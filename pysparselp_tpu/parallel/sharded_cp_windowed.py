"""Position-sharded windowed CP: stencil domain decomposition over a mesh.

The row-sharded CP path (``parallel/sharded_cp``) keeps the primal
replicated and pays one ``psum`` per iteration — and its per-shard SpMVs
run the per-op kernels, not the windowed whole-iteration kernel that is
the single-chip flagship regime.  For anchor-aligned DIA systems there is
a strictly better decomposition: the aligned POSITION SPACE itself is 1-D
with a local stencil (offset span ~4·grid_side), so it shards like any
stencil computation —

* each device owns a contiguous run of ``nw_l`` windows of the padded
  window layout (``ops/cp_windowed``) plus the standard two pad windows;
* the interior windows run the SAME windowed whole-iteration Pallas
  kernel as the single-chip path (``ops.cp_windowed.build_windowed_call``);
* instead of a ``psum``, each iteration exchanges a halo of
  ``hq + gq`` sublane rows of ``x``/``y`` (``y_eq``) with the two
  neighbors via ``lax.ppermute`` — a few tens of KB over ICI, vs
  re-reducing the full primal;
* the mesh-edge shards receive zeros from the missing neighbor, which is
  exactly the global layout's neutral pad-window contract.

Primal AND duals are fully sharded; per-iteration communication is O(halo)
instead of O(n).  Reference context: this distributes the reference's
flagship hot loop (``pysparselp/ChambollePockPPD.py:195-342``) the way a
TPU distributes a stencil — by position, not by matrix row blocks.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops import cp_windowed as cw
from ..ops.cp_windowed import (LANE, _pad_rows_layout, _pad_vals_layout,
                               build_windowed_call, window_layout)


def _mesh_ndev(mesh: Mesh) -> int:
    return int(np.prod(list(mesh.shape.values())))


def position_shard_plan(a_eq, a_ineq, n, m_eq, m_ineq, ndev, dtype):
    """Joint windowed plan for the position-sharded path, or ``None``.

    Eligible when the (already anchor-aligned) systems lower to DIA with
    f32/bf16-exact values, a joint window plan exists, and there is at
    least one interior window per device."""
    import scipy.sparse

    from ..problem import DiaMatrix

    if np.dtype(dtype) != np.float32:
        return None
    if a_ineq is None or a_ineq.shape[0] == 0:
        return None
    if not (cw._FORCE_INTERPRET or jax.default_backend() == "tpu"):
        return None
    di = DiaMatrix.from_scipy(scipy.sparse.csr_matrix(a_ineq),
                              dtype=jnp.float32)
    if di.vals.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    if not di.offsets or not di.offsets_t:
        return None
    de = None
    eq_args = None
    if a_eq is not None and a_eq.shape[0] > 0:
        de = DiaMatrix.from_scipy(scipy.sparse.csr_matrix(a_eq),
                                  dtype=jnp.float32)
        if de.vals.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        if not de.offsets or not de.offsets_t:
            return None
        eq_args = (de.offsets, de.offsets_t, de.vals.dtype.itemsize)
    plan = window_layout(di.offsets, di.offsets_t, n, max(m_ineq, m_eq),
                         di.vals.dtype.itemsize, eq=eq_args)
    if plan is None:
        return None
    wq, hq, gq, nw, kk = plan
    if nw < ndev:
        return None           # fewer windows than devices: use row sharding
    # only the fully-fused regime should outrank this path; mirror the
    # single-chip driver's ordering by rejecting problems the fused
    # kernel would take (the caller checks that first anyway)
    return dict(plan=plan, dia=di, dia_eq=de)


def build_position_sharded(sys_d, mesh: Mesh, alpha=1.0, theta=1.0,
                           plan_info=None):
    """Host-side setup: per-shard stacked arrays in the padded window
    layout, placed with their shardings.

    ``sys_d`` is the ALIGNED system dict (scipy matrices + numpy vectors):
    keys ``a_eq, beq, a_ineq, b_ineq, c, lb, ub, x0, x30, y_eq0, y_ineq0``.
    """
    import scipy.sparse

    axis = mesh.axis_names[0]
    ndev = _mesh_ndev(mesh)
    n = sys_d["c"].size
    a_one = sys_d["a_ineq"]
    a_eq = sys_d["a_eq"]
    m = a_one.shape[0]
    m_eq = a_eq.shape[0] if a_eq is not None else 0
    if plan_info is None:
        plan_info = position_shard_plan(a_eq, a_one, n, m_eq, m, ndev,
                                        np.float32)
    assert plan_info is not None, "caller must check position_shard_plan"
    di, de = plan_info["dia"], plan_info["dia_eq"]
    has_eq = de is not None
    wq, hq, gq, nw, _kk = plan_info["plan"]
    qc = wq + 2 * hq
    nw_l = -(-nw // ndev)
    nw_g = nw_l * ndev              # padded global window count (neutral)
    qtot_g = (nw_g + 2) * wq        # global padded layout rows
    qtot_l = (nw_l + 2) * wq        # per-shard layout rows

    # diagonal preconditioners: identical formulas to the single-chip
    # driver (``ChambollePockPPD.py:123-178``)
    col_sum = np.zeros(n)
    for a in (a_eq, a_one):
        if a is None:
            continue
        aa = scipy.sparse.csr_matrix(a).copy()
        aa.data = np.abs(aa.data) ** (2.0 - alpha)
        col_sum += np.asarray(aa.sum(axis=0)).ravel()
    col_sum[col_sum == 0] = 1.0
    diag_t = 1.0 / col_sum

    def sigma_of(a):
        aa = scipy.sparse.csr_matrix(a).copy()
        aa.data = np.abs(aa.data) ** alpha
        rs = np.asarray(aa.sum(axis=1)).ravel()
        rs[rs == 0] = 1.0
        return 1.0 / rs

    f32 = jnp.float32

    def glayout(vec):
        return _pad_rows_layout(jnp.asarray(np.asarray(vec), f32), wq,
                                qtot_g)

    def shards_of(g):
        """(qtot_g, LANE) global layout -> (ndev, qtot_l, LANE) stacked
        overlapping shard slices (shard s starts at window s*nw_l)."""
        return jnp.stack([g[s * nw_l * wq: s * nw_l * wq + qtot_l]
                          for s in range(ndev)])

    def tiles_of(vals, ndiag, size):
        pad = _pad_vals_layout(vals, ndiag, size, wq, qtot_g)
        starts = [(s * nw_l + j + 1) * wq - hq
                  for s in range(ndev) for j in range(nw_l)]
        tiles = jnp.stack([pad[:, st:st + qc, :] for st in starts])
        return tiles.reshape(ndev, nw_l, ndiag, qc, LANE)

    shard = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, shard)

    sigma_ineq = sigma_of(a_one)
    sigma_eq = sigma_of(a_eq) if has_eq else None
    consts = [glayout(sys_d["c"]), glayout(diag_t), glayout(sys_d["lb"]),
              glayout(sys_d["ub"]), glayout(sigma_ineq),
              glayout(sys_d["b_ineq"])]
    if has_eq:
        consts += [glayout(sigma_eq), glayout(sys_d["beq"])]
    consts = [put(shards_of(g)) for g in consts]
    planes = [put(tiles_of(di.vals_t, len(di.offsets_t), n)),
              put(tiles_of(di.vals, len(di.offsets), m))]
    if has_eq:
        planes += [put(tiles_of(de.vals_t, len(de.offsets_t), n)),
                   put(tiles_of(de.vals, len(de.offsets), m_eq))]

    def state_of(vec, size):
        v = np.zeros(size) if vec is None else np.asarray(vec, np.float64)
        return put(shards_of(glayout(v)))

    state = dict(
        x=state_of(sys_d.get("x0"), n),
        x3=state_of(sys_d.get("x30") if sys_d.get("x30") is not None
                    else sys_d.get("x0"), n),
        y_ineq=state_of(sys_d.get("y_ineq0"), m),
    )
    if has_eq:
        state["y_eq"] = state_of(sys_d.get("y_eq0"), m_eq)

    data = dict(
        consts=tuple(consts), planes=tuple(planes),
        plan=(wq, hq, gq, nw_l), has_eq=has_eq, ndev=ndev, axis=axis,
        n=n, m=m, m_eq=m_eq, theta=float(theta),
        offsets=di.offsets, offsets_t=di.offsets_t,
        vt_dtype=di.vals_t.dtype, v_dtype=di.vals.dtype,
        eq_offsets=de.offsets if has_eq else None,
        eq_offsets_t=de.offsets_t if has_eq else None,
        vte_dtype=de.vals_t.dtype if has_eq else None,
        ve_dtype=de.vals.dtype if has_eq else None,
        diag_t=diag_t, sigma_ineq=sigma_ineq, sigma_eq=sigma_eq,
    )
    return data, state


def _unshard_vec(stacked, wq, nw_l, size):
    """(ndev, qtot_l, LANE) stacked shard layouts -> (size,) global vector
    (interior windows concatenated)."""
    s = np.asarray(stacked)
    interiors = s[:, wq:(nw_l + 1) * wq, :]          # (ndev, nw_l*wq, LANE)
    return interiors.reshape(-1)[:size]


def unshard_state(data, state):
    """Gather the sharded padded state back to global (x, x3, y_eq, y)."""
    wq, _hq, _gq, nw_l = data["plan"]
    x = _unshard_vec(state["x"], wq, nw_l, data["n"])
    x3 = _unshard_vec(state["x3"], wq, nw_l, data["n"])
    y = _unshard_vec(state["y_ineq"], wq, nw_l, data["m"])
    ye = (_unshard_vec(state["y_eq"], wq, nw_l, data["m_eq"])
          if data["has_eq"] else np.zeros(0))
    return x, x3, ye, y


def run_position_sharded(sys_d, mesh: Mesh, info, nb_max_iter=1000,
                         nb_iter_plot=100, callback_func=None,
                         max_time=None, start_time=None,
                         force_integer=False, stop_tol=None,
                         light_metrics=False, theta=1.0, alpha=1.0):
    """Host loop for the position-sharded windowed CP path.

    Same contract as the row-sharded loop: chunked iterations, checkpoint
    metrics through the standard callback protocol, ``stop_tol`` /
    ``max_time`` / ``force_integer`` semantics.  Checkpoint metrics are
    computed on the gathered global state with the single-chip metrics
    evaluator (a 0-step ``_cp_chunk``) — checkpoints are rare, the
    iterations themselves never leave the mesh.  Returns
    ``(x_aligned, best_integer_solution)``."""
    from ..problem import LPProblem, dispatch_iteration_cap
    from ..solvers.base import HostLoop, chunk_schedule, emit_callback
    from ..solvers.chambolle_pock import _cp_chunk

    data, state = build_position_sharded(sys_d, mesh, alpha=alpha,
                                         theta=theta, plan_info=info)
    di, de = info["dia"], info["dia_eq"]
    has_eq = de is not None
    f32 = jnp.float32
    n, m, m_eq = data["n"], data["m"], data["m_eq"]
    prob = LPProblem(
        c=jnp.asarray(sys_d["c"], f32), lb=jnp.asarray(sys_d["lb"], f32),
        ub=jnp.asarray(sys_d["ub"], f32),
        a_eq=de, b_eq=jnp.asarray(sys_d["beq"], f32) if has_eq else None,
        a_ineq=di, b_lower=None,
        b_upper=jnp.asarray(sys_d["b_ineq"], f32),
        n=n, m_eq=m_eq, m_ineq=m)
    pre = dict(diag_t=jnp.asarray(data["diag_t"], f32),
               theta=jnp.asarray(theta, f32),
               sigma_ineq=jnp.asarray(data["sigma_ineq"], f32))
    if has_eq:
        pre["sigma_eq"] = jnp.asarray(data["sigma_eq"], f32)

    loop = HostLoop(start_time, max_time)
    cap = dispatch_iteration_cap(de, di)
    niter = 0
    best_integer_solution = None
    best_integer_energy = np.inf
    xg = np.asarray(sys_d["x0"] if sys_d.get("x0") is not None
                    else np.zeros(n))
    for nsteps in chunk_schedule(nb_max_iter, nb_iter_plot):
        done = 0
        while done < nsteps:
            sub = min(cap, nsteps - done)
            state = sharded_windowed_chunk(data, state, mesh, sub)
            done += sub
        niter += nsteps
        xg, x3g, yeg, yg = unshard_state(data, state)
        gstate = (jnp.asarray(xg, f32), jnp.asarray(x3g, f32),
                  jnp.asarray(yeg, f32), jnp.asarray(yg, f32))
        _, metrics = _cp_chunk(prob, pre, gstate, 0)
        if force_integer and bool(metrics["rounded_feasible"]):
            er = float(metrics["energy_rounded"])
            if er < best_integer_energy:
                best_integer_energy = er
                best_integer_solution = np.round(xg)
        emit_callback(
            callback_func, niter, gstate[0],
            metrics["energy1"], metrics["energy2"],
            lambda: loop.elapsed,
            metrics["max_violated_equality"],
            metrics["max_violated_inequality"],
            light=light_metrics,
        )
        if loop.timed_out:
            break
        if stop_tol is not None:
            e1, e2 = float(metrics["energy1"]), float(metrics["energy2"])
            gap = abs(e1 - e2) / (1.0 + abs(e1) + abs(e2))
            feas = max(float(metrics["max_violated_equality"]),
                       float(metrics["max_violated_inequality"]))
            if feas < stop_tol and gap < stop_tol:
                break
    return np.asarray(xg, np.float64), best_integer_solution


def sharded_windowed_chunk(data, state, mesh: Mesh, nsteps: int):
    """Advance ``nsteps`` iterations, fully sharded; returns new state.

    Each iteration: halo-exchange ``hq+gq`` rows of the state with both
    neighbors (``ppermute``), then one windowed whole-iteration
    ``pallas_call`` over the shard's ``nw_l`` windows."""
    assert nsteps >= 1
    axis = data["axis"]
    ndev = data["ndev"]
    wq, hq, gq, nw_l = data["plan"]
    has_eq = data["has_eq"]
    h = hq + gq
    lo = wq                      # first interior row
    hi = wq + nw_l * wq          # one past last interior row
    interpret = jax.default_backend() != "tpu"

    def make_call(emit_x3):
        return build_windowed_call(
            wq, hq, gq, nw_l, 1, data["theta"], False, emit_x3,
            data["offsets"], data["offsets_t"], data["vt_dtype"],
            data["v_dtype"], eq_offsets=data["eq_offsets"],
            eq_offsets_t=data["eq_offsets_t"],
            vte_dtype=data["vte_dtype"], ve_dtype=data["ve_dtype"],
            interpret=interpret)

    call = make_call(False)
    call_x3 = make_call(True)
    fwd = [(s, s + 1) for s in range(ndev - 1)]
    bwd = [(s + 1, s) for s in range(ndev - 1)]

    def refresh(arr):
        """Overwrite the pad-window halo rows with fresh neighbor edges
        (mesh-edge shards receive ppermute's zeros = the global layout's
        neutral pads)."""
        from_left = jax.lax.ppermute(arr[hi - h:hi], axis, fwd)
        from_right = jax.lax.ppermute(arr[lo:lo + h], axis, bwd)
        arr = arr.at[lo - h:lo].set(from_left)
        return arr.at[hi:hi + h].set(from_right)

    def body(consts, planes, x, x3, y, ye):
        x, x3, y, ye = x[0], x3[0], y[0], ye[0]
        ins = consts + planes
        ins = tuple(a[0] for a in ins)

        def one(xc, yc, yec, emit):
            xc, yc = refresh(xc), refresh(yc)
            if has_eq:
                yec = refresh(yec)
                outs = (call_x3 if emit else call)(xc, yc, yec, *ins)
            else:
                outs = (call_x3 if emit else call)(xc, yc, *ins)
            if emit:
                if has_eq:
                    xn, x3n, yn, yen = outs
                else:
                    (xn, x3n, yn), yen = outs, yec
                return xn, x3n, yn, yen
            if has_eq:
                xn, yn, yen = outs
            else:
                (xn, yn), yen = outs, yec
            return xn, yn, yen

        def loop_body(_, carry):
            xc, yc, yec = carry
            return one(xc, yc, yec, False)

        x, y, ye = jax.lax.fori_loop(0, nsteps - 1, loop_body, (x, y, ye))
        x, x3, y, ye = one(x, y, ye, True)
        return x[None], x3[None], y[None], ye[None]

    spec = P(axis)
    n_c = len(data["consts"])
    n_p = len(data["planes"])
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=((spec,) * n_c, (spec,) * n_p, spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec),
        check_vma=False,
    )
    ye0 = state.get("y_eq")
    if ye0 is None:
        # uniform pytree for the no-eq case: a zero dummy with the same
        # leading axis (never read by the kernel)
        ye0 = state["y_ineq"]
    x, x3, y, ye = sharded(data["consts"], data["planes"], state["x"],
                           state["x3"], state["y_ineq"], ye0)
    out = dict(state, x=x, x3=x3, y_ineq=y)
    if has_eq:
        out["y_eq"] = ye
    return out
