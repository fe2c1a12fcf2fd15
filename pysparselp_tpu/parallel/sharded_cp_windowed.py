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

import functools

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


#: telemetry for bench/diagnostics — set each time the position-sharded
#: loop actually runs (executed plan + device count), so a measurement
#: can assert which regime it priced.
last_run_info = None


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
    # cheap O(nnz) diagonal-count probe BEFORE materializing DIA storage:
    # a non-banded system (rcm/unpermuted presolve choice) can have ~m
    # distinct diagonals, and DiaMatrix would allocate O(ndiag * n) host
    # memory just to learn the plan is ineligible
    from ..problem import DIA_AUTO_MAX_OFFSETS, dia_offset_count

    csr_in = scipy.sparse.csr_matrix(a_ineq)
    if dia_offset_count(csr_in) > DIA_AUTO_MAX_OFFSETS:
        return None
    csr_eq = None
    if a_eq is not None and a_eq.shape[0] > 0:
        csr_eq = scipy.sparse.csr_matrix(a_eq)
        if dia_offset_count(csr_eq) > DIA_AUTO_MAX_OFFSETS:
            return None
    di = DiaMatrix.from_scipy(csr_in, dtype=jnp.float32)
    if di.vals.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    if not di.offsets or not di.offsets_t:
        return None
    de = None
    eq_args = None
    if csr_eq is not None:
        de = DiaMatrix.from_scipy(csr_eq, dtype=jnp.float32)
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
                           plan_info=None, omega=1.0):
    """Host-side setup: per-shard stacked arrays in the padded window
    layout, placed with their shardings.

    ``sys_d`` is the ALIGNED system dict (scipy matrices + numpy vectors):
    keys ``a_eq, beq, a_ineq, b_ineq, c, lb, ub, x0, x30, y_eq0, y_ineq0``.
    ``omega`` statically applies the primal weight (τ·ω, σ/ω — the τσ
    invariant, mirroring the single-chip ``_scale_pre``); the restart
    controller instead builds with ``omega=1`` and scales dynamically.
    """
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
    # driver (shared helper, ``ChambollePockPPD.py:123-178``)
    from ..solvers.chambolle_pock import host_preconditioners

    diag_t, sigma_eq, sigma_ineq = host_preconditioners(
        a_eq, a_one, alpha=alpha, omega=omega)

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
                         light_metrics=False, theta=1.0, alpha=1.0,
                         omega=1.0, restart=None, restart_period=None):
    """Host loop for the position-sharded windowed CP path.

    Same contract as the row-sharded loop: chunked iterations, checkpoint
    metrics through the standard callback protocol, ``stop_tol`` /
    ``max_time`` / ``force_integer`` semantics.  Checkpoint metrics are
    computed on the gathered global state with the single-chip metrics
    evaluator (a 0-step ``_cp_chunk``) — checkpoints are rare, the
    iterations themselves never leave the mesh.  ``omega`` applies the
    primal weight; ``restart="average"`` runs the device-resident PDLP
    controller (:func:`sharded_windowed_chunk_restart`).  Returns
    ``(x_aligned, best_integer_solution)``."""
    from ..problem import LPProblem, dispatch_iteration_cap
    from ..solvers.base import HostLoop, chunk_schedule, emit_callback
    from ..solvers.chambolle_pock import _cp_chunk, _kkt_score

    global last_run_info
    last_run_info = {"regime": "position-sharded-windowed",
                     "plan": tuple(int(v) for v in info["plan"]),
                     "ndev": _mesh_ndev(mesh),
                     "restart": restart}
    data, state = build_position_sharded(
        sys_d, mesh, alpha=alpha, theta=theta, plan_info=info,
        omega=1.0 if restart == "average" else float(omega))
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
    # per-SHARD dispatch budget: each device streams ~1/ndev of the
    # operator bytes per iteration, so the whole-problem cap would cut
    # dispatches to ~budget/ndev seconds and charge the ~35 ms re-dispatch
    # latency ndev times as often
    cap = dispatch_iteration_cap(de, di) * _mesh_ndev(mesh)
    niter = 0
    best_integer_solution = None
    best_integer_energy = np.inf
    # light checkpoints with a solution-less recorder never leave the
    # mesh: metrics reduce on-device (sharded_windowed_metrics) and the
    # single synchronizing fetch is emit_callback's float(energy1)
    wants_x = (callback_func is not None
               and getattr(callback_func, "wants_solution", True))
    device_metrics = light_metrics and not wants_x
    rstate = None
    if restart == "average":
        # seed the controller with the KKT score of the initial point
        # (single-chip seeding, chambolle_pock.py) — a one-time host-side
        # evaluation on the compact system
        period = int(min(restart_period or nb_iter_plot, nb_iter_plot,
                         cap))

        def compact(key, size):
            v = sys_d.get(key)
            return jnp.asarray(np.zeros(size) if v is None else v, f32)

        mu0 = _kkt_score(prob, compact("x0", n),
                         compact("y_eq0", m_eq) if has_eq
                         else jnp.zeros(0, f32),
                         compact("y_ineq0", m))
        rstate = {
            "state": dict(state),
            "omega": jnp.asarray(float(omega), f32),
            "mu_restart": mu0.astype(f32),
            "mu_last": jnp.asarray(np.inf, f32),
            "zx": state["x"],
            "zeq": state.get("y_eq"),
            "zineq": state["y_ineq"],
        }
    for nsteps in chunk_schedule(nb_max_iter, nb_iter_plot):
        done = 0
        if restart == "average":
            cap_r = max(period, cap // period * period)
            while done < nsteps:
                sub = min(cap_r, nsteps - done)
                rstate = sharded_windowed_chunk_restart(
                    data, rstate, mesh, sub, period)
                done += sub
            state = rstate["state"]
        else:
            while done < nsteps:
                sub = min(cap, nsteps - done)
                state = sharded_windowed_chunk(data, state, mesh, sub)
                done += sub
        niter += nsteps
        if device_metrics:
            metrics = sharded_windowed_metrics(data, state, mesh)
            x_cb = state["x"]   # light contract: never converted
        else:
            xg, x3g, yeg, yg = unshard_state(data, state)
            gstate = (jnp.asarray(xg, f32), jnp.asarray(x3g, f32),
                      jnp.asarray(yeg, f32), jnp.asarray(yg, f32))
            _, metrics = _cp_chunk(prob, pre, gstate, 0)
            x_cb = gstate[0]
        if force_integer and bool(metrics["rounded_feasible"]):
            er = float(metrics["energy_rounded"])
            if er < best_integer_energy:
                best_integer_energy = er
                best_integer_solution = np.round(
                    unshard_state(data, state)[0] if device_metrics
                    else xg)
        emit_callback(
            callback_func, niter, x_cb,
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
    # one final gather — with device_metrics the loop never materialized x
    xg = unshard_state(data, state)[0]
    return np.asarray(xg, np.float64), best_integer_solution


def _interior_matvec(planes, offsets, arr, wq, hq, nw_l):
    """DIA mat/rmatvec restricted to a shard's INTERIOR positions.

    ``planes`` is the per-shard tiled value layout ``(nw_l, nd, qc, LANE)``
    (possibly bf16); ``arr`` a padded shard layout ``(qtot_l, LANE)`` whose
    halo rows are fresh.  Result[p] = Σ_j vals[j, p] · arr[p + off_j] for
    the ``nw_l·wq·LANE`` interior positions — every tap is a STATIC slice
    of the flattened layout (|off| ≤ gq·LANE ≤ wq·LANE, so reads stay
    inside the pad windows)."""
    qc = planes.shape[2]
    af = arr.reshape(-1)
    base = wq * LANE
    size = nw_l * wq * LANE
    out = jnp.zeros((size,), jnp.float32)
    # tile center rows hq:hq+wq of window j = interior window j's values
    cent = planes[:, :, hq:hq + wq, :]         # (nw_l, nd, wq, LANE)
    assert cent.shape[2] == wq and qc == wq + 2 * hq
    for j, off in enumerate(offsets):
        v = cent[:, j].astype(jnp.float32).reshape(size)
        out = out + v * jax.lax.slice(af, (base + off,),
                                      (base + off + size,))
    return out


def _halo_refresh(axis, ndev, lo, hi, h):
    """Build the per-array halo exchange: overwrite the pad-window halo
    rows with fresh neighbor edges via two ``ppermute``s (mesh-edge shards
    receive zeros = the global layout's neutral pads)."""
    fwd = [(s, s + 1) for s in range(ndev - 1)]
    bwd = [(s + 1, s) for s in range(ndev - 1)]

    def refresh(arr):
        from_left = jax.lax.ppermute(arr[hi - h:hi], axis, fwd)
        from_right = jax.lax.ppermute(arr[lo:lo + h], axis, bwd)
        arr = arr.at[lo - h:lo].set(from_left)
        return arr.at[hi:hi + h].set(from_right)

    return refresh


def _static_of(data):
    """Hashable static-config key of a ``build_position_sharded`` data
    dict — everything the chunk factories close over besides the arrays.
    Factories cache on it (plus mesh/nsteps) so repeated host-loop chunks
    reuse ONE jitted executable instead of re-tracing a fresh ``shard_map``
    closure per call (the re-trace + remote lowering costs seconds per
    chunk over a tunneled chip)."""
    def tup(v):
        return None if v is None else tuple(int(o) for o in v)

    return (data["axis"], int(data["ndev"]),
            tuple(int(v) for v in data["plan"]),
            bool(data["has_eq"]), float(data["theta"]),
            tup(data["offsets"]), tup(data["offsets_t"]),
            np.dtype(data["vt_dtype"]), np.dtype(data["v_dtype"]),
            tup(data["eq_offsets"]), tup(data["eq_offsets_t"]),
            None if data["vte_dtype"] is None else np.dtype(data["vte_dtype"]),
            None if data["ve_dtype"] is None else np.dtype(data["ve_dtype"]),
            len(data["consts"]), len(data["planes"]))


def sharded_windowed_chunk_restart(data, rstate, mesh: Mesh, nsteps: int,
                                   period: int):
    """Device-resident PDLP restart controller for the position-sharded
    windowed path: ``nsteps`` iterations with a restart-to-average check
    every ``period`` iterations, entirely on the mesh.

    Multi-chip twin of ``solvers.chambolle_pock._cp_chunk_restart_device``
    (windowed branch) — per-shard windowed kernels emit the running sums,
    and the KKT progress score reduces with SCALAR psums only: unlike the
    row-sharded controller (which all-reduces the O(n) dual-transpose
    vector), every vector quantity here — Ax, Aᵀy, the box-dual — is
    computable locally from the halo-refreshed shard state, so a restart
    check costs a handful of scalar collectives on top of one extra local
    SpMV pair.  ``rstate`` carries the sharded solver state, the sharded
    restart point (``zx``/``zeq``/``zineq``), and the replicated
    controller scalars (ω, score at last restart, last candidate score).
    """
    assert nsteps >= 1 and period >= 1
    has_eq = data["has_eq"]
    fn = _restart_callable(_static_of(data), mesh, int(nsteps),
                           int(period),
                           jax.default_backend() != "tpu")
    st_in = rstate["state"]
    dummy = st_in.get("y_eq", st_in["y_ineq"])
    rs_in = {
        "state": (st_in["x"], st_in["x3"], st_in["y_ineq"],
                  st_in.get("y_eq", dummy)),
        "omega": rstate["omega"], "mu_restart": rstate["mu_restart"],
        "mu_last": rstate["mu_last"], "zx": rstate["zx"],
        "zeq": rstate["zeq"] if rstate["zeq"] is not None else dummy,
        "zineq": rstate["zineq"],
    }
    st, om, mu_r, mu_l, zx, zeq, zineq = fn(
        data["consts"], data["planes"], rs_in)
    state_out = dict(st_in, x=st[0], x3=st[1], y_ineq=st[2])
    if has_eq:
        state_out["y_eq"] = st[3]
    return dict(state=state_out, omega=om, mu_restart=mu_r, mu_last=mu_l,
                zx=zx, zeq=zeq if has_eq else None, zineq=zineq)


@functools.lru_cache(maxsize=64)
def _restart_callable(static, mesh, nsteps, period, interpret):
    (axis, ndev, plan, has_eq, theta, offsets, offsets_t, vt_dtype,
     v_dtype, eq_offsets, eq_offsets_t, vte_dtype, ve_dtype, n_c,
     n_p) = static
    wq, hq, gq, nw_l = plan
    h = hq + gq
    lo = wq
    hi = wq + nw_l * wq
    beta_suf, beta_nec = 0.2, 0.8
    nblocks, rem = divmod(nsteps, period)

    def make_call(emit_x3):
        # sums variants only: the remainder iterations reuse them (their
        # sums are discarded) so the chunk compiles two kernels, not four
        return build_windowed_call(
            wq, hq, gq, nw_l, 1, theta, True, emit_x3,
            offsets, offsets_t, vt_dtype, v_dtype, eq_offsets=eq_offsets,
            eq_offsets_t=eq_offsets_t, vte_dtype=vte_dtype,
            ve_dtype=ve_dtype, interpret=interpret)

    call_s = make_call(False)
    call_sx3 = make_call(True)
    refresh = _halo_refresh(axis, ndev, lo, hi, h)

    def body(consts, planes, rs):
        consts = tuple(a[0] for a in consts)
        planes = tuple(a[0] for a in planes)
        rs = dict(rs)
        rs["state"] = tuple(a[0] for a in rs["state"])
        for k in ("zx", "zeq", "zineq"):
            rs[k] = rs[k][0]
        cb, tb, lbb, ubb, sb, bb = consts[:6]
        seb, beb = (consts[6], consts[7]) if has_eq else (None, None)
        vt_p, v_p = planes[0], planes[1]
        vte_p, ve_p = (planes[2], planes[3]) if has_eq else (None, None)

        def interior(a):
            return a[lo:hi].reshape(-1)

        c_i, lb_i, ub_i, b_i = (interior(cb), interior(lbb), interior(ubb),
                                interior(bb))
        be_i = interior(beb) if has_eq else None

        def score(xr, yr, yer):
            """KKT progress score of halo-fresh layouts (scalar psums)."""
            x_i, y_i = interior(xr), interior(yr)
            dd = c_i + _interior_matvec(vt_p, offsets_t, yr, wq,
                                        hq, nw_l)
            r = jnp.maximum(
                _interior_matvec(v_p, offsets, xr, wq, hq, nw_l)
                - b_i, 0.0)
            pviol = jnp.sum(r * r)
            dual = -jnp.dot(y_i, b_i)
            if has_eq:
                ye_i = interior(yer)
                dd = dd + _interior_matvec(vte_p, eq_offsets_t,
                                           yer, wq, hq, nw_l)
                re_ = (_interior_matvec(ve_p, eq_offsets, xr, wq,
                                        hq, nw_l) - be_i)
                pviol = pviol + jnp.sum(re_ * re_)
                dual = dual - jnp.dot(ye_i, be_i)
            dual = dual + jnp.sum(jnp.where(dd < 0, dd * ub_i, dd * lb_i))
            pobj = jax.lax.psum(jnp.dot(c_i, x_i), axis)
            dual = jax.lax.psum(dual, axis)
            pviol = jax.lax.psum(pviol, axis)
            gap = jnp.abs(pobj - dual) / (
                1.0 + jnp.abs(pobj) + jnp.abs(dual))
            return jnp.sqrt(pviol + gap * gap)

        def one(xc, yc, yec, om, emit):
            """One halo-exchange + windowed iteration at primal weight ω;
            returns (state..., sums...)."""
            ins = (cb, tb * om, lbb, ubb, sb / om, bb)
            if has_eq:
                ins += (seb / om, beb)
            ins += (vt_p, v_p) + ((vte_p, ve_p) if has_eq else ())
            xc, yc = refresh(xc), refresh(yc)
            call = call_sx3 if emit else call_s
            if has_eq:
                yec = refresh(yec)
                outs = call(xc, yc, yec, *ins)
            else:
                outs = call(xc, yc, *ins)
            it = iter(outs)
            xn = next(it)
            x3n = next(it) if emit else None
            yn = next(it)
            yen = next(it) if has_eq else yec
            sums = tuple(it)            # (sx, sy[, sye])
            return xn, x3n, yn, yen, sums

        def run_block(rs):
            x, x3, y, ye = rs["state"]
            om = rs["omega"]
            zero = jnp.zeros_like(x)
            nsum = 3 if has_eq else 2

            def iter_body(_, carry):
                (xc, yc, yec), acc = carry
                xn, _, yn, yen, sums = one(xc, yc, yec, om, False)
                return (xn, yn, yen), tuple(a + s
                                            for a, s in zip(acc, sums))

            (x, y, ye), acc = jax.lax.fori_loop(
                0, period - 1, iter_body, ((x, y, ye), (zero,) * nsum))
            x, x3, y, ye, sums = one(x, y, ye, om, True)
            acc = tuple(a + s for a, s in zip(acc, sums))
            inv = 1.0 / period
            ax = refresh(acc[0] * inv)
            ay = refresh(acc[1] * inv)
            aye = refresh(acc[2] * inv) if has_eq else ye
            xf, yf = refresh(x), refresh(y)
            yef = refresh(ye) if has_eq else ye
            s_cur = score(xf, yf, yef)
            s_avg = score(ax, ay, aye)
            mu_c = jnp.minimum(s_cur, s_avg)
            do = (mu_c <= beta_suf * rs["mu_restart"]) | (
                (mu_c <= beta_nec * rs["mu_restart"])
                & (mu_c > rs["mu_last"]))
            use_avg = s_avg < s_cur
            zx = jnp.where(use_avg, ax, xf)
            zineq = jnp.where(use_avg, ay, yf)
            zeq = jnp.where(use_avg, aye, yef) if has_eq else ye
            dx = jnp.sqrt(jax.lax.psum(
                jnp.sum((interior(zx) - interior(rs["zx"])) ** 2), axis))
            dy2 = jnp.sum((interior(zineq) - interior(rs["zineq"])) ** 2)
            if has_eq:
                dy2 = dy2 + jnp.sum(
                    (interior(zeq) - interior(rs["zeq"])) ** 2)
            dy = jnp.sqrt(jax.lax.psum(dy2, axis))
            valid = (dx > 1e-30) & (dy > 1e-30)
            om_new = jnp.where(
                do & valid,
                jnp.exp(0.5 * jnp.log(dx / jnp.maximum(dy, 1e-30))
                        + 0.5 * jnp.log(om)),
                om,
            )
            new_state = (
                jnp.where(do, zx, x),
                jnp.where(do, zx, x3),
                jnp.where(do, zineq, y),
                jnp.where(do, zeq, ye) if has_eq else ye,
            )
            return {
                "state": new_state,
                "omega": om_new,
                "mu_restart": jnp.where(do, mu_c, rs["mu_restart"]),
                "mu_last": jnp.where(do, jnp.asarray(jnp.inf, mu_c.dtype),
                                     mu_c),
                "zx": jnp.where(do, zx, rs["zx"]),
                "zeq": jnp.where(do, zeq, rs["zeq"]) if has_eq
                else rs["zeq"],
                "zineq": jnp.where(do, zineq, rs["zineq"]),
            }

        # uniform carry: blocks update x3 at their final call, so the
        # state tuple keeps (x, x3, y, ye) throughout
        rs = jax.lax.fori_loop(0, nblocks, lambda _, r: run_block(r), rs)
        if rem:
            x, x3, y, ye = rs["state"]
            om = rs["omega"]

            def tail_body(_, carry):
                xc, yc, yec = carry
                xn, _, yn, yen, _s = one(xc, yc, yec, om, False)
                return xn, yn, yen

            x, y, ye = jax.lax.fori_loop(0, rem - 1, tail_body, (x, y, ye))
            x, x3, y, ye, _s = one(x, y, ye, om, True)
            rs = dict(rs, state=(x, x3, y, ye))
        st = tuple(a[None] for a in rs["state"])
        return (st, rs["omega"], rs["mu_restart"], rs["mu_last"],
                rs["zx"][None], rs["zeq"][None], rs["zineq"][None])

    spec = P(axis)
    rspec = P()
    st_spec = (spec,) * 4
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=((spec,) * n_c, (spec,) * n_p,
                  {"state": st_spec, "omega": rspec, "mu_restart": rspec,
                   "mu_last": rspec, "zx": spec, "zeq": spec,
                   "zineq": spec}),
        out_specs=(st_spec, rspec, rspec, rspec, spec, spec, spec),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_windowed_metrics(data, state, mesh: Mesh):
    """Checkpoint metrics computed ON the mesh — multi-chip twin of the
    single-chip metrics block (``chambolle_pock.cp_chunk_impl``), exact up
    to f32 reduction order.

    Everything reduces with SCALAR psums/pmaxes: the Lagrangian value
    ``energy1``, the box-dual lower bound ``energy2`` (its dual-feasible
    minimizer ``x4`` is local given one extra halo refresh), the true-row
    violation maxima (position masking keeps ``max_violated_inequality``
    exact — it can be negative — despite the layout's neutral padding),
    and the ``force_integer`` rounding stats.  With ``light_metrics`` the
    position-sharded host loop fetches ONE of these scalars per
    checkpoint instead of gathering the full sharded state."""
    fn = _metrics_callable(_static_of(data), mesh, int(data["m"]),
                           int(data["m_eq"]))
    has_eq = data["has_eq"]
    ye0 = state.get("y_eq", state["y_ineq"])
    e1, e2, mveq, mvin, er, rf = fn(
        data["consts"], data["planes"], state["x"], state["y_ineq"], ye0)
    return dict(energy1=e1, energy2=e2,
                max_violated_equality=(mveq if has_eq
                                       else jnp.asarray(0.0, jnp.float32)),
                max_violated_inequality=mvin,
                energy_rounded=er, rounded_feasible=rf)


@functools.lru_cache(maxsize=64)
def _metrics_callable(static, mesh, m, m_eq):
    (axis, ndev, plan, has_eq, _theta, offsets, offsets_t, _vt_dtype,
     _v_dtype, eq_offsets, eq_offsets_t, _vte_dtype, _ve_dtype, n_c,
     n_p) = static
    wq, hq, gq, nw_l = plan
    h = hq + gq
    lo = wq
    hi = wq + nw_l * wq
    size = nw_l * wq * LANE
    refresh = _halo_refresh(axis, ndev, lo, hi, h)

    def body(consts, planes, x, y, ye):
        consts = tuple(a[0] for a in consts)
        planes = tuple(a[0] for a in planes)
        x, y, ye = x[0], y[0], ye[0]
        cb, _tb, lbb, ubb, _sb, bb = consts[:6]
        beb = consts[7] if has_eq else None
        vt_p, v_p = planes[0], planes[1]
        vte_p, ve_p = (planes[2], planes[3]) if has_eq else (None, None)

        def interior(a):
            return a[lo:hi].reshape(-1)

        def matvec(p, offs, arr):
            return _interior_matvec(p, offs, arr, wq, hq, nw_l)

        def embed(vec_i):
            pad = jnp.zeros((x.shape[0] * LANE,), jnp.float32)
            pad = pad.at[lo * LANE:hi * LANE].set(vec_i)
            return refresh(pad.reshape(x.shape[0], LANE))

        x, y = refresh(x), refresh(y)
        if has_eq:
            ye = refresh(ye)
        c_i, lb_i, ub_i, b_i = (interior(cb), interior(lbb),
                                interior(ubb), interior(bb))
        x_i, y_i = interior(x), interior(y)
        pos = (jax.lax.axis_index(axis) * size
               + jax.lax.iota(jnp.int32, size))

        d_i = c_i + matvec(vt_p, offsets_t, y)
        if has_eq:
            d_i = d_i + matvec(vte_p, eq_offsets_t, ye)
        x4 = embed(jnp.where(d_i < 0, ub_i, lb_i))
        xr = jnp.round(x)

        r_in = matvec(v_p, offsets, x) - b_i
        energy1 = jnp.dot(c_i, x_i) + jnp.dot(y_i, r_in)
        energy2 = (jnp.dot(c_i, interior(x4))
                   + jnp.dot(y_i, matvec(v_p, offsets, x4) - b_i))
        energy_rounded = jnp.dot(c_i, interior(xr))
        max_v_in = jnp.max(jnp.where(pos < m, r_in, -jnp.inf))
        feas_r = jnp.max(matvec(v_p, offsets, xr) - b_i) <= 0
        max_v_eq = jnp.asarray(-jnp.inf, jnp.float32)
        if has_eq:
            ye_i, be_i = interior(ye), interior(beb)
            r_eq = matvec(ve_p, eq_offsets, x) - be_i
            energy1 = energy1 + jnp.dot(ye_i, r_eq)
            energy2 = energy2 + jnp.dot(
                ye_i, matvec(ve_p, eq_offsets, x4) - be_i)
            max_v_eq = jnp.max(jnp.abs(r_eq))
            feas_r &= jnp.max(jnp.abs(
                matvec(ve_p, eq_offsets, xr) - be_i)) == 0
        energy1 = jax.lax.psum(energy1, axis)
        energy2 = jax.lax.psum(energy2, axis)
        energy_rounded = jax.lax.psum(energy_rounded, axis)
        max_v_in = jax.lax.pmax(max_v_in, axis)
        max_v_eq = jax.lax.pmax(max_v_eq, axis)
        feas_r = jax.lax.pmin(feas_r.astype(jnp.int32), axis) > 0
        return energy1, energy2, max_v_eq, max_v_in, energy_rounded, feas_r

    spec = P(axis)
    rspec = P()
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=((spec,) * n_c, (spec,) * n_p, spec, spec, spec),
        out_specs=(rspec,) * 6,
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_windowed_chunk(data, state, mesh: Mesh, nsteps: int):
    """Advance ``nsteps`` iterations, fully sharded; returns new state.

    Each iteration: halo-exchange ``hq+gq`` rows of the state with both
    neighbors (``ppermute``), then one windowed whole-iteration
    ``pallas_call`` over the shard's ``nw_l`` windows."""
    assert nsteps >= 1
    has_eq = data["has_eq"]
    fn = _chunk_callable(_static_of(data), mesh, int(nsteps),
                         jax.default_backend() != "tpu")
    ye0 = state.get("y_eq")
    if ye0 is None:
        # uniform pytree for the no-eq case: a zero dummy with the same
        # leading axis (never read by the kernel)
        ye0 = state["y_ineq"]
    x, x3, y, ye = fn(data["consts"], data["planes"], state["x"],
                      state["x3"], state["y_ineq"], ye0)
    out = dict(state, x=x, x3=x3, y_ineq=y)
    if has_eq:
        out["y_eq"] = ye
    return out


@functools.lru_cache(maxsize=64)
def _chunk_callable(static, mesh, nsteps, interpret):
    (axis, ndev, plan, has_eq, theta, offsets, offsets_t, vt_dtype,
     v_dtype, eq_offsets, eq_offsets_t, vte_dtype, ve_dtype, n_c,
     n_p) = static
    wq, hq, gq, nw_l = plan
    h = hq + gq
    lo = wq                      # first interior row
    hi = wq + nw_l * wq          # one past last interior row

    def make_call(emit_x3):
        return build_windowed_call(
            wq, hq, gq, nw_l, 1, theta, False, emit_x3,
            offsets, offsets_t, vt_dtype, v_dtype, eq_offsets=eq_offsets,
            eq_offsets_t=eq_offsets_t, vte_dtype=vte_dtype,
            ve_dtype=ve_dtype, interpret=interpret)

    call = make_call(False)
    call_x3 = make_call(True)
    refresh = _halo_refresh(axis, ndev, lo, hi, h)

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
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=((spec,) * n_c, (spec,) * n_p, spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec),
        check_vma=False,
    )
    return jax.jit(sharded)
