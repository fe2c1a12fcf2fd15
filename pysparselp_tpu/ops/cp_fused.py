"""Whole-iteration fused Pallas kernel for CP-PPD on DIA operators.

The per-op pipeline (``solvers/chambolle_pock._cp_iteration``) launches two
DIA SpMV kernels plus ~10 XLA elementwise ops per iteration; at Potts-50
size the whole problem is ~4 MB, so every iteration re-streams data that
could simply stay on-chip.  This kernel keeps EVERYTHING resident in VMEM —
both diagonal-value arrays, all problem vectors, the padded state buffers —
and runs ``nsteps`` complete CP iterations inside ONE ``pallas_call``:

    d  = c + A'ᵀ y                     (vals_t shifts over the y buffer)
    x2 = clip(x − T∘d, l, u);  x3 = (1+θ)x2 − θx;  x = x2
    r  = A' x3 − b                     (vals shifts over the x3 buffer)
    y  = max(y + σ∘r, 0)

HBM traffic per chunk: one read of the operator + vectors, one write of the
state — independent of ``nsteps``.  Offsets are baked in as Python
constants (they are static metadata), so every lane rotate is an immediate
shuffle.  Eligibility: inequality-only problems (the one-sided form every
CP solve reduces to) whose operator + vectors fit the VMEM budget — the
anchor-aligned grid-LP class up to ~100k rows.

Reference context: this fuses the entire hot loop of
``pysparselp/ChambollePockPPD.py:195-342`` into one on-chip program.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# total VMEM budget for operator values + vectors + padded state buffers
FUSED_VMEM_BUDGET = 10 * 1024 * 1024

# test hook: force interpreter mode off-TPU
_FORCE_INTERPRET = False


def _cdiv(a, b):
    return -(-a // b)


def _pad_rows(n):
    return _cdiv(max(n, 1), LANE)


def _shift_read(buf_ref, qoff, loff, q_rows):
    """Static-shift read: rows [qoff, qoff+q_rows) lane-rotated by loff."""
    a = buf_ref[qoff:qoff + q_rows, :]
    if loff == 0:
        return a
    b = buf_ref[qoff + 1:qoff + 1 + q_rows, :]
    c = jnp.concatenate([a, b], axis=1)
    # i32 explicitly: under jax_enable_x64 a bare python int traces to an
    # i64 scalar, which tpu.dynamic_rotate refuses to accept
    return pltpu.roll(c, jnp.int32(2 * LANE - loff), axis=1)[:, :LANE]


def _make_cp_kernel(offsets, offsets_t, left, left_t, qn, qm, qxp, qyp,
                    nsteps, theta, with_sums):
    l0 = left // LANE       # row offset of x3 inside its padded buffer
    ly = left_t // LANE     # row offset of y inside its padded buffer

    def kernel(c_ref, diag_t_ref, lb_ref, ub_ref, sigma_ref, b_ref,
               vt_ref, v_ref, x_in_ref, y_in_ref, *out_refs):
        if with_sums:
            (x_out_ref, x3_out_ref, y_out_ref, sx_out_ref, sy_out_ref,
             x3p_ref, yp_ref) = out_refs
        else:
            x_out_ref, x3_out_ref, y_out_ref, x3p_ref, yp_ref = out_refs
        x3p_ref[:] = jnp.zeros((qxp, LANE), jnp.float32)
        yp_ref[:] = jnp.zeros((qyp, LANE), jnp.float32)
        yp_ref[ly:ly + qm, :] = y_in_ref[:]
        if with_sums:
            sx_out_ref[:] = jnp.zeros((qn, LANE), jnp.float32)
            sy_out_ref[:] = jnp.zeros((qm, LANE), jnp.float32)

        def body(_, x):
            d = c_ref[:]
            for j, off in enumerate(offsets_t):
                t = off + left_t
                d = d + vt_ref[j].astype(jnp.float32) * _shift_read(
                    yp_ref, t // LANE, t % LANE, qn)
            x2 = jnp.clip(x - diag_t_ref[:] * d, lb_ref[:], ub_ref[:])
            x3 = (1.0 + theta) * x2 - theta * x
            x3p_ref[l0:l0 + qn, :] = x3
            r = -b_ref[:]
            for j, off in enumerate(offsets):
                t = off + left
                r = r + v_ref[j].astype(jnp.float32) * _shift_read(
                    x3p_ref, t // LANE, t % LANE, qm)
            y = jnp.maximum(yp_ref[ly:ly + qm, :] + sigma_ref[:] * r, 0.0)
            yp_ref[ly:ly + qm, :] = y
            if with_sums:
                sx_out_ref[:] += x2
                sy_out_ref[:] += y
            return x2

        x = jax.lax.fori_loop(0, nsteps, body, x_in_ref[:])
        x_out_ref[:] = x
        # x3 from the final iteration still sits in its padded buffer
        x3_out_ref[:] = x3p_ref[l0:l0 + qn, :]
        y_out_ref[:] = yp_ref[ly:ly + qm, :]

    return kernel


def fused_vmem_bytes(dia, n, m) -> int:
    """VMEM footprint of the fused chunk for this DiaMatrix operator."""
    qn, qm = _pad_rows(n), _pad_rows(m)
    left = LANE * _cdiv(max(0, -min(dia.offsets)), LANE) if dia.offsets else 0
    left_t = (LANE * _cdiv(max(0, -min(dia.offsets_t)), LANE)
              if dia.offsets_t else 0)
    qxp = qm + max(0, max(dia.offsets) + left) // LANE + 2 if dia.offsets \
        else qm
    qyp = qn + max(0, max(dia.offsets_t) + left_t) // LANE + 2 \
        if dia.offsets_t else qn
    vals_bytes = (dia.vals.size * dia.vals.dtype.itemsize
                  + dia.vals_t.size * dia.vals_t.dtype.itemsize)
    vec_bytes = (4 * qn + 2 * qm + qxp + qyp + 3 * qn + qm) * LANE * 4
    return vals_bytes + vec_bytes


def cp_fused_eligible(prob, dtype) -> bool:
    """Inequality-only + DIA operator + fits the fused VMEM budget."""
    from ..problem import DiaMatrix

    if prob.a_eq is not None or prob.a_ineq is None:
        return False
    if not isinstance(prob.a_ineq, DiaMatrix):
        return False
    if prob.a_ineq.vals.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if not prob.a_ineq.offsets or not prob.a_ineq.offsets_t:
        return False
    if fused_vmem_bytes(prob.a_ineq, prob.n, prob.m_ineq) \
            > FUSED_VMEM_BUDGET:
        return False
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("nsteps", "theta_f",
                                             "interpret", "with_sums"))
def _cp_fused_call(prob, pre, x, y, nsteps, theta_f, interpret=False,
                   with_sums=False):
    dia = prob.a_ineq
    n, m = prob.n, prob.m_ineq
    qn, qm = _pad_rows(n), _pad_rows(m)
    offsets, offsets_t = dia.offsets, dia.offsets_t
    left = LANE * _cdiv(max(0, -min(offsets)), LANE)
    left_t = LANE * _cdiv(max(0, -min(offsets_t)), LANE)
    qxp = qm + max(0, max(offsets) + left) // LANE + 2
    qxp = max(qxp, _cdiv(left + n, LANE) + 1)
    qyp = qn + max(0, max(offsets_t) + left_t) // LANE + 2
    qyp = max(qyp, _cdiv(left_t + m, LANE) + 1)

    def v2d(v, q):
        out = jnp.zeros((q * LANE,), jnp.float32)
        return out.at[:v.shape[0]].set(v.astype(jnp.float32)).reshape(
            q, LANE)

    # vals are kernel-layout padded at build; reshape rows to (q, LANE) and
    # trim the diagonal padding rows (offsets are exact here)
    ndt = len(offsets_t)
    nd = len(offsets)
    vt3 = dia.vals_t[:ndt].reshape(ndt, -1, LANE)[:, :qn, :]
    v3 = dia.vals[:nd].reshape(nd, -1, LANE)[:, :qm, :]

    # mask infinite bounds the same way the unfused path's clip handles
    # them: jnp.clip with +-inf bounds is a no-op on that side
    kernel = _make_cp_kernel(offsets, offsets_t, left, left_t, qn, qm,
                             qxp, qyp, nsteps, theta_f, with_sums)
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(10)]
    out_shape = [
        jax.ShapeDtypeStruct((qn, LANE), jnp.float32),
        jax.ShapeDtypeStruct((qn, LANE), jnp.float32),
        jax.ShapeDtypeStruct((qm, LANE), jnp.float32),
    ]
    if with_sums:
        out_shape += [
            jax.ShapeDtypeStruct((qn, LANE), jnp.float32),
            jax.ShapeDtypeStruct((qm, LANE), jnp.float32),
        ]
    outs = pl.pallas_call(
        kernel,
        in_specs=specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((qxp, LANE), jnp.float32),
            pltpu.VMEM((qyp, LANE), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nsteps * (vt3.size + v3.size),
            bytes_accessed=vt3.size * vt3.dtype.itemsize
            + v3.size * v3.dtype.itemsize,
            transcendentals=0,
        ),
    )(
        v2d(prob.c, qn), v2d(pre["diag_t"], qn), v2d(prob.lb, qn),
        v2d(prob.ub, qn), v2d(pre["sigma_ineq"], qm), v2d(prob.b_upper, qm),
        vt3.astype(dia.vals.dtype), v3,
        v2d(x, qn), v2d(y, qm),
    )
    dt = x.dtype

    def unpad(v, size):
        return v.reshape(-1)[:size].astype(dt)

    res = (unpad(outs[0], n), unpad(outs[1], n), unpad(outs[2], m))
    if with_sums:
        res += (unpad(outs[3], n), unpad(outs[4], m))
    return res


# ----------------------------------------------------------------------
# dense variant: eq+ineq systems as VMEM-resident dense operators (MXU)
# ----------------------------------------------------------------------

DENSE_FUSED_VMEM_BUDGET = 4 * 1024 * 1024


def cp_dense_fused_eligible(prob, dtype) -> bool:
    """Both systems (when present) lowered to DenseMatrix, f32 compute,
    everything fits the dense-fused VMEM budget.  This is the small/medium
    LP regime (netlib class) where per-op dispatch otherwise dominates."""
    from ..problem import DenseMatrix

    total = 0
    any_sys = False
    for op in (prob.a_eq, prob.a_ineq):
        if op is None:
            continue
        any_sys = True
        if not isinstance(op, DenseMatrix):
            return False
        if op.a.dtype != jnp.float32:
            return False
        total += _pad_rows(op.nrows) * _pad_rows(op.ncols) * LANE * LANE * 4
    if not any_sys or total > DENSE_FUSED_VMEM_BUDGET:
        return False
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() == "tpu"


def _make_cp_dense_kernel(has_eq, has_in, nsteps, theta, with_sums):
    hp = jax.lax.Precision.HIGHEST

    def kernel(*refs):
        it = iter(refs)
        c_ref, diag_t_ref, lb_ref, ub_ref = (next(it) for _ in range(4))
        if has_eq:
            ae_ref, be_ref, se_ref = (next(it) for _ in range(3))
        if has_in:
            ai_ref, bi_ref, si_ref = (next(it) for _ in range(3))
        x_in_ref = next(it)
        ye_in_ref = next(it) if has_eq else None
        yi_in_ref = next(it) if has_in else None
        x_out_ref, x3_out_ref = next(it), next(it)
        ye_out_ref = next(it) if has_eq else None
        yi_out_ref = next(it) if has_in else None
        if with_sums:
            sx_out_ref = next(it)
            sye_out_ref = next(it) if has_eq else None
            syi_out_ref = next(it) if has_in else None
            sx_out_ref[:] = jnp.zeros_like(sx_out_ref)
            if has_eq:
                sye_out_ref[:] = jnp.zeros_like(sye_out_ref)
            if has_in:
                syi_out_ref[:] = jnp.zeros_like(syi_out_ref)

        def rmat(a_ref, y):
            # yᵀA as an MXU contraction over the row dim
            return jax.lax.dot_general(
                y, a_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hp)

        def mat(a_ref, v):
            # A v: contract the column dim
            return jax.lax.dot_general(
                v, a_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hp)

        def body(_, carry):
            x, ye, yi, _x3 = carry
            d = c_ref[:]
            if has_eq:
                d = d + rmat(ae_ref, ye)
            if has_in:
                d = d + rmat(ai_ref, yi)
            x2 = jnp.clip(x - diag_t_ref[:] * d, lb_ref[:], ub_ref[:])
            x3 = (1.0 + theta) * x2 - theta * x
            if has_eq:
                ye = ye + se_ref[:] * (mat(ae_ref, x3) - be_ref[:])
            if has_in:
                yi = jnp.maximum(
                    yi + si_ref[:] * (mat(ai_ref, x3) - bi_ref[:]), 0.0)
            if with_sums:
                sx_out_ref[:] += x2
                if has_eq:
                    sye_out_ref[:] += ye
                if has_in:
                    syi_out_ref[:] += yi
            return (x2, ye, yi, x3)

        zero = jnp.zeros((1, LANE), jnp.float32)
        x0 = x_in_ref[:]
        ye0 = ye_in_ref[:] if has_eq else zero
        yi0 = yi_in_ref[:] if has_in else zero
        x, ye, yi, x3 = jax.lax.fori_loop(0, nsteps, body,
                                          (x0, ye0, yi0, x0))
        x_out_ref[:] = x
        x3_out_ref[:] = x3
        if has_eq:
            ye_out_ref[:] = ye
        if has_in:
            yi_out_ref[:] = yi

    return kernel


@functools.partial(jax.jit, static_argnames=("nsteps", "theta_f",
                                             "interpret", "with_sums"))
def _cp_dense_fused_call(prob, pre, x, y_eq, y_in, nsteps, theta_f,
                         interpret=False, with_sums=False):
    n = prob.n
    has_eq = prob.a_eq is not None
    has_in = prob.a_ineq is not None

    def row1(v, size):
        q = _pad_rows(size)
        out = jnp.zeros((q * LANE,), jnp.float32)
        return out.at[:size].set(
            v.astype(jnp.float32)).reshape(1, q * LANE)

    def mat2(op):
        qr, qc = _pad_rows(op.nrows), _pad_rows(op.ncols)
        out = jnp.zeros((qr * LANE, qc * LANE), jnp.float32)
        return out.at[:op.nrows, :op.ncols].set(
            op.a.astype(jnp.float32))

    inputs = [row1(prob.c, n), row1(pre["diag_t"], n), row1(prob.lb, n),
              row1(prob.ub, n)]
    if has_eq:
        inputs += [mat2(prob.a_eq), row1(prob.b_eq, prob.m_eq),
                   row1(pre["sigma_eq"], prob.m_eq)]
    if has_in:
        inputs += [mat2(prob.a_ineq), row1(prob.b_upper, prob.m_ineq),
                   row1(pre["sigma_ineq"], prob.m_ineq)]
    inputs.append(row1(x, n))
    if has_eq:
        inputs.append(row1(y_eq, prob.m_eq))
    if has_in:
        inputs.append(row1(y_in, prob.m_ineq))

    qn = _pad_rows(n) * LANE
    qme = _pad_rows(prob.m_eq) * LANE if has_eq else 0
    qmi = _pad_rows(prob.m_ineq) * LANE if has_in else 0
    out_shape = [jax.ShapeDtypeStruct((1, qn), jnp.float32)] * 2
    if has_eq:
        out_shape.append(jax.ShapeDtypeStruct((1, qme), jnp.float32))
    if has_in:
        out_shape.append(jax.ShapeDtypeStruct((1, qmi), jnp.float32))
    if with_sums:
        out_shape.append(jax.ShapeDtypeStruct((1, qn), jnp.float32))
        if has_eq:
            out_shape.append(jax.ShapeDtypeStruct((1, qme), jnp.float32))
        if has_in:
            out_shape.append(jax.ShapeDtypeStruct((1, qmi), jnp.float32))

    outs = pl.pallas_call(
        _make_cp_dense_kernel(has_eq, has_in, nsteps, theta_f, with_sums),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    dt = x.dtype

    def unpad(v, size):
        return v.reshape(-1)[:size].astype(dt)

    it = iter(outs)
    res = [unpad(next(it), n), unpad(next(it), n)]
    res.append(unpad(next(it), prob.m_eq) if has_eq
               else jnp.zeros(0, dt))
    res.append(unpad(next(it), prob.m_ineq) if has_in
               else jnp.zeros(0, dt))
    if with_sums:
        res.append(unpad(next(it), n))
        res.append(unpad(next(it), prob.m_eq) if has_eq
                   else jnp.zeros(0, dt))
        res.append(unpad(next(it), prob.m_ineq) if has_in
                   else jnp.zeros(0, dt))
    return tuple(res)


def cp_dense_fused_chunk(prob, pre, state, nsteps: int, theta: float):
    """Dense-operator twin of :func:`cp_fused_chunk` (supports eq+ineq)."""
    x, _x3, y_eq, y_ineq = state
    interpret = jax.default_backend() != "tpu"
    x_n, x3_n, ye_n, yi_n = _cp_dense_fused_call(
        prob, pre, x, y_eq, y_ineq, nsteps, float(theta),
        interpret=interpret)
    return (x_n, x3_n, ye_n, yi_n)


def cp_fused_chunk(prob, pre, state, nsteps: int, theta: float):
    """Run ``nsteps`` fused CP iterations; returns the new (x, x3, y_eq,
    y_ineq) state tuple (y_eq empty — eligibility requires ineq-only)."""
    x, _x3, y_eq, y_ineq = state
    interpret = jax.default_backend() != "tpu"
    x_n, x3_n, y_n = _cp_fused_call(prob, pre, x, y_ineq, nsteps,
                                    float(theta), interpret=interpret)
    return (x_n, x3_n, y_eq, y_n)


def cp_fused_chunk_with_sums(prob, pre, state, nsteps: int, theta: float):
    """Like :func:`cp_fused_chunk` but also returns the running sums of the
    primal iterates and inequality duals over the chunk — the inputs the
    PDLP restart-to-average controller needs."""
    x, _x3, y_eq, y_ineq = state
    interpret = jax.default_backend() != "tpu"
    x_n, x3_n, y_n, sx, sy = _cp_fused_call(
        prob, pre, x, y_ineq, nsteps, float(theta), interpret=interpret,
        with_sums=True)
    return (x_n, x3_n, y_eq, y_n), sx, sy
