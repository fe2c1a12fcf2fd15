"""Fused Pallas TPU kernel for DIA (diagonal-storage) SpMV.

The XLA fallback in :class:`~pysparselp_tpu.problem.DiaMatrix` emits one
``dynamic_slice`` + multiply-add chain per diagonal; with hundreds of
diagonals the per-op dispatch charge and the accumulator read-modify-write
per diagonal dominate (calibrated: ``ndiag·(m+n)·(itemsize+12)`` bytes per
direction pair — see the cost-model constants in ``problem.py``).

This kernel fuses ALL diagonals into a single ``pallas_call``:

* ``x`` (zero-padded, reshaped ``(Q_in, 128)``) stays **resident in VMEM**
  for the whole kernel — read from HBM once;
* the accumulator lives in the revisited output block — written once;
* diagonal values stream HBM→VMEM through the Pallas pipeline in
  ``(DIAG_BLOCK, QT, 128)`` chunks;
* each diagonal's shifted ``x`` view is two sublane-aligned reads plus one
  dynamic lane rotate (``pltpu.roll``) — no gathers anywhere.

The kernel is VPU-op-bound at ~150 ns/diagonal/10k-rows (measured on v5e),
so the value layout matters more than raw bytes: `problem.anchor_align`
collapses structured LPs to a handful of diagonals before lowering here.

``vals`` must be PRE-PADDED to the kernel layout at build time
(:func:`kernel_layout` / :func:`pad_vals_for_kernel`) — padding per call
would re-stream the whole array through a scatter.

Reference context: this is the hot SpMV of the flagship first-order solver
(``pysparselp/ChambollePockPPD.py:199-240``), specialized for LPs where
diagonal storage wins (grid-structured models like Potts segmentation).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# sublane rows of the output tile per grid step (QT·128 rows of y)
DEFAULT_QT = 256
# max diagonals per grid step; actual block picked by kernel_layout so that
# small-ndiag problems run the whole d-range in one step
MAX_DIAG_BLOCK = 64
# whole-x VMEM residency budget (f32 bytes); above this fall back to XLA.
# 8 MB leaves room for the double-buffered vals blocks (~2 MB) and the
# output tile within the 16 MB VMEM (validated at Potts-700: x = 7.8 MB)
X_VMEM_BUDGET = 8 * 1024 * 1024
# double-buffered vals chunk budget
_VALS_VMEM_BUDGET = 8 * 1024 * 1024

# test hook: force interpreter mode off-TPU
_FORCE_INTERPRET = False


def _cdiv(a, b):
    return -(-a // b)


def kernel_layout(ndiag: int, nrows: int, itemsize: int = 4):
    """Deterministic kernel tiling for a (ndiag, nrows) DIA value array.

    Returns ``(diag_block, nd, qt, nq)``: vals must be padded to
    ``(diag_block*nd, nq*qt*LANE)`` columns-of-rows layout.
    """
    q_out = _cdiv(max(nrows, 1), LANE)
    qt = max(min(DEFAULT_QT, _cdiv(q_out, 8) * 8), 8)
    nq = _cdiv(q_out, qt)
    db = max(min(MAX_DIAG_BLOCK, _cdiv(max(ndiag, 1), 8) * 8), 8)
    while db > 8 and 2 * db * qt * LANE * itemsize > _VALS_VMEM_BUDGET:
        db -= 8
    nd = _cdiv(max(ndiag, 1), db)
    return db, nd, qt, nq


def pad_vals_for_kernel(vals: np.ndarray, nrows: int) -> np.ndarray:
    """Host-side: zero-pad (ndiag, nrows) vals to the kernel layout."""
    ndiag = vals.shape[0]
    db, nd, qt, nq = kernel_layout(ndiag, nrows)
    out = np.zeros((db * nd, nq * qt * LANE), dtype=vals.dtype)
    out[:ndiag, : vals.shape[1]] = vals
    return out


def _make_kernel(qt, diag_block, acc_dtype):
    def kernel(offs_ref, x_ref, vals_ref, o_ref):
        dblk = pl.program_id(1)

        @pl.when(dblk == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        q = pl.program_id(0)
        acc = o_ref[:]
        for j in range(diag_block):
            t = offs_ref[dblk * diag_block + j]  # off + LEFT  (>= 0)
            # lax.div/rem directly: python // and % emit nested jit
            # closures (floor_divide) that Mosaic cannot lower
            qoff = jax.lax.div(t, jnp.int32(LANE))
            loff = jax.lax.rem(t, jnp.int32(LANE))
            qstart = q * qt + qoff
            # rows [qstart, qstart+qt] of x cover this tile's reads for the
            # diagonal; the lane misalignment is one dynamic rotate of the
            # 2-block concatenation (value-level dynamic_slice cannot lower)
            a = x_ref[pl.ds(qstart, qt), :]
            b = x_ref[pl.ds(qstart + 1, qt), :]
            c = jnp.concatenate([a, b], axis=1)  # (qt, 256)
            xs = pltpu.roll(c, 2 * LANE - loff, axis=1)[:, :LANE]
            acc = acc + vals_ref[j].astype(acc_dtype) * xs
        o_ref[:] = acc

    return kernel


@functools.partial(
    jax.jit, static_argnames=("offsets", "n_in", "n_out", "interpret")
)
def _dia_matvec_pallas(vals, offsets, x, n_in, n_out, interpret=False):
    """y[r] = Σ_d vals[d, r] · x[r + offsets[d]]  (one fused kernel).

    ``vals`` must already be in the kernel layout for
    ``kernel_layout(len(offsets), n_out)`` (see :func:`pad_vals_for_kernel`).
    Returns (n_out,) float32.
    """
    ndiag = len(offsets)
    db, nd, qt, nq = kernel_layout(ndiag, n_out)
    assert vals.shape == (db * nd, nq * qt * LANE), (
        vals.shape, (db * nd, nq * qt * LANE))
    acc_dtype = jnp.float32
    min_off = min(offsets)
    max_off = max(offsets)
    left = LANE * _cdiv(max(0, -min_off), LANE)
    q_out_pad = nq * qt

    # x padding: reads reach sublane row (nq-1)*qt + (max_off+left)//128 + qt
    max_qoff = (max_off + left) // LANE
    q_in = q_out_pad + max_qoff + 2
    q_in = max(q_in, _cdiv(left + n_in, LANE) + 1)

    # padded diagonal slots get t=0 (always in-bounds; their vals rows are 0)
    offs_padded = np.zeros(nd * db, np.int32)
    offs_padded[:ndiag] = np.asarray(offsets, np.int32) + left

    xp = jnp.zeros((q_in * LANE,), acc_dtype)
    xp = xp.at[left:left + n_in].set(x.astype(acc_dtype))
    xp2d = xp.reshape(q_in, LANE)
    v3 = vals.reshape(nd * db, q_out_pad, LANE)

    i32 = jnp.int32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nq, nd),
        in_specs=[
            pl.BlockSpec((q_in, LANE), lambda q, d, offs: (i32(0), i32(0))),
            pl.BlockSpec(
                (db, qt, LANE),
                lambda q, d, offs: (i32(d), i32(q), i32(0)),
            ),
        ],
        out_specs=pl.BlockSpec(
            (qt, LANE), lambda q, d, offs: (i32(q), i32(0))
        ),
    )
    y2d = pl.pallas_call(
        _make_kernel(qt, db, acc_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q_out_pad, LANE), acc_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * v3.size,
            bytes_accessed=v3.size * v3.dtype.itemsize
            + xp2d.size * 4 + q_out_pad * LANE * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(offs_padded), xp2d, v3)
    return y2d.reshape(-1)[:n_out]


@functools.partial(jax.jit, static_argnames=("n_in", "n_out", "interpret"))
def _dia_matvec_pallas_dyn(vals, offs, x, n_in, n_out, interpret=False):
    """Fused DIA SpMV with RUNTIME offsets (traced i32 array).

    Bounds are derived conservatively from shapes alone — any valid offset
    satisfies ``-n_out < off < n_in`` — so the same compiled kernel serves
    every shard of a row-partitioned DIA operator inside ``shard_map``
    (each shard passes its own offset values; shapes are uniform).
    ``vals`` must be kernel-layout padded for ``(len(offs), n_out)``.
    """
    ndiag = offs.shape[0]
    db, nd, qt, nq = kernel_layout(ndiag, n_out)
    assert vals.shape == (db * nd, nq * qt * LANE), (
        vals.shape, (db * nd, nq * qt * LANE))
    # f64 only reaches this kernel in interpreter mode (CPU mesh tests);
    # keep full precision there so sharded == single-chip to 1e-10
    acc_dtype = (jnp.float64 if vals.dtype == jnp.float64
                 else jnp.float32)
    left = LANE * _cdiv(n_out, LANE)
    q_out_pad = nq * qt
    max_qoff = (n_in + left) // LANE
    q_in = q_out_pad + max_qoff + 2

    # offsets outside (-n_out, n_in) have no valid elements (their vals
    # rows are all-zero) but would read out of the padded buffer: clamp
    offs = jnp.clip(offs.astype(jnp.int32), -(n_out - 1), n_in - 1)
    offs_full = jnp.zeros((nd * db,), jnp.int32)
    offs_full = offs_full.at[:ndiag].set(offs + jnp.int32(left))

    xp = jnp.zeros((q_in * LANE,), acc_dtype)
    xp = xp.at[left:left + n_in].set(x.astype(acc_dtype))
    xp2d = xp.reshape(q_in, LANE)
    v3 = vals.reshape(nd * db, q_out_pad, LANE)

    i32 = jnp.int32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nq, nd),
        in_specs=[
            pl.BlockSpec((q_in, LANE), lambda q, d, offs: (i32(0), i32(0))),
            pl.BlockSpec(
                (db, qt, LANE),
                lambda q, d, offs: (i32(d), i32(q), i32(0)),
            ),
        ],
        out_specs=pl.BlockSpec(
            (qt, LANE), lambda q, d, offs: (i32(q), i32(0))
        ),
    )
    y2d = pl.pallas_call(
        _make_kernel(qt, db, acc_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q_out_pad, LANE), acc_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * v3.size,
            bytes_accessed=v3.size * v3.dtype.itemsize
            + xp2d.size * 4 + q_out_pad * LANE * 4,
            transcendentals=0,
        ),
    )(offs_full, xp2d, v3)
    return y2d.reshape(-1)[:n_out]


# windowed fallback: row-chunk size (multiple of the kernel layout's
# 256-sublane tile, 256*LANE, so chunk value slices ARE kernel-layout
# views).  Large chunks amortize the per-launch cost — 1M rows is a 4 MB
# window, still comfortably inside the budget with typical aligned
# offset spreads (measured at Potts-1000: 32k-row chunks left 129
# launches/direction and only 501 it/s)
WINDOW_ROWS = 32 * 256 * LANE


def _window_plan(offsets, n_in, n_out):
    """Row chunks + per-chunk x windows for operators whose x exceeds the
    VMEM residency budget.  Valid when the offset spread is small relative
    to the budget (anchor-aligned matrices); returns None otherwise."""
    if not offsets:
        return None
    min_off, max_off = min(offsets), max(offsets)
    spread = max_off - min_off
    if (WINDOW_ROWS + spread + 2 * LANE) * 4 > X_VMEM_BUDGET:
        return None
    chunks = []
    for r0 in range(0, n_out, WINDOW_ROWS):
        r1 = min(n_out, r0 + WINDOW_ROWS)
        w0 = min(max(r0 + min_off, 0), n_in)
        w1 = min(max(r1 + max_off + 1, 0), n_in)
        # chunk-local offsets: reads hit x_window[(r - r0) + (off + r0 - w0)]
        offs_local = tuple(o + r0 - w0 for o in offsets)
        chunks.append((r0, r1, w0, w1, offs_local))
    return chunks


def _dia_matvec_windowed(vals, offsets, x, n_in, n_out, plan):
    """Row-chunked DIA SpMV: each chunk's x window is VMEM-resident, the
    chunk's value slice is a direct view of the kernel-padded layout
    (WINDOW_ROWS is a multiple of the layout tile).  Interior chunks share
    one compiled kernel; only the clipped edge chunks differ."""
    interpret = jax.default_backend() != "tpu"
    parts = []
    for r0, r1, w0, w1, offs_local in plan:
        w1 = max(w1, w0 + 1)
        xw = jax.lax.slice(x, (w0,), (w1,))
        vk = jax.lax.slice(vals, (0, r0),
                           (vals.shape[0], min(r0 + WINDOW_ROWS,
                                               vals.shape[1])))
        db, nd, qt, nq = kernel_layout(len(offs_local), r1 - r0)
        tgt = (db * nd, nq * qt * LANE)
        if vk.shape != tgt:
            # only the clipped tail chunk lands here: re-pad (or trim the
            # parent layout's trailing zero columns) to the chunk layout
            vp = jnp.zeros(tgt, vk.dtype)
            rr = min(vk.shape[0], tgt[0])
            cc = min(vk.shape[1], tgt[1])
            vk = vp.at[:rr, :cc].set(vk[:rr, :cc])
        parts.append(_dia_matvec_pallas(
            vk, offs_local, xw, int(w1 - w0), int(r1 - r0),
            interpret=interpret))
    return jnp.concatenate(parts)


def window_spread_ok(offsets) -> bool:
    """Whether the offset spread admits the row-windowed kernel path
    (mirrors the :func:`_window_plan` feasibility check)."""
    if not len(offsets):
        return False
    spread = int(max(offsets)) - int(min(offsets))
    return (WINDOW_ROWS + spread + 2 * LANE) * 4 <= X_VMEM_BUDGET


def dia_use_pallas(vals, offsets, n_in, n_out, dtype) -> bool:
    """Eligibility: TPU (or forced interpret for tests), f32/bf16 values in
    the kernel layout, x resident in VMEM, at least one diagonal."""
    if not offsets:
        return False
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    q_in_est = _cdiv(max(0, -min(offsets)) + n_in, LANE) + _cdiv(
        max(0, max(offsets)), LANE) + 2
    if q_in_est * LANE * 4 > X_VMEM_BUDGET:
        return False
    if vals is not None:
        db, nd, qt, nq = kernel_layout(len(offsets), n_out)
        # vals must be kernel-layout padded (done at DiaMatrix build time)
        if vals.shape != (db * nd, nq * qt * LANE):
            return False
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() == "tpu"


def dia_matvec(vals, offsets, x, n_in, n_out, compute_dtype):
    """Public entry: fused-Pallas DIA SpMV (returns compute_dtype)."""
    interpret = jax.default_backend() != "tpu"
    y = _dia_matvec_pallas(vals, tuple(offsets), x, int(n_in), int(n_out),
                           interpret=interpret)
    return y.astype(compute_dtype)
