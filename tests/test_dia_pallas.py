"""Correctness of the fused Pallas DIA SpMV kernel (interpret mode on CPU)
against the XLA shift-loop fallback and scipy."""

import numpy as np
import pytest
import scipy.sparse

import jax.numpy as jnp

from pysparselp_tpu import problem as pr
from pysparselp_tpu.ops import dia_pallas


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setattr(dia_pallas, "_FORCE_INTERPRET", True)


def _random_dia(m, n, ndiag, seed, frac=0.6):
    rng = np.random.RandomState(seed)
    span = min(m, n)
    offs = rng.choice(np.arange(-m + 1, n), size=min(ndiag, m + n - 1),
                      replace=False)
    rows, cols, vals = [], [], []
    for o in offs:
        r = np.arange(max(0, -o), min(m, n - o))
        if r.size == 0:
            continue
        keep = rng.rand(r.size) < frac
        r = r[keep]
        rows.append(r)
        cols.append(r + o)
        vals.append(rng.randn(r.size))
    rows = np.concatenate(rows) if rows else np.zeros(0, int)
    cols = np.concatenate(cols) if cols else np.zeros(0, int)
    vals = np.concatenate(vals) if vals else np.zeros(0)
    del span
    return scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()


@pytest.mark.parametrize("m,n,ndiag,seed", [
    (130, 257, 9, 0),       # unaligned shapes, both signs of offsets
    (64, 64, 5, 1),         # tiny (single lane-block rows)
    (700, 300, 25, 2),      # wide-landscape, many diagonals
    (300, 700, 17, 3),      # portrait; offsets beyond +/-128
])
def test_matches_xla_fallback_and_scipy(m, n, ndiag, seed):
    a = _random_dia(m, n, ndiag, seed)
    dia = pr.DiaMatrix.from_scipy(a, dtype=jnp.float32, allow_bf16=False)
    x = np.random.RandomState(seed + 100).randn(n).astype(np.float32)
    y = np.random.RandomState(seed + 200).randn(m).astype(np.float32)

    got = np.asarray(dia_pallas.dia_matvec(
        dia.vals, dia.offsets, jnp.asarray(x), n, m, jnp.float32))
    np.testing.assert_allclose(got, a @ x, rtol=2e-5, atol=2e-5)

    got_t = np.asarray(dia_pallas.dia_matvec(
        dia.vals_t, dia.offsets_t, jnp.asarray(y), m, n, jnp.float32))
    np.testing.assert_allclose(got_t, a.T @ y, rtol=2e-5, atol=2e-5)


def test_bf16_storage_path():
    # bf16-exact entries (±1, ±0.5): kernel upcasts to f32, zero value error
    rng = np.random.RandomState(7)
    m = n = 384
    a = _random_dia(m, n, 11, 7)
    a.data = rng.choice([-1.0, -0.5, 0.5, 1.0, 2.0], size=a.nnz)
    dia = pr.DiaMatrix.from_scipy(a, dtype=jnp.float32, allow_bf16="exact")
    assert dia.vals.dtype == jnp.bfloat16
    x = rng.randn(n).astype(np.float32)
    got = np.asarray(dia_pallas.dia_matvec(
        dia.vals, dia.offsets, jnp.asarray(x), n, m, jnp.float32))
    np.testing.assert_allclose(got, a @ x, rtol=2e-5, atol=2e-5)


def test_dia_apply_dispatches_to_pallas(monkeypatch):
    # DiaMatrix.matvec routes through the fused kernel when eligible
    calls = {}
    real = dia_pallas.dia_matvec

    def spy(*args, **kw):
        calls["hit"] = True
        return real(*args, **kw)

    monkeypatch.setattr(dia_pallas, "dia_matvec", spy)
    a = _random_dia(200, 150, 7, 11)
    dia = pr.DiaMatrix.from_scipy(a, dtype=jnp.float32, allow_bf16=False)
    x = np.random.RandomState(0).randn(150).astype(np.float32)
    got = np.asarray(dia.matvec(jnp.asarray(x)))
    assert calls.get("hit")
    np.testing.assert_allclose(got, a @ x, rtol=2e-5, atol=2e-5)


def test_use_pallas_gating():
    assert not dia_pallas.dia_use_pallas(None, (), 10, 10, jnp.float32)
    # f64 never eligible (Mosaic path is f32/bf16 only)
    assert not dia_pallas.dia_use_pallas(None, (0, 1), 10, 10, jnp.float64)
    # x too large for VMEM residency
    assert not dia_pallas.dia_use_pallas(None, (0,), 10_000_000, 100,
                                         jnp.float32)


def test_operator_cost_bytes_regimes():
    """The dispatch-cap pricing must distinguish the fused-kernel regime
    from the XLA shift-loop regime (x beyond the VMEM budget): pricing the
    slow regime at the fast rate admits watchdog-length dispatches."""
    import scipy.sparse

    from pysparselp_tpu.problem import operator_cost_bytes

    small = _random_dia(1000, 1000, 5, seed=1)
    big_n = 4_000_000  # x would need ~16 MB — beyond the kernel budget
    dia_small = pr.DiaMatrix.from_scipy(small, dtype=jnp.float32,
                                        allow_bf16=False)
    cost_small = operator_cost_bytes(dia_small)
    # _FORCE_INTERPRET fixture makes the small one kernel-eligible
    assert cost_small == dia_small.nnz_padded * 9

    big = scipy.sparse.diags([np.ones(big_n)], [0],
                             shape=(big_n, big_n)).tocsr()
    dia_big = pr.DiaMatrix.from_scipy(big, dtype=jnp.float32,
                                      allow_bf16=False)
    cost_big = operator_cost_bytes(dia_big)
    # x beyond the fused VMEM budget but offset spread 0: the row-windowed
    # Pallas regime applies (its own pricing tier, r3)
    from pysparselp_tpu.problem import DIA_WINDOWED_COST_PER_ENTRY

    assert cost_big == dia_big.nnz_padded * DIA_WINDOWED_COST_PER_ENTRY

    # spread beyond the window budget: the XLA shift-loop pricing applies
    big_spread = scipy.sparse.diags(
        [np.ones(big_n), np.ones(big_n - 3_000_000)], [0, 3_000_000],
        shape=(big_n, big_n)).tocsr()
    dia_bs = pr.DiaMatrix.from_scipy(big_spread, dtype=jnp.float32,
                                     allow_bf16=False)
    assert operator_cost_bytes(dia_bs) == dia_bs.nnz_padded * (4 + 12)


def test_windowed_path_matches_scipy(monkeypatch):
    """x beyond the VMEM budget: the row-chunked window path must equal
    the full-residency kernel (exercised by shrinking the budget and the
    window size so a small problem takes multiple chunks)."""
    monkeypatch.setattr(dia_pallas, "X_VMEM_BUDGET", 2048 * 4)
    monkeypatch.setattr(dia_pallas, "WINDOW_ROWS", 1024)
    # narrow offset band (the anchor-aligned class the window path serves)
    rng = np.random.RandomState(21)
    m, n = 3000, 2900
    rows, cols, vals = [], [], []
    for o in (-140, -63, -1, 0, 2, 64, 139):
        r = np.arange(max(0, -o), min(m, n - o))
        keep = rng.rand(r.size) < 0.5
        r = r[keep]
        rows.append(r)
        cols.append(r + o)
        vals.append(rng.randn(r.size))
    a = scipy.sparse.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(m, n)).tocsr()
    dia = pr.DiaMatrix.from_scipy(a, dtype=jnp.float32, allow_bf16=False)
    assert not dia_pallas.dia_use_pallas(
        dia.vals, dia.offsets, 2900, 3000, dia.vals.dtype)
    plan = dia_pallas._window_plan(dia.offsets, 2900, 3000)
    assert plan is not None and len(plan) >= 3
    x = np.random.RandomState(0).randn(2900).astype(np.float32)
    got = np.asarray(dia.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(got, a @ x, rtol=2e-5, atol=2e-5)
    y = np.random.RandomState(1).randn(3000).astype(np.float32)
    got_t = np.asarray(dia.rmatvec(jnp.asarray(y)))
    np.testing.assert_allclose(got_t, a.T @ y, rtol=2e-5, atol=2e-5)
