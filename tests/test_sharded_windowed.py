"""Position-sharded windowed CP (parallel/sharded_cp_windowed) on the
virtual CPU mesh: stencil domain decomposition with per-iteration ppermute
halo exchange, pinned against the unfused single-chip CP iteration."""

import numpy as np
import pytest
import scipy.sparse

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pysparselp_tpu.ops import cp_windowed as cw
from pysparselp_tpu.parallel import sharded_cp_windowed as scw
from pysparselp_tpu.problem import DiaMatrix, LPProblem
from pysparselp_tpu.solvers.chambolle_pock import _cp_iteration

OFFSETS = (-3, 0, 5, 130)
EQ_OFFSETS = (-1, 0, 2)


def _dia(n, offsets, rng):
    mats = [rng.rand(n) * 2 - 1 for _ in offsets]
    return scipy.sparse.diags(mats, offsets, shape=(n, n)).tocsr()


def _system(n=20000, eq=False, seed=0):
    rng = np.random.RandomState(seed)
    a = _dia(n, OFFSETS, rng)
    a_eq = _dia(n, EQ_OFFSETS, rng) if eq else None
    return dict(
        a_eq=a_eq, beq=rng.rand(n) if eq else None,
        a_ineq=a, b_ineq=rng.rand(n) * 2,
        c=rng.rand(n), lb=np.zeros(n), ub=np.ones(n) * 2,
        x0=rng.rand(n), x30=None,
        y_eq0=rng.rand(n) * 0.1 if eq else None,
        y_ineq0=rng.rand(n) * 0.1,
    )


def _reference_prob(sys_d, alpha=1.0):
    """Single-chip (prob, pre, state0) with the position-sharded builder's
    own preconditioner formulas (the single-chip driver's alpha formulas)."""
    n = sys_d["c"].size
    a, a_eq = sys_d["a_ineq"], sys_d["a_eq"]
    col_sum = np.zeros(n)
    for m_ in (a_eq, a):
        if m_ is None:
            continue
        aa = m_.copy()
        aa.data = np.abs(aa.data) ** (2.0 - alpha)
        col_sum += np.asarray(aa.sum(axis=0)).ravel()
    col_sum[col_sum == 0] = 1.0

    def sigma_of(m_):
        aa = m_.copy()
        aa.data = np.abs(aa.data) ** alpha
        rs = np.asarray(aa.sum(axis=1)).ravel()
        rs[rs == 0] = 1.0
        return 1.0 / rs

    f32 = jnp.float32
    has_eq = a_eq is not None
    prob = LPProblem(
        c=jnp.asarray(sys_d["c"], f32), lb=jnp.asarray(sys_d["lb"], f32),
        ub=jnp.asarray(sys_d["ub"], f32),
        a_eq=DiaMatrix.from_scipy(a_eq, dtype=f32) if has_eq else None,
        b_eq=jnp.asarray(sys_d["beq"], f32) if has_eq else None,
        a_ineq=DiaMatrix.from_scipy(a, dtype=f32), b_lower=None,
        b_upper=jnp.asarray(sys_d["b_ineq"], f32),
        n=n, m_eq=n if has_eq else 0, m_ineq=n,
    )
    pre = dict(diag_t=jnp.asarray(1.0 / col_sum, f32),
               theta=jnp.asarray(1.0, f32),
               sigma_ineq=jnp.asarray(sigma_of(a), f32))
    if has_eq:
        pre["sigma_eq"] = jnp.asarray(sigma_of(a_eq), f32)
    state = (jnp.asarray(sys_d["x0"], f32), jnp.asarray(sys_d["x0"], f32),
             jnp.asarray(sys_d["y_eq0"], f32) if has_eq
             else jnp.zeros(0, f32),
             jnp.asarray(sys_d["y_ineq0"], f32))
    return prob, pre, state


def _reference_state(sys_d, nsteps, alpha=1.0, pre_scale=None):
    """Unfused CP iterations from :func:`_reference_prob`; ``pre_scale``
    applies a primal weight via the single-chip ``_scale_pre``."""
    from pysparselp_tpu.solvers.chambolle_pock import _scale_pre

    prob, pre, state = _reference_prob(sys_d, alpha)
    if pre_scale is not None:
        pre = _scale_pre(pre, pre_scale)
    for _ in range(nsteps):
        state = _cp_iteration(prob, pre, state)
    return state


@pytest.fixture()
def small_windows(monkeypatch):
    # budgets tuned so a 20k-position problem plans >= 4 interior windows
    # (the eq variant carries more planes per row, hence the bigger budget)
    monkeypatch.setattr(cw, "_MIN_WQ", 32)
    monkeypatch.setattr(cw, "_FORCE_INTERPRET", True)

    def set_budget(nbytes):
        monkeypatch.setattr(cw, "WINDOWED_VMEM_BUDGET", nbytes)

    return set_budget


def _mesh(ndev):
    return Mesh(np.array(jax.devices()[:ndev]), ("pos",))


@pytest.mark.parametrize("eq", [False, True])
def test_position_sharded_matches_unfused(small_windows, eq):
    small_windows(2_000_000 if eq else 1_500_000)
    sys_d = _system(eq=eq)
    mesh = _mesh(4)
    info = scw.position_shard_plan(sys_d["a_eq"], sys_d["a_ineq"],
                                   sys_d["c"].size,
                                   sys_d["c"].size if eq else 0,
                                   sys_d["c"].size, 4, np.float32)
    assert info is not None
    data, state = scw.build_position_sharded(sys_d, mesh, plan_info=info)
    nsteps = 5
    state = scw.sharded_windowed_chunk(data, state, mesh, nsteps)
    x, x3, ye, y = scw.unshard_state(data, state)
    ref = _reference_state(sys_d, nsteps)
    np.testing.assert_allclose(x, np.asarray(ref[0]), atol=3e-5)
    np.testing.assert_allclose(x3, np.asarray(ref[1]), atol=6e-5)
    np.testing.assert_allclose(y, np.asarray(ref[3]), atol=3e-5)
    if eq:
        np.testing.assert_allclose(ye, np.asarray(ref[2]), atol=3e-5)


def test_chunk_callables_are_cached(small_windows):
    """Repeated host-loop chunks must reuse ONE jitted executable — a
    fresh shard_map closure per chunk re-traces and re-lowers every time
    (seconds per chunk over a tunneled chip)."""
    small_windows(1_500_000)
    sys_d = _system()
    mesh = _mesh(2)
    info = scw.position_shard_plan(sys_d["a_eq"], sys_d["a_ineq"],
                                   sys_d["c"].size, 0, sys_d["c"].size,
                                   2, np.float32)
    data, state = scw.build_position_sharded(sys_d, mesh, plan_info=info)
    for fn in (scw._chunk_callable, scw._metrics_callable):
        fn.cache_clear()
    state = scw.sharded_windowed_chunk(data, state, mesh, 3)
    scw.sharded_windowed_metrics(data, state, mesh)
    state = scw.sharded_windowed_chunk(data, state, mesh, 3)
    scw.sharded_windowed_metrics(data, state, mesh)
    assert scw._chunk_callable.cache_info().misses == 1
    assert scw._chunk_callable.cache_info().hits == 1
    assert scw._metrics_callable.cache_info().misses == 1
    assert scw._metrics_callable.cache_info().hits == 1


def test_position_sharded_device_count_invariance(small_windows):
    small_windows(1_500_000)
    sys_d = _system(n=50000)
    results = {}
    for ndev in (1, 2, 8):
        mesh = _mesh(ndev)
        info = scw.position_shard_plan(sys_d["a_eq"], sys_d["a_ineq"],
                                       sys_d["c"].size, 0,
                                       sys_d["c"].size, ndev, np.float32)
        assert info is not None, ndev
        data, state = scw.build_position_sharded(sys_d, mesh,
                                                 plan_info=info)
        state = scw.sharded_windowed_chunk(data, state, mesh, 4)
        results[ndev] = scw.unshard_state(data, state)
    for ndev in (2, 8):
        for a, b in zip(results[1], results[ndev]):
            np.testing.assert_allclose(b, a, atol=2e-5)


def test_position_sharded_end_to_end_solve(small_windows):
    """lp.solve(mesh=...) routes an eligible f32 DIA system to the
    position-sharded windowed path and matches the single-chip solve."""
    import pysparselp_tpu.parallel.sharded_cp_windowed as mod
    from pysparselp_tpu import SparseLP

    small_windows(1_500_000)
    rng = np.random.RandomState(3)
    n = 20000
    a = _dia(n, OFFSETS, rng)
    lp = SparseLP()
    lp.add_variables_array(n, lower_bounds=0, upper_bounds=2,
                           costs=rng.rand(n) - 0.3)
    lp.add_inequality_constraints_sparse(a, None, rng.rand(n) * 2 + 0.5)

    calls = {"n": 0}
    orig = mod.run_position_sharded

    def spy(*a_, **kw):
        calls["n"] += 1
        return orig(*a_, **kw)

    mod.run_position_sharded = spy
    try:
        x8, _ = lp.solve(method="chambolle_pock_ppd", mesh=_mesh(4),
                         nb_iter=400, nb_iter_plot=200, dtype=np.float32,
                         permute=False)
    finally:
        mod.run_position_sharded = orig
    assert calls["n"] == 1, "position-sharded path was not taken"
    x1, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=400,
                     nb_iter_plot=200, dtype=np.float32, permute=False)
    np.testing.assert_allclose(x8, x1, atol=1e-4)
    assert len(lp.itrn_curve) == 2      # checkpoint contract intact


def test_position_sharded_omega(small_windows):
    """A static primal weight must rescale the sharded steps exactly like
    the single-chip ``_scale_pre`` (regression: ``omega`` used to be
    dropped on the position-sharded route)."""
    small_windows(1_500_000)
    sys_d = _system()
    mesh = _mesh(2)
    n = sys_d["c"].size
    info = scw.position_shard_plan(None, sys_d["a_ineq"], n, 0, n, 2,
                                   np.float32)
    assert info is not None
    data, state = scw.build_position_sharded(sys_d, mesh, plan_info=info,
                                             omega=2.5)
    state = scw.sharded_windowed_chunk(data, state, mesh, 4)
    x, _x3, _ye, y = scw.unshard_state(data, state)
    ref = _reference_state(sys_d, 4, pre_scale=2.5)
    np.testing.assert_allclose(x, np.asarray(ref[0]), atol=3e-5)
    np.testing.assert_allclose(y, np.asarray(ref[3]), atol=3e-5)


@pytest.mark.parametrize("eq", [False, True])
def test_position_sharded_restart_matches_single_chip(small_windows, eq):
    """The device-resident restart controller on the position-sharded path
    (scalar-psum KKT scoring, sharded restart point) must track the
    single-chip controller's trajectory AND its ω updates."""
    from pysparselp_tpu.solvers.chambolle_pock import (
        _cp_chunk_restart_device, _kkt_score)

    small_windows(2_000_000 if eq else 1_500_000)
    sys_d = _system(eq=eq, seed=5)
    mesh = _mesh(4)
    n = sys_d["c"].size
    info = scw.position_shard_plan(sys_d["a_eq"], sys_d["a_ineq"], n,
                                   n if eq else 0, n, 4, np.float32)
    assert info is not None
    prob, pre, state0 = _reference_prob(sys_d)
    f32 = jnp.float32
    mu0 = _kkt_score(prob, state0[0], state0[2], state0[3]).astype(f32)
    rstate0 = {
        "state": state0,
        "omega": jnp.asarray(1.0, f32),
        "mu_restart": mu0,
        "mu_last": jnp.asarray(np.inf, f32),
        "zx": state0[0], "zeq": state0[2], "zineq": state0[3],
    }
    nsteps, period = 45, 20
    ref_rs, _m = _cp_chunk_restart_device(prob, pre, rstate0, nsteps,
                                          period, use_fused=None,
                                          theta_f=1.0)

    data, st = scw.build_position_sharded(sys_d, mesh, plan_info=info)
    rs = {"state": st, "omega": jnp.asarray(1.0, f32),
          "mu_restart": mu0, "mu_last": jnp.asarray(np.inf, f32),
          "zx": st["x"], "zeq": st.get("y_eq"), "zineq": st["y_ineq"]}
    rs = scw.sharded_windowed_chunk_restart(data, rs, mesh, nsteps, period)
    x, x3, ye, y = scw.unshard_state(data, rs["state"])
    np.testing.assert_allclose(float(rs["omega"]), float(ref_rs["omega"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(rs["mu_restart"]),
                               float(ref_rs["mu_restart"]), rtol=2e-3)
    np.testing.assert_allclose(x, np.asarray(ref_rs["state"][0]),
                               atol=3e-4)
    np.testing.assert_allclose(x3, np.asarray(ref_rs["state"][1]),
                               atol=5e-4)
    np.testing.assert_allclose(y, np.asarray(ref_rs["state"][3]),
                               atol=3e-4)
    if eq:
        np.testing.assert_allclose(ye, np.asarray(ref_rs["state"][2]),
                                   atol=3e-4)


def test_position_sharded_restart_end_to_end(small_windows):
    """``lp.solve(mesh=..., restart="average")`` routes to the
    position-sharded path (not the row-sharded fallback) and matches the
    single-chip accelerated solve."""
    import pysparselp_tpu.parallel.sharded_cp_windowed as mod
    from pysparselp_tpu import SparseLP

    small_windows(1_500_000)
    rng = np.random.RandomState(7)
    n = 20000
    a = _dia(n, OFFSETS, rng)
    lp = SparseLP()
    lp.add_variables_array(n, lower_bounds=0, upper_bounds=2,
                           costs=rng.rand(n) - 0.3)
    lp.add_inequality_constraints_sparse(a, None, rng.rand(n) * 2 + 0.5)

    calls = {"n": 0}
    orig = mod.run_position_sharded

    def spy(*a_, **kw):
        calls["n"] += 1
        return orig(*a_, **kw)

    mod.run_position_sharded = spy
    kwargs = dict(method="chambolle_pock_ppd", nb_iter=120,
                  nb_iter_plot=60, restart="average", restart_period=30,
                  omega=1.3, dtype=np.float32, permute=False)
    try:
        x_mesh, _ = lp.solve(mesh=_mesh(4), **kwargs)
    finally:
        mod.run_position_sharded = orig
    assert calls["n"] == 1, "position-sharded restart path was not taken"
    x_one, _ = lp.solve(**kwargs)
    np.testing.assert_allclose(x_mesh, x_one, atol=1e-3)


@pytest.mark.parametrize("eq", [False, True])
def test_sharded_windowed_metrics_matches_single_chip(small_windows, eq):
    """Device-resident checkpoint metrics (scalar psums/pmaxes on the mesh)
    must equal the single-chip metrics block evaluated on the gathered
    state — same energies, true-row violation maxima, rounding stats."""
    from pysparselp_tpu.solvers.chambolle_pock import _cp_chunk

    small_windows(2_000_000 if eq else 1_500_000)
    sys_d = _system(eq=eq, seed=11)
    mesh = _mesh(4)
    n = sys_d["c"].size
    info = scw.position_shard_plan(sys_d["a_eq"], sys_d["a_ineq"], n,
                                   n if eq else 0, n, 4, np.float32)
    assert info is not None
    data, state = scw.build_position_sharded(sys_d, mesh, plan_info=info)
    state = scw.sharded_windowed_chunk(data, state, mesh, 6)
    got = scw.sharded_windowed_metrics(data, state, mesh)

    x, x3, ye, y = scw.unshard_state(data, state)
    prob, pre, _ = _reference_prob(sys_d)
    f32 = jnp.float32
    gstate = (jnp.asarray(x, f32), jnp.asarray(x3, f32),
              jnp.asarray(ye, f32), jnp.asarray(y, f32))
    _, want = _cp_chunk(prob, pre, gstate, 0)
    for k in ("energy1", "energy2", "energy_rounded"):
        np.testing.assert_allclose(float(got[k]), float(want[k]),
                                   rtol=2e-5, atol=1e-5, err_msg=k)
    for k in ("max_violated_equality", "max_violated_inequality"):
        np.testing.assert_allclose(float(got[k]), float(want[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    assert bool(got["rounded_feasible"]) == bool(want["rounded_feasible"])


def test_position_sharded_light_metrics_end_to_end(small_windows):
    """``lp.solve(mesh=..., light_metrics=True)`` without a ground truth
    keeps checkpoints entirely on the mesh (solution-less recorder) and
    still reproduces the default path's curves and solution."""
    import pysparselp_tpu.parallel.sharded_cp_windowed as mod
    from pysparselp_tpu import SparseLP

    small_windows(1_500_000)
    rng = np.random.RandomState(9)
    n = 20000
    a = _dia(n, OFFSETS, rng)

    def build():
        lp = SparseLP()
        lp.add_variables_array(n, lower_bounds=0, upper_bounds=2,
                               costs=rng_costs)
        lp.add_inequality_constraints_sparse(a, None, bvec)
        return lp

    rng_costs = rng.rand(n) - 0.3
    bvec = rng.rand(n) * 2 + 0.5
    kwargs = dict(method="chambolle_pock_ppd", mesh=_mesh(4), nb_iter=400,
                  nb_iter_plot=200, dtype=np.float32, permute=False)
    calls = {"n": 0}
    orig = mod.run_position_sharded

    def spy(*a_, **kw):
        calls["n"] += 1
        assert kw.get("light_metrics"), "light flag must reach the loop"
        return orig(*a_, **kw)

    lp = build()
    mod.run_position_sharded = spy
    try:
        x_l, _ = lp.solve(light_metrics=True, **kwargs)
    finally:
        mod.run_position_sharded = orig
    assert calls["n"] == 1
    light = {k: list(getattr(lp, k)) for k in
             ("itrn_curve", "pobj_curve", "dobj_curve",
              "max_violated_inequality")}
    lp2 = build()
    x_d, _ = lp2.solve(**kwargs)
    np.testing.assert_allclose(x_l, x_d, atol=1e-6)
    assert light["itrn_curve"] == list(lp2.itrn_curve)
    for k in ("pobj_curve", "dobj_curve", "max_violated_inequality"):
        np.testing.assert_allclose(light[k], list(getattr(lp2, k)),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_position_shard_plan_gates():
    # dense matrix (no DIA) -> ineligible
    rng = np.random.RandomState(0)
    n = 4000
    a = scipy.sparse.random(n, n, density=0.01, random_state=rng,
                            format="csr")
    assert scw.position_shard_plan(None, a, n, 0, n, 4, np.float32) is None
    # f64 -> ineligible
    band = _dia(20000, OFFSETS, rng)
    assert scw.position_shard_plan(None, band, 20000, 0, 20000, 4,
                                   np.float64) is None
