"""Whole-iteration fused CP kernel: parity with the composed path."""

import numpy as np
import pytest
import scipy.sparse

import jax.numpy as jnp

from pysparselp_tpu import problem as pr
from pysparselp_tpu.ops import cp_fused, dia_pallas


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setattr(cp_fused, "_FORCE_INTERPRET", True)
    monkeypatch.setattr(dia_pallas, "_FORCE_INTERPRET", True)


def _dia_problem(m, n, seed, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    offs = np.array([-260, -128, -1, 0, 1, 5, 129, 260])
    rows, cols, vals = [], [], []
    for o in offs:
        r = np.arange(max(0, -o), min(m, n - o))
        keep = rng.rand(r.size) < 0.5
        r = r[keep]
        rows.append(r)
        cols.append(r + o)
        vals.append(rng.randn(r.size))
    a = scipy.sparse.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(m, n)).tocsr()
    dia = pr.DiaMatrix.from_scipy(a, dtype=dtype, allow_bf16=False)
    x_feas = rng.rand(n)
    b = a @ x_feas + 0.5
    prob = pr.LPProblem(
        c=jnp.asarray(rng.randn(n), dtype),
        lb=jnp.asarray(np.zeros(n), dtype),
        ub=jnp.asarray(np.ones(n), dtype),
        a_eq=None, b_eq=None,
        a_ineq=dia,
        b_lower=None,
        b_upper=jnp.asarray(b, dtype),
        n=n, m_eq=0, m_ineq=m,
    )
    pre = dict(
        diag_t=1.0 / jnp.maximum(dia.abs_power_colsum(1.0), 1e-9),
        theta=jnp.asarray(1.0, dtype),
        sigma_ineq=1.0 / jnp.maximum(dia.abs_power_rowsum(1.0), 1e-9),
    )
    return prob, pre


def test_fused_chunk_matches_composed_iterations():
    from pysparselp_tpu.solvers.chambolle_pock import cp_chunk_impl

    prob, pre = _dia_problem(450, 400, seed=0)
    x0 = jnp.zeros(prob.n, jnp.float32)
    state = (x0, x0, jnp.zeros(0, jnp.float32),
             jnp.zeros(prob.m_ineq, jnp.float32))
    ref_state, ref_metrics = cp_chunk_impl(prob, pre, state, 7)
    fused_state = cp_fused.cp_fused_chunk(prob, pre, state, 7, theta=1.0)
    for a, b in zip(fused_state, ref_state):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fused_chunks_compose():
    # two fused chunks of 3+4 equal one chunk of 7 (state continuity incl.
    # the padded dual buffer round-trip)
    prob, pre = _dia_problem(300, 330, seed=3)
    x0 = jnp.zeros(prob.n, jnp.float32)
    state = (x0, x0, jnp.zeros(0, jnp.float32),
             jnp.zeros(prob.m_ineq, jnp.float32))
    s7 = cp_fused.cp_fused_chunk(prob, pre, state, 7, theta=1.0)
    s34 = cp_fused.cp_fused_chunk(
        prob, pre, cp_fused.cp_fused_chunk(prob, pre, state, 3, theta=1.0),
        4, theta=1.0)
    for a, b in zip(s34, s7):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_eligibility_gating():
    prob, pre = _dia_problem(300, 330, seed=5)
    assert cp_fused.cp_fused_eligible(prob, jnp.float32)
    # equality system present -> composed path
    import dataclasses

    prob_eq = dataclasses.replace(prob, a_eq=prob.a_ineq,
                                  b_eq=prob.b_upper, m_eq=prob.m_ineq)
    assert not cp_fused.cp_fused_eligible(prob_eq, jnp.float32)
    # over-budget -> composed path
    import pysparselp_tpu.ops.cp_fused as cf

    old = cf.FUSED_VMEM_BUDGET
    try:
        cf.FUSED_VMEM_BUDGET = 10
        assert not cp_fused.cp_fused_eligible(prob, jnp.float32)
    finally:
        cf.FUSED_VMEM_BUDGET = old


def test_fused_restart_controller_matches_composed():
    import jax.numpy as jnp

    from pysparselp_tpu.solvers.chambolle_pock import (
        _cp_chunk_restart_device, _kkt_score)

    prob, pre = _dia_problem(280, 260, seed=9)
    x0 = jnp.zeros(prob.n, jnp.float32)
    state = (x0, x0, jnp.zeros(0, jnp.float32),
             jnp.zeros(prob.m_ineq, jnp.float32))
    rstate = {
        "state": state,
        "omega": jnp.asarray(1.0, jnp.float32),
        "mu_restart": _kkt_score(prob, state[0], state[2],
                                 state[3]).astype(jnp.float32),
        "mu_last": jnp.asarray(np.inf, jnp.float32),
        "zx": state[0], "zeq": state[2], "zineq": state[3],
    }
    r_ref, m_ref = _cp_chunk_restart_device(prob, pre, rstate, 25, 10)
    r_fused, m_fused = _cp_chunk_restart_device(
        prob, pre, rstate, 25, 10, use_fused=True, theta_f=1.0)
    for k in r_ref:
        a, b = r_ref[k], r_fused[k]
        if isinstance(a, tuple):
            for ai, bi in zip(a, b):
                np.testing.assert_allclose(np.asarray(bi), np.asarray(ai),
                                           rtol=1e-5, atol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(m_fused["energy1"]),
                               float(m_ref["energy1"]), rtol=1e-4)


def _dense_problem(me, mi, n, seed):
    rng = np.random.RandomState(seed)
    ae = rng.randn(me, n) * (rng.rand(me, n) < 0.4)
    ai = rng.randn(mi, n) * (rng.rand(mi, n) < 0.4)
    x_feas = rng.rand(n)
    prob = pr.LPProblem(
        c=jnp.asarray(rng.randn(n), jnp.float32),
        lb=jnp.asarray(np.zeros(n), jnp.float32),
        ub=jnp.asarray(np.ones(n), jnp.float32),
        a_eq=pr.DenseMatrix(a=jnp.asarray(ae, jnp.float32), nrows=me,
                            ncols=n),
        b_eq=jnp.asarray(ae @ x_feas, jnp.float32),
        a_ineq=pr.DenseMatrix(a=jnp.asarray(ai, jnp.float32), nrows=mi,
                              ncols=n),
        b_lower=None,
        b_upper=jnp.asarray(ai @ x_feas + 0.5, jnp.float32),
        n=n, m_eq=me, m_ineq=mi,
    )
    pre = dict(
        diag_t=1.0 / jnp.maximum(
            prob.a_eq.abs_power_colsum(1.0)
            + prob.a_ineq.abs_power_colsum(1.0), 1e-9),
        theta=jnp.asarray(1.0, jnp.float32),
        sigma_eq=1.0 / jnp.maximum(prob.a_eq.abs_power_rowsum(1.0), 1e-9),
        sigma_ineq=1.0 / jnp.maximum(prob.a_ineq.abs_power_rowsum(1.0),
                                     1e-9),
    )
    return prob, pre


def test_dense_fused_matches_composed():
    from pysparselp_tpu.solvers.chambolle_pock import cp_chunk_impl

    prob, pre = _dense_problem(40, 90, 130, seed=2)
    assert cp_fused.cp_dense_fused_eligible(prob, jnp.float32)
    x0 = jnp.zeros(prob.n, jnp.float32)
    state = (x0, x0, jnp.zeros(prob.m_eq, jnp.float32),
             jnp.zeros(prob.m_ineq, jnp.float32))
    ref_state, _ = cp_chunk_impl(prob, pre, state, 9)
    fused_state = cp_fused.cp_dense_fused_chunk(prob, pre, state, 9,
                                                theta=1.0)
    for a, b in zip(fused_state, ref_state):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_dense_fused_restart_matches_composed():
    import jax.numpy as jnp2

    from pysparselp_tpu.solvers.chambolle_pock import (
        _cp_chunk_restart_device, _kkt_score)

    prob, pre = _dense_problem(30, 70, 100, seed=8)
    x0 = jnp2.zeros(prob.n, jnp2.float32)
    state = (x0, x0, jnp2.zeros(prob.m_eq, jnp2.float32),
             jnp2.zeros(prob.m_ineq, jnp2.float32))
    rstate = {
        "state": state,
        "omega": jnp2.asarray(1.0, jnp2.float32),
        "mu_restart": _kkt_score(prob, state[0], state[2],
                                 state[3]).astype(jnp2.float32),
        "mu_last": jnp2.asarray(np.inf, jnp2.float32),
        "zx": state[0], "zeq": state[2], "zineq": state[3],
    }
    r_ref, _ = _cp_chunk_restart_device(prob, pre, rstate, 25, 10)
    r_fused, _ = _cp_chunk_restart_device(
        prob, pre, rstate, 25, 10, use_fused="dense", theta_f=1.0)
    for k in r_ref:
        a, b = r_ref[k], r_fused[k]
        if isinstance(a, tuple):
            for ai_, bi_ in zip(a, b):
                np.testing.assert_allclose(np.asarray(bi_), np.asarray(ai_),
                                           rtol=2e-5, atol=2e-5)
        else:
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-5, atol=2e-5)
