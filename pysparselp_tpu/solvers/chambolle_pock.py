"""Diagonally-preconditioned Chambolle–Pock primal-dual LP solver on TPU.

Same algorithm as the reference's flagship first-order solver
(``pysparselp/ChambollePockPPD.py:36-346``; Pock & Chambolle, ICCV'11
"Diagonal preconditioning for first order primal-dual algorithms"), rebuilt
TPU-first: the hot loop — two transpose-SpMVs, a box-projected primal step,
over-relaxation, two SpMVs and the dual ascent — is a single fused
``lax.fori_loop`` body compiled once per problem shape.  All SpMVs are
gathers on the dual-ELL layout (:class:`~pysparselp_tpu.problem.EllMatrix`),
so one iteration is pure VPU work with no host round-trips; metrics are
evaluated on device once per ``nb_iter_plot`` chunk.
"""

from __future__ import annotations

import functools

import numpy as np
import scipy.sparse

import jax
import jax.numpy as jnp

from ..problem import LPProblem, default_dtype, ell_from_scipy
from .base import HostLoop, chunk_schedule, emit_callback, to_np


def _fold_one_sided(a_ineq, b_lower, b_upper):
    """Fold ``bl <= Ax <= bu`` into ``A'x <= b'`` dropping infinite sides
    (mirrors ``ChambollePockPPD.py:74-88``)."""
    if a_ineq is None:
        return None, None
    a_ineq = scipy.sparse.csr_matrix(a_ineq)
    if b_lower is None:
        return a_ineq, np.asarray(b_upper, np.float64)
    keep_u = np.nonzero(b_upper != np.inf)[0]
    keep_l = np.nonzero(b_lower != -np.inf)[0]
    if keep_u.size and keep_l.size:
        a = scipy.sparse.vstack((a_ineq[keep_u, :], -a_ineq[keep_l, :])).tocsr()
    elif keep_l.size:
        a = (-a_ineq).tocsr()[keep_l, :]
    else:
        a = a_ineq[keep_u, :]
    b = np.concatenate((b_upper[keep_u], -b_lower[keep_l]))
    return a, b


def cp_chunk_impl(prob: LPProblem, pre, state, nsteps: int):
    """Run ``nsteps`` CP-PPD iterations then evaluate metrics on device.

    Pure function (jitted as ``_cp_chunk``); also the compile-check entry
    point exposed through ``__graft_entry__.entry``.
    """
    theta = pre["theta"]

    def body(_, s):
        x, x3, y_eq, y_ineq = s
        d = prob.c
        if prob.a_eq is not None:
            d = d + prob.a_eq.rmatvec(y_eq)
        if prob.a_ineq is not None:
            d = d + prob.a_ineq.rmatvec(y_ineq)
        x2 = jnp.clip(x - pre["diag_t"] * d, prob.lb, prob.ub)
        x3 = (1.0 + theta) * x2 - theta * x
        x = x2
        if prob.a_eq is not None:
            r_eq = prob.a_eq.matvec(x3) - prob.b_eq
            y_eq = y_eq + pre["sigma_eq"] * r_eq
        if prob.a_ineq is not None:
            r_ineq = prob.a_ineq.matvec(x3) - prob.b_upper
            y_ineq = jnp.maximum(y_ineq + pre["sigma_ineq"] * r_ineq, 0.0)
        return (x, x3, y_eq, y_ineq)

    state = jax.lax.fori_loop(0, nsteps, body, state)
    x, x3, y_eq, y_ineq = state

    # -- metrics (``ChambollePockPPD.py:242-315``) ------------------------
    d = prob.c
    if prob.a_eq is not None:
        d = d + prob.a_eq.rmatvec(y_eq)
    if prob.a_ineq is not None:
        d = d + prob.a_ineq.rmatvec(y_ineq)
    # dual-feasible primal minimizer for the lower bound (energy2)
    x4 = jnp.where(d < 0, prob.ub, prob.lb)
    energy1 = jnp.dot(prob.c, x)
    energy2 = jnp.dot(prob.c, x4)
    max_v_eq = jnp.asarray(0.0, x.dtype)
    max_v_ineq = jnp.asarray(0.0, x.dtype)
    x_rounded = jnp.round(x)
    energy_rounded = jnp.dot(prob.c, x_rounded)
    rounded_feasible = jnp.asarray(True)
    if prob.a_eq is not None:
        r_eq = prob.a_eq.matvec(x) - prob.b_eq
        energy1 = energy1 + jnp.dot(y_eq, r_eq)
        energy2 = energy2 + jnp.dot(y_eq, prob.a_eq.matvec(x4) - prob.b_eq)
        max_v_eq = jnp.max(jnp.abs(r_eq))
        rounded_feasible &= jnp.max(
            jnp.abs(prob.a_eq.matvec(x_rounded) - prob.b_eq)
        ) == 0
    if prob.a_ineq is not None:
        r_ineq = prob.a_ineq.matvec(x) - prob.b_upper
        energy1 = energy1 + jnp.dot(y_ineq, r_ineq)
        energy2 = energy2 + jnp.dot(y_ineq, prob.a_ineq.matvec(x4) - prob.b_upper)
        max_v_ineq = jnp.max(r_ineq)
        rounded_feasible &= jnp.max(
            prob.a_ineq.matvec(x_rounded) - prob.b_upper
        ) <= 0
    metrics = dict(
        energy1=energy1,
        energy2=energy2,
        max_violated_equality=max_v_eq,
        max_violated_inequality=max_v_ineq,
        energy_rounded=energy_rounded,
        rounded_feasible=rounded_feasible,
    )
    return state, metrics


_cp_chunk = functools.partial(jax.jit, static_argnames=("nsteps",))(cp_chunk_impl)


def chambolle_pock_ppd(
    c,
    a_eq,
    beq,
    a_ineq,
    b_lower,
    b_upper,
    lb,
    ub,
    x0=None,
    alpha=1.0,
    theta=1.0,
    nb_max_iter=100,
    callback_func=None,
    max_time=None,
    save_problem=False,
    force_integer=False,
    nb_iter_plot=10,
    dtype=None,
    start_time=None,
):
    """Solve the LP with preconditioned CP-PPD; returns ``(x, best_integer_solution)``.

    Signature-compatible with the reference solver
    (``pysparselp/ChambollePockPPD.py:36``).
    """
    del save_problem  # repro dumps are handled by utils.save_arguments
    dtype = dtype or default_dtype()
    c = np.asarray(c, np.float64)
    n = c.size

    if a_eq is not None and a_eq.shape[0] == 0:
        a_eq, beq = None, None
    a_one, b_ineq = _fold_one_sided(a_ineq, b_lower, b_upper)
    if a_one is not None and a_one.shape[0] == 0:
        a_one, b_ineq = None, None

    lb = np.asarray(lb, np.float64)
    ub = np.asarray(ub, np.float64)
    if a_eq is None and a_one is None:
        # unconstrained: minimize cᵀx over the box (``ChambollePockPPD.py:147-151``)
        x = np.zeros_like(lb)
        x[c > 0] = lb[c > 0]
        x[c < 0] = ub[c < 0]
        return x, None

    eq_m = ell_from_scipy(a_eq, dtype=dtype) if a_eq is not None else None
    in_m = ell_from_scipy(a_one, dtype=dtype) if a_one is not None else None
    prob = LPProblem(
        c=jnp.asarray(c, dtype),
        lb=jnp.asarray(lb, dtype),
        ub=jnp.asarray(ub, dtype),
        a_eq=eq_m,
        b_eq=jnp.asarray(beq, dtype) if a_eq is not None else None,
        a_ineq=in_m,
        b_lower=None,
        b_upper=jnp.asarray(b_ineq, dtype) if in_m is not None else None,
        n=n,
        m_eq=eq_m.nrows if eq_m is not None else 0,
        m_ineq=in_m.nrows if in_m is not None else 0,
    )

    # diagonal preconditioners (``ChambollePockPPD.py:122-179``):
    #   T_jj = 1 / sum_i |a_ij|^{2-alpha},  Σ_ii = 1 / sum_j |a_ij|^{alpha}
    col_sum = jnp.zeros(n, dtype)
    if eq_m is not None:
        col_sum = col_sum + eq_m.abs_power_colsum(2.0 - alpha)
    if in_m is not None:
        col_sum = col_sum + in_m.abs_power_colsum(2.0 - alpha)
    diag_t = 1.0 / jnp.where(col_sum == 0, 1.0, col_sum)
    pre = dict(diag_t=diag_t, theta=jnp.asarray(theta, dtype))
    if eq_m is not None:
        rs = eq_m.abs_power_rowsum(alpha)
        pre["sigma_eq"] = 1.0 / jnp.where(rs == 0, 1.0, rs)
    if in_m is not None:
        rs = in_m.abs_power_rowsum(alpha)
        pre["sigma_ineq"] = 1.0 / jnp.where(rs == 0, 1.0, rs)

    x = jnp.asarray(x0 if x0 is not None else np.zeros(n), dtype)
    state = (
        x,
        x,
        jnp.zeros(prob.m_eq, dtype) if eq_m is not None else jnp.zeros(0, dtype),
        jnp.zeros(prob.m_ineq, dtype) if in_m is not None else jnp.zeros(0, dtype),
    )

    loop = HostLoop(start_time=start_time, max_time=max_time)
    best_integer_solution = None
    best_integer_energy = np.inf
    niter = 0
    for nsteps in chunk_schedule(nb_max_iter, nb_iter_plot):
        state, metrics = _cp_chunk(prob, pre, state, nsteps)
        niter += nsteps
        if force_integer and bool(metrics["rounded_feasible"]):
            er = float(metrics["energy_rounded"])
            if er < best_integer_energy:
                best_integer_energy = er
                best_integer_solution = np.round(to_np(state[0]))
        emit_callback(
            callback_func,
            niter,
            state[0],
            metrics["energy1"],
            metrics["energy2"],
            loop.elapsed,
            metrics["max_violated_equality"],
            metrics["max_violated_inequality"],
        )
        if loop.timed_out:
            break

    return to_np(state[0]), best_integer_solution
