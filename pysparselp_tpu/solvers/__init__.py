"""Solver registry and dispatch (equivalent of ``pysparselp/SparseLP.py:1095-1377``).

Each built-in method maps to a solver module.  ``dispatch`` performs the same
per-method host-side form conversions as the reference's ``solve`` and maps
solutions back through the recorded ``(m_change, shift)`` with the convention
``x_original = m_change @ x_new + shift``.
"""

from __future__ import annotations

import copy

import numpy as np


def _same_option(a, b) -> bool:
    """Equality that tolerates arrays/meshes (identity) for option values."""
    if a is b:
        return True
    if isinstance(a, (int, float, str, bool, type(None))) and isinstance(
        b, (int, float, str, bool, type(None))
    ):
        return a == b
    return False


def _csr_with_blocks(blocked):
    """BlockedCSR -> (scipy csr or None, blocks list)."""
    if blocked is None or blocked.shape[0] == 0:
        return None, []
    return blocked.tocsr(), list(blocked.blocks)


def dispatch(
    lp,
    method,
    x0,
    nb_iter,
    max_time,
    callback_func,
    nb_iter_plot,
    start_time,
    force_integer=False,
    dtype=None,
    **solver_kwargs,
):
    from ..config import resolve_config
    from ..modeling import solving_methods

    if method not in solving_methods:
        raise ValueError(
            f"method {method!r} not valid; available methods are {solving_methods}"
        )

    # typed per-solver config gate (SURVEY §5): unknown/typo'd options raise
    # here with the valid field list instead of deep inside the solver
    cfg = resolve_config(method, solver_kwargs)
    if cfg is not None:
        solver_kwargs = cfg.solver_kwargs()
        # drop untouched optionals so solvers keep their own defaults and
        # reference-faithful call paths stay byte-identical
        defaults = type(cfg)()
        solver_kwargs = {
            k: v
            for k, v in solver_kwargs.items()
            if not _same_option(v, getattr(defaults, k))
        }

    a_ineq, ineq_blocks = _csr_with_blocks(lp.a_inequalities)
    a_eq, eq_blocks = _csr_with_blocks(lp.a_equalities)
    if a_ineq is not None:
        a_ineq.blocks = ineq_blocks
    if a_eq is not None:
        a_eq.blocks = eq_blocks
    b_eq = lp.b_equalities if a_eq is not None else None
    b_lower = lp.b_lower if a_ineq is not None else None
    b_upper = lp.b_upper if a_ineq is not None else None

    if method in ("scipy_simplex", "scipy_interior_point"):
        from .scipy_bridge import solve_scipy

        return solve_scipy(
            lp, method, nb_iter=nb_iter, callback_func=callback_func,
            start_time=start_time, nb_iter_plot=nb_iter_plot,
        )

    if method == "chambolle_pock_ppd":
        from .chambolle_pock import chambolle_pock_ppd

        lp_reduced = copy.deepcopy(lp)
        m_change, shift = lp_reduced.remove_fixed_variables()
        # warm start: map into the reduced space (inverse of
        # ``x = m_change @ x_r + shift``; m_change columns are unit vectors)
        x0_r = None if x0 is None else m_change.T @ (np.asarray(x0) - shift)
        x30 = solver_kwargs.pop("x30", None)
        if x30 is not None:
            solver_kwargs["x30"] = m_change.T @ (np.asarray(x30) - shift)

        def back(niter, sol, e1, e2, dur, mveq, mvineq, state=None):
            if state is not None:
                state = dict(
                    state,
                    x=m_change @ state["x"] + shift,
                    x3=m_change @ state["x3"] + shift,
                )
            if not back.wants_solution:
                # light-metrics contract: a solution-less callback must not
                # trigger the device fetch the untransform would cost
                xb = sol
            else:
                xb = m_change @ np.asarray(sol) + shift
            callback_func(
                niter, xb, e1, e2, dur, mveq, mvineq,
                **(
                    {"state": state}
                    if getattr(callback_func, "wants_state", False)
                    else {}
                ),
            )

        from .base import mirror_callback_attrs

        mirror_callback_attrs(back, callback_func)

        a_ineq_r, _ = _csr_with_blocks(lp_reduced.a_inequalities)
        a_eq_r, _ = _csr_with_blocks(lp_reduced.a_equalities)

        mesh = solver_kwargs.pop("mesh", None)
        if mesh is not None:
            # multi-chip path: row-shard the constraint systems over the mesh
            from ..parallel.sharded_cp import chambolle_pock_ppd_sharded

            x = chambolle_pock_ppd_sharded(
                lp_reduced.costsvector, a_eq_r,
                lp_reduced.b_equalities if a_eq_r is not None else None,
                a_ineq_r,
                lp_reduced.b_lower if a_ineq_r is not None else None,
                lp_reduced.b_upper if a_ineq_r is not None else None,
                lp_reduced.lower_bounds, lp_reduced.upper_bounds, mesh,
                nb_max_iter=nb_iter, nb_iter_plot=nb_iter_plot,
                callback_func=back, max_time=max_time, x0=x0_r,
                start_time=start_time, force_integer=force_integer,
                **({"dtype": dtype} if dtype is not None else {}),
                **solver_kwargs,
            )
            if force_integer:
                x, _best = x
                if _best is not None:
                    x = _best
            return m_change @ x + shift
        x, _best = chambolle_pock_ppd(
            lp_reduced.costsvector,
            a_eq_r if a_eq_r is not None else None,
            lp_reduced.b_equalities if a_eq_r is not None else None,
            a_ineq_r,
            lp_reduced.b_lower if a_ineq_r is not None else None,
            lp_reduced.b_upper if a_ineq_r is not None else None,
            lp_reduced.lower_bounds,
            lp_reduced.upper_bounds,
            x0=x0_r,
            alpha=solver_kwargs.pop("alpha", 1.0),
            theta=solver_kwargs.pop("theta", 1.0),
            nb_max_iter=nb_iter,
            callback_func=back,
            max_time=max_time,
            force_integer=force_integer,
            nb_iter_plot=nb_iter_plot,
            dtype=dtype,
            start_time=start_time,
            **solver_kwargs,
        )
        if force_integer and _best is not None:
            # return the best feasible integer-rounded iterate the solver
            # tracked (``ChambollePockPPD.py:274-291``)
            x = _best
        return m_change @ x + shift

    if method == "mehrotra":
        from .mehrotra import mpc_sol

        lp_slack = copy.deepcopy(lp)
        m_change1, shift1 = lp_slack.remove_fixed_variables()
        m_change2, shift2 = lp_slack.convert_to_slack_form()

        def mehrotra_cb(solution, niter, **kw):
            x = m_change1 @ (m_change2 @ solution + shift2) + shift1
            callback_func(niter, x, float(lp.costsvector.dot(x)), 0.0,
                          kw.get("elapsed", 0.0), 0.0, 0.0)

        mesh = solver_kwargs.pop("mesh", None)
        if mesh is not None:
            # multi-chip path: column-shard the standard-form system
            from ..parallel.sharded_mehrotra import mpc_sol_sharded

            _f, x, _y, _s, _n = mpc_sol_sharded(
                lp_slack.a_equalities.tocsr(),
                lp_slack.b_equalities,
                lp_slack.costsvector,
                mesh,
                max_iter=nb_iter,
                callback=mehrotra_cb,
                dtype=dtype,
                start_time=start_time,
                max_time=max_time,
                **solver_kwargs,
            )
            return m_change1 @ (m_change2 @ x + shift2) + shift1
        _f, x, _y, _s, _n = mpc_sol(
            lp_slack.a_equalities.tocsr(),
            lp_slack.b_equalities,
            lp_slack.costsvector,
            max_iter=nb_iter,
            callback=mehrotra_cb,
            dtype=dtype,
            start_time=start_time,
            max_time=max_time,
            **solver_kwargs,
        )
        return m_change1 @ (m_change2 @ x + shift2) + shift1

    if method == "admm":
        from .admm import lp_admm

        return lp_admm(
            lp.costsvector, a_eq, b_eq, a_ineq, b_lower, b_upper,
            lp.lower_bounds, lp.upper_bounds,
            nb_iter=nb_iter, x0=x0, callback_func=callback_func,
            max_time=max_time, nb_iter_plot=nb_iter_plot, dtype=dtype,
            start_time=start_time, **solver_kwargs,
        )

    if method == "admm2":
        from .admm import lp_admm2

        return lp_admm2(
            lp.costsvector, a_eq, b_eq, a_ineq, b_lower, b_upper,
            lp.lower_bounds, lp.upper_bounds,
            nb_iter=nb_iter, x0=x0, callback_func=callback_func,
            max_time=max_time, nb_iter_plot=nb_iter_plot, dtype=dtype,
            start_time=start_time, **solver_kwargs,
        )

    if method == "admm_blocks":
        from .admm_blocks import lp_admm_block_decomposition

        return lp_admm_block_decomposition(
            lp.costsvector, a_eq, b_eq, a_ineq, b_lower, b_upper,
            lp.lower_bounds, lp.upper_bounds,
            nb_iter=nb_iter, x0=x0, callback_func=callback_func,
            max_time=max_time, nb_iter_plot=nb_iter_plot, dtype=dtype,
            start_time=start_time, **solver_kwargs,
        )

    if method == "dual_gradient_ascent":
        from .dual_ascent import dual_gradient_ascent

        mesh = solver_kwargs.pop("mesh", None)
        if mesh is not None:
            from ..parallel.sharded_dga import dual_gradient_ascent_sharded

            x, _y_eq, _y_ineq = dual_gradient_ascent_sharded(
                x0, lp, mesh, nb_max_iter=nb_iter,
                callback_func=callback_func,
                y_eq=solver_kwargs.pop("y_eq", None),
                y_ineq=solver_kwargs.pop("y_ineq", None),
                max_time=max_time, nb_iter_plot=nb_iter_plot, dtype=dtype,
                start_time=start_time, **solver_kwargs,
            )
            return x
        x, _y_eq, _y_ineq = dual_gradient_ascent(
            x=x0, lp=lp, nb_max_iter=nb_iter, callback_func=callback_func,
            y_eq=solver_kwargs.pop("y_eq", None),
            y_ineq=solver_kwargs.pop("y_ineq", None), max_time=max_time,
            nb_iter_plot=nb_iter_plot, dtype=dtype, start_time=start_time,
            **solver_kwargs,
        )
        return x

    if method == "dual_coordinate_ascent":
        from .dual_ascent import dual_coordinate_ascent

        lp_reduced = copy.deepcopy(lp)
        m_change, shift = lp_reduced.remove_fixed_variables()
        x0_r = None if x0 is None else m_change.T @ (np.asarray(x0) - shift)

        def back(niter, sol, e1, e2, dur, mveq, mvineq):
            callback_func(niter, m_change @ sol + shift, e1, e2, dur, mveq, mvineq)

        mesh = solver_kwargs.pop("mesh", None)
        if mesh is not None:
            # mesh= implies the blocked (graph-colored) mode — the
            # sequential sweep is an unbreakable chain through c̄
            from ..parallel.sharded_dca import dual_coordinate_ascent_sharded

            solver_kwargs.pop("mode", None)
            x, _y_eq, _y_ineq = dual_coordinate_ascent_sharded(
                x0_r, lp_reduced, mesh, nb_max_iter=nb_iter,
                callback_func=back,
                y_eq=solver_kwargs.pop("y_eq", None),
                y_ineq=solver_kwargs.pop("y_ineq", None),
                max_time=max_time, nb_iter_plot=nb_iter_plot, dtype=dtype,
                start_time=start_time, **solver_kwargs,
            )
            return m_change @ x + shift
        x, _y_eq, _y_ineq = dual_coordinate_ascent(
            x=x0_r, lp=lp_reduced, nb_max_iter=nb_iter, callback_func=back,
            y_eq=solver_kwargs.pop("y_eq", None),
            y_ineq=solver_kwargs.pop("y_ineq", None), max_time=max_time,
            nb_iter_plot=nb_iter_plot, dtype=dtype, start_time=start_time,
            **solver_kwargs,
        )
        return m_change @ x + shift

    if method == "osqp":  # pragma: no cover - optional dependency
        from .osqp_bridge import solve_osqp

        return solve_osqp(lp, nb_iter=nb_iter, callback_func=callback_func,
                          start_time=start_time)

    if method in ("ECOS", "SCS", "CVXOPT"):  # pragma: no cover - optional
        from .cvxpy_bridge import solve_cvxpy

        return solve_cvxpy(lp, method, nb_iter=nb_iter,
                           callback_func=callback_func, start_time=start_time)

    raise ValueError(f"unknown LP solver method {method}")
