"""Shared solver-loop infrastructure.

Every iterative solver follows the same shape: a jit-compiled *chunk* of
``nb_iter_plot`` iterations (a ``lax.fori_loop`` body over the device
:class:`~pysparselp_tpu.problem.LPProblem`), driven by a host loop that pulls
scalar metrics between chunks, feeds the curve-recording callback and enforces
the wall-clock budget.  This reproduces the reference's callback/metrics
contract (``ChambollePockPPD.py:242-329``, ``ADMM.py:213-248``) while keeping
``max_time`` — which is nondeterministic by design — outside the compiled
region.
"""

from __future__ import annotations

import time

import numpy as np


def to_np(x):
    return np.asarray(x, dtype=np.float64)


def chunk_schedule(nb_iter: int, nb_iter_plot: int):
    """Chunk sizes whose sum is exactly ``nb_iter`` (at most two distinct sizes,
    so at most two XLA compilations per solver/problem shape)."""
    nb_iter = int(nb_iter)
    nb_iter_plot = max(1, int(nb_iter_plot))
    full, rem = divmod(nb_iter, nb_iter_plot)
    return [nb_iter_plot] * full + ([rem] if rem else [])


class HostLoop:
    """Host driver: timing, max_time budget, callback plumbing."""

    def __init__(self, start_time=None, max_time=None):
        self.start = time.perf_counter() if start_time is None else start_time
        self.max_time = max_time

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.start

    @property
    def timed_out(self) -> bool:
        return self.max_time is not None and self.elapsed > self.max_time


def mirror_callback_attrs(wrapper, user_cb):
    """Copy the callback-protocol attributes onto a wrapping closure so
    downstream loops (light-metrics gating, state forwarding) still see
    the user callback's declarations; returns the wrapper."""
    wrapper.wants_state = getattr(user_cb, "wants_state", False)
    wrapper.wants_solution = getattr(user_cb, "wants_solution", True)
    return wrapper


def emit_callback(callback_func, niter, x, energy1, energy2, elapsed,
                  max_violated_eq, max_violated_ineq, state=None,
                  light=False):
    """Invoke the 7-positional-arg callback protocol.

    ``elapsed`` may be a float or a zero-arg callable (pass
    ``lambda: loop.elapsed``): the callable is resolved only AFTER the
    device arrays have been fetched, so the timestamp includes the chunk
    that produced them.  JAX dispatch is asynchronous — reading the clock
    before the fetch silently attributes each chunk's device time to the
    NEXT checkpoint, understating time-to-tolerance by up to one chunk.

    ``state`` (a dict of full solver state arrays, e.g. duals) is passed as
    an extra keyword ONLY to callbacks that opt in with a truthy
    ``wants_state`` attribute — existing positional callbacks keep working.

    ``light=True`` (the ``light_metrics`` solve option): the checkpoint
    performs exactly ONE device fetch — ``float(energy1)``, which also
    synchronizes every queued chunk so the timestamp stays truthful — and
    passes ``x`` and the remaining metrics through UNfetched (device
    scalars).  Callbacks advertising ``wants_solution = False`` must not
    convert ``x``.  Over a remote-tunneled chip each fetch costs tens of
    milliseconds, so the default path's 5+ round trips per checkpoint can
    otherwise dominate short chunks.
    """
    if callback_func is None:
        return
    if light:
        args = (
            int(niter),
            x,
            float(energy1),  # the single synchronizing fetch
            energy2,
            float(elapsed()) if callable(elapsed) else float(elapsed),
            max_violated_eq,
            max_violated_ineq,
        )
        if state is not None and getattr(callback_func, "wants_state", False):
            callback_func(*args, state=state)
        else:
            callback_func(*args)
        return
    x_np = to_np(x)
    metric_vals = (float(energy1), float(energy2))  # forces the sync
    viol_vals = (float(max_violated_eq), float(max_violated_ineq))
    args = (
        int(niter),
        x_np,
        metric_vals[0],
        metric_vals[1],
        float(elapsed()) if callable(elapsed) else float(elapsed),
        viol_vals[0],
        viol_vals[1],
    )
    if state is not None and getattr(callback_func, "wants_state", False):
        callback_func(*args, state=state)
    else:
        callback_func(*args)


class ToleranceStop:
    """Host-side tolerance termination on chunk metrics.

    Stops when the worst constraint violation AND the relative objective
    change between consecutive checks both fall below ``stop_tol`` (the
    first-order analogue of a solver's convergence test; the reference only
    has iteration/time budgets).  Stateless no-op when ``stop_tol`` is None.
    """

    def __init__(self, stop_tol=None):
        self.tol = stop_tol
        self._last = None

    def check(self, energy, *violations) -> bool:
        if self.tol is None:
            return False
        feas = max((float(v) for v in violations), default=0.0)
        e = float(energy)
        rel = (
            abs(e - self._last) / (1.0 + abs(e))
            if self._last is not None
            else np.inf
        )
        self._last = e
        return feas < self.tol and rel < self.tol
