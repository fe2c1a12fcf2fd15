"""On-chip ``_PLANE_UNROLL`` sweep for the dst-grouped routed kernel.

For each unroll in the sweep list, rebuilds the routed operator for the
bench's 1.95M-nnz unstructured matrix, then times the fused
matvec+rmatvec chain at N and 2N iterations and reports the SLOPE
``(t(2N) - t(N)) / N`` — the constant dispatch+fetch overhead of the
tunneled chip (observed 30-300 ms, varying run to run) cancels, unlike
the single-point ``scripts_routed_probe.py`` timing.  Medians of
``reps`` runs per point.

Run ON the real chip, one process at a time:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts_unroll_sweep.py \
        [N] [REPS] [U1,U2,...]
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
unrolls = ([int(u) for u in sys.argv[3].split(",")]
           if len(sys.argv) > 3 else [2, 3, 4])

from bench import _unstructured_matrix  # noqa: E402
from pysparselp_tpu import problem as pr  # noqa: E402
from pysparselp_tpu.ops import ell_routed as _er  # noqa: E402
from pysparselp_tpu.solvers.chambolle_pock import _fold_one_sided  # noqa: E402


def timed_chain(op, iters):
    """One jit: ``iters`` matvec+rmatvec pairs, scalar result."""
    def pair(x, _):
        y = op.matvec(x)
        x2 = op.rmatvec(y)
        return x2 / (jnp.max(jnp.abs(x2)) + 1.0), None

    @jax.jit
    def chain(x0):
        xf, _ = jax.lax.scan(pair, x0, None, length=iters)
        return jnp.sum(xf)

    return chain


def time_point(chain, x0, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(x0))
        ts.append(time.perf_counter() - t0)
    return ts


def main():
    a, b, c = _unstructured_matrix()
    a1, _ = _fold_one_sided(a.tocsr(), None, b)
    results = []
    for u in unrolls:
        _er._PLANE_UNROLL = u
        t0 = time.perf_counter()
        op = pr.ell_from_scipy(a1, dtype=jnp.float32, prefer="routed")
        build_s = time.perf_counter() - t0
        x0 = jnp.ones(a1.shape[1], jnp.float32)
        c1, c2 = timed_chain(op, n_iters), timed_chain(op, 2 * n_iters)
        t0 = time.perf_counter()
        float(c1(x0))  # compile 1
        float(c2(x0))  # compile 2
        compile_s = time.perf_counter() - t0
        ts1 = time_point(c1, x0, reps)
        ts2 = time_point(c2, x0, reps)
        pair_us = (np.median(ts2) - np.median(ts1)) / n_iters * 1e6
        planes = op.v.shape[0] + op.vt.shape[0]
        for chain in (op.coll, op.coll_t):
            planes += sum(stack[3].shape[0] for stack in chain or ())
        r = {
            "unroll": u, "build_s": round(build_s, 1),
            "compile_s": round(compile_s, 1),
            "t_n": [round(t, 3) for t in ts1],
            "t_2n": [round(t, 3) for t in ts2],
            "pair_us": round(float(pair_us), 1),
            "ns_per_plane": round(float(pair_us) * 1e3 / planes, 1),
            "planes_per_pair": int(planes),
            "nnz_padded": int(op.nnz_padded),
            "bytes_per_slot_at_932": round(
                float(pair_us) * 1e-6 * 932e9 / op.nnz_padded, 2),
        }
        print(json.dumps(r), flush=True)
        results.append(r)
        del op, c1, c2
    best = min(results, key=lambda r: r["pair_us"])
    print(json.dumps({"best_unroll": best["unroll"],
                      "best_pair_us": best["pair_us"]}))


if __name__ == "__main__":
    main()
