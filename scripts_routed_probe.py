"""TPU probe: calibrate the routed gather-ELL per-slot cost on chip.

Times matvec+rmatvec pairs of the RoutedEllMatrix built for the bench's
unstructured 150k x 100k / 1.95M-nnz workload (the matrix the backend
exists for), plus the segmented-ELL fallback the chooser would otherwise
pick, and derives the effective bytes-per-padded-slot constant
(``ops/ell_routed.ROUTED_ELL_BYTES_PER_SLOT``).

Run ON the real chip, one process at a time:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts_routed_probe.py \
        [ITERS] [routed|fallback|both] [UNROLL]

The second arg selects which backend(s) to time (default ``both``) —
operationally important on the tunneled chip: timing one backend per
process keeps each dispatch chain short (long dispatches can kill the
tunneled worker) and isolates a crash to the backend that caused it.
The third arg overrides ``_PLANE_UNROLL`` (chains per tiled-kernel grid
step) so the unroll sweep runs without editing the module.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
which = sys.argv[2] if len(sys.argv) > 2 else "both"

if len(sys.argv) > 3:
    from pysparselp_tpu.ops import ell_routed as _er
    _er._PLANE_UNROLL = int(sys.argv[3])

from bench import _unstructured_matrix  # noqa: E402
from pysparselp_tpu import problem as pr  # noqa: E402
from pysparselp_tpu.solvers.chambolle_pock import _fold_one_sided  # noqa: E402


def time_op(op, iters, tag):
    """Median-of-3 per-pair time of a jitted matvec/rmatvec scan chain."""
    m, n = op.shape
    x0 = jnp.asarray(np.random.RandomState(0).rand(n), jnp.float32)

    @jax.jit
    def chain(x):
        def body(x, _):
            y = op.matvec(x)
            x2 = op.rmatvec(y)
            # keep magnitudes bounded so the loop can't overflow
            x2 = x2 / (jnp.max(jnp.abs(x2)) + 1.0)
            return x2, ()

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out) + 0.0  # scalar fetch syncs the dispatch

    t0 = time.perf_counter()
    float(chain(x0))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(x0))
        times.append(time.perf_counter() - t0)
    per_pair = float(np.median(times)) / iters
    return {
        "tag": tag, "compile_s": round(compile_s, 1),
        "run_s": [round(t, 3) for t in times],
        "pair_us": round(per_pair * 1e6, 1),
        "nnz_padded": int(op.nnz_padded),
    }


def main():
    a, b, c = _unstructured_matrix()
    a1, _ = _fold_one_sided(a.tocsr(), None, b)
    results = {}

    if which in ("both", "routed"):
        t0 = time.perf_counter()
        op_r = pr.ell_from_scipy(a1, dtype=jnp.float32, prefer="routed")
        build_s = time.perf_counter() - t0
        r = time_op(op_r, iters, "routed")
        r["build_s"] = round(build_s, 1)
        # effective bytes per padded slot so the streamed-bytes model
        # prices a routed pair at its measured wall clock (932 GB/s HBM
        # observed ceiling; see bench.HBM_OBSERVED_CEILING_GBS)
        r["bytes_per_slot_at_932"] = round(
            r["pair_us"] * 1e-6 * 932e9 / r["nnz_padded"], 2)
        planes = op_r.v.shape[0] + op_r.vt.shape[0]
        for chain in (op_r.coll, op_r.coll_t):
            planes += sum(stack[3].shape[0] for stack in chain or ())
        r["planes_per_pair"] = int(planes)
        results["routed"] = r
        del op_r

    if which in ("both", "fallback"):
        op_f = pr.ell_from_scipy(a1, dtype=jnp.float32)
        r = time_op(op_f, iters, type(op_f).__name__)
        r["bytes_per_nnz_at_932"] = round(
            r["pair_us"] * 1e-6 * 932e9 / (2 * a1.nnz), 2)
        results["fallback"] = r

    print(json.dumps(results))


if __name__ == "__main__":
    main()
