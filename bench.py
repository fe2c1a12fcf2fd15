"""Benchmark driver: Potts 50×50 segmentation LP, CP-PPD iterations/second.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

This is the reference's headline qualitative benchmark
(``readme.md:90-93``: Potts convergence curves, 15 s per solver) made
quantitative per BASELINE.md's north star ("Potts segmentation LP iters/sec
per chip").  The baseline is the reference implementation's CP-PPD iteration
rate measured on THIS container's host CPU (same machine, same problem,
reference solver driven through its own API): 3716 iters/s
(56000 iterations / 15.1 s, converged to distance 0 from the graph cut).

This script runs on the default JAX device (the real TPU chip under the
driver) in float32, which also converges to distance 0 (the diagonal
preconditioner makes CP-PPD robust to f32 on this problem).

Backend note: the lowering's bytes-streamed cost model picks the Pallas
block-ELL backend with bf16-exact tile storage for this matrix (entries are
±1); measured ~56 µs per CP iteration on a v5e-1 in isolation, ~14.8k
iters/s through the full solve loop (~4× the reference on this host's CPU).
"""

import json
import time

import numpy as np


REFERENCE_CPU_ITERS_PER_SEC = 3716.4  # measured on this host, see docstring


def main():
    from pysparselp_tpu.examples.potts import build_linear_program

    lp, gt, idx, _ = build_linear_program(50, 0.5, 500)

    # warmup: compile both chunk shapes
    lp.solve(method="chambolle_pock_ppd", nb_iter=2000, nb_iter_plot=2000,
             dtype=np.float32)

    nb_iter = 200_000
    t0 = time.perf_counter()
    x, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=nb_iter,
                    nb_iter_plot=nb_iter, dtype=np.float32)
    elapsed = time.perf_counter() - t0
    rate = nb_iter / elapsed

    dist = float(np.mean(np.abs(gt - x[idx])))
    assert dist < 1e-2, f"benchmark run did not converge (dist={dist})"

    print(
        json.dumps(
            {
                "metric": "potts50_cp_ppd_iters_per_sec",
                "value": round(rate, 1),
                "unit": "iters/s",
                "vs_baseline": round(rate / REFERENCE_CPU_ITERS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
