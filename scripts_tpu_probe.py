"""TPU probe: windowed-kernel regimes at several Potts sizes.

Run ON the real chip (no JAX_PLATFORMS override). One process at a time.
Usage: python scripts_tpu_probe.py SIZE NB_ITER [x64]
"""
import json, sys, time
import numpy as np
import jax

size = int(sys.argv[1]) if len(sys.argv) > 1 else 300
nb_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
if len(sys.argv) > 3 and "x64" in sys.argv[3:]:
    jax.config.update("jax_enable_x64", True)  # bench.py parity
# (the windowed kernel is now the default beyond the fused budget)

from pysparselp_tpu.examples.potts import build_linear_program

lp, gt, idx, _ = build_linear_program(size, 0.5, 500)
kwargs = dict(method="chambolle_pock_ppd", nb_iter=nb_iter,
              nb_iter_plot=nb_iter // 2, dtype=np.float32)
t0 = time.perf_counter()
lp.solve(**kwargs)   # warmup/compile
t1 = time.perf_counter()
x, _ = lp.solve(**kwargs)
elapsed = lp.opttime_curve[-1] - lp.opttime_curve[0]
nit = lp.itrn_curve[-1] - lp.itrn_curve[0]
dist = float(np.mean(np.abs(gt - x[idx])))
print(json.dumps({
    "size": size, "rate_it_per_s": round(nit / elapsed, 1),
    "iter_us": round(elapsed / nit * 1e6, 2),
    "compile_s": round(t1 - t0, 1), "dist": dist,
}))
