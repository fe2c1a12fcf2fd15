"""Benchmark driver. Prints ONE JSON line {metric, value, unit, vs_baseline}.

Headline metric (BASELINE.md north star #1): **netlib SC105 time-to-tolerance**
— wall-clock seconds for the flagship first-order solver to reach mean-abs
distance < 1e-3 from the perPlex-certified exact optimum, on the real TPU
chip, using the accelerated CP-PPD (PDLP-style primal weight + adaptive
restarts; reference-faithful mode stays default elsewhere).

Baseline: the reference implementation's CP-PPD driven through its own API on
THIS container's host CPU (pysparselp/ChambollePockPPD.py with py3.12 shims
``time.clock = time.perf_counter``): reaches dist<1e-3 at **19.28 s**
(280k iterations; re-measure with the snippet in bench_details.json).
``vs_baseline`` = baseline_seconds / our_seconds (higher is better).

Also measured and written to ``bench_details.json``: the Potts 50×50
segmentation CP-PPD iteration rate (north star #2), vs the reference's rate
on this host CPU (3716 iters/s, converged to the graph-cut optimum).
"""

import json
import time

import jax
import numpy as np

# SC105 runs in f64 (emulated on TPU, but this tiny problem is
# dispatch/overhead-bound, and f64 restart dynamics converge in ~2.5x fewer
# iterations than f32); Potts below explicitly requests float32.
jax.config.update("jax_enable_x64", True)

REF_SC105_TIME_TO_1E3 = 19.28   # seconds, reference CP-PPD on this host CPU
REF_POTTS_ITERS_PER_SEC = 3716.4  # reference CP-PPD on this host CPU
# reference CP-PPD on this host CPU at Potts-300 (1.08M nnz), measured via
# its own API (py3.12 shims), rate from (600-100) iteration wall-clock delta
REF_POTTS300_ITERS_PER_SEC = 71.4
# reference CP-PPD on this host CPU at Potts-500 (3.0M nnz), measured the
# same way (wall-clock delta between nb_max_iter=60 and =180 runs)
REF_POTTS500_ITERS_PER_SEC = 46.6


def _sc105_lp():
    import copy

    from pysparselp_tpu import SparseLP
    from pysparselp_tpu.io.netlib import get_problem

    d = get_problem("SC105")
    gt = d["solution"]
    lp = SparseLP()
    lp.add_variables_array(
        len(d["cost_vector"]), lower_bounds=d["lower_bounds"],
        upper_bounds=np.minimum(d["upper_bounds"], np.max(gt) * 2),
        costs=d["cost_vector"],
    )
    lp.add_equality_constraints_sparse(d["a_eq"], d["b_eq"])
    lp.add_inequality_constraints_sparse(d["a_ineq"], d["b_lower"],
                                         d["b_upper"])
    lp2 = copy.deepcopy(lp)
    lp2.convert_to_one_sided_inequality_system()
    return lp2, gt


def measure_sc105(tol=1e-3):
    lp, gt = _sc105_lp()
    # f32 + the dense whole-iteration fused kernel (ops/cp_fused): the
    # restart trajectory needs ~5x the f64 iteration count but each
    # iteration is ~20x cheaper than f64 emulation; device restart checks
    # every 4000 iterations, a single metrics checkpoint (each host fetch
    # costs ~0.15 s over the tunnel).  f32 converges to dist ~2e-4,
    # comfortably under the 1e-3 tolerance.
    kwargs = dict(method="chambolle_pock_ppd", nb_iter=72000,
                  nb_iter_plot=72000, restart="average", restart_period=4000,
                  dtype=np.float32, ground_truth=gt,
                  ground_truth_indices=np.arange(len(gt)))
    lp.solve(**kwargs)  # warmup: compile
    lp.solve(**kwargs)
    dists = np.asarray(lp.distance_to_ground_truth)
    below = np.nonzero(dists < tol)[0]
    assert below.size, f"did not reach tol={tol}; best {dists.min()}"
    t = float(lp.opttime_curve[below[0]])
    return t, int(lp.itrn_curve[below[0]])


def _dia_roofline(lp, elapsed_per_iter):
    """Roofline accounting for the lowered flagship operator.  Since the
    whole-iteration fused kernel (ops/cp_fused) keeps the problem
    VMEM-resident, HBM bytes/iteration ~ 0 and the binding roofline is the
    VPU shift-multiply work — the calibrated 9-bytes/entry-equivalent model
    of the DIA kernel.  Reports measured iteration time against that floor
    plus what streaming the values would have cost."""
    import jax.numpy as jnp

    from pysparselp_tpu.problem import aligned_offset_count, dia_cost_bytes
    from pysparselp_tpu.solvers.chambolle_pock import _fold_one_sided

    a, _ = _fold_one_sided(lp.a_inequalities.tocsr(), lp.b_lower, lp.b_upper)
    counts, m_new, n_new = aligned_offset_count([None, a])
    nd, mn = counts[1], m_new[1]
    # bf16 storage (Potts coefficients are bf16-exact); kernel pads ndiag
    # to a multiple of 8 and rows to lane tiles
    nd_pad = -(-nd // 8) * 8
    bytes_if_streamed = nd_pad * (mn + n_new) * 2
    model_bytes = dia_cost_bytes(nd, mn, n_new, 2, jnp.bfloat16)
    model_s = model_bytes / 600e9
    return {
        "regime": "fused-vmem-resident",
        "ndiag": nd,
        "hbm_bytes_per_iter_if_streamed": int(bytes_if_streamed),
        "op_bound_model_us": round(model_s * 1e6, 2),
        "measured_iter_us": round(elapsed_per_iter * 1e6, 2),
        "frac_of_op_bound_roofline": round(model_s / elapsed_per_iter, 3),
    }


def measure_potts():
    from pysparselp_tpu.examples.potts import build_linear_program

    lp, gt, idx, _ = build_linear_program(50, 0.5, 500)
    nb_iter = 200_000
    # steady-state rate from the curve timestamps between the first and
    # last checkpoint: excludes compile and the one-time lowering/presolve
    # (the reference baseline rate was measured the same way)
    kwargs = dict(method="chambolle_pock_ppd", nb_iter=nb_iter,
                  nb_iter_plot=50_000, dtype=np.float32)
    lp.solve(**kwargs)  # warmup: compile the chunk shape
    x, _ = lp.solve(**kwargs)
    elapsed = lp.opttime_curve[-1] - lp.opttime_curve[0]
    nb_iter = lp.itrn_curve[-1] - lp.itrn_curve[0]
    dist = float(np.mean(np.abs(gt - x[idx])))
    assert dist < 1e-2, f"Potts run did not converge (dist={dist})"
    roofline = _dia_roofline(lp, elapsed / nb_iter)

    # secondary: wall-clock to reach the graph-cut optimum with the
    # accelerated mode (reference: 15.1 s / 56k iterations on this host CPU).
    # Device restart checks stay at a 4000-iteration period; host metric
    # chunks are 3x larger because each host fetch costs ~0.1-0.2 s over
    # the tunnel and would otherwise dominate the measurement.
    kwargs = dict(method="chambolle_pock_ppd", nb_iter=36000,
                  nb_iter_plot=12000, restart_period=4000,
                  restart="average", dtype=np.float32,
                  ground_truth=gt, ground_truth_indices=idx)
    lp.solve(**kwargs)
    lp.solve(**kwargs)
    dists = np.asarray(lp.distance_to_ground_truth)
    below = np.nonzero(dists < 1e-2)[0]
    t_conv = float(lp.opttime_curve[below[0]]) if below.size else None
    return nb_iter / elapsed, t_conv, roofline


def measure_potts_scale(size, nb_iter=20_000):
    """Scale benchmark: Potts-``size`` steady-state CP iteration rate on
    the chip vs the reference's rate on this host CPU.  Returns
    ``(rate, roofline_dict)``; at these sizes the operator streams from
    HBM every iteration (per-op regime), so the roofline combines the HBM
    bytes and the VPU op-bound model."""
    from pysparselp_tpu.examples.potts import build_linear_program

    lp, gt, idx, _ = build_linear_program(size, 0.5, 500)
    kwargs = dict(method="chambolle_pock_ppd", nb_iter=nb_iter,
                  nb_iter_plot=nb_iter // 2, dtype=np.float32)
    lp.solve(**kwargs)  # warmup: compile
    lp.solve(**kwargs)
    elapsed = lp.opttime_curve[-1] - lp.opttime_curve[0]
    nit = lp.itrn_curve[-1] - lp.itrn_curve[0]
    roof = _dia_roofline(lp, elapsed / nit)
    roof["regime"] = "per-op-streamed"
    return nit / elapsed, roof


def main():
    sc105_t, sc105_iters = measure_sc105()
    details = {
        "sc105_time_to_dist1e-3_s": round(sc105_t, 3),
        "sc105_iterations": sc105_iters,
        "sc105_ref_cpu_s": REF_SC105_TIME_TO_1E3,
        "potts50_ref_cpu_iters_per_sec": REF_POTTS_ITERS_PER_SEC,
        "potts50_ref_cpu_time_to_graphcut_s": 15.1,
    }
    # secondary measurements must not kill the primary metric
    try:
        potts_rate, potts_t_conv, roofline = measure_potts()
        details["potts50_roofline"] = roofline
        details.update({
            "potts50_iters_per_sec": round(potts_rate, 1),
            "potts50_speedup": round(potts_rate / REF_POTTS_ITERS_PER_SEC,
                                     2),
            "potts50_time_to_graphcut_restart_s": (
                None if potts_t_conv is None else round(potts_t_conv, 3)
            ),
        })
    except Exception as e:  # pragma: no cover - hardware flake guard
        details["potts50_error"] = repr(e)
    try:
        rate300, roof300 = measure_potts_scale(300)
        details.update({
            "potts300_nnz": 1_076_400,
            "potts300_iters_per_sec": round(rate300, 1),
            "potts300_ref_cpu_iters_per_sec": REF_POTTS300_ITERS_PER_SEC,
            "potts300_speedup": round(rate300 / REF_POTTS300_ITERS_PER_SEC,
                                      1),
            "potts300_roofline": roof300,
        })
    except Exception as e:  # pragma: no cover - hardware flake guard
        details["potts300_error"] = repr(e)
    try:
        rate500, roof500 = measure_potts_scale(500, nb_iter=10_000)
        details.update({
            "potts500_nnz": 2_994_000,
            "potts500_iters_per_sec": round(rate500, 1),
            "potts500_ref_cpu_iters_per_sec": REF_POTTS500_ITERS_PER_SEC,
            "potts500_speedup": round(rate500 / REF_POTTS500_ITERS_PER_SEC,
                                      1),
            "potts500_roofline": roof500,
        })
    except Exception as e:  # pragma: no cover - hardware flake guard
        details["potts500_error"] = repr(e)
    details.update({
        "reference_remeasure": (
            "sys.path.insert(0,'/root/reference'); "
            "time.clock=time.perf_counter; np.float=float; "
            "run pysparselp.ChambollePockPPD.chambolle_pock_ppd on the same "
            "SC105 system with a distance-tracking callback"
        ),
    })
    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=1)
    print(
        json.dumps(
            {
                "metric": "netlib_sc105_time_to_dist1e-3",
                "value": round(sc105_t, 3),
                "unit": "s",
                "vs_baseline": round(REF_SC105_TIME_TO_1E3 / sc105_t, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
