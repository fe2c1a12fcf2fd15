"""TPU probe: where does the routed plane chain spend its time?

Times compute-only Pallas kernels (one resident tile set, no HBM plane
streams) over G grid steps, isolating the per-plane op cost of
candidate chain shapes:

  gather3_t2   3 lane gathers + 2 (128,128) transposes + mult-acc
               (the shipped routed chain)
  gather3      3 lane gathers + mult-acc (transposes removed — their
               cost is the difference vs gather3_t2)
  gather2_mm   2 lane gathers + 0/1-mask mult + f32-exact MXU matmul
               + mult-acc (the proposed matmul middle stage)
  mm_only      the masked matmul alone

Run ON the real chip, one process at a time:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts_chain_probe.py [STEPS]
"""
import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
Q = 128


def _dyn_gather(x, idx):
    dn = lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return lax.gather(x, idx.astype(jnp.int32)[..., None], dn, (1, 1),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def make_kernel(shape):
    def kernel(x_ref, a_ref, c_ref, v_ref, p_ref, o_ref):
        pi = pl.program_id(0)

        @pl.when(pi == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        x = x_ref[...]
        if shape == "gather3_t2":
            ta = _dyn_gather(x, a_ref[...])
            tb = _dyn_gather(ta.T, a_ref[...]).T
            g = _dyn_gather(tb, c_ref[...])
            o_ref[...] += v_ref[...] * g
        elif shape == "gather3":
            ta = _dyn_gather(x, a_ref[...])
            tb = _dyn_gather(ta, a_ref[...])
            g = _dyn_gather(tb, c_ref[...])
            o_ref[...] += v_ref[...] * g
        elif shape == "gather2_mm":
            ta = _dyn_gather(x, a_ref[...]) * v_ref[...]  # mask mult
            tb = jnp.dot(p_ref[...], ta,
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
            g = _dyn_gather(tb, c_ref[...])
            o_ref[...] += v_ref[...] * g
        elif shape == "mm_only":
            tb = jnp.dot(p_ref[...], x,
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
            o_ref[...] += tb
        else:
            raise ValueError(shape)

    return kernel


@functools.partial(jax.jit, static_argnames=("shape", "steps"))
def run(x, a, c, v, p, shape, steps):
    spec = pl.BlockSpec((Q, Q), lambda i: (0, 0))
    out = pl.pallas_call(
        make_kernel(shape),
        grid=(steps,),
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Q, Q), jnp.float32),
    )(x, a, c, v, p)
    return jnp.sum(out) + 0.0


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(Q, Q), jnp.float32)
    a = jnp.asarray(rng.randint(0, Q, (Q, Q)), jnp.int32)
    c = jnp.asarray(rng.randint(0, Q, (Q, Q)), jnp.int32)
    v = jnp.asarray((rng.rand(Q, Q) < 0.5), jnp.float32)
    # 0/1 selection matrix, one nonzero per row
    pm = np.zeros((Q, Q), np.float32)
    pm[np.arange(Q), rng.randint(0, Q, Q)] = 1.0
    p = jnp.asarray(pm)

    out = {}
    for shape in ("gather3_t2", "gather3", "gather2_mm", "mm_only"):
        t0 = time.perf_counter()
        float(run(x, a, c, v, p, shape, STEPS))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, a, c, v, p, shape, STEPS))
            times.append(time.perf_counter() - t0)
        out[shape] = {
            "ns_per_step": round(np.median(times) / STEPS * 1e9, 1),
            "compile_s": round(compile_s, 1),
        }
        print(shape, out[shape], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
