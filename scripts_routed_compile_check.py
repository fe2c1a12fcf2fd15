"""TPU check: the routed kernels compile and match the oracle on chip.

Small matrices, one single-tile case (fits 128x128) and one tiled case.
    PYTHONPATH=/root/repo:/root/.axon_site python scripts_routed_compile_check.py
"""
import json

import numpy as np
import scipy.sparse
import jax.numpy as jnp

from pysparselp_tpu.ops.ell_routed import RoutedEllMatrix


def check(m, n, density, seed, tag):
    rng = np.random.RandomState(seed)
    a = scipy.sparse.random(m, n, density=density, random_state=rng,
                            format="csr")
    a.data = rng.randn(a.nnz)
    op = RoutedEllMatrix.from_scipy(a, dtype=jnp.float32)
    x = rng.randn(n).astype(np.float32)
    y = rng.randn(m).astype(np.float32)

    # one jitted dispatch per direction: eager op-by-op execution costs
    # a remote compile round-trip PER OP over the axon tunnel
    import jax

    got, gott = map(np.asarray, jax.jit(
        lambda xx, yy: (op.matvec(xx) + 0.0, op.rmatvec(yy) + 0.0)
    )(jnp.asarray(x), jnp.asarray(y)))
    err = float(np.max(np.abs(got - a @ x)) / (np.abs(a @ x).max() + 1e-9))
    errt = float(np.max(np.abs(gott - a.T @ y))
                 / (np.abs(a.T @ y).max() + 1e-9))
    return {"tag": tag, "tiles": (op.tiles, op.tiles_t),
            "planes": (int(op.a.shape[0]), int(op.at.shape[0])),
            "rel_err": round(err, 7), "rel_err_t": round(errt, 7)}


if __name__ == "__main__":
    out = [
        check(3_000, 2_000, 0.002, 0, "single-tile"),
        check(40_000, 25_000, 3e-4, 1, "tiled"),
    ]
    print(json.dumps(out))
