"""Device-resident LP problem containers (the lowering boundary).

The reference keeps scipy CSR matrices live inside every solver loop
(e.g. ``pysparselp/ChambollePockPPD.py:195-342``).  On TPU the equivalent has
to be a statically-shaped, device-resident structure that XLA can compile
once.  The core container is :class:`EllMatrix`: a padded ELLPACK layout
stored in BOTH orientations —

* row-major ELL  ``(vals, cols)``  of shape ``(nrows, K)``  → ``A @ x`` is a
  gather of ``x`` followed by a VPU multiply-reduce;
* col-major ELL  ``(vals_t, rows_t)`` of shape ``(ncols, K_t)`` → ``yᵀA`` is a
  gather of ``y`` followed by a multiply-reduce.

Storing the transpose explicitly doubles memory but turns *both* SpMV
directions into pure gathers: no scatter-adds anywhere in the hot loops,
which is the right trade on TPU (gathers vectorize on the VPU; scatters
serialize).  Padding entries carry ``val = 0`` and index ``0`` so they
contribute nothing.

``LPProblem`` bundles the lowered model: costs, bounds, both constraint
systems and the inf-masking vectors.  It is a registered JAX pytree so it can
be passed straight through ``jit``/``shard_map``.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import scipy.sparse

import jax
import jax.numpy as jnp


def default_dtype():
    return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("vals", "cols", "vals_t", "rows_t"),
    meta_fields=("nrows", "ncols"),
)
@dataclasses.dataclass(frozen=True)
class EllMatrix:
    """Padded ELLPACK sparse matrix stored in both orientations."""

    vals: jax.Array  # (nrows, K)
    cols: jax.Array  # (nrows, K) int32
    vals_t: jax.Array  # (ncols, K_t)
    rows_t: jax.Array  # (ncols, K_t) int32
    nrows: int
    ncols: int

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    @property
    def nnz_padded(self):
        return self.vals.size

    def matvec(self, x: jax.Array) -> jax.Array:
        """``A @ x`` — gather + multiply-reduce along the ELL width."""
        return jnp.sum(self.vals * jnp.take(x, self.cols, axis=0), axis=1)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        """``Aᵀ @ y`` (= ``y @ A``) — gather + multiply-reduce via the stored transpose."""
        return jnp.sum(self.vals_t * jnp.take(y, self.rows_t, axis=0), axis=1)

    def abs_power_rowsum(self, p: float) -> jax.Array:
        """``sum_j |a_ij|^p`` per row (diagonal preconditioner building block,
        mirrors ``pysparselp/ChambollePockPPD.py:158-179``)."""
        return jnp.sum(jnp.abs(self.vals) ** p, axis=1)

    def abs_power_colsum(self, p: float) -> jax.Array:
        """``sum_i |a_ij|^p`` per column (``ChambollePockPPD.py:122-153``)."""
        return jnp.sum(jnp.abs(self.vals_t) ** p, axis=1)

    def to_dense(self) -> jax.Array:
        """Densify (small problems only): used by the MXU Cholesky paths."""
        out = jnp.zeros((self.nrows, self.ncols), dtype=self.vals.dtype)
        rows = jnp.broadcast_to(
            jnp.arange(self.nrows)[:, None], self.cols.shape
        )
        return out.at[rows, self.cols].add(self.vals)

    @staticmethod
    def from_scipy(a, dtype=None, pad_width_to: int = 1) -> "EllMatrix":
        """Lower a scipy sparse matrix to the dual-ELL device layout."""
        dtype = dtype or default_dtype()
        csr = scipy.sparse.csr_matrix(a)
        csc = csr.tocsc()
        nrows, ncols = csr.shape

        def _ell(indptr, indices, data, n_major, pad_to):
            cnt = np.diff(indptr)
            k = max(int(cnt.max()) if cnt.size else 0, 1)
            k = -(-k // pad_to) * pad_to
            vals = np.zeros((n_major, k), dtype=np.float64)
            idx = np.zeros((n_major, k), dtype=np.int32)
            # position of each nnz within its row: arange - indptr[row]
            if data.size:
                row_of = np.repeat(np.arange(n_major), cnt)
                pos = np.arange(data.size) - indptr[row_of]
                vals[row_of, pos] = data
                idx[row_of, pos] = indices
            return vals, idx

        vals, cols = _ell(csr.indptr, csr.indices, csr.data, nrows, pad_width_to)
        vals_t, rows_t = _ell(csc.indptr, csc.indices, csc.data, ncols, pad_width_to)
        return EllMatrix(
            vals=jnp.asarray(vals, dtype=dtype),
            cols=jnp.asarray(cols),
            vals_t=jnp.asarray(vals_t, dtype=dtype),
            rows_t=jnp.asarray(rows_t),
            nrows=nrows,
            ncols=ncols,
        )


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("c", "lb", "ub", "a_eq", "b_eq", "a_ineq", "b_lower", "b_upper"),
    meta_fields=("n", "m_eq", "m_ineq"),
)
@dataclasses.dataclass(frozen=True)
class LPProblem:
    """Statically-shaped device LP: min cᵀx, A_e x = b_e, bl ≤ A_i x ≤ bu, l ≤ x ≤ u.

    Empty constraint systems are represented as ``None`` (static pytree
    structure — solvers specialize at trace time, like the reference's
    ``a_eq is None`` branches, e.g. ``ChambollePockPPD.py:199-240``).
    """

    c: jax.Array
    lb: jax.Array
    ub: jax.Array
    a_eq: EllMatrix | None
    b_eq: jax.Array | None
    a_ineq: EllMatrix | None
    b_lower: jax.Array | None  # may contain -inf
    b_upper: jax.Array | None  # may contain +inf
    n: int
    m_eq: int
    m_ineq: int


def lower_lp(lp, dtype=None) -> LPProblem:
    """Lower a host :class:`~pysparselp_tpu.modeling.SparseLP` to the device."""
    dtype = dtype or default_dtype()

    def arr(x):
        return None if x is None else jnp.asarray(np.asarray(x, np.float64), dtype=dtype)

    a_eq = b_eq = None
    m_eq = 0
    if lp.a_equalities is not None and lp.a_equalities.shape[0] > 0:
        a_eq = EllMatrix.from_scipy(lp.a_equalities.tocsr(), dtype=dtype)
        b_eq = arr(lp.b_equalities)
        m_eq = a_eq.nrows
    a_ineq = b_lower = b_upper = None
    m_ineq = 0
    if lp.a_inequalities is not None and lp.a_inequalities.shape[0] > 0:
        a_ineq = EllMatrix.from_scipy(lp.a_inequalities.tocsr(), dtype=dtype)
        b_lower = arr(lp.b_lower)
        b_upper = arr(lp.b_upper)
        m_ineq = a_ineq.nrows
    return LPProblem(
        c=arr(lp.costsvector),
        lb=arr(lp.lower_bounds),
        ub=arr(lp.upper_bounds),
        a_eq=a_eq,
        b_eq=b_eq,
        a_ineq=a_ineq,
        b_lower=b_lower,
        b_upper=b_upper,
        n=int(lp.nb_variables),
        m_eq=m_eq,
        m_ineq=m_ineq,
    )
