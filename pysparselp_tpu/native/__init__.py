"""Host-side native (C++) kernels: sequential algorithms kept off-device.

Two algorithm families in the framework are irreducibly sequential and run
as compiled C++ on the host, mirroring the reference's native surface
(its two Cython extensions — SURVEY.md §2):

* bounded Gauss-Seidel / SOR sweeps (:mod:`.gauss_seidel`), and
* interval constraint propagation with backtracking
  (:mod:`pysparselp_tpu.integer.propagation`).

Each compiles on first use with ``g++`` and loads through ctypes, with a
pure-numpy fallback when no toolchain is available.
"""

from .gauss_seidel import BoundedGaussSeidel, gauss_seidel

__all__ = ["gauss_seidel", "BoundedGaussSeidel"]
