"""Netlib LP test-problem loader (reference ``pysparselp/netlib.py:35-73``).

Problems ship vendored under ``io/data/netlib`` (``.SIF``) with perPlex exact
solutions under ``io/data/perPlex`` (see ``io/data/README.md`` for
provenance).  Missing problems are fetched from the public mirrors when the
environment has network access.
"""

from __future__ import annotations

import gzip
import os

from .mps import mps_parser

_NETLIB_URL = "ftp://ftp.numerical.rl.ac.uk/pub/cuter/netlib/%s.SIF"
_PERPLEX_URL = "http://www.zib.de/koch/perplex/data/netlib/txt/%s.txt.gz"


def get_problem(problem_name, data_dir=None):
    """Load a netlib problem (+ perPlex exact solution when available).

    Returns the ``mps_parser`` dict with a ``solution`` entry.
    """
    here = data_dir or os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    netlib_folder = os.path.join(here, "netlib")
    sol_folder = os.path.join(here, "perPlex")
    os.makedirs(netlib_folder, exist_ok=True)
    os.makedirs(sol_folder, exist_ok=True)
    filename_lp = os.path.join(netlib_folder, problem_name.upper() + ".SIF")
    filename_sol = os.path.join(sol_folder, problem_name.lower() + ".txt")

    if not os.path.isfile(filename_lp):  # pragma: no cover - needs network
        import urllib.request

        urllib.request.urlretrieve(
            _NETLIB_URL % problem_name.upper(), filename_lp
        )
    if not os.path.isfile(filename_sol):  # pragma: no cover - needs network
        import urllib.request

        urllib.request.urlretrieve(
            _PERPLEX_URL % problem_name.lower(), filename_sol + ".gz"
        )
        with gzip.open(filename_sol + ".gz") as fgz, open(filename_sol, "wb") as f:
            f.write(fgz.read())

    with open(filename_lp) as file_lp:
        f_sol = open(filename_sol) if os.path.isfile(filename_sol) else None
        try:
            return mps_parser(file_lp, f_sol)
        finally:
            if f_sol is not None:
                f_sol.close()
