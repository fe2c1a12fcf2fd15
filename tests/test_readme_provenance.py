"""README benchmark provenance is enforced structurally.

Rounds 3 and 4 both shipped READMEs whose benchmark numbers disagreed
with ``bench_details.json`` because the README cited a file the bench
driver rewrites after every round.  The fix: each driver capture is
archived verbatim as ``bench_details_rNN.json``, the README's whole
benchmark block is GENERATED from the one archive it cites
(``scripts_bench_table.py``), and this test asserts byte-equality
between the README block and a fresh render of the cited archive — so a
hand-edited number, an un-refreshed table, or a citation of the mutable
file fails CI.
"""

import json
import pathlib
import re
import sys

sys.path.insert(0, ".")

import scripts_bench_table as sbt  # noqa: E402

README = pathlib.Path("README.md")
END_MARKER = "<!-- BENCH_TABLE_END -->"


def _readme_block():
    readme = README.read_text()
    m = re.search(r"<!-- BENCH_TABLE_BEGIN source=(\S+) [^>]*-->", readme)
    assert m, "README.md is missing the BENCH_TABLE_BEGIN marker"
    start = readme.index(m.group(0))
    end = readme.index(END_MARKER) + len(END_MARKER)
    return m.group(1), readme[start:end]


def test_readme_cites_an_immutable_archive():
    archive, _ = _readme_block()
    # must be a round-archived capture, never the driver-rewritten
    # bench_details.json (citing the mutable file is the exact defect
    # this machinery exists to prevent)
    assert re.fullmatch(r"bench_details_r\d+\.json", archive), archive
    assert pathlib.Path(archive).exists(), f"cited archive {archive} missing"


def test_readme_block_is_a_fresh_render_of_the_cited_archive():
    archive, block = _readme_block()
    with open(archive) as f:
        rendered = sbt.render(json.load(f), archive)
    assert block == rendered, (
        "README benchmark block differs from the generated render of "
        f"{archive}; refresh with: python scripts_bench_table.py {archive}"
    )


def test_renderer_never_omits_captured_workloads():
    """Every per-workload speedup recorded in the cited archive appears
    in the rendered table — including the losing ones; omitting weak
    rows is the honesty failure the generated block exists to prevent."""
    archive, block = _readme_block()
    with open(archive) as f:
        d = json.load(f)
    for key, val in d.items():
        if key.endswith("_speedup"):
            assert f"**{val:g}×**" in block, (key, val)
