"""Executable twin of SCALING.md's sanctioned-collect inventory.

The r9 verdict found the doc claiming a "complete inventory" of three
driver-side ``.collect()`` sites while the package had six — a doc that
says complete and isn't trains readers to stop checking. This gate
greps the package source and fails BOTH ways:

- a ``.collect()`` site whose line (plus the line above, where the
  sanction comment usually lives) matches no sanctioned pattern is a
  new, unreviewed driver materialization → fail;
- a sanctioned pattern that no longer matches any site is inventory rot
  → fail, so the doc list and this list can never drift apart silently.

Driver-side pandas materializations (``.toPandas()`` /
``.toLocalIterator()``) are gated to ZERO call sites package-wide —
query results must stay distributed all the way to the caller.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "asyncdatapipeline_spark"

# (relative file, pattern matched against the collect line + up to 8
# lines above it, expected site count) — mirrors SCALING.md "Sanctioned
# driver-side collects". Patterns key on stable code context, not line
# numbers.
SANCTIONED: list[tuple[str, str, int]] = [
    # IVF quantizer: nlist-row seed fetch + nlist×d Lloyd sums (cached
    # per corpus) — both inside _ivf_centroids' bounded build.
    ("llm/similarity.py", r"limit\(_IVF_NLIST\)", 1),
    ("llm/similarity.py", r'F\.count\(F\.lit\(1\)\)\.alias\("n"\)', 1),
    # q_embed_spectral Gramian: d*d cells, data-independent.
    ("llm/similarity.py", r"d\*d cells", 1),
    # binaryFile demo-tree fixture build: 100 rows, once per corpus.
    ("operators/scans.py", r'select\("doc_id", "text"\)', 1),
    # json-array fixture build: 5 region rows, once per corpus.
    ("operators/scans.py", r"dimension-sized \(5 rows\)", 1),
    # CSV dialect sniff: ONE row of delimiter counts.
    ("operators/scans.py", r"1-row O\(1\) scalar", 1),
    # BFS seed: ONE row, min node id.
    ("operators/graph.py", r'F\.min\("src"\)\.alias\("s"\)', 1),
]


def _collect_sites() -> list[tuple[str, int, str]]:
    sites = []
    for py in sorted(PKG.rglob("*.py")):
        lines = py.read_text().splitlines()
        for i, ln in enumerate(lines):
            if ".collect()" in ln:
                # context = the collect line plus up to 8 lines above:
                # multi-line agg chains put the identifying expression
                # several lines before the terminal .collect()
                ctx = "\n".join(lines[max(0, i - 8): i + 1])
                sites.append((str(py.relative_to(PKG)), i + 1, ctx))
    return sites


def test_collect_inventory_is_complete_and_sanctioned():
    sites = _collect_sites()
    unsanctioned = []
    used = [0] * len(SANCTIONED)
    for rel, lineno, ctx in sites:
        for k, (f, pat, _n) in enumerate(SANCTIONED):
            if rel == f and re.search(pat, ctx):
                used[k] += 1
                break
        else:
            unsanctioned.append(f"{rel}:{lineno}: {ctx.strip()}")
    assert not unsanctioned, (
        "driver-side .collect() outside the sanctioned inventory "
        "(review for boundedness, then add to SCALING.md AND here):\n"
        + "\n".join(unsanctioned)
    )
    rotted = [
        f"{f} /{pat}/ expected {n} site(s), found {used[k]}"
        for k, (f, pat, n) in enumerate(SANCTIONED)
        if used[k] != n
    ]
    assert not rotted, "inventory rot (update SCALING.md + here):\n" + "\n".join(rotted)


def test_no_driver_pandas_materialization():
    offenders = []
    for py in sorted(PKG.rglob("*.py")):
        for i, ln in enumerate(py.read_text().splitlines(), 1):
            code = ln.split("#", 1)[0]
            if ".toPandas()" in code or ".toLocalIterator()" in code:
                offenders.append(f"{py.relative_to(PKG)}:{i}: {ln.strip()}")
    assert not offenders, (
        ".toPandas()/.toLocalIterator() in the package (query results "
        "must stay distributed):\n" + "\n".join(offenders)
    )
