"""Static determinism lint (VERDICT r1 item 4, collect_list class).

``collect_list``/``collect_set`` produce arrays in partition-arrival
order — non-deterministic across runs and engines.  Any use that can
reach an oracle-checked output must sit under ``sort_array`` /
``array_sort`` (or be consumed by an order-insensitive fold).  This
test greps the package source so the class of bug cannot silently
reappear with a new query; genuinely order-insensitive consumers are
listed as explicit, commented exemptions.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "projectmapreduce_spark"

# file -> substrings of lines that are allowed to call collect_* bare.
EXEMPT = {
    # combine_by_key hands the collected bag to a caller-supplied fold;
    # its docstring requires the merge to be order-insensitive.
    "operators/mr.py": ["merge(F.collect_list(value))"],
    # W7 consumes the collected frame with size(array_distinct(...)) —
    # set cardinality is order-insensitive by construction.
    "queries/windows.py": ["F.size(F.array_distinct(F.collect_list"],
    # A16 merges two sketches: sort_array sits OUTSIDE the
    # flatten+distinct (sort_array(array_distinct(flatten(collect_list)))),
    # so the collected order is erased before anything order-sensitive.
    "queries/aggregates.py": [
        "F.sort_array(F.array_distinct(F.flatten(F.collect_list"
    ],
    # L2's array-based verify consumes the per-doc token set ONLY via
    # size() and size(array_intersect()) — set cardinalities are
    # order-insensitive by construction, and sorting every doc's token
    # array would add a per-doc O(n log n) the result cannot observe.
    "operators/dedup.py": ['F.collect_set("token").alias("toks")'],
}


def test_no_unsorted_collect_in_package():
    offenders: list[str] = []
    for py in sorted(PKG.rglob("*.py")):
        rel = py.relative_to(PKG).as_posix()
        for ln_no, raw in enumerate(py.read_text().splitlines(), 1):
            # Strip #-comments before matching: prose mentioning
            # collect_set is not a determinism hazard (r5 false positive
            # on a comment line in mr_surface.py).  Naive split is fine —
            # the package never embeds '#' inside a collect_* call line.
            line = raw.split("#", 1)[0]
            if not re.search(r"\bcollect_(list|set)\s*\(", line):
                continue
            if re.search(r"(sort_array|array_sort)\s*\(\s*F\.collect_(list|set)", line):
                continue
            if any(tag in line for tag in EXEMPT.get(rel, [])):
                continue
            offenders.append(f"{rel}:{ln_no}: {line.strip()}")
    assert not offenders, (
        "unsorted collect_list/collect_set (non-deterministic order can "
        "reach an oracle hash) — wrap in sort_array/array_sort or add an "
        "explicit exemption with a rationale:\n" + "\n".join(offenders)
    )
