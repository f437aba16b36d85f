"""Docs carry registry counts only through render-time markers
(tools/render_counts.py); this pin makes a drifted count a test failure
instead of a doc-review finding (round-3 verdict item 6)."""

import re

from tools.render_counts import DOCS, registry_counts


def test_doc_counts_match_registry():
    nq, no = registry_counts()
    found_q = found_o = 0
    for path in DOCS:
        with open(path) as f:
            text = f.read()
        for m in re.finditer(r"<!--QCOUNT-->(\d+)<!--/QCOUNT-->", text):
            found_q += 1
            assert int(m.group(1)) == nq, (path, m.group(0))
        for m in re.finditer(r"<!--OCOUNT-->(\d+)<!--/OCOUNT-->", text):
            found_o += 1
            assert int(m.group(1)) == no, (path, m.group(0))
    # the markers themselves must exist (deleting them would un-pin docs)
    assert found_q >= 3 and found_o >= 2


def test_no_unmarked_registry_count_claims():
    """Any bare 'NNN driver queries' claim outside a marker would drift
    silently — forbid the phrase unless marker-wrapped."""
    for path in DOCS:
        with open(path) as f:
            text = f.read()
        for m in re.finditer(r"(\d{3,})\s+driver queries", text):
            start = max(0, m.start() - 40)
            ctx = text[start : m.end()]
            assert "<!--QCOUNT-->" in ctx, (path, ctx)
