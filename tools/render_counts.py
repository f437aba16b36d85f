"""Render registry counts into the docs from the registry itself.

Round-3 verdict item 6: two commits that round existed only to re-correct
hand-maintained counts. The count now has ONE source of truth —
`len(queries())` — and the docs carry `<!--QCOUNT-->N<!--/QCOUNT-->` /
`<!--OCOUNT-->N<!--/OCOUNT-->` markers this tool rewrites in place.
`tests/test_doc_counts.py` pins docs == registry, so a stale count fails
the suite instead of needing a human to notice.

Usage: python tools/render_counts.py        # rewrite README.md, SURVEY.md
"""

from __future__ import annotations

import importlib.util
import re
import sys

REPO = "/root/repo"
DOCS = [f"{REPO}/README.md", f"{REPO}/SURVEY.md", f"{REPO}/PARITY.md"]


def registry_counts() -> tuple[int, int]:
    sys.path.insert(0, REPO)
    spec = importlib.util.spec_from_file_location(
        "entry_counts", f"{REPO}/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return len(m.queries()), len(m.oracle_sql())


def render(text: str, nq: int, no: int) -> str:
    text = re.sub(
        r"<!--QCOUNT-->\d+<!--/QCOUNT-->", f"<!--QCOUNT-->{nq}<!--/QCOUNT-->", text
    )
    return re.sub(
        r"<!--OCOUNT-->\d+<!--/OCOUNT-->", f"<!--OCOUNT-->{no}<!--/OCOUNT-->", text
    )


def main() -> None:
    nq, no = registry_counts()
    for path in DOCS:
        with open(path) as f:
            before = f.read()
        after = render(before, nq, no)
        if after != before:
            with open(path, "w") as f:
                f.write(after)
            print(f"updated {path}")
    print(f"registry: {nq} queries, {no} oracles")


if __name__ == "__main__":
    main()
