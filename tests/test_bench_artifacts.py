"""The committed scaling artifact must be regenerable from its archived
raw data — BENCH/BASELINE.md is tool output, not hand-edited prose."""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_baseline_md_matches_archived_run(tmp_path, monkeypatch):
    bench = _bench()
    with open(os.path.join(REPO, "BENCH", "scaling_run_latest.json")) as f:
        data = json.load(f)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md")) as f:
        committed = f.read()

    # re-render into a scratch REPO so the committed artifact isn't touched
    os.makedirs(tmp_path / "BENCH", exist_ok=True)
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    out = bench.write_baseline_md(data)

    with open(tmp_path / "BENCH" / "BASELINE.md") as f:
        rendered = f.read()
    assert rendered == committed

    # and the headline must genuinely clear the target from the data
    assert out["meets_target"] is True
    assert out["efficiency_min"] >= 0.8
