"""End-to-end test of the spark-submit --py-files ship path.

Runs tools/submit.sh -> spark-submit --py-files <zip> jobs/s2_assign_job.py
as a REAL subprocess from a foreign cwd with PYTHONPATH scrubbed, so
`osm_hadoop_spark` can only come from the shipped zip — on the driver via
spark-submit's sys.path handling and on executor Python workers via file
distribution. This is the north rule's mandated launch mode, previously
only exercised indirectly through get_spark's addPyFile."""

from __future__ import annotations

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_ship(tmp_path):
    duckdb = pytest.importorskip("duckdb")
    from osm_hadoop_spark.functions import s2
    from osm_hadoop_spark.sources.fixtures import node_coords

    rows, level = 1500, 10
    out = tmp_path / "out"
    env = os.environ.copy()
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    env["MASTER"] = "local[4]"

    r = subprocess.run(
        [
            "bash",
            os.path.join(REPO, "tools", "submit.sh"),
            os.path.join(REPO, "jobs", "s2_assign_job.py"),
            "--rows",
            str(rows),
            "--level",
            str(level),
            "--output",
            str(out),
        ],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])

    got = duckdb.sql(
        f"SELECT s2_cell, n_nodes FROM read_parquet('{out}/*.parquet') ORDER BY s2_cell"
    ).fetchnumpy()

    # independent recomputation: doc d carries node d+1 at node_coords(id)
    ids = np.arange(1, rows + 1, dtype=np.uint64)
    lon, lat = node_coords(ids)
    exp_cells, exp_counts = np.unique(
        s2.cell_for_lonlat(lon, lat, level), return_counts=True
    )
    assert (got["s2_cell"].astype(np.int64) == exp_cells).all()
    assert (got["n_nodes"].astype(np.int64) == exp_counts).all()
