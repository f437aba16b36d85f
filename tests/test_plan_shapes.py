"""Mechanical plan-shape guards for the measured perf claims (PARITY.md).

Each claim that a query has a specific physical shape is asserted from the
explain output, so a regression that silently re-plans (extra Exchange, a
Python stage sneaking into a codegen path, a fallback to the nested-loop
join) fails CI instead of only showing up as a bench delta.
"""

import importlib.util

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "entry_planshapes", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_multipolygon_assembly_single_exchange(spark, entry):
    import re

    plan = _plan(spark, entry.queries()["multipolygon_assembly"](spark, SF_DIR))
    # one shuffle total: the repartition(rel_id) feeding the Python kernel
    # (formatted explain prints every node twice — tree + detail — so count
    # only the numbered detail headers)
    shuffles = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(shuffles) == 1, plan


def test_pip_grid_plan_is_keyed(spark, entry):
    plan = _plan(spark, entry.queries()["pip_multipolygon_holes"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Generate" in plan  # the sequence-explode zone cover


def test_jvm_cover_has_no_python_stage(spark, entry):
    plan = _plan(spark, entry.queries()["tile_cover_jvm_z5"](spark, SF_DIR))
    for node in ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas",
                 "BatchEvalPython"):
        assert node not in plan, (node, plan)


def test_jvm_point_cells_have_no_python_stage(spark, entry):
    plan = _plan(spark, entry.queries()["tile_point_jvm_z14"](spark, SF_DIR))
    for node in ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas",
                 "BatchEvalPython"):
        assert node not in plan, (node, plan)


NO_PYTHON = ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas",
             "BatchEvalPython")


def test_asof_join_single_data_exchange_no_python(spark, entry):
    import re

    plan = _plan(spark, entry.queries()["asof_join_events"](spark, SF_DIR))
    for node in NO_PYTHON:
        assert node not in plan, (node, plan)
    # exactly two shuffles: the right-side (user, ts) dedupe agg and the
    # union->window key exchange; the operator itself adds only the latter
    shuffles = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(shuffles) == 2, plan
    assert "Window" in plan


def test_bm25_no_python_and_broadcast_scalars(spark, entry):
    plan = _plan(spark, entry.queries()["bm25_topk_terms"](spark, SF_DIR))
    for node in NO_PYTHON:
        assert node not in plan, (node, plan)
    assert "BroadcastExchange" in plan  # corpus scalars + slim dims


def test_polygon_fill_no_python(spark, entry):
    plan = _plan(spark, entry.queries()["polygon_fill_spans"](spark, SF_DIR))
    for node in NO_PYTHON:
        assert node not in plan, (node, plan)
    assert "Generate" in plan  # edge + scanline explodes


def test_sq8_no_python_corpus_not_shuffled(spark, entry):
    plan = _plan(spark, entry.queries()["ann_sq8_topk"](spark, SF_DIR))
    for node in NO_PYTHON:
        assert node not in plan, (node, plan)
    # quantizer state and query side arrive by broadcast
    assert "BroadcastExchange" in plan


def test_interval_join_is_equi_not_nested_loop(spark, entry):
    plan = _plan(spark, entry.queries()["interval_join_events"](spark, SF_DIR))
    for node in NO_PYTHON:
        assert node not in plan, (node, plan)
    # the whole point: the overlap join runs as a hash equi-join on
    # (key, bucket), never as a nested-loop/cartesian theta join
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_flagship_entry_has_zero_python_stages(spark, entry):
    """Round-4: the whole flagship (span parse -> assembly -> z14 cover+
    refine -> counts) runs without a single Python worker — the refine is
    segment-explode codegen (tiles_sql.sql_segment_box_hit), the parse is
    from_json, the assembly native groupBy."""
    plan = _plan(spark, entry.entry(spark))
    for node in NO_PYTHON:
        assert node not in plan, (node, plan)


def test_jvm_refine_query_has_zero_python_stages(spark, entry):
    plan = _plan(spark, entry.queries()["tile_refine_jvm_z10"](spark, SF_DIR))
    for node in NO_PYTHON:
        assert node not in plan, (node, plan)


def test_jvm_buffered_cover_has_zero_python_stages(spark, entry):
    """Round 5: the z13 buffered path runs zero-Python through
    cover_impl='jvm' (verdict item 4)."""
    plan = _plan(spark, entry.queries()["buffered_cover_jvm_z13"](spark, SF_DIR))
    for node in NO_PYTHON:
        assert node not in plan, (node, plan)


def test_codegen_wkt_assembly_has_zero_python_stages(spark, entry):
    """way_assembly_wkt now renders WKT via geometry_sql (default
    impl='jvm'): the full J1+J2+E1 chain is Python-free."""
    plan = _plan(spark, entry.queries()["way_assembly_wkt"](spark, SF_DIR))
    for node in NO_PYTHON:
        assert node not in plan, (node, plan)
