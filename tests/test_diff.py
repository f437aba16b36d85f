"""Changeset application goldens (osmosis snapshot rules)."""

from pyspark.sql import Row


def test_apply_diff_golden(spark):
    from osm_hadoop_spark.operators.diff import apply_diff

    base = spark.createDataFrame(
        [Row(entity_id=1, version=1, visible=True, tag="a"),
         Row(entity_id=2, version=3, visible=True, tag="b"),
         Row(entity_id=3, version=1, visible=True, tag="c"),
         Row(entity_id=4, version=2, visible=True, tag="d")],
    )
    delta = spark.createDataFrame(
        [Row(entity_id=1, version=2, visible=True, tag="a2"),   # update
         Row(entity_id=2, version=4, visible=False, tag="b2"),  # delete
         Row(entity_id=4, version=1, visible=False, tag="old"), # stale: ignored
         Row(entity_id=5, version=1, visible=True, tag="new")], # create
    )
    got = {r["entity_id"]: (r["version"], r["tag"])
           for r in apply_diff(base, delta).collect()}
    assert got == {1: (2, "a2"), 3: (1, "c"), 4: (2, "d"), 5: (1, "new")}


def test_apply_diff_idempotent_tie(spark):
    """Equal version: the delta row wins, so re-applying a diff is a no-op."""
    from osm_hadoop_spark.operators.diff import apply_diff

    base = spark.createDataFrame([Row(entity_id=1, version=2, visible=True, tag="from_delta")])
    delta = spark.createDataFrame([Row(entity_id=1, version=2, visible=True, tag="delta_again")])
    got = apply_diff(base, delta).collect()
    assert len(got) == 1 and got[0]["tag"] == "delta_again"
