"""derive_diff: minimality + the apply_diff round-trip contract."""

import random


def _snap(spark, rows):
    return spark.createDataFrame(
        rows, "entity_id: long, version: long, tag: string"
    )


def test_classification_and_minimality(spark):
    from osm_hadoop_spark.operators.diff import derive_diff

    old = _snap(spark, [(1, 1, "a"), (2, 1, "b"), (3, 2, "c"), (4, 1, "d")])
    new = _snap(spark, [(1, 1, "a"),            # unchanged -> omitted
                        (2, 2, "b2"),           # modify (payload+version)
                        (3, 2, "c9"),           # modify (payload only)
                        (5, 1, "e")])           # create; 4 deleted
    got = {
        r["entity_id"]: (r["version"], r["visible"], r["tag"])
        for r in derive_diff(old, new).collect()
    }
    assert got == {
        2: (2, True, "b2"),
        3: (2, True, "c9"),
        4: (2, False, "d"),
        5: (1, True, "e"),
    }


def test_version_bump_without_payload_change_is_emitted(spark):
    from osm_hadoop_spark.operators.diff import derive_diff

    old = _snap(spark, [(1, 1, "a")])
    new = _snap(spark, [(1, 3, "a")])
    rows = derive_diff(old, new).collect()
    assert [(r["entity_id"], r["version"], r["visible"])
            for r in rows] == [(1, 3, True)]


def test_null_safe_payload_compare(spark):
    from osm_hadoop_spark.operators.diff import derive_diff

    old = _snap(spark, [(1, 1, None), (2, 1, None), (3, 1, "x")])
    new = _snap(spark, [(1, 1, None), (2, 1, "y"), (3, 1, None)])
    got = {r["entity_id"]: r["tag"] for r in derive_diff(old, new).collect()}
    assert got == {2: "y", 3: None}  # null==null is unchanged


def test_round_trip_random(spark):
    from pyspark.sql import functions as F

    from osm_hadoop_spark.operators.diff import apply_diff, derive_diff

    rng = random.Random(77)
    old_rows = [(i, rng.randint(1, 3), f"t{rng.randint(0, 5)}")
                for i in range(60)]
    new_rows = []
    for i, v, t in old_rows:
        r = rng.random()
        if r < 0.2:
            continue  # delete
        if r < 0.5:
            new_rows.append((i, v + 1, f"m{rng.randint(0, 5)}"))  # modify
        else:
            new_rows.append((i, v, t))  # unchanged
    new_rows += [(1000 + i, 1, "new") for i in range(7)]  # creates
    old = _snap(spark, old_rows)
    new = _snap(spark, new_rows)
    diff = derive_diff(old, new)
    result = apply_diff(old.withColumn("visible", F.lit(True)), diff)
    got = sorted(
        (r["entity_id"], r["version"], r["tag"])
        for r in result.select("entity_id", "version", "tag").collect()
    )
    assert got == sorted(new_rows)
