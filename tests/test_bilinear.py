"""Bilinear upsample (operators/resample_raster.py): hand-checked 2x2
patch, weight-sum completeness semantics, join-free plan shape."""


def _cells(spark, rows):
    return spark.createDataFrame(rows, "cx bigint, cy bigint, elev bigint")


def test_full_patch_hand_values(spark):
    from osm_hadoop_spark.operators.resample_raster import bilinear_upsample

    # 2x2 patch, k=2: fine pixels between samples average exactly
    df = _cells(spark, [(0, 0, 0), (1, 0, 8), (0, 1, 4), (1, 1, 12)])
    got = {(r["px"], r["py"]): r["val_num"]
           for r in bilinear_upsample(df, k=2).collect()}
    k2 = 4
    assert got[(0, 0)] == 0 * k2          # on-sample pixels reproduce input
    assert got[(2, 0)] == 8 * k2
    assert got[(1, 0)] == (0 + 8) * 2     # midpoint x: (v00+v10)/2 -> num
    assert got[(0, 1)] == (0 + 4) * 2
    assert got[(1, 1)] == 0 + 8 + 4 + 12  # center: 4-corner average
    # pixels needing the missing (2,*) column are absent
    assert (3, 0) not in got
    assert len(got) == 9  # the 3x3 fine pixels inside the 2x2 patch


def test_isolated_cell_emits_only_its_sample(spark):
    from osm_hadoop_spark.operators.resample_raster import bilinear_upsample

    df = _cells(spark, [(5, 5, 7)])
    got = {(r["px"], r["py"]): r["val_num"]
           for r in bilinear_upsample(df, k=3).collect()}
    # only the on-sample pixel is fully determined (wsum = 9 there only)
    assert got == {(15, 15): 7 * 9}


def test_plan_is_join_free_single_shuffle(spark):
    from osm_hadoop_spark.operators.resample_raster import bilinear_upsample

    df = _cells(spark, [(0, 0, 1)])
    plan = (
        bilinear_upsample(df, k=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") == 1  # the aggregate's only
