"""Ad-hoc (spark, sf_dir) -> DataFrame variants for `bench.py --ab`.

The --ab harness resolves `module:callable` specs; this module hosts
implementation variants kept around for interleaved same-JVM regression
measurement (the only trustworthy comparison on a host with multi-minute
5x performance windows — see BENCH/NOTES.md).
"""

from pyspark.sql import functions as F


def _load_entry(tag="entry_ab"):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        tag, "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _neardup_corpus(spark, sf_dir):
    import os

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    pert = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.zip_with(
            "embedding", F.reverse("embedding"), lambda x, y: x + 0.5 * y
        ).alias("embedding"),
    )
    return emb.unionByName(pert)


def _neardup(spark, sf_dir, mode):
    from osm_hadoop_spark.operators.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _neardup_corpus(spark, sf_dir),
        threshold_num=4, threshold_den=5, dim=64, n_planes=8,
        probe_mode=mode,
    )


def neardup_slim(spark, sf_dir):
    return _neardup(spark, sf_dir, "slim")


def neardup_explode(spark, sf_dir):
    return _neardup(spark, sf_dir, "explode")


def _s2_inputs(spark, sf_dir):
    import os

    from osm_hadoop_spark.operators.s2_join import regions_from_points, with_leaf_cell

    part = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    nodes = with_leaf_cell(part.select(
        F.col("p_partkey").alias("node_id"),
        (F.col("p_partkey") % 340 - 170).cast("double").alias("lon"),
        ((F.col("p_partkey") * 7) % 160 - 80).cast("double").alias("lat"),
    ))
    nat = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        F.col("n_nationkey").cast("bigint").alias("rid"),
        ((F.col("n_nationkey") * 77) % 340 - 170).cast("double").alias("lon"),
        ((F.col("n_nationkey") * 13) % 160 - 80).cast("double").alias("lat"),
        (F.lit(2) + F.col("n_nationkey") % 3).cast("int").alias("level"),
    )
    return nodes, regions_from_points(nat, "rid", "lon", "lat", "level")


def s2_contain_explode(spark, sf_dir):
    """Current: one pass, per-level parents exploded, single join."""
    from osm_hadoop_spark.operators.s2_join import s2_containment_join

    nodes, regions = _s2_inputs(spark, sf_dir)
    return s2_containment_join(nodes, regions, strategy="levels").groupBy(
        "region_id", "region_cell"
    ).agg(F.count(F.lit(1)).alias("n_nodes"))


def s2_contain_rescan(spark, sf_dir):
    """Round-3 initial shape: one join per level, each rescanning points."""
    nodes, regions = _s2_inputs(spark, sf_dir)
    levels = sorted(r["level"] for r in regions.select("level").distinct().collect())
    parts = []
    for lvl in levels:
        lsb = 1 << (2 * (30 - int(lvl)))
        parent = F.col("s2_leaf").bitwiseAND(F.lit(-lsb)).bitwiseOR(F.lit(lsb))
        parts.append(
            nodes.withColumn("region_cell", parent).join(
                regions.filter(F.col("level") == lvl).select("region_id", "region_cell"),
                "region_cell",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("region_id", "region_cell").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


def _mp_members(spark, sf_dir):
    m = _load_entry()
    import osm_hadoop_spark.operators.polygon_assembly as PA

    cap = {}

    class _Captured(Exception):
        pass

    def _grab(mem, strategy="map"):
        cap["m"] = mem
        raise _Captured()

    orig = PA.assemble_multipolygons
    try:
        PA.assemble_multipolygons = _grab
        m._q_multipolygon_assembly(spark, sf_dir)
    except _Captured:
        pass
    finally:
        PA.assemble_multipolygons = orig
    return cap["m"]


def mp_assemble_map(spark, sf_dir):
    """Partition-buffered mapInPandas multipolygon assembly (shipped)."""
    from osm_hadoop_spark.operators.polygon_assembly import assemble_multipolygons

    return assemble_multipolygons(_mp_members(spark, sf_dir), strategy="map")


def mp_assemble_group(spark, sf_dir):
    """Per-group applyInPandas multipolygon assembly (legacy A/B arm)."""
    from osm_hadoop_spark.operators.polygon_assembly import assemble_multipolygons

    return assemble_multipolygons(_mp_members(spark, sf_dir), strategy="group")


def _cover_ways(spark, sf_dir):
    return _load_entry()._ways_geom(spark, sf_dir)


def tile_cover_arrow(spark, sf_dir):
    """z5 envelope cover + per-way count, Arrow kernel path."""
    from pyspark.sql import functions as F

    from osm_hadoop_spark.operators.tile_join import assign_tiles

    a = assign_tiles(_cover_ways(spark, sf_dir), zoom=5, tms=False, refine=False)
    return a.groupBy("way_id").agg(F.count(F.lit(1)).alias("n_tiles"))


def tile_cover_jvm(spark, sf_dir):
    """z5 envelope cover + per-way count, whole-stage-codegen path."""
    from pyspark.sql import functions as F

    from osm_hadoop_spark.operators.tile_join import assign_tiles

    a = assign_tiles(_cover_ways(spark, sf_dir), zoom=5, tms=False,
                     refine=False, cover_impl="jvm")
    return a.groupBy("way_id").agg(F.count(F.lit(1)).alias("n_tiles"))


def _pip_inputs(spark, sf_dir):
    return _load_entry()


def pip_grid(spark, sf_dir):
    """point-in-multipolygon, computable-grid equi-join path (shipped)."""
    return _pip_inputs(spark, sf_dir)._q_pip_multipolygon(spark, sf_dir)


def pip_broadcast(spark, sf_dir):
    """point-in-multipolygon, BroadcastNestedLoopJoin envelope path."""
    import osm_hadoop_spark.operators.polygon_join as PJ

    m = _pip_inputs(spark, sf_dir)
    orig = PJ.point_multipolygon_join
    try:
        PJ.point_multipolygon_join = (
            lambda pts, polys, strategy="grid", cell_size=32.0:
            orig(pts, polys, strategy="broadcast")
        )
        return m._q_pip_multipolygon(spark, sf_dir)
    finally:
        PJ.point_multipolygon_join = orig


def dbscan_star(spark, sf_dir):
    """grid DBSCAN, dense-cell contraction path (shipped default)."""
    from osm_hadoop_spark.operators.clustering import dbscan

    m = _load_entry()
    return dbscan(m._dbscan_points(spark, sf_dir), 40, 5, dense_cells="star")


def dbscan_pairs(spark, sf_dir):
    """grid DBSCAN, naive eps-grid pair enumeration (A/B baseline)."""
    from osm_hadoop_spark.operators.clustering import dbscan

    m = _load_entry()
    return dbscan(m._dbscan_points(spark, sf_dir), 40, 5, dense_cells="pairs")


def _focal_cells(spark, sf_dir):
    m = _load_entry()
    return (
        m._dbscan_points(spark, sf_dir)
        .groupBy(
            F.floor(F.col("x").cast("double") / m._KDE_CELL).cast("bigint").alias("cx"),
            F.floor(F.col("y").cast("double") / m._KDE_CELL).cast("bigint").alias("cy"),
        )
        .agg(F.count(F.lit(1)).alias("v"))
    )


def _focal(spark, sf_dir, strategy):
    from osm_hadoop_spark.operators.focal import focal_stats

    return focal_stats(_focal_cells(spark, sf_dir), k=1, strategy=strategy)


def focal_separable(spark, sf_dir):
    """focal stats, two 1-D passes (shipped default)."""
    return _focal(spark, sf_dir, "separable")


def focal_direct(spark, sf_dir):
    """focal stats, one (2k+1)^2 explode (A/B baseline)."""
    return _focal(spark, sf_dir, "direct")


def focal_separable_k3(spark, sf_dir):
    """focal stats k=3 (7x7), two 1-D passes."""
    from osm_hadoop_spark.operators.focal import focal_stats

    return _focal_cells(spark, sf_dir).transform(
        lambda df: focal_stats(df, k=3, strategy="separable")
    )


def focal_direct_k3(spark, sf_dir):
    """focal stats k=3 (7x7), one 49-way explode."""
    from osm_hadoop_spark.operators.focal import focal_stats

    return _focal_cells(spark, sf_dir).transform(
        lambda df: focal_stats(df, k=3, strategy="direct")
    )



def _suffix_docs(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", F.substring("text", 1, 128).alias("text")
    )


def suffix_window(spark, sf_dir):
    """prefix doubling, position-count ranks + class window (shipped)."""
    from osm_hadoop_spark.operators.suffix import suffix_ranks

    return suffix_ranks(_suffix_docs(spark, sf_dir), impl="window")


def suffix_legacy(spark, sf_dir):
    """prefix doubling, per-round dense ranks (A/B baseline)."""
    from osm_hadoop_spark.operators.suffix import suffix_ranks

    return suffix_ranks(_suffix_docs(spark, sf_dir), impl="legacy")



def _cover_grams(spark, sf_dir):
    import os

    from osm_hadoop_spark.operators.selection import word_gram_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return word_gram_pairs(docs, n=3)


def cover_exact(spark, sf_dir):
    """exact greedy cover, k full scans (shipped oracle semantics)."""
    from osm_hadoop_spark.operators.selection import greedy_cover

    return greedy_cover(_cover_grams(spark, sf_dir), k=8)


def cover_stochastic(spark, sf_dir):
    """stochastic-greedy (Lazier Than Lazy Greedy), 25% candidate sample."""
    from osm_hadoop_spark.operators.selection import stochastic_greedy_cover

    return stochastic_greedy_cover(_cover_grams(spark, sf_dir), k=8,
                                   sample_frac=0.25)
