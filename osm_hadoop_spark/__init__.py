"""osm_hadoop_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing capabilities of
willtemperley/osm-hadoop (reference at /root/reference, Scala/Hadoop MRv2)
on the Spark SQL engine: DataFrame plans optimized by Catalyst, geometry
kernels as vectorized NumPy inside Arrow pandas UDFs (no per-row Python),
Iceberg-or-Parquet snapshot checkpoints instead of SequenceFile stages,
cell-partitioned tables instead of HBase.

Subpackages
-----------
functions   pure vectorized kernels: grid snap, Bresenham, tile/cell index,
            WKT codec, PIP / segment-box predicates (SURVEY.md section 2.6)
sources     interleaved-document span parsing + deterministic fixture
            generators + the snapshot catalog (SURVEY.md section 2.1)
operators   the operator inventory: way assembly (J1/J2), rasterize
            (E4/E5/A1-A3), tile spatial join (J3/A4/A6), zonal stats (A5),
            kNN (J6), dedup / text stats / similarity / multimodal
plans       staged pipeline with checkpoint / resume / lineage metrics
streaming   structured-streaming adapters (engine addition; reference has none)
"""

__version__ = "0.1.0"
