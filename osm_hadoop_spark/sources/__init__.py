"""Sources & sinks: interleaved-document span parsing, fixture generators,
and the snapshot catalog (Iceberg when available, Parquet-snapshot fallback).

Replaces the reference's SequenceFile stage files (S3/S4/S7) and HBase sinks
(S10) with snapshot-tracked tables (SURVEY.md section 2.1).
"""
