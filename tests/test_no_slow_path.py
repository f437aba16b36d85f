"""CI guard from SURVEY.md section 7's risk register: no per-row Python in
the engine. The only sanctioned extension forms are Arrow-vectorized
(pandas_udf / applyInPandas / mapInPandas, SURVEY.md section 2.7); row-wise
`F.udf`, RDD transformations, and driver-side collect loops are forbidden
in the library (fixtures/catalog drivers excepted where noted)."""

import os
import re

PKG = os.path.join(os.path.dirname(__file__), "..", "osm_hadoop_spark")

FORBIDDEN = [
    # row-at-a-time Python UDFs (pandas_udf is fine — different call)
    re.compile(r"\bF\.udf\s*\("),
    re.compile(r"(?<!pandas_)\budf\s*\(\s*lambda"),
    # RDD surface
    re.compile(r"\.rdd\b"),
    re.compile(r"\bsc\.parallelize\b"),
    re.compile(r"\bflatMap\b|\bmapPartitions\b"),
]

# driver-side materialization is allowed ONLY in these modules (bounded
# outputs: raster assembly S9, snapshot metadata, fixture generation,
# uniqueness assertions, IVF sample fit, shapefile export S11 — the
# reference's ShapeWriter also accumulates features driver-side;
# s2_join.py collects only the distinct region LEVELS, <= 31 rows;
# sketch.py collects only the bloom word table, m_bits/64 bigints — a
# config-sized constant embedded as a literal predicate;
# clustering.py's kmeans_lloyd collects k centroid rows per round —
# O(k * dims) per pass, the same bounded shape as the IVF sample fit;
# bpe.py's bpe_train collects exactly ONE argmax row per merge round
# via .limit(1) — a learned-parameter fetch, never corpus data;
# linalg.py's pca_top_eigen collects the d^2/2 moment rows — learned
# parameters bounded by the embedding dimension)
COLLECT_ALLOWED = {
    "rasterize.py", "catalog.py", "fixtures.py", "way_assembly.py",
    "similarity.py", "shapefile.py", "s2_join.py", "sketch.py",
    "clustering.py", "bpe.py", "linalg.py",
    # selection.py's greedy_cover collects ONE argmax row per round via
    # .limit(1) — the BPE-ladder learned-parameter posture;
    # suffix.py collects one count-distinct scalar per doubling round —
    # the kNN round-control posture
    "selection.py", "suffix.py",
    # semdedup.py collects the hard-bounded hash-ordered centroid-fit
    # sample (limit(sample).toPandas()) — the IVF/PQ fit posture
    "semdedup.py",
}
COLLECT_RE = re.compile(r"\.(collect|toPandas)\s*\(")


def _py_files():
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                yield os.path.join(root, fn)


def test_no_row_wise_python_or_rdd():
    bad = []
    for path in _py_files():
        with open(path) as f:
            src = f.read()
        for pat in FORBIDDEN:
            if pat.search(src):
                bad.append((os.path.basename(path), pat.pattern))
    assert not bad, f"forbidden slow-path constructs: {bad}"


# Unpartitioned windows (`Window.orderBy` with no partitionBy) execute as
# ONE task over their whole input relation — a scale-killer when that
# relation is the data (round-4 verdict #2: the old skyline). They are
# allowed ONLY over bounded relations, pinned here per file WITH exact
# occurrence counts so a new one (anywhere, or an extra in an allowlisted
# file) fails CI. Documented bounds:
#   suffix.py (2): coarse-bucket subtotal windows over ~#distinct-keys /
#     2^coarse_bits rows (dense_rank_scalable / rank_by_count contract);
#   ranges.py (1), strpack.py (1): the same coarse-bucket subtotal shape;
#   textstats.py (1): vocab-growth curve over per-bucket firsts (#buckets
#     rows, a config constant);
#   quantile_sketch.py (1): the compacted MRL sketch rows (O(k log n));
#   skyline.py (1): the bucket-rollup offset window over the bucket
#     AGGREGATE relation (x-range / 2^coarse_bits rows) — the full-point
#     windows are bucket-partitioned (plan-asserted in test_skyline).
UNPARTITIONED_WINDOW_ALLOWED = {
    "suffix.py": 2,
    "ranges.py": 1,
    "strpack.py": 1,
    "textstats.py": 1,
    "quantile_sketch.py": 1,
    "skyline.py": 1,
}
UNPARTITIONED_WINDOW_RE = re.compile(r"\bWindow\s*\.\s*orderBy\s*\(")


def test_unpartitioned_windows_only_on_bounded_relations():
    bad = []
    for path in _py_files():
        base = os.path.basename(path)
        with open(path) as f:
            src = f.read()
        n = len(UNPARTITIONED_WINDOW_RE.findall(src))
        if n != UNPARTITIONED_WINDOW_ALLOWED.get(base, 0):
            bad.append((base, n, UNPARTITIONED_WINDOW_ALLOWED.get(base, 0)))
    assert not bad, (
        "Window.orderBy without partitionBy outside the documented "
        f"bounded-relation allowlist (file, found, allowed): {bad}"
    )


def test_collect_only_in_bounded_modules():
    bad = []
    for path in _py_files():
        base = os.path.basename(path)
        if base in COLLECT_ALLOWED:
            continue
        with open(path) as f:
            src = f.read()
        if COLLECT_RE.search(src):
            bad.append(base)
    assert not bad, f"driver-side collect outside bounded modules: {bad}"
