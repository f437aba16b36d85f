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
