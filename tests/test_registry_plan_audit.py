"""Registry-wide physical-plan audit: EVERY driver query is planned and
checked for scale-killer nodes. Complements test_no_slow_path.py (source
grep) with what Catalyst actually planned:

  - BatchEvalPython  = a row-at-a-time Python UDF reached the plan — never
    allowed anywhere (the engine's UDF surface is Arrow-only).
  - CartesianProduct = an unkeyed join of two big sides — never allowed.
  - BroadcastNestedLoopJoin = allowed ONLY on the allowlist below, where
    the build side is a bounded relation by construction (a one-row global
    totals/stats aggregate, or a bounded broadcast query/dim set). A new
    query that accidentally plans a BNLJ on two data-sized sides fails
    here before it ships.

Costs one analysis pass per query at sf0.001 (plans only — nothing is
executed beyond the bounded parameter fits some queries run at build
time).
"""

import importlib.util

import pytest

SF_DIR = "/root/testdata/sf0.001"

# BNLJ build sides that are bounded BY CONSTRUCTION (not by luck):
#   one-row global aggregates: bm25 corpus stats, PMI totals, chi2 totals,
#     join-count global CSR stats, balanced-ranges global count
#   bounded broadcast sets: ANN/PQ/SQ8 + brute top-k query vectors
#     (fixed query sample), PIP triangle/polygon dims (literal fixture
#     size), merge-chains junction table (bounded by degree filter),
#     way_polygon boundary dims
#   one-row lattice stats (n_cells, S) for the Moran/Gi* family; one-row
#     binding-group argmin + |groups|-row census for mixture rebalancing
BNLJ_ALLOWED = {
    "ann_pq_topk", "ann_sq8_topk", "embedding_topk", "bm25_topk_terms",
    "cooccurrence_pmi", "token_drift_chi2", "join_counts_grid",
    "balanced_ranges_b32", "merge_chains_ways", "pip_outside",
    "pip_triangles", "way_polygon_contain",
    "morans_lisa_g60", "morans_global_g60", "getis_ord_gi_g60",
    "mixture_rebalance_lang",
    # kmv overlap: the pair generator is a |groups|-row dim crossed with
    # itself (5 event types -> 10 pairs); sketch fan-out is broadcast equi
    "kmv_overlap_events",
    # z-range membership: 237-row disjoint-interval broadcast build side
    # (the computed-key fast form; stored keys use pushed OR-of-BETWEEN)
    "zorder_bbox_scan",
    # hilbert bulk plan scan: the build side is the planner's interval
    # table — O(perimeter) intervals per box (textbook exact-cover bound),
    # bounded by construction; each (point, box) matches <= 1 interval
    "hilbert_bulk_scan",
    # basket lift: the one-row n_baskets global-count build side
    "basket_pair_lift",
    # AMS F2: both sides of the final join are one-row global aggregates
    "ams_f2_users",
    # dyad census: same shape — the final join stitches two ONE-ROW
    # global aggregates (node count x direction census)
    "dyad_census",
    # triad census: the closed-form 003/012/102 rows cross ONE-ROW
    # scalar aggregates (n, dyad counts, enumeration sums) onto the
    # 16-name literal frame — every build side is a single row or the
    # 16-row frame by construction
    "triad_census_man",
    # STR packing: the build side is the one-row (n, P, S) slice-geometry
    # scalar crossed onto the ranked rects
    "str_pack_c32",
    # MRL sketch: the build side is the 9-row decile-target relation
    # (deciles x one-row global count) non-equi-joined to the bounded
    # <= shards*k summary
    "mrl_deciles_sketch",
    # Geary's C: two one-row global-aggregate build sides (lattice
    # stats crossed onto cells; pair-num crossed onto den) — the
    # morans/Gi* pattern
    "gearys_c_g60",
    # Ripley's K: the one-row n_points global count crossed onto the
    # 4-row radius census
    "ripley_k_multi",
    # Benford: the 9-row digit frame crossed onto the distinct-key dim
    "benford_digits",
    # pair confusion: three one-row aggregates (tp, pred_pairs,
    # truth_pairs) crossed into the single output row
    "pair_confusion_docs",
    # dominance: the distinct-band relation (the operator's B lever,
    # ~sqrt(n) rows by the documented band_width choice) broadcast
    # against points for the lower-band explode
    "dominance_counts_b250",
    # ordinal patterns: the 6-row pattern frame crossed onto the
    # distinct-key dim (the benford zero-fill shape)
    "ordinal_patterns_o3",
    # emerging hotspots: inherits getis_ord_gi's one-row (n, S) lattice
    # stats broadcast
    "emerging_hotspots",
}


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "entry_registry_audit", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_registry_plans_free_of_scale_killers(spark, entry):
    bad = {}
    for name, fn in entry.queries().items():
        plan = (
            fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        )
        marks = []
        if "BatchEvalPython" in plan:
            marks.append("row-wise PythonUDF")
        if "CartesianProduct" in plan:
            marks.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            marks.append("unapproved BroadcastNestedLoopJoin")
        if marks:
            bad[name] = marks
    assert not bad, bad
