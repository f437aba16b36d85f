"""D8 hydrology (operators/hydrology.py): brute force + plan shape.

The independent anchor computes steepest descent with exact
`fractions.Fraction` slopes (drop^2 / dist^2 — a different formulation
from the operator's cross-multiplied packed score) over a dict DEM, and
accumulation by literally walking every cell's drainage path. Crafted
features on top of the hash noise: a long monotone ramp (chain deeper
than the round budget), a pit (interior sink), a flat plateau pair, and
rim cells draining off-grid through the default elevation.
"""

from __future__ import annotations

import hashlib
from fractions import Fraction

from osm_hadoop_spark.operators.hydrology import (
    D8_OFFSETS,
    d8_flow_direction,
    flow_accumulation,
    watershed_basins,
)

GRID = 24


def _h(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _dem():
    cells = {}
    for i in range(450):
        cx, cy = _h(f"hx{i}", GRID), _h(f"hy{i}", GRID)
        cells[(cx, cy)] = max(cells.get((cx, cy), 0), _h(f"he{i}", 1400) + 1)
    # monotone ramp: a 12-cell walled corridor (chain deeper than
    # rounds=4; without walls every cell would drain off-DEM, since the
    # drop to the default-0 outside always beats any in-DEM drop)
    for j in range(12):
        cells[(30 + j, 5)] = 2000 - 100 * j
    for x in range(28, 44):
        cells[(x, 4)] = 3000
        cells[(x, 6)] = 3000
    cells[(29, 5)] = 3000
    cells[(42, 5)] = 3000
    # pit: 5x5 block, high rim so the inner ring cannot drain off-DEM ->
    # ring drains into the center, center sinks
    for dx in (-2, -1, 0, 1, 2):
        for dy in (-2, -1, 0, 1, 2):
            r = max(abs(dx), abs(dy))
            cells[(50 + dx, 50 + dy)] = {2: 800, 1: 500, 0: 100}[r]
    # flat plateau pair: equal elevations, both must sink or drain out
    cells[(60, 60)] = 700
    cells[(61, 60)] = 700
    return cells


def _brute_d8(dem, default=0):
    out = {}
    for (cx, cy), e in dem.items():
        best_key, best_rank = None, None
        for rank, (dx, dy, _) in enumerate(D8_OFFSETS):
            ne = dem.get((cx + dx, cy + dy), default)
            drop = e - ne
            if drop <= 0:
                continue
            slope2 = Fraction(drop * drop, 2 if rank % 2 == 1 else 1)
            key = (slope2, -rank)
            if best_key is None or key > best_key:
                best_key, best_rank = key, rank
        if best_rank is None:
            out[(cx, cy)] = (0, None, None, None)
        else:
            dx, dy, code = D8_OFFSETS[best_rank]
            out[(cx, cy)] = (code, cx + dx, cy + dy, e - dem.get((cx + dx, cy + dy), default))
    return out


def _brute_acc(dem, dirs, rounds):
    acc = {c: 0 for c in dem}
    for u in dem:
        cur = u
        acc[cur] += 1
        for _ in range(rounds):
            code, nx, ny, _ = dirs[cur]
            if code == 0 or (nx, ny) not in dem:
                break
            cur = (nx, ny)
            acc[cur] += 1
    return acc


def _dem_df(spark, dem):
    return spark.createDataFrame(
        [(cx, cy, e) for (cx, cy), e in dem.items()], "cx long, cy long, elev long"
    )


def test_d8_direction_matches_brute(spark):
    dem = _dem()
    got = {
        (r["cx"], r["cy"]): (r["dir"], r["nx"], r["ny"], r["dropv"])
        for r in d8_flow_direction(_dem_df(spark, dem)).collect()
    }
    want = _brute_d8(dem)
    assert got == want
    # crafted features behaved: pit center is a sink, ring drains inward
    assert want[(50, 50)][0] == 0
    assert want[(49, 50)] == (1, 50, 50, 400)
    # ramp links forward; plateau cells never drain into each other
    assert want[(30, 5)][1:3] == (31, 5)
    assert want[(60, 60)][1:3] != (61, 60)
    assert want[(61, 60)][1:3] != (60, 60)
    # mix of sinks and drainers
    codes = [v[0] for v in want.values()]
    assert 0 < codes.count(0) < len(codes)


def test_d8_tie_breaks_prefer_low_rank(spark):
    # center with two equal straight drops (E and S) -> E (rank 0) wins;
    # equal diag drops (SE and SW) with shallower straight -> SE wins
    dem = {
        (5, 5): 100, (6, 5): 40, (5, 6): 40,
        (20, 20): 100, (21, 21): 10, (19, 21): 10, (21, 20): 95,
    }
    got = {
        (r["cx"], r["cy"]): (r["dir"], r["nx"], r["ny"])
        for r in d8_flow_direction(_dem_df(spark, dem), default_elev=99).collect()
    }
    assert got[(5, 5)] == (1, 6, 5)
    # straight drop 5 -> slope^2 25; diag drop 90 -> slope^2 4050: SE wins
    assert got[(20, 20)] == (2, 21, 21)
    assert got == {k: (v[0], v[1], v[2]) for k, v in _brute_d8(dem, 99).items()}


def test_flow_accumulation_matches_brute(spark):
    dem = _dem()
    for rounds in (1, 4):
        got = {
            (r["cx"], r["cy"]): r["acc"]
            for r in flow_accumulation(_dem_df(spark, dem), rounds).collect()
        }
        want = _brute_acc(dem, _brute_d8(dem), rounds)
        assert got == want
    # the ramp head contributes to cell 4 hops down but not 5
    want4 = _brute_acc(dem, _brute_d8(dem), 4)
    want5 = _brute_acc(dem, _brute_d8(dem), 5)
    assert want5[(35, 5)] == want4[(35, 5)] + 1


def _brute_basin(dem, dirs, applications):
    """Label = the `applications`-th absorbing pointer application."""
    out = {}
    for u in dem:
        cur = u
        for _ in range(applications):
            code, nx, ny, _ = dirs[cur]
            if code == 0 or (nx, ny) not in dem:
                break
            cur = (nx, ny)
        out[u] = cur
    return out


def test_watershed_basins_matches_brute(spark):
    dem = _dem()
    dirs = _brute_d8(dem)
    # 5 doublings cover chains <= 32; the deepest crafted chain is the
    # 12-cell ramp, so this is full convergence
    got = {
        (r["cx"], r["cy"]): (r["bx"], r["by"])
        for r in watershed_basins(_dem_df(spark, dem), 5).collect()
    }
    want = _brute_basin(dem, dirs, 1 << 5)
    assert got == want
    # converged: every label is a terminal (sink or edge-drainer)
    for bx, by in set(got.values()):
        code, nx, ny, _ = dirs[(bx, by)]
        assert code == 0 or (nx, ny) not in dem
    # the whole ramp corridor drains to one basin; the pit ring labels
    # onto the pit center
    ramp_labels = {got[(30 + j, 5)] for j in range(12)}
    assert len(ramp_labels) == 1
    assert got[(49, 50)] == (50, 50) and got[(50, 50)] == (50, 50)
    assert len(set(got.values())) > 1


def test_watershed_partial_doubling_is_pow2_successor(spark):
    dem = _dem()
    got = {
        (r["cx"], r["cy"]): (r["bx"], r["by"])
        for r in watershed_basins(_dem_df(spark, dem), 2).collect()
    }
    assert got == _brute_basin(dem, _brute_d8(dem), 4)
    # the ramp head is NOT yet at its terminal after only 4 hops
    assert got[(30, 5)] != _brute_basin(dem, _brute_d8(dem), 32)[(30, 5)]


def test_d8_plan_shape(spark):
    dem = _dem_df(spark, {(1, 1): 5, (2, 1): 3})
    plan = (
        d8_flow_direction(dem)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union + ONE hash-aggregate exchange + codegen projection: no join,
    # no Python, nothing quadratic
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "Python" not in plan and "BatchEval" not in plan


def test_strahler_textbook_confluence(spark):
    """Two order-1 streams meeting make order 2; a third order-1 joining
    downstream keeps order 2 (the defining Strahler asymmetry)."""
    import pyspark.sql.functions as F

    from osm_hadoop_spark.operators.hydrology import strahler_order

    # elevations force the D8 paths: two ridges draining into a channel
    #   (0,0)=9  (2,0)=9   -> both flow to (1,1)=5 -> (1,2)=3 -> (1,3)=1
    #   (0,2)=8 joins at (1,3)? no: let it join at (1,2)'s successor
    rows = [
        (0, 0, 9), (2, 0, 9),        # headwaters (order 1)
        (1, 1, 5),                   # confluence of two order-1 -> 2
        (1, 2, 3),                   # passes through (still 2)
        (0, 2, 8),                   # side headwater (order 1)
        (1, 3, 1),                   # side stream joins main: max(2,1)=2
    ]
    dem = spark.createDataFrame(rows, "cx long, cy long, elev long")
    # default_elev=99 walls the border so drainage stays inside the DEM
    got = {(r["cx"], r["cy"]): r["strahler"]
           for r in strahler_order(dem, rounds=6, default_elev=99).collect()}
    assert got[(0, 0)] == 1 and got[(2, 0)] == 1 and got[(0, 2)] == 1
    assert got[(1, 1)] == 2
    assert got[(1, 2)] == 2
    # (1,3) receives the order-2 main stem and the order-1 side stream:
    # orders differ, so it stays 2
    assert got[(1, 3)] == 2


def _brute_flow_length(dem, dirs, rounds):
    """Longest upstream chain ending at each cell, bounded by rounds."""
    children = {}
    for u in dem:
        code, nx, ny, _ = dirs[u]
        if code > 0 and (nx, ny) in dem:
            children.setdefault((nx, ny), []).append(u)
    f = {u: 0 for u in dem}
    for _ in range(rounds):
        f = {
            u: max([f[c] + 1 for c in children.get(u, [])] or [0])
            for u in dem
        }
    return f


def test_flow_path_length_matches_brute(spark):
    from osm_hadoop_spark.operators.hydrology import flow_path_length

    dem = _dem()
    dirs = _brute_d8(dem)
    for rounds in (1, 4, 8):
        got = {
            (r["cx"], r["cy"]): r["fl"]
            for r in flow_path_length(_dem_df(spark, dem), rounds).collect()
        }
        assert got == _brute_flow_length(dem, dirs, rounds), rounds
    # the walled 12-cell ramp: fl grows one per round until the chain is
    # exhausted — at rounds=8 the ramp foot has fl 8, proving the bound
    # is the advertised lower bound (exact once rounds >= chain length)
    got8 = _brute_flow_length(dem, dirs, 8)
    got12 = _brute_flow_length(dem, dirs, 12)
    assert got8[(41, 5)] == 8 and got12[(41, 5)] >= 11
