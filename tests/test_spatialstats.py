"""Local/global Moran's I on hand-checkable lattices."""

from __future__ import annotations


def test_lisa_uniform_lattice_is_zero(spark):
    """Constant field -> z' = 0 everywhere -> every LISA term is 0."""
    from osm_hadoop_spark.operators.spatialstats import morans_i_local

    cells = spark.createDataFrame(
        [(x, y, 5) for x in range(3) for y in range(3)],
        "cx long, cy long, n long",
    )
    out = morans_i_local(cells).collect()
    assert len(out) == 9
    assert all(r["z_scaled"] == 0 and r["lisa_num"] == 0 for r in out)
    # interior cell has 4 rook neighbors, corner has 2
    nb = {(r["cx"], r["cy"]): r["n_neighbors"] for r in out}
    assert nb[(1, 1)] == 4 and nb[(0, 0)] == 2


def test_lisa_two_cell_contrast(spark):
    """Two adjacent cells, values 1 and 3: n=2, S=4 -> z' = (-2, +2);
    each neighbors only the other -> lisa_num = -4 for both (perfect
    negative autocorrelation)."""
    from osm_hadoop_spark.operators.spatialstats import (
        morans_i_global,
        morans_i_local,
    )

    cells = spark.createDataFrame(
        [(0, 0, 1), (0, 1, 3)], "cx long, cy long, n long"
    )
    out = {(r["cx"], r["cy"]): r for r in morans_i_local(cells).collect()}
    assert out[(0, 0)]["z_scaled"] == -2 and out[(0, 1)]["z_scaled"] == 2
    assert out[(0, 0)]["lisa_num"] == -4 and out[(0, 1)]["lisa_num"] == -4
    [g] = morans_i_global(cells).collect()
    # I = (n/W) * num/den = (2/2) * (-8/8) = -1: perfect dispersion
    assert (g["n_cells"], g["w_sum"], g["num"], g["den"]) == (2, 2, -8, 8)


def test_lisa_isolated_cell_has_no_neighbors(spark):
    from osm_hadoop_spark.operators.spatialstats import morans_i_local

    cells = spark.createDataFrame(
        [(0, 0, 1), (10, 10, 3)], "cx long, cy long, n long"
    )
    out = {(r["cx"], r["cy"]): r for r in morans_i_local(cells).collect()}
    assert all(r["n_neighbors"] == 0 and r["lisa_num"] == 0
               for r in out.values())


def test_getis_ord_uniform_is_zero(spark):
    """Constant field: W_i = k_i * x, so gi_num = n*k*x - k*(n*x) = 0."""
    from osm_hadoop_spark.operators.spatialstats import getis_ord_gi

    cells = spark.createDataFrame(
        [(x, y, 7) for x in range(3) for y in range(3)],
        "cx long, cy long, n long",
    )
    out = {(r["cx"], r["cy"]): r for r in getis_ord_gi(cells).collect()}
    assert all(r["gi_num"] == 0 for r in out.values())
    # window includes self: interior k=5, corner k=3
    assert out[(1, 1)]["k"] == 5 and out[(0, 0)]["k"] == 3


def test_getis_ord_hot_cell(spark):
    """A single hot cell lifts its own and its neighbors' windows."""
    from osm_hadoop_spark.operators.spatialstats import getis_ord_gi

    cells = spark.createDataFrame(
        [(0, 0, 1), (0, 1, 100), (0, 2, 1)], "cx long, cy long, n long"
    )
    out = {(r["cx"], r["cy"]): r for r in getis_ord_gi(cells).collect()}
    # n=3, S=102. center window = all three = 102, k=3:
    # gi = 3*102 - 3*102 = 0 (it IS the whole lattice); ends: W=101,k=2:
    # gi = 3*101 - 2*102 = 99 > 0 (they border the hot cell)
    assert out[(0, 1)]["gi_num"] == 0
    assert out[(0, 0)]["gi_num"] == 99 and out[(0, 2)]["gi_num"] == 99
