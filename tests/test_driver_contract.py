"""Driver-contract guards: queries()/oracle_sql() stay in sync and every
oracle is at least PARSEABLE by DuckDB against the real table schemas —
a syntax or binder error here would otherwise first surface inside the
grading driver."""

import importlib.util
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_contract", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


# Queries whose oracle is DERIVED from the sf parquet (IVF centroids are
# re-fit from the embeddings table): on a machine without /root/testdata
# these fall back to rows-only, which is a documented environment
# limitation, not a contract break.
ENV_DEPENDENT_ORACLES = {
    "ann_ivf_topk", "ann_pq_topk", "bpe_train_merges", "pca_project_q",
    "semdedup_prune_k8",
}


def test_every_query_has_an_oracle():
    m = _entry()
    qs = set(m.queries())
    os_ = set(m.oracle_sql())
    assert os_ <= qs, f"oracles without queries: {os_ - qs}"
    missing = qs - os_
    assert missing <= ENV_DEPENDENT_ORACLES, (
        f"rows-only queries (should be value-oracled): "
        f"{missing - ENV_DEPENDENT_ORACLES}"
    )
    if missing:
        import warnings

        warnings.warn(
            f"derived oracles skipped (input parquet absent): {missing}"
        )


@pytest.mark.skipif(not os.path.isdir(SF),
                    reason="driver testdata not mounted")
def test_every_oracle_parses_in_duckdb():
    m = _entry()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    for name, sql in m.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # pragma: no cover - the assertion message
            raise AssertionError(f"oracle {name} fails to bind: {e}") from e
