"""Replica of the driver's correctness gate as a pytest: every SQL-backed
registry query at sf0.001 must match its DuckDB oracle on row count, column
names, and values (sorted, order-insensitive).  Rows-only queries are
smoke-checked for non-trivial output."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _sql_backed_names():
    from kgx import queries as Q

    return sorted(Q.oracle_sql())


@pytest.mark.parametrize("name", _sql_backed_names())
def test_query_matches_duckdb_oracle(ray_session, con, name):
    from kgx import queries as Q

    ours = canon(to_pandas(Q.registry()[name](SF_DIR)))
    theirs = canon(con.execute(Q.oracle_sql()[name]).fetchdf())
    assert list(ours.columns) == list(theirs.columns)
    assert len(ours) == len(theirs)
    for c in ours.columns:
        a, b = ours[c], theirs[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            pd.testing.assert_series_equal(
                a.astype(float), b.astype(float), check_names=False
            )
        else:
            assert (a.astype(str) == b.astype(str)).all(), f"column {c} differs"


def test_rows_only_queries_nonempty(ray_session):
    from kgx import queries as Q

    reg = Q.registry()
    sqls = Q.oracle_sql()
    for name in ["kg_triples", "kg_entities", "kg_mentions", "dedup_minhash_lsh",
                 "dedup_simhash", "ann_topk_lsh"]:
        assert name in reg and name not in sqls
        assert to_pandas(reg[name](SF_DIR)).shape[0] > 0


def test_every_query_has_sql_or_documented_reason(ray_session):
    """Registry hygiene: the rows-only set is exactly the non-SQL-expressible
    pipelines (KG chain on enriched pages + probabilistic variants)."""
    from kgx import queries as Q

    rows_only = set(Q.registry()) - set(Q.oracle_sql())
    assert rows_only == {
        "kg_triples", "kg_entities", "kg_adjacency", "kg_mentions",
        "dedup_minhash_lsh", "dedup_simhash", "ann_topk_lsh", "ann_topk_ivf",
    }
