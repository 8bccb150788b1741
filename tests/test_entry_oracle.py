"""Mimics the driver's correctness gate: run every ``queries()`` entry
on Spark at sf0.01 and the matching ``oracle_sql()`` in DuckDB over the
same parquet tables; compare row count, schema (names), and
order-insensitive values."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(df):
    """Order-insensitive canonical form: sort columns by name, rows by value."""
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(round(v, 6) if not math.isnan(v) else "nan")
            else:
                row.append(v)
        rows.append(tuple(row))
    return sorted(rows, key=repr)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    duck_df = duck.execute(ORACLES[name]).df()
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        spark_df.columns,
        duck_df.columns,
    )
    assert len(spark_df) == len(duck_df)
    assert _canon(spark_df) == _canon(duck_df)


def test_every_query_has_oracle_or_is_documented():
    missing = set(QUERIES) - set(ORACLES)
    # every contract entry is oracle-checked as of r05:
    # media_pipeline / embed_digest / bpe_merges gained .oracle_aux
    # value checks (driver-side independent recomputation read back by
    # DuckDB), closing the last rows-only rows
    assert missing == set(), missing


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score"}
