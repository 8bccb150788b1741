"""Oracle output-type sweep: the driver's correctness hash is
dtype-sensitive, and DuckDB silently widens uncast ``sum(BIGINT)`` to
HUGEINT (→ float64 in pandas) while Spark emits int64 — so `6` vs
`6.0` hash-mismatch even when every value agrees (the r04
``pipeline_aggs`` / ``bpe_encode`` reds).  This test ``DESCRIBE``s
every oracle SQL (plans without executing) and asserts no output
column is typed HUGEINT / UHUGEINT / DECIMAL, so no future oracle can
reintroduce the artifact."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
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

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")

ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types(duck, name):
    sql = ORACLES[name]
    if callable(sql):  # aux-materializing oracles take the spark dir
        pytest.skip("aux oracle — typed at materialization time")
    try:
        desc = duck.execute(f"DESCRIBE {sql}").fetchall()
    except duckdb.Error as exc:  # aux-table oracles need runtime views
        msg = str(exc)
        if "oracle_aux" in sql or "does not exist" in msg:
            pytest.skip(f"needs runtime aux table: {msg[:80]}")
        raise
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if any(b in typ.upper() for b in BANNED)
    ]
    assert not bad, (
        f"oracle {name!r} emits driver-hash-unsafe column types {bad}; "
        "CAST the aggregate to BIGINT/DOUBLE in the oracle SQL"
    )
