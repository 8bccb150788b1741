"""One-off driver-faithful check of the current ``_GATE_FRONT`` window:
runs each windowed query on Spark (sf0.01) and its DuckDB oracle, then
compares row count, sorted column names, per-column dtype KIND
(int vs float vs object — the axis the driver's hash is sensitive to
and the pytest mirror masks), and rounded values.

Usage: python tests/window_dtype_check.py [start [end]]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod  # noqa: E402
from embed_rerank_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df):
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


def main() -> int:
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    end = int(sys.argv[2]) if len(sys.argv) > 2 else len(entry_mod._GATE_FRONT)
    spark = get_spark("window-dtype-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = entry_mod.oracle_sql()
    queries = entry_mod.queries()
    bad = 0
    for name in entry_mod._GATE_FRONT[start:end]:
        sdf = queries[name](spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        ddf = con.execute(oracles[name]).df()
        probs = []
        if sorted(sdf.columns) != sorted(ddf.columns):
            probs.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        if len(sdf) != len(ddf):
            probs.append(f"rows {len(sdf)} vs {len(ddf)}")
        for c in sorted(set(sdf.columns) & set(ddf.columns)):
            ks, kd = sdf[c].dtype.kind, ddf[c].dtype.kind
            # driver hash cares about int-vs-float; u~i is equivalent
            norm = {"u": "i"}
            if norm.get(ks, ks) != norm.get(kd, kd):
                probs.append(f"dtype[{c}] spark={sdf[c].dtype} duck={ddf[c].dtype}")
        if not probs and _canon(sdf) != _canon(ddf):
            probs.append("values differ")
        if probs:
            bad += 1
            print(f"{name}: FAIL — {'; '.join(probs)}")
        else:
            print(f"{name}: ok ({len(sdf)} rows)")
    print(f"\n{'ALL GREEN' if bad == 0 else f'{bad} FAILURES'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
