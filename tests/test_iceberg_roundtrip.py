"""Iceberg round-trip — probe-gated.

The engine's ingest declares Iceberg snapshot/branch reader options
(sources/web_tables.py; capture-tested in test_sources.py), but this
sandbox ships NO Iceberg runtime: no `pyiceberg` module and no
`iceberg-spark-runtime` jar on the Spark classpath (probed 2026-08-21,
recorded in BENCH/BASELINE.md). This test IS the probe: if an Iceberg
runtime is ever present, it exercises a real write -> snapshot ->
as-of read round-trip; until then it skips with the exact missing
pieces so the gap is evidenced, not asserted.
"""

from __future__ import annotations

import importlib.util
import os
from pathlib import Path

import pytest


def _iceberg_available() -> tuple[bool, str]:
    reasons = []
    if importlib.util.find_spec("pyiceberg") is None:
        reasons.append("no pyiceberg module")
    try:
        import pyspark

        jars = Path(os.path.dirname(pyspark.__file__)) / "jars"
        if not any("iceberg" in p.name.lower() for p in jars.iterdir()):
            reasons.append("no iceberg-spark-runtime jar in pyspark/jars")
    except OSError:
        reasons.append("cannot list pyspark jars")
    return (not reasons, "; ".join(reasons))


_OK, _WHY = _iceberg_available()


@pytest.mark.skipif(not _OK, reason=f"Iceberg runtime absent in sandbox: {_WHY}")
def test_iceberg_roundtrip(spark, tmp_path):
    spark.conf.set(
        "spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
    spark.sql("CREATE TABLE it.db.pages (url STRING, text STRING) USING iceberg")
    spark.sql("INSERT INTO it.db.pages VALUES ('u1', 'hello iceberg')")
    first_snap = spark.sql(
        "SELECT snapshot_id FROM it.db.pages.snapshots ORDER BY committed_at"
    ).first()[0]
    spark.sql("INSERT INTO it.db.pages VALUES ('u2', 'second snapshot')")
    assert spark.table("it.db.pages").count() == 2
    asof = (
        spark.read.format("iceberg")
        .option("snapshot-id", str(first_snap))
        .load("it.db.pages")
    )
    assert asof.count() == 1


def test_iceberg_probe_is_current():
    """If the runtime EVER becomes available, fail loudly so the
    skip-documentation above gets replaced by the real round-trip."""
    ok, why = _iceberg_available()
    if ok:
        pytest.fail(
            "Iceberg runtime detected — test_iceberg_roundtrip now runs; "
            "update BENCH/BASELINE.md's probe note"
        )
    assert "no pyiceberg module" in why or "jar" in why
