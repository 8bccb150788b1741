"""Pages source adapter: schema enforcement + format dispatch."""

from __future__ import annotations

import pytest

from embed_rerank_spark.sources.pages import generate_pages
from embed_rerank_spark.sources.web_tables import PAGES_COLUMNS, read_pages


def test_read_pages_parquet_enforces_schema(spark, tmp_path):
    generate_pages(spark, 200, seed=3, n_snapshots=1).write.parquet(str(tmp_path / "p"))
    df = read_pages(spark, str(tmp_path / "p"))
    assert df.columns == PAGES_COLUMNS
    types = dict(df.dtypes)
    assert types["warc_ts"] == "timestamp"
    assert types["html"] == "binary"
    assert df.count() == 200


def test_read_pages_missing_column_raises(spark, tmp_path):
    spark.range(5).selectExpr("cast(id as string) url").write.parquet(
        str(tmp_path / "bad")
    )
    with pytest.raises(ValueError, match="missing columns"):
        read_pages(spark, str(tmp_path / "bad"))


def test_read_pages_unknown_format_raises(spark):
    with pytest.raises(ValueError, match="unknown pages format"):
        read_pages(spark, "x", format="orc")
