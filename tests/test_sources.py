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


def test_iceberg_read_options_contract():
    """Snapshot-range option names/values pinned (public Iceberg Spark
    read options; one (start, end] range = one build segment)."""
    from embed_rerank_spark.sources.web_tables import iceberg_read_options

    assert iceberg_read_options() == {}
    assert iceberg_read_options(10) == {"start-snapshot-id": "10"}
    assert iceberg_read_options(10, 20) == {
        "start-snapshot-id": "10",
        "end-snapshot-id": "20",
    }
    assert iceberg_read_options(end_snapshot_id=7) == {"end-snapshot-id": "7"}


def test_read_pages_iceberg_path_via_reader_capture(spark):
    """Exercise the FULL iceberg branch of read_pages without an
    Iceberg runtime: a capturing stub stands in for spark.read, returns
    a real pages DataFrame from load(), and the test asserts the
    format/options/table wiring plus the schema enforcement applied to
    the result."""
    from embed_rerank_spark.sources.pages import generate_pages
    from embed_rerank_spark.sources.web_tables import PAGES_COLUMNS, read_pages

    real = generate_pages(spark, 20, seed=3, n_snapshots=1)

    class Reader:
        def __init__(self):
            self.fmt = None
            self.options = {}
            self.loaded = None

        def format(self, f):
            self.fmt = f
            return self

        def option(self, k, v):
            self.options[k] = v
            return self

        def load(self, src):
            self.loaded = src
            return real

    class FakeSpark:
        def __init__(self):
            self.reader = Reader()

        @property
        def read(self):
            return self.reader

    fake = FakeSpark()
    out = read_pages(
        fake, "web.crawl.pages", format="iceberg",
        start_snapshot_id=111, end_snapshot_id=222,
    )
    assert fake.reader.fmt == "iceberg"
    assert fake.reader.loaded == "web.crawl.pages"
    assert fake.reader.options == {
        "start-snapshot-id": "111",
        "end-snapshot-id": "222",
    }
    # schema enforcement ran on the loaded DataFrame
    assert out.columns == PAGES_COLUMNS
    assert out.count() == 20
