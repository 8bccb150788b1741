"""Index integrity checker (``fsck`` for the inverted index).

At 10^12 docs an index is rebuilt rarely and merged/compacted
constantly; silent corruption (a bad varbyte slice, a stale header, a
non-monotone run after a buggy merge) poisons every query that touches
the block — and WAND's block skipping means wrong HEADERS cause wrong
RESULTS, not crashes (a too-low block max silently prunes matching
docs). This job re-derives every invariant from the payload bytes and
compares against the stored headers and the build's lineage manifests:

per block (decode + recheck, one vectorized Arrow pass, no shuffle):
  - payload decodes to exactly ``n_docs`` postings
  - doc ids strictly ascending; ``first_doc``/``last_doc`` match
  - ``max_tf`` == max(tfs), ``min_dl`` == min(dls); tf >= 1, dl >= 1
per (term, shard) after a tiny agg over block headers:
  - block doc-ranges non-overlapping (ascending first_doc per salt run
    implied by per-block monotonicity + range disjointness)
whole index vs manifest:
  - sum(n_docs) == manifest postings_emitted (per shard)

Cost model: decode-everything is one linear scan of the compressed
bytes (the same kernel queries use), embarrassingly parallel over the
posting files; the per-block verdict rows are ~1/block_size of the
posting count, so the anomaly agg is trivial. Run it after compaction
or before promoting a snapshot — the moral equivalent of a filesystem
fsck or a parquet footer checksum pass, but semantic.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VERDICT_SCHEMA = (
    "term string, shard int, block_id int, first_doc long, n_docs int, ok boolean, err string"
)


def fsck_blocks(postings: DataFrame) -> DataFrame:
    """One verdict row per block: ok + first failed invariant."""

    def check(batches: Iterator[pa.RecordBatch]):
        from ..functions.codec import decode_block  # noqa: PLC0415

        for batch in batches:
            t = batch.to_pydict()
            n = len(t["term"])
            oks, errs = [], []
            for i in range(n):
                err = None
                try:
                    docs, tfs, dls = decode_block(
                        t["docs_bin"][i], t["tfs_bin"][i], t["dls_bin"][i], t["n_docs"][i]
                    )
                    if len(docs) != t["n_docs"][i]:
                        err = f"decoded {len(docs)} != n_docs {t['n_docs'][i]}"
                    # NB: compare, don't np.diff — int64 differences
                    # between xxhash64 ids can exceed 2^63 and wrap
                    elif len(docs) and not bool(np.all(docs[1:] > docs[:-1])):
                        err = "doc ids not strictly ascending"
                    elif len(docs) and int(docs[0]) != t["first_doc"][i]:
                        err = f"first_doc header {t['first_doc'][i]} != {int(docs[0])}"
                    elif len(docs) and int(docs[-1]) != t["last_doc"][i]:
                        err = f"last_doc header {t['last_doc'][i]} != {int(docs[-1])}"
                    elif len(tfs) and int(tfs.max()) != t["max_tf"][i]:
                        err = f"max_tf header {t['max_tf'][i]} != {int(tfs.max())}"
                    elif len(dls) and int(dls.min()) != t["min_dl"][i]:
                        err = f"min_dl header {t['min_dl'][i]} != {int(dls.min())}"
                    elif len(tfs) and int(tfs.min()) < 1:
                        err = "tf < 1"
                    elif len(dls) and int(dls.min()) < 1:
                        err = "dl < 1"
                except Exception as e:  # decode blow-up IS the finding
                    err = f"decode error: {e}"
                oks.append(err is None)
                errs.append(err)
            yield pa.RecordBatch.from_pydict(
                {
                    "term": t["term"],
                    "shard": t["shard"],
                    "block_id": t["block_id"],
                    "first_doc": t["first_doc"],
                    "n_docs": t["n_docs"],
                    "ok": oks,
                    "err": errs,
                },
                schema=pa.schema(
                    [
                        ("term", pa.string()),
                        ("shard", pa.int32()),
                        ("block_id", pa.int32()),
                        ("first_doc", pa.int64()),
                        ("n_docs", pa.int32()),
                        ("ok", pa.bool_()),
                        ("err", pa.string()),
                    ]
                ),
            )

    cols = [
        "term", "shard", "block_id", "first_doc", "last_doc",
        "n_docs", "max_tf", "min_dl", "docs_bin", "tfs_bin", "dls_bin",
    ]
    return postings.select(*cols).mapInArrow(check, _VERDICT_SCHEMA)


def fsck_overlaps(postings: DataFrame) -> DataFrame:
    """(term, shard, overlaps): count of adjacent block-range overlaps
    within each (term, shard) — catches merge bugs that interleave doc
    ranges across blocks (legal only across SALT runs, where ranges
    are disjoint by construction; a genuine overlap is a defect).
    Pure header columns: no payload decode, tiny agg."""
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("term", "shard").orderBy("first_doc", "block_id")
    ordered = postings.select(
        "term", "shard", "block_id", "first_doc", "last_doc"
    ).withColumn("prev_last", F.lag("last_doc").over(w))
    return (
        ordered.withColumn(
            "overlap",
            (F.col("prev_last").isNotNull() & (F.col("first_doc") <= F.col("prev_last"))).cast("int"),
        )
        .groupBy("term", "shard")
        .agg(F.sum("overlap").alias("overlaps"))
        .filter(F.col("overlaps") > 0)
    )


def fsck_index(index, manifest: DataFrame | None = None) -> dict:
    """Full check of an ``InvertedIndex``: returns a summary dict and
    raises nothing — callers decide whether anomalies are fatal.

    ``manifest``: optional lineage manifest with ``postings_emitted``;
    when given, total decoded postings must reconcile with the build's
    own accounting (catches lost/duplicated files, not just bad bytes).
    """
    verdicts = fsck_blocks(index.postings)
    agg = verdicts.agg(
        F.count(F.lit(1)).alias("blocks"),
        F.sum(F.col("ok").cast("int")).alias("ok_blocks"),
        F.sum("n_docs").alias("postings"),
    ).collect()[0]
    bad = [
        (r.term, r.shard, r.block_id, r.err)
        for r in verdicts.filter(~F.col("ok")).limit(20).collect()
    ]
    overlaps = fsck_overlaps(index.postings).limit(20).collect()
    out = {
        "blocks": int(agg.blocks),
        "bad_blocks": int(agg.blocks - agg.ok_blocks),
        "postings": int(agg.postings or 0),
        "range_overlap_groups": [(r.term, r.shard, r.overlaps) for r in overlaps],
        "examples": bad,
        "manifest_postings": None,
        "manifest_match": None,
    }
    if manifest is not None:
        m = manifest.agg(F.sum("postings_emitted").alias("p")).collect()[0]
        out["manifest_postings"] = int(m.p or 0)
        out["manifest_match"] = out["manifest_postings"] == out["postings"]
    out["ok"] = (
        out["bad_blocks"] == 0
        and not out["range_overlap_groups"]
        and out["manifest_match"] is not False
    )
    return out
