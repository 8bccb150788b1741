"""Tiered (log-structured) index compaction + multi-unit query view.

``merge_segments`` (build_index.py) rewrites the WHOLE index on every
merge — correct, but at 10^12 docs a daily snapshot would re-encode
every posting. This module gives the build the LSM shape real engines
use:

- level-0 units are the per-snapshot segments the incremental build
  already writes (``path/segments/<snap>``);
- ``compact`` merges ``fanout`` SAME-LEVEL units into one unit at the
  next level (``path/tiers/L<k>/<first>__<last>``), promoting upward
  until no level has ``fanout`` live units. A new snapshot therefore
  costs O(segment) immediately and amortized O(segment * log_fanout n)
  over its lifetime — higher-level tiers are NOT rewritten (pinned by
  a mtime/bytes test);
- ``load_tiered`` exposes the LIVE units (those not absorbed by any
  tier) as one ``InvertedIndex``: postings union with a ``seg`` column
  so the WAND reader walks one independent cursor per (term, unit) —
  runs overlap in doc-id range across units, never within one.

Absorption is tracked in tier manifests (``inputs`` list), NOT by
deleting inputs: the snapshot segments double as the build's
checkpoint/resume record (their commit markers are what
``build_incremental`` skips), so they stay on disk; a production
deployment would garbage-collect absorbed units once a retention
window passes.

Re-crawled docs (same url, hence same doc_id, in several units) are
NEWEST-WINS at query time: ``load_tiered`` derives a (doc -> newest
unit) version map from the unioned doc stats, and every decode kernel
drops the doc's postings from older units — including terms that only
existed in the stale crawl. Compaction applies the same rule
physically (``_merge_units`` keeps only the newest unit's postings
and doc stats for a multi-unit doc), so pre- and post-compaction
rankings agree; corpus/term stats drift (count the stale crawl) until
compaction folds it in, same as deletion tombstones.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codec import BLOCK_SIZE
from ..operators.postings import POSTINGS_SCHEMA, InvertedIndex, pow2_salts, salt_expr
from .build_index import (
    _manifest_file,
    _merge_partition,
    committed_snapshots,
    stale_versions,
)

DEFAULT_FANOUT = 4


def _tier_root(path: str) -> str:
    return f"{path}/tiers"


def _unit_dir(path: str, unit: str) -> str:
    """unit id is a path relative to the index root:
    ``segments/<snap>`` or ``tiers/L<k>/<name>``."""
    return f"{path}/{unit}"


def _tier_units(path: str) -> list[tuple[int, str, dict]]:
    """[(level, unit_id, manifest)] for every committed tier."""
    out = []
    root = _tier_root(path)
    if not os.path.isdir(root):
        return out
    for lvl_name in sorted(os.listdir(root)):
        if not lvl_name.startswith("L"):
            continue
        level = int(lvl_name[1:])
        for name in sorted(os.listdir(f"{root}/{lvl_name}")):
            mf = f"{root}/{lvl_name}/{name}/MANIFEST.json"
            if os.path.exists(mf):
                with open(mf) as f:
                    out.append((level, f"tiers/{lvl_name}/{name}", json.load(f)))
    return out


def live_units(path: str) -> list[tuple[int, str]]:
    """[(level, unit_id)] of units not absorbed by any committed tier,
    ordered (level asc, name asc)."""
    tiers = _tier_units(path)
    absorbed = {u for _, _, m in tiers for u in m["inputs"]}
    units = [(0, f"segments/{s}") for s in sorted(committed_snapshots(path))]
    units += [(lvl, uid) for lvl, uid, _ in tiers]
    return sorted((lvl, uid) for lvl, uid in units if uid not in absorbed)


def _build_salts(path: str) -> int:
    """The n_salts every unit was built with (must be uniform — same
    guard as merge_segments)."""
    salts = set()
    for s in committed_snapshots(path):
        with open(_manifest_file(path, s)) as f:
            salts.add(json.load(f).get("n_salts", 1))
    for _, _, m in _tier_units(path):
        salts.add(m.get("n_salts", 1))
    if len(salts) > 1:
        raise ValueError(f"units built with mixed n_salts: {sorted(salts)}")
    return salts.pop() if salts else 1


def _build_positional(path: str) -> bool:
    """Whether the units carry position streams (must be uniform —
    compaction and the query view need one schema)."""
    flags = set()
    for s in committed_snapshots(path):
        with open(_manifest_file(path, s)) as f:
            flags.add(bool(json.load(f).get("positional", False)))
    for _, _, m in _tier_units(path):
        flags.add(bool(m.get("positional", False)))
    if len(flags) > 1:
        raise ValueError("units mix positional and non-positional builds")
    return flags.pop() if flags else False


def _unit_shard_files(path: str, uid: str) -> bool:
    """Whether a unit's postings were written in the shard-file layout
    (``write_shard_files`` marker)."""
    marker = f"{_unit_dir(path, uid)}/LAYOUT.json"
    if not os.path.exists(marker):
        return False
    with open(marker) as f:
        return json.load(f).get("postings") == "shard_files"


def _tombstone_dir(path: str) -> str:
    return f"{path}/tombstones"


def delete_docs(path: str, doc_ids) -> str:
    """Record deletion tombstones for ``doc_ids`` (the LSM delete
    path): queries mask them immediately (``load_tiered`` puts them on
    the handle), and the next ``compact`` that rewrites a unit drops
    their postings physically. Tombstone sets between compactions play
    the memtable-delete role — they stay small relative to the corpus
    and ride the task closure; the durable record is one tiny JSON
    file per delete batch."""
    os.makedirs(_tombstone_dir(path), exist_ok=True)
    # next = max existing suffix + 1 (never len(): a numbering gap or a
    # concurrent writer would silently overwrite a prior batch), and
    # exclusive-create retries the race away
    existing = [
        int(f[3:-5])
        for f in os.listdir(_tombstone_dir(path))
        if f.startswith("ts-") and f.endswith(".json") and f[3:-5].isdigit()
    ]
    seq = (max(existing) + 1) if existing else 0
    while True:
        out = f"{_tombstone_dir(path)}/ts-{seq:06d}.json"
        try:
            with open(out, "x") as f:
                json.dump({"doc_ids": sorted(int(d) for d in doc_ids)}, f)
            return out
        except FileExistsError:
            seq += 1


def retire_tombstones(spark: SparkSession, path: str) -> list[str]:
    """Remove tombstone files whose doc ids no longer appear in ANY
    live unit's doc_stats — compaction has physically applied them
    everywhere. Retiring restores correct LSM shadowing: a tombstone
    masks its doc id only until the physical delete completes, so a
    LATER re-crawl of the same url (same doc_id) becomes visible again
    instead of being shadowed forever. ``compact`` calls this
    automatically; the membership check is one tiny isin-filtered scan
    of the unioned doc stats per tombstone file."""
    from functools import reduce  # noqa: PLC0415

    root = _tombstone_dir(path)
    if not os.path.isdir(root):
        return []
    files = sorted(
        f for f in os.listdir(root) if f.startswith("ts-") and f.endswith(".json")
    )
    if not files:
        return []
    units = live_units(path)
    if not units:
        return []
    dstats = reduce(
        DataFrame.unionByName,
        [spark.read.parquet(f"{_unit_dir(path, u)}/doc_stats") for _, u in units],
    )
    retired = []
    for fname in files:
        with open(f"{root}/{fname}") as f:
            ids = json.load(f)["doc_ids"]
        if not ids or dstats.filter(F.col("doc_id").isin(ids)).limit(1).count() == 0:
            os.remove(f"{root}/{fname}")
            retired.append(fname)
    return retired


def load_tombstones(path: str) -> frozenset:
    """Union of all recorded tombstone sets."""
    root = _tombstone_dir(path)
    if not os.path.isdir(root):
        return frozenset()
    ids: set[int] = set()
    for fname in sorted(os.listdir(root)):
        if fname.startswith("ts-") and fname.endswith(".json"):
            with open(f"{root}/{fname}") as f:
                ids.update(json.load(f)["doc_ids"])
    return frozenset(ids)


def _merge_units(
    spark: SparkSession,
    path: str,
    inputs: list[str],
    out_unit: str,
    level: int,
    block_size: int,
    n_salts: int,
) -> None:
    """Merge the input units' postings + doc stats into one committed
    unit (manifest written last = commit marker). Same vectorized
    decode -> lexsort -> re-encode kernel as the full merge.
    Recorded tombstones are applied PHYSICALLY here (the rewritten
    unit carries neither the deleted docs' postings nor their doc
    stats, so corpus stats fold the deletes in as units compact), and
    so is NEWEST-WINS for re-crawled docs: a doc present in several
    input units keeps only its newest unit's postings and doc stats —
    the same rule the query view masks at read time, so rankings
    agree before and after compaction."""
    from functools import reduce  # noqa: PLC0415

    out_dir = _unit_dir(path, out_unit)
    excluded = tuple(sorted(load_tombstones(path)))
    positional = _build_positional(path)
    # recency-order the inputs so seg ordinal = recency (newest last),
    # the key the newest-wins version map uses
    inputs_rec = [u for _l, u in _recency_ordered(path, [(0, u) for u in inputs])]
    ds_list = [
        spark.read.parquet(f"{_unit_dir(path, u)}/doc_stats") for u in inputs_rec
    ]
    versions = stale_versions(ds_list)
    posts = reduce(
        DataFrame.unionByName,
        [
            spark.read.parquet(f"{_unit_dir(path, u)}/postings").withColumn(
                "seg", F.lit(i)
            )
            for i, u in enumerate(inputs_rec)
        ],
    )
    # same data-volume sizing as merge_segments (compaction is the
    # identical decode->merge->re-encode workload over whole tiers):
    # metadata-only block-row count keeps per-task memory flat however
    # large the input tiers are
    from .build_index import merge_partitions  # noqa: PLC0415

    n_parts = merge_partitions(spark, posts.count())
    merge_cols = [
        "term", "shard", "first_doc", "n_docs", "docs_bin", "tfs_bin", "dls_bin",
        "seg",
    ]
    if positional:
        from ..operators.positions import (  # noqa: PLC0415
            POSITIONAL_SCHEMA,
            merge_partition_pos,
        )

        merge_cols.append("pos_bin")
        kernel, out_schema = merge_partition_pos, POSITIONAL_SCHEMA
    else:
        kernel, out_schema = _merge_partition, POSTINGS_SCHEMA
    merged = (
        posts.select(*merge_cols)
        .withColumn("bsalt", salt_expr(F.col("first_doc"), pow2_salts(n_salts)))
        .repartition(n_parts, "shard", "term", "bsalt")
        .mapInArrow(
            lambda it: kernel(it, block_size, pow2_salts(n_salts), excluded, versions),
            out_schema,
        )
    )
    from ..operators.postings import write_shard_files  # noqa: PLC0415

    write_shard_files(merged, out_dir)

    dstats = reduce(
        DataFrame.unionByName,
        [ds.withColumn("seg", F.lit(i)) for i, ds in enumerate(ds_list)],
    )
    if excluded:
        dstats = dstats.filter(~F.col("doc_id").isin(list(excluded)))
    # unique docs across inputs: newest unit's dl wins (matching the
    # postings rewrite above); dl desc breaks within-unit hash-collision
    # ties the way the encoder's max-(tf, dl) collapse does
    dstats.groupBy("doc_id", "shard").agg(
        F.max_by("dl", F.struct(F.col("seg"), F.col("dl"))).alias("dl")
    ).select("doc_id", "dl", "shard").write.mode("overwrite").parquet(
        f"{out_dir}/doc_stats"
    )

    manifest = {
        "level": level,
        "inputs": inputs,
        "n_salts": pow2_salts(n_salts),
        "block_size": block_size,
        "positional": positional,
        "tombstones_applied": len(excluded),
    }
    with open(f"{out_dir}/MANIFEST.json", "w") as f:
        json.dump(manifest, f, indent=1)


def compact(
    spark: SparkSession,
    path: str,
    fanout: int = DEFAULT_FANOUT,
    block_size: int = BLOCK_SIZE,
) -> list[str]:
    """Tiered compaction: while any level holds >= fanout live units,
    merge the OLDEST fanout of them into one unit at the next level.
    Only same-level units ever merge, so a new snapshot never rewrites
    a higher tier. Returns the tier unit ids created."""
    n_salts = _build_salts(path)
    created = []
    while True:
        by_level: dict[int, list[str]] = {}
        for lvl, uid in live_units(path):
            by_level.setdefault(lvl, []).append(uid)
        lvl = next(
            (lv for lv in sorted(by_level) if len(by_level[lv]) >= fanout), None
        )
        if lvl is None:
            if created:
                # fully-applied tombstones retire so later re-crawls
                # of the same doc id are not shadowed forever
                retire_tombstones(spark, path)
            return created
        victims = sorted(by_level[lvl])[:fanout]
        first = victims[0].rsplit("/", 1)[-1]
        last = victims[-1].rsplit("/", 1)[-1]
        out_unit = f"tiers/L{lvl + 1}/{first}__{last}"
        os.makedirs(_unit_dir(path, out_unit), exist_ok=True)
        _merge_units(spark, path, victims, out_unit, lvl + 1, block_size, n_salts)
        created.append(out_unit)


def _covered_snaps(uid: str, tiers_by_id: dict[str, dict]) -> set[str]:
    """The L0 snapshot names a unit transitively covers (a segment
    covers itself; a tier covers the closure of its inputs)."""
    if uid.startswith("segments/"):
        return {uid.split("/", 1)[1]}
    return set().union(
        *(_covered_snaps(u, tiers_by_id) for u in tiers_by_id[uid]["inputs"])
    )


def units_as_of(path: str, snap: str) -> list[tuple[int, str]]:
    """[(level, unit_id)] reconstructing the index AS OF ``snap``
    (inclusive): the highest-level committed units whose covered
    snapshots all fall at or before the cut, plus the raw segments
    for anything those units don't cover.

    This is snapshot time travel for free out of the LSM layout:
    absorbed inputs stay on disk (they are the build's resume record),
    so a tier that mixes pre- and post-cut snapshots is simply skipped
    in favor of its older constituents — no data is rewritten to
    answer a historical query. Snapshot ids order lexically
    (YYYY-MM-DD days, zero-padded stream batches)."""
    tiers = _tier_units(path)
    tiers_by_id = {uid: m for _lvl, uid, m in tiers}
    snaps = {s for s in committed_snapshots(path) if s <= snap}
    chosen: list[tuple[int, str]] = []
    covered: set[str] = set()
    for lvl, uid, _m in sorted(tiers, key=lambda x: -x[0]):
        cov = _covered_snaps(uid, tiers_by_id)
        if cov <= snaps and not (cov & covered):
            chosen.append((lvl, uid))
            covered |= cov
    chosen += [(0, f"segments/{s}") for s in snaps - covered]
    return sorted(chosen)


def _recency_ordered(path: str, units: list[tuple[int, str]]) -> list[tuple[int, str]]:
    """Units ordered oldest -> newest by the LATEST snapshot each one
    covers (covered snapshot sets are disjoint across live units, so
    the max-snap keys are distinct and the order is total). The
    enumeration ordinal over this order is the ``seg`` the query view
    stamps on postings/doc stats — newest unit = highest seg — which
    is what newest-wins doc versioning keys on."""
    tiers_by_id = {u: m for _l, u, m in _tier_units(path)}
    return sorted(units, key=lambda lu: max(_covered_snaps(lu[1], tiers_by_id)))


def load_tiered(
    spark: SparkSession,
    path: str,
    units: list[tuple[int, str]] | None = None,
    with_tombstones: bool = True,
    newest_wins: bool = True,
) -> InvertedIndex:
    """One queryable ``InvertedIndex`` over all live units (or an
    explicit unit list, e.g. from ``units_as_of``).

    postings carry a ``seg`` column (unit RECENCY ordinal, newest =
    highest) so the WAND reader builds one cursor per (term, unit);
    term/corpus stats are derived lazily from the unioned tables (df
    lookups stay term-filtered scans — the handle's dictionary cache
    memoizes them).

    ``newest_wins=True`` (default): docs present in more than one unit
    (a url re-crawled across snapshots, not yet collapsed by
    compaction) are scored ONCE, from their newest unit — the handle
    carries a (doc_id -> newest seg) version map and every decode
    kernel drops the doc's postings from older units, so a term that
    disappeared from the newest crawl no longer matches the doc.
    The map covers only multi-unit docs (bounded by the re-crawl
    overlap since the last compaction — the memtable-sized set every
    LSM keeps; at larger overlaps, compact). Corpus/term stats keep
    counting the stale crawl until compaction physically folds it in
    — the same drift model as deletion tombstones (Lucene's
    docCount-with-deletes)."""
    from functools import reduce  # noqa: PLC0415

    if units is None:
        units = live_units(path)
    if not units:
        raise ValueError(f"no live units under {path}")
    units = _recency_ordered(path, units)
    gced = [uid for _, uid in units if os.path.exists(f"{_unit_dir(path, uid)}/GCED")]
    if gced:
        raise ValueError(
            f"units {gced} were garbage-collected (gc_units); this view "
            "is older than the retention horizon"
        )
    posts = reduce(
        DataFrame.unionByName,
        [
            spark.read.parquet(f"{_unit_dir(path, uid)}/postings").withColumn(
                "seg", F.lit(i)
            )
            for i, (_, uid) in enumerate(units)
        ],
    )
    dstats = reduce(
        DataFrame.unionByName,
        [spark.read.parquet(f"{_unit_dir(path, uid)}/doc_stats") for _, uid in units],
    )
    cs = dstats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    term_stats = posts.groupBy("term").agg(F.sum("n_docs").alias("df"))
    versions = None
    if newest_wins and len(units) > 1:
        versions = stale_versions(
            [
                spark.read.parquet(f"{_unit_dir(path, uid)}/doc_stats")
                for _, uid in units
            ]
        )
    # the multi-unit view may use the shuffle-free per-shard scan path
    # when every unit is shard-file laid out: a doc's postings live
    # whole in one (shard, unit) file, and with newest-wins active a
    # re-crawled doc's stale copies are version-masked in whichever
    # task they land, so per-task top-k stays exact without
    # co-locating units (postings.whole_shard_scan_ok still verifies
    # file sizes against the planner's split bound at query time)
    shard_files = (newest_wins or len(units) == 1) and all(
        _unit_shard_files(path, uid) for _, uid in units
    )
    # tombstoned docs still PRESENT in a live unit's doc_stats count
    # toward the stats (deleted-docs visibility model); once compaction
    # rewrites their units the stats shrink with the postings. The mask
    # on the handle removes them from every query's result set now.
    return InvertedIndex(
        postings=posts,
        term_stats=term_stats,
        doc_stats=dstats,
        n_docs=cs["n_docs"],
        avgdl=float(cs["avgdl"]),
        tombstones=(load_tombstones(path) or None) if with_tombstones else None,
        doc_versions=versions,
        shard_files=shard_files,
    )


def load_tiered_as_of(spark: SparkSession, path: str, snap: str) -> InvertedIndex:
    """The index AS OF snapshot ``snap`` (inclusive) — a historical
    view reconstructed from on-disk units without rewriting anything
    (the Iceberg-time-travel analogue for the LSM index). Deletion
    tombstones are NOT applied: they record deletes issued after the
    fact, and the historical view shows the corpus as ingested."""
    return load_tiered(
        spark, path, units=units_as_of(path, snap), with_tombstones=False
    )


def gc_units(path: str, retain_asof: str) -> list[str]:
    """Garbage-collect absorbed units older than a retention horizon.

    Deletes the PAYLOAD (postings/stats/extracted parquet) of every
    unit that is neither live nor needed to answer any as-of view at
    a committed snapshot >= ``retain_asof``; manifests stay in place
    (they are the build's resume/commit bookkeeping and the audit
    trail of what was absorbed into what), and a ``GCED`` marker makes
    deeper time travel fail with a clear retention-horizon error
    instead of a missing-parquet stack. Returns the unit ids GC'd.

    This is the storage-reclaim step every LSM deployment runs: the
    as-of views keep absorbed inputs alive only as long as the
    retention window the operator promises. Pure manifest/file
    bookkeeping on the driver — the data deletion is O(retired bytes),
    no Spark job, no rewrite of surviving units."""
    import shutil  # noqa: PLC0415

    needed = {uid for _lvl, uid in live_units(path)}
    for s in committed_snapshots(path):
        if s >= retain_asof:
            needed |= {uid for _lvl, uid in units_as_of(path, s)}
    all_units = {f"segments/{s}" for s in committed_snapshots(path)}
    all_units |= {uid for _lvl, uid, _m in _tier_units(path)}
    gced: list[str] = []
    for uid in sorted(all_units - needed):
        d = _unit_dir(path, uid)
        # marker BEFORE payload deletion: a crash mid-delete must leave
        # the marker in place so deeper as-of reads fail with the clear
        # retention-horizon error, never a raw missing-parquet stack.
        # A marker-ed unit with leftover payload (that crash window) is
        # self-healed here — files are re-removed, but the unit is not
        # re-reported as newly GC'd.
        marker = f"{d}/GCED"
        already = os.path.exists(marker)
        if not already:
            with open(marker, "w") as f:
                json.dump({"retain_asof": retain_asof}, f)
        for sub in os.listdir(d):
            if sub in ("MANIFEST.json", "GCED"):
                continue
            full = f"{d}/{sub}"
            if os.path.isdir(full):
                shutil.rmtree(full)
            else:
                os.remove(full)
        if not already:
            gced.append(uid)
    return gced


def index_stats(spark: SparkSession, path: str) -> DataFrame:
    """(level, unit, snapshots, n_terms, postings, blocks, bytes,
    docs, bytes_per_posting): the ops-facing storage report per LIVE
    unit — Lucene's segment-info API for this layout. Reads each
    unit's postings/doc_stats parquet (metadata-sized aggregations);
    the per-unit rows are as many as live units, so the driver union
    is trivial."""
    rows = []
    for lvl, uid in live_units(path):
        p = spark.read.parquet(f"{_unit_dir(path, uid)}/postings")
        agg = p.agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum("n_docs").alias("postings"),
            F.count(F.lit(1)).alias("blocks"),
            (
                F.sum(F.length("docs_bin"))
                + F.sum(F.length("tfs_bin"))
                + F.sum(F.length("dls_bin"))
            ).alias("bytes"),
        ).collect()[0]
        docs = spark.read.parquet(f"{_unit_dir(path, uid)}/doc_stats").count()
        tiers_by_id = {u: m for _l, u, m in _tier_units(path)}
        snaps = len(_covered_snaps(uid, tiers_by_id))
        rows.append(
            (
                lvl,
                uid,
                snaps,
                agg["n_terms"],
                int(agg["postings"]),
                agg["blocks"],
                int(agg["bytes"]),
                docs,
                round(agg["bytes"] / max(int(agg["postings"]), 1), 2),
            )
        )
    return spark.createDataFrame(
        rows,
        "level int, unit string, snapshots int, n_terms long, postings long, "
        "blocks long, bytes long, docs long, bytes_per_posting double",
    )
