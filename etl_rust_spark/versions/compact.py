"""Compaction: fold small files and merge-on-read sidecar debt into
clean size-targeted files, split from dml.py in r11."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .core import (
    _commit,
    _load_manifest,
    _retry_conflicts,
    _stage_files,
    latest_version,
)
from .layout import (
    _phys_col,
    _synth_of,
)
from .read import (
    _carry_deletes,
    _plan_with_deletes,
)
from .stats import (
    _new_file_meta,
)


def compact_table_version(
    spark: SparkSession,
    path: str,
    max_files_per_partition: int = 1,
    zorder_by: list[str] | None = None,
    bits_per_col: int = 8,
    target_file_bytes: int | None = None,
) -> int:
    """Concurrent-writer-safe wrapper around one compaction pass (see
    :func:`upsert_table_version` for the conflict protocol).
    ``zorder_by`` turns the pass into OPTIMIZE ZORDER BY;
    ``target_file_bytes`` turns it into size-targeted bin-packing
    (both below)."""
    return _retry_conflicts(
        lambda: _compact_table_version_once(
            spark, path, max_files_per_partition, zorder_by, bits_per_col,
            target_file_bytes,
        ),
        f"compaction of {path}",
    )


def _compact_table_version_once(
    spark: SparkSession,
    path: str,
    max_files_per_partition: int = 1,
    zorder_by: list[str] | None = None,
    bits_per_col: int = 8,
    target_file_bytes: int | None = None,
) -> int:
    """OPTIMIZE: rewrite fragmented partitions into at most
    ``max_files_per_partition`` files each, committed as a new
    content-identical version.

    File-level COW upserts accumulate one file set per touched epoch —
    a hot partition upserted N times carries N small files, and small
    files are the classic table killer at scale (footer overhead, task
    scheduling, row-group fragmentation).  Compaction is the missing
    lifecycle step between upsert and :func:`expire_versions`: only
    partitions OVER the threshold rewrite (coalesced to the target file
    count); already-compact partitions' files carry over verbatim, and
    every older version still reads its own files byte-identically.
    Unpartitioned tables compact as one unit.  Stats columns are
    inherited; rewritten files get fresh footer stats.

    ``zorder_by`` (OPTIMIZE ZORDER BY parity): instead of coalescing
    fragmented partitions, rewrite EVERY data file with the whole head
    z-order clustered on those columns (:func:`catalog.zorder_frame` —
    quantile-bucketed Morton keys, one range exchange + in-file sort).
    The freshly computed per-file [min, max] stats then cover small
    disjoint hyper-rectangles, so subsequent ``prune``/``point`` reads
    on ANY clustered column skip most files — the re-layout step that
    makes manifest stats pruning actually bite after random-order
    ingestion.  File budget: ``max_files_per_partition`` × the head's
    partition-directory count (one unit when unpartitioned).

    ``target_file_bytes`` (Delta OPTIMIZE bin-packing parity, r10 s3):
    instead of a uniform file-count threshold, each partition's target
    output count is ``ceil(partition_bytes / target_file_bytes)`` and
    only partitions where merging actually REDUCES the file count
    rewrite — a partition holding one over-target file is never
    touched (no file splitting, like Delta), and a 100-partition table
    with one hot fragmented partition rewrites exactly that one.  The
    packing is approximate by design: byte sizes are the compressed
    on-disk sizes (recompression shifts them), and slot allocation can
    merge adjacent slots (files land OVER target rather than under —
    the cheap direction, fewer-larger files).  Mutually exclusive with
    ``zorder_by``; ``max_files_per_partition`` is ignored when set."""
    if target_file_bytes is not None:
        if zorder_by:
            raise ValueError(
                "target_file_bytes does not compose with zorder_by — "
                "run the z-order pass first, then size-compact"
            )
        if target_file_bytes <= 0:
            raise ValueError("target_file_bytes must be positive")
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, head)
    partition_by = m.get("partition_by") or None
    stats_cols = m.get("stats_cols") or None

    def part_of(f: str) -> str:
        return f.rsplit("/", 1)[0] if "/" in f else ""

    by_part: dict[str, list[str]] = {}
    for f in m["files"]:
        by_part.setdefault(part_of(f), []).append(f)
    if zorder_by:
        from etl_rust_spark.catalog import zorder_frame

        if not m["files"] or not m["count"]:
            # empty table (possibly schema-only part files): no layout
            return head
        data = str(Path(path) / "data")
        scope = _plan_with_deletes(
            spark, data, m["files"], m.get("deletes"), _synth_of(m)
        )
        n_files = max_files_per_partition * max(1, len(by_part))
        rewritten = zorder_frame(
            scope, [_phys_col(m, c) for c in zorder_by],
            n_files, bits_per_col,
        )
        new_files = _stage_files(rewritten, path, partition_by)
        bloom_conf = m.get("blooms_conf")
        stats = _new_file_meta(
            spark, path, new_files, stats_cols, bloom_conf
        )
        return _commit(
            path, new_files, m["count"], head, partition_by,
            stats_cols, stats, bloom_conf=bloom_conf, op="zorder",
        )
    # a partition is compactable when it is FRAGMENTED (too many files)
    # or carries MoR delete-sidecar debt (rewriting folds the mask into
    # clean files — "the compactor folds them", VERDICT r9 #3)
    masked = set()
    for d in m.get("deletes") or []:
        masked.update(part_of(f) for f in d["files"])
    n_out: dict[str, int] = {}
    if target_file_bytes is not None:
        import math

        data_dir = Path(path) / "data"
        for p, fs in by_part.items():
            part_bytes = sum((data_dir / f).stat().st_size for f in fs)
            n_out[p] = max(1, math.ceil(part_bytes / target_file_bytes))
        fragmented = sorted(
            p for p, fs in by_part.items()
            if len(fs) > n_out[p] or p in masked
        )
    else:
        fragmented = sorted(
            p for p, fs in by_part.items()
            if len(fs) > max_files_per_partition or p in masked
        )
    if not fragmented:
        return head  # nothing to do — no empty commits
    if partition_by:
        # Plan the fragmented partitions from their FILES directly —
        # no value-level filter, so Hive-escaped directory names
        # (':' → '%3A', __HIVE_DEFAULT_PARTITION__, date rendering)
        # never round-trip through str() (ADVICE r7); also reads only
        # the partitions being rewritten instead of the whole head.
        frag = set(fragmented)
        data = str(Path(path) / "data")
        frag_files = [f for f in m["files"] if part_of(f) in frag]
        carried = [f for f in m["files"] if part_of(f) not in frag]
    else:
        data = str(Path(path) / "data")
        frag_files = list(m["files"])
        carried = []
    if target_file_bytes is None:
        # deletes-aware: compaction FOLDS sidecars for the partitions it
        # rewrites (masked rows physically drop, the sidecar's scope
        # shrinks to the carried files)
        scope = _plan_with_deletes(spark, data, frag_files, m.get("deletes"),
                                   _synth_of(m))
        rewritten = scope.coalesce(max_files_per_partition)
    else:
        # size-targeted bin-pack: route each row to one of its
        # partition's ceil(bytes/target) output slots.  Fragmented
        # files group BY SLOT COUNT into one plan branch each (distinct
        # counts are few — log-ish in partition sizes), every branch
        # carrying its count as a literal, so no input_file_name (it is
        # rejected over the MoR anti-join union) and no directory-name
        # round-trip (the ADVICE-r7 escaping lesson).  Slot assignment
        # is a wide row hash mod the count (duplicates colocate); the
        # range exchange keeps (partition, slot) groups contiguous so
        # output files stay single-partition-value.
        by_n: dict[int, list[str]] = {}
        for f in frag_files:
            by_n.setdefault(n_out[part_of(f)], []).append(f)
        total = sum(n_out[p] for p in fragmented) or 1
        keyed = None
        for n, fs in sorted(by_n.items()):
            b = _plan_with_deletes(spark, data, fs, m.get("deletes"),
                                   _synth_of(m))
            slot = F.pmod(
                F.xxhash64(*[F.col(c) for c in b.columns]), F.lit(n)
            )
            b = b.withColumn("__slot", slot)
            keyed = b if keyed is None else keyed.unionByName(b)
        cols = ([F.col(partition_by)] if partition_by else []) + [
            F.col("__slot")
        ]
        rewritten = keyed.repartitionByRange(total, *cols).drop("__slot")
    new_files = _stage_files(rewritten, path, partition_by)
    bloom_conf = m.get("blooms_conf")
    old_stats = m.get("stats") or {}
    stats = {f: old_stats[f] for f in carried if f in old_stats}
    stats.update(_new_file_meta(spark, path, new_files, stats_cols, bloom_conf))
    return _commit(
        path, carried + new_files, m["count"], head, partition_by,
        stats_cols, stats, bloom_conf=bloom_conf, op="compact",
        deletes=_carry_deletes(m.get("deletes"), carried),
    )
