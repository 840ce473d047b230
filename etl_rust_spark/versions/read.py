"""Snapshot reads: read_table_version, AS OF resolution, merge-on-read
planning (sidecar anti-joins, positional annotations) and the find-
the-files step DML shares.

Mechanical split of the former single-module versions.py (r11); see the package __init__ for the public surface."""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import (
    list_tags,
    _load_manifest,
    _manifest_path,
    latest_version,
    list_versions,
)
from .layout import (
    _bucket_seg_of,
    _phys_col,
    _seg_value_of,
    _synth_of,
    _to_logical,
    _to_physical,
    _transform_of,
    _transform_prune_keep,
)
from .stats import (
    _BLOOM_KEY,
    _bloom_might_contain,
    _point_probe_str,
    _rel_from_file_uri,
)


# ------------------------------------------------- merge-on-read deletes
# (VERDICT r9 #3, Iceberg-v2-delete-file shaped): a MoR delete writes a
# SIDECAR parquet of row FINGERPRINTS instead of rewriting the hit data
# files — a 1-row takedown on a 1 GB file costs one KB-sized sidecar.
# Readers anti-join the sidecar at scan time (the MoR read tax); the
# compactor folds sidecars back into clean files.  Scoping rule: a
# sidecar applies ONLY to the data files recorded with it — files are
# immutable, so a later re-insert of byte-identical content lands in a
# NEW file and is never masked (the role Iceberg's sequence numbers
# play, expressed on the file axis).  The fingerprint is the proven-
# injective encoding from operators/profile.py over ALL columns in
# sorted-name order, so "delete exactly these rows" is exact row-value
# semantics, NULLs included, with no null-safe-join gymnastics.


_MOR_MAX_ROWS = 1_000_000


def _check_mor_size(n_matched: int, mor_max_rows: int, op: str,
                    path: str) -> None:
    """The MoR cost model is BROADCAST-SIZED takedowns: the sidecar
    stages through one task (coalesce(1)) and then rides every read as
    a broadcast delete side.  A broad predicate breaks both halves —
    one funneled writer task now, an executor-memory-sized broadcast
    on every read after — so past the row threshold refuse with the
    CoW remediation instead of silently degrading (VERDICT r10 #5)."""
    if n_matched > mor_max_rows:
        raise ValueError(
            f"{op} of {path} matched {n_matched:,} rows — over the "
            f"mor_max_rows={mor_max_rows:,} sidecar guard.  A sidecar "
            "that size funnels through one staging task and then rides "
            "EVERY read as a broadcast delete side.  Use mode='cow' "
            "for broad predicates (write amplification once, clean "
            "reads after), or pass a larger mor_max_rows if the read "
            "tax is understood"
        )


def _sidecar_rows(matched: DataFrame, m: dict) -> DataFrame:
    """One sidecar row per matched row: ``_fp`` (the injective full-
    row fingerprint in PHYSICAL space — column order sorts by NAME, so
    a rename never changes it) plus ``_file``/``_pos`` (data-relative
    file and row position, captured from the delete-time scan) so
    position-capable readers mask without replicating the fingerprint
    encode.  Fingerprint readers ``select("_fp").distinct()`` and see
    exactly the pre-r11 shape.  ``matched`` carries the
    :data:`_POS_COLS` annotations; :func:`_to_physical` passes them
    through untouched, and they are excluded from the fingerprint."""
    from etl_rust_spark.operators.profile import _fingerprint

    matched_p = _to_physical(matched, m)
    fp_cols = sorted(c for c in matched_p.columns
                     if c not in _POS_COLS)
    return matched_p.select(
        _fingerprint(matched_p, fp_cols).alias("_fp"),
        F.col(_POS_COLS[0]).alias("_file"),
        F.col(_POS_COLS[1]).alias("_pos"),
    )


def _stage_delete_sidecar(fps: DataFrame, table: str) -> str:
    """Write a sidecar frame as ONE parquet under ``data/_deletes/``
    (sidecars are driver-named, collision-free, and live inside data/
    so expiry's sweep covers them); returns the data-relative path."""
    root = Path(table)
    stage = root / f"_stage-{uuid.uuid4().hex}"
    fps.coalesce(1).write.parquet(str(stage))
    part = next(iter(sorted(stage.rglob("*.parquet"))))
    rel = f"_deletes/{uuid.uuid4().hex}.parquet"
    dest = root / "data" / rel
    dest.parent.mkdir(parents=True, exist_ok=True)
    os.rename(part, dest)
    shutil.rmtree(stage)
    return rel


def _carry_deletes(
    parent_deletes: list[dict] | None, carried_files: list[str]
) -> list[dict] | None:
    """Sidecar carry rule for every rewriting op: files REWRITTEN in
    this commit were re-staged from a deletes-aware read (their masked
    rows are physically gone), so each sidecar keeps only the files
    that carried over verbatim; sidecars left scoping nothing drop."""
    if not parent_deletes:
        return None
    sset = set(carried_files)
    out = []
    for d in parent_deletes:
        files = [f for f in d["files"] if f in sset]
        if files:
            out.append({"path": d["path"], "files": files})
    return out or None


_POS_COLS = ("__pos_file", "__pos_idx")


def _pos_annotation_cols(data: str) -> list:
    """(data-relative file, row position) expressions over a scan's
    ``_metadata`` columns — recorded into MoR sidecars at delete time
    so position-capable readers (the jar-free DataSource) can mask
    rows without replicating the fingerprint string-cast encode.
    Literal '+' is pre-escaped before url_decode (the deltalake
    scan-side discipline: java decodes '+' to a space, silently
    breaking path equality)."""
    data_abs = str(Path(data).resolve())
    dec = F.url_decode(
        F.regexp_replace(F.col("_metadata.file_path"), r"\+", "%2B")
    )
    rel = F.regexp_replace(
        F.regexp_replace(dec, "^file:/+", "/"),
        "^" + re.escape(data_abs) + "/", "",
    )
    return [rel.alias(_POS_COLS[0]),
            F.col("_metadata.row_index").alias(_POS_COLS[1])]


def _plan_with_deletes(
    spark: SparkSession, data: str, files: list[str],
    deletes: list[dict] | None,
    synth: str | None = None,
    positions: bool = False,
) -> DataFrame:
    """Plan ``files`` with MoR sidecars applied: files are grouped by
    their APPLICABLE sidecar set (usually one or two groups — most
    files have none), each group anti-joins the broadcast union of its
    sidecars' fingerprints, groups union back.  Cost model at 100 TB:
    the delete side is KBs–MBs (broadcast, no shuffle of the data
    side); untouched file groups pay nothing.

    ``synth`` (transform tables): the synthetic partition column is
    cast back to STRING immediately after the read — partition
    inference would type '2026-01-01' directories as DATE and bucket
    digits as INT, which would desynchronize the fingerprint encoding
    between the read-side anti-join here and the sidecar build (both
    must see the same dtype)."""
    by_sidecars: dict[tuple[str, ...], list[str]] = {}
    scoped = [
        (d["path"], frozenset(d["files"])) for d in (deletes or [])
    ]
    for f in files:
        key = tuple(sorted(p for p, fs in scoped if f in fs))
        by_sidecars.setdefault(key, []).append(f)
    parts = []
    for sidecars, fs in sorted(by_sidecars.items()):
        df = spark.read.option("basePath", data).parquet(
            *[f"{data}/{f}" for f in fs]
        )
        if positions:
            # per scan relation, BEFORE the union (`_metadata` does
            # not resolve through a union)
            df = df.select("*", *_pos_annotation_cols(data))
        if synth and synth in df.columns:
            df = df.withColumn(synth, F.col(synth).cast("string"))
        if sidecars:
            dd = spark.read.parquet(
                *[f"{data}/{s}" for s in sidecars]
            ).select("_fp").distinct()
            from etl_rust_spark.operators.profile import _fingerprint

            # fingerprint the DATA columns only — the position
            # annotations are reader-side bookkeeping, never part of
            # the row identity the sidecars encode
            fp_cols = sorted(c for c in df.columns
                             if c not in _POS_COLS)
            df = (
                df.withColumn("__fp", _fingerprint(df, fp_cols))
                .join(
                    F.broadcast(dd),
                    F.col("__fp") == F.col("_fp"),
                    "left_anti",
                )
                .drop("__fp")
            )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _import_positional_sidecar(
    spark: SparkSession, src: str, dest: str,
    dv_state: dict[str, frozenset],
    cache: dict,
    synth: str | None = None,
) -> list[dict]:
    """An external table format's row-level delete state — ``{dest
    data-relative file: deleted row positions}`` — re-materialized as
    this layer's positional MoR sidecar (r12, shared by the Delta DV
    and Iceberg position-delete importers): the masked rows (located
    via ``_metadata.row_index``) fingerprint into the sidecar's
    ``(_fp, _file, _pos)`` shape, so both the fingerprint reader and
    the position-capable DataSource mask exactly what the source
    format masks.  Cached on the full (file → positions) state — a
    mask that persists unchanged across imported versions
    re-references the same sidecar file.

    Guards: a mask covering only SOME of a set of full-row duplicates
    has no fingerprint representation (the value-exact anti-join would
    drop the surviving twins) and refuses with the materialize
    remediation; a position that hits no row means a corrupt source
    descriptor and would silently under-delete — also refuses."""
    from etl_rust_spark.operators.profile import _fingerprint

    key = frozenset(dv_state.items())
    if key in cache:
        return cache[key]
    data = str(Path(dest) / "data")
    # ``synth``: when the dest reconstructs a HIDDEN transform, the
    # read-side fingerprint includes the synthetic partition column —
    # the sidecar build must see the identical column set or the
    # anti-join silently masks nothing
    pdf = _plan_with_deletes(spark, data, sorted(dv_state), None,
                             synth, positions=True)
    fp_cols = sorted(c for c in pdf.columns if c not in _POS_COLS)
    ann = pdf.select(
        _fingerprint(pdf, fp_cols).alias("_fp"),
        F.col(_POS_COLS[0]), F.col(_POS_COLS[1]),
    )
    pairs = spark.createDataFrame(
        [(f, p) for f, ps in sorted(dv_state.items())
         for p in sorted(ps)],
        f"{_POS_COLS[0]} string, {_POS_COLS[1]} long",
    )
    matched = ann.join(F.broadcast(pairs), list(_POS_COLS), "semi")
    n_expect = sum(len(p) for p in dv_state.values())
    n_matched = matched.count()
    if n_matched != n_expect:
        raise ValueError(
            f"row-level deletes of {src} name {n_expect} row "
            f"positions but only {n_matched} exist in the data files "
            "— corrupt delete descriptor or truncated file"
        )
    unmatched = ann.join(F.broadcast(pairs), list(_POS_COLS), "anti")
    clash = (matched.select("_fp").intersect(unmatched.select("_fp"))
             .limit(1).count())
    if clash:
        raise ValueError(
            f"a row-level delete of {src} masks only some of a set of "
            "full-row duplicates — a fingerprint sidecar would drop "
            "the surviving twins too; materialize via the format's "
            "reader + write_table_version instead"
        )
    side = matched.select(
        "_fp",
        F.col(_POS_COLS[0]).alias("_file"),
        F.col(_POS_COLS[1]).alias("_pos"),
    )
    rel = _stage_delete_sidecar(side, dest)
    out = [{"path": rel, "files": sorted(dv_state)}]
    cache[key] = out
    return out


def _parse_as_of(ts) -> float:
    """AS OF timestamp → epoch seconds.  Accepts epoch int/float, a
    datetime (tz-naive assumed UTC — never silently local), or an
    ISO-8601 string ('2026-08-15T12:00:00Z' / '+00:00' offsets /
    date-only)."""
    import datetime as _dt

    if isinstance(ts, bool) or not isinstance(
        ts, (int, float, str, _dt.datetime, _dt.date)
    ):
        raise TypeError(f"as_of must be epoch/datetime/ISO string, got "
                        f"{type(ts).__name__}")
    if isinstance(ts, (int, float)):
        return float(ts)
    if isinstance(ts, str):
        s = ts[:-1] + "+00:00" if ts.endswith("Z") else ts
        ts = _dt.datetime.fromisoformat(s)
    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return ts.timestamp()
    # a plain date: midnight UTC
    return _dt.datetime(
        ts.year, ts.month, ts.day, tzinfo=_dt.timezone.utc
    ).timestamp()


def version_at_timestamp(path: str, as_of) -> int:
    """AS OF <timestamp> resolution (VERDICT r9 #4 — Delta/Iceberg's
    most-used time-travel form): the NEWEST version whose commit
    timestamp is <= ``as_of``.  Commit timestamps are read from the
    manifests (recorded at commit since r10 and forced monotone over
    the parent's; pre-r10 manifests fall back to file mtime).  Raises
    if ``as_of`` predates the first surviving commit — retention may
    have expired the version that WAS current then, and guessing an
    older-but-wrong snapshot would be silent time-travel corruption."""
    t = _parse_as_of(as_of)
    best = None
    for v in list_versions(path):
        mp = _manifest_path(path, v)
        try:
            vts = json.loads(mp.read_text()).get("ts")
            if vts is None:
                vts = mp.stat().st_mtime  # pre-r10 manifest
        except (FileNotFoundError, json.JSONDecodeError):
            continue
        if float(vts) <= t:
            best = v  # list_versions is ascending; keep the newest
    if best is None:
        raise ValueError(
            f"no version of {path} committed at or before {as_of!r} "
            "(before the first surviving commit — expired by retention, "
            "or the timestamp predates the table)"
        )
    return best


def read_table_version(
    spark: SparkSession,
    path: str,
    version: int | str | None = None,
    prune: list[tuple] | None = None,
    point: list[tuple] | None = None,
    as_of=None,
) -> DataFrame:
    """The table AS OF ``version`` (default: latest) — planned from the
    manifest's explicit file list, ``basePath``-anchored so partition
    columns survive reading individual files.

    ``prune`` is a list of ``(col, lo, hi)`` range predicates evaluated
    against the manifest's per-file stats BEFORE planning: files whose
    recorded [min, max] cannot intersect are never handed to Spark at
    all (driver-side, zero I/O).  ``point`` is a list of ``(col,
    value)`` equality probes evaluated against per-file bloom filters
    (``bloom_cols`` at write time; str/int values render identically to
    the CAST(col AS STRING) the build hashed, bool is normalized to
    Spark's 'true'/'false', anything else raises — see
    :func:`_point_probe_str`) — the pruning
    that works where min/max can't: unordered high-cardinality keys.
    Files without stats/blooms for a column are kept — pruning is an
    optimization, never a filter: callers still apply the real
    predicate to the returned frame (bloom false positives only keep
    extra files, never drop a match).

    ``as_of`` reads the table AS OF a wall-clock instant (epoch /
    datetime / ISO-8601 string — :func:`version_at_timestamp`);
    mutually exclusive with ``version``."""
    if as_of is not None:
        if version is not None:
            raise ValueError("pass version OR as_of, not both")
        version = version_at_timestamp(path, as_of)
    if isinstance(version, str):  # a tag name (tag_version)
        tags = list_tags(path)
        if version not in tags:
            raise FileNotFoundError(f"no tag {version!r} on {path}")
        version = tags[version]
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, v)
    data = str(Path(path) / "data")
    files = m["files"]
    if not files:
        if m.get("schema"):
            # an EMPTY version (delete_table_version removed every
            # row): the manifest carries the schema no file can
            from pyspark.sql.types import StructType

            return _to_logical(
                spark.createDataFrame([], StructType.fromJson(m["schema"])),
                m,
            )
        raise ValueError(f"version {v} of {path} is empty")
    # prune/point arrive in LOGICAL names; stats/bloom keys are
    # PHYSICAL (recorded at file-write time, rename-stable)
    raw_point = point  # typed values, pre-rendering (bucket replica)
    if prune:
        prune = [(_phys_col(m, c), lo, hi) for c, lo, hi in prune]
    if point:
        point = [(_phys_col(m, c), _point_probe_str(c, val))
                 for c, val in point]
    if prune or point:
        stats = m.get("stats") or {}
        # hidden partitioning: prunes on the transform SOURCE column
        # additionally skip whole directories (days/hours/truncate
        # range mapping; bucket point-probe replica)
        t = _transform_of(m)
        t_prunes = (
            [pr for pr in prune or [] if pr[0] == t["source"]]
            if t
            else []
        )
        t_bucket_segs = None
        if t and t["kind"] == "bucket":
            probes = [
                _bucket_seg_of(t, v)
                for c, v in raw_point or []
                if _phys_col(m, c) == t["source"]
            ]
            if probes and None not in probes:
                # AND semantics (like blooms): a file must be able to
                # hold EVERY probe — distinct buckets prune everything
                t_bucket_segs = set(probes)

        def keep(f: str) -> bool:
            if t_bucket_segs is not None:
                sv = _seg_value_of(f)
                if sv is not None and not all(
                    sv == b for b in t_bucket_segs
                ):
                    return False
            if t_prunes and not _transform_prune_keep(
                t, _seg_value_of(f), t_prunes
            ):
                return False
            fs = stats.get(f)
            if not fs:
                return True
            for col, lo, hi in prune or []:
                if col in fs:
                    fmin, fmax = fs[col]
                    if (hi is not None and fmin > hi) or (
                        lo is not None and fmax < lo
                    ):
                        return False
            for col, val in point or []:
                entry = fs.get(_BLOOM_KEY + col)
                if entry and not _bloom_might_contain(entry, val):
                    return False
            return True

        files = [f for f in files if keep(f)]
    if not files:
        # stats pruned every file: an empty frame with the version's
        # schema, planned from ONE file (all files of a version share a
        # schema — evolution commits full snapshots).  No recursion:
        # recursing on the same version with prune dropped used to
        # RecursionError on empty manifests (ADVICE r7).
        return _to_logical(
            spark.read.option("basePath", data)
            .parquet(f"{data}/{m['files'][0]}")
            .limit(0),
            m,
        )
    # MoR sidecars (if any) anti-join here — the read tax a mode="mor"
    # delete trades for not rewriting data files; plain tables take the
    # zero-cost branch inside.  The column map applies LAST: sidecar
    # fingerprints and partition columns are physical underneath
    return _to_logical(
        _plan_with_deletes(spark, data, files, m.get("deletes"),
                           _synth_of(m)), m
    )


def _files_matching(
    spark: SparkSession, m: dict, data: str, data_abs: Path, cond,
    prune: list[tuple] | None, point: list[tuple] | None,
) -> set[str]:
    """The find-the-files step shared by DELETE and UPDATE: stats/bloom
    prune the candidates driver-side, then ONE job (predicate pushed to
    the scan, ReadSchema pruned to the predicate columns — CI-asserted
    in tests/test_plans.py) collects the DISTINCT FILE NAMES holding a
    matching row — bounded by file count, never row count."""
    candidates = list(m["files"])
    raw_point = point  # typed values, pre-rendering (bucket replica)
    if prune:
        prune = [(_phys_col(m, c), lo, hi) for c, lo, hi in prune]
    if point:
        point = [(_phys_col(m, c), _point_probe_str(c, val))
                 for c, val in point]
    if prune or point:
        stats = m.get("stats") or {}
        t = _transform_of(m)
        t_prunes = (
            [pr for pr in prune or [] if pr[0] == t["source"]]
            if t
            else []
        )
        t_bucket_segs = None
        if t and t["kind"] == "bucket":
            probes = [
                _bucket_seg_of(t, v)
                for c, v in raw_point or []
                if _phys_col(m, c) == t["source"]
            ]
            if probes and None not in probes:
                t_bucket_segs = set(probes)

        def keep(f: str) -> bool:
            if t_bucket_segs is not None:
                sv = _seg_value_of(f)
                if sv is not None and not all(
                    sv == b for b in t_bucket_segs
                ):
                    return False
            if t_prunes and not _transform_prune_keep(
                t, _seg_value_of(f), t_prunes
            ):
                return False
            fs = stats.get(f)
            if not fs:
                return True
            for col, lo, hi in prune or []:
                if col in fs:
                    fmin, fmax = fs[col]
                    if (hi is not None and fmin > hi) or (
                        lo is not None and fmax < lo
                    ):
                        return False
            for col, val in point or []:
                entry = fs.get(_BLOOM_KEY + col)
                if entry and not _bloom_might_contain(entry, val):
                    return False
            return True

        candidates = [f for f in candidates if keep(f)]
    if not candidates:
        return set()
    cdf = spark.read.option("basePath", data).parquet(
        *[f"{data}/{f}" for f in candidates]
    )
    # the predicate arrives in LOGICAL names; the aliased projection
    # still pushes the filter to the (physical) scan
    hit_uris = [
        r[0]
        for r in _to_logical(cdf, m).filter(cond)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    ]
    known = set(m["files"])
    hit: set[str] = set()
    for u in hit_uris:
        rel = _rel_from_file_uri(u, data_abs)
        if rel not in known:  # never silently rewrite the wrong file
            raise ValueError(
                f"matched file {rel!r} is not in version "
                f"{m['version']}'s manifest"
            )
        hit.add(rel)
    return hit
