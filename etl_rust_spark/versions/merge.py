"""MERGE INTO (Delta parity): the conditional keyed merge, split from
dml.py in r11."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import (
    _commit,
    _load_manifest,
    _retry_conflicts,
    _stage_files,
    latest_version,
)
from .layout import (
    _logical_pb,
    _phys_col,
    _synth_of,
    _to_logical,
    _to_physical,
)
from .metadata import (
    _validate_constraints,
)
from .read import (
    _MOR_MAX_ROWS,
    _POS_COLS,
    _carry_deletes,
    _check_mor_size,
    _plan_with_deletes,
    _sidecar_rows,
    _stage_delete_sidecar,
)
from .stats import (
    _new_file_meta,
    _rel_from_file_uri,
)


def merge_table_version(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    when_matched_update: dict | str | None = None,
    when_matched_delete=None,
    when_not_matched_insert=None,
    update_condition=None,
    prune: list[tuple] | None = None,
    mode: str = "cow",
    mor_max_rows: int = _MOR_MAX_ROWS,
) -> int:
    """``MERGE INTO`` (Delta parity) — the conditional keyed merge the
    unconditional :func:`upsert_table_version` cannot express, and the
    natural CDC-apply operation (a feed of upserts AND deletes lands in
    ONE commit).  ``source`` joins the head on ``keys``; clauses:

    - ``when_matched_delete``: ``True`` or a SQL/Column condition —
      matched target rows satisfying it are removed.  Evaluated FIRST
      (the Delta convention for delete-then-update clause stacks); a
      NULL condition leaves the row (SQL semantics).
    - ``when_matched_update``: ``"*"`` (every target column takes the
      source's value) or ``{col: expr}``; expressions and conditions
      see the target row as ``t`` and the source row as ``s``
      (``{"val": "concat(t.val, s.val)"}``).  ``update_condition``
      narrows it; rows matching neither clause carry unchanged.
    - ``when_not_matched_insert``: ``True``/``"*"`` (source must carry
      every target column; extra source columns are dropped) or a
      condition — source rows with no key match insert as new rows.

    Duplicate-match protection (Delta's error, same reason): if a
    target row matches MORE THAN ONE source row the merge raises —
    which source row wins would be nondeterministic.

    Scale: the same three-step narrowing as DELETE/UPDATE — source key
    [min,max] bounds prune candidate files driver-side (a small CDC
    batch against a clustered table touches few files), one semi-join
    job collects the hit FILE names, and only hit files rewrite; an
    insert-only merge (no matched clauses) rewrites ZERO files and
    reduces to a pure append.  The not-matched anti-join reads only the
    key columns of the head (column-pruned scan).  Reference shape:
    Delta MERGE; the file-level rewrite mirrors this module's
    delete/update (versions.py r9-r10).

    ``mode="mor"`` (r12, completes the DML trio's merge-on-read):
    matched rows a clause TOUCHES (updated or deleted) mask through a
    positional sidecar scoped to the hit files, updated images and
    inserts append as new files — ZERO data files rewritten; untouched
    matched rows never leave their file.  The sidecar guard
    (``mor_max_rows``) refuses broad matches with the CoW remediation;
    ``mode="auto"`` routes instead (small → sidecar, broad → rewrite),
    exactly like delete/update."""
    if when_matched_update is None and when_matched_delete is None \
            and when_not_matched_insert is None:
        raise ValueError("MERGE needs at least one WHEN clause")
    missing = [k for k in keys if k not in source.columns]
    if missing:
        raise ValueError(f"source is missing key columns: {missing}")
    if mode not in ("cow", "mor", "auto"):
        raise ValueError(f"mode must be cow|mor|auto, got {mode!r}")
    return _retry_conflicts(
        lambda: _merge_table_version_once(
            spark, path, source, keys, when_matched_update,
            when_matched_delete, when_not_matched_insert,
            update_condition, prune, mode, mor_max_rows,
        ),
        f"merge into {path}",
    )


def _merge_always(c) -> bool:
    """Is this clause unconditional? (never use ``in``/``==`` on a
    possibly-Column value — Column.__eq__ returns a Column and its
    truthiness raises)."""
    return c is True or (isinstance(c, str) and c == "*")


def _merge_cond(c):
    """Normalize a clause condition: True/"*" → always, str → expr;
    NULL evaluates to not-taken (SQL clause semantics)."""
    if _merge_always(c):
        return F.lit(True)
    return F.coalesce(F.expr(c) if isinstance(c, str) else c, F.lit(False))


def _merge_table_version_once(
    spark: SparkSession, path: str, source: DataFrame, keys: list[str],
    upd, dele, ins, upd_cond, prune: list[tuple] | None,
    mode: str = "cow", mor_max_rows: int = _MOR_MAX_ROWS,
) -> int:
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(
            f"no committed versions under {path} — MERGE needs an "
            "existing table (seed with write_table_version)"
        )
    m = _load_manifest(path, head)
    partition_by = m.get("partition_by") or None
    stats_cols = m.get("stats_cols") or None
    bloom_conf = m.get("blooms_conf")
    if not m["files"]:
        # emptied table: every source row is not-matched
        if not ins:
            return head
        seeded = source
        if not _merge_always(ins):
            seeded = source.filter(_merge_cond(ins))
        seeded = _to_physical(seeded, m)  # staged files live physical
        tgt_schema = m.get("schema")
        if tgt_schema:
            cols = [f["name"] for f in tgt_schema["fields"]]
            seeded = seeded.select(*cols)
        n = seeded.count()
        if not n:
            return head
        _validate_constraints(
            seeded, m.get("constraints"), f"merge into {path}"
        )
        files = _stage_files(seeded, path, partition_by)
        stats = _new_file_meta(spark, path, files, stats_cols, bloom_conf) or None
        return _commit(path, files, n, head, partition_by, stats_cols,
                       stats, bloom_conf=bloom_conf, op="merge")
    data_abs = (Path(path) / "data").resolve()
    data = str(Path(path) / "data")
    existing = _to_logical(
        _plan_with_deletes(spark, data, m["files"], m.get("deletes"),
                           _synth_of(m)), m
    )
    if upd == "*" or ins is not None:
        # every insert is "*"-shaped (optionally conditional): the
        # inserted row is the source row projected to the table schema
        lacking = [c for c in existing.columns if c not in source.columns]
        if lacking:
            raise ValueError(
                f"source is missing table columns {sorted(lacking)} "
                "required by the update('*')/insert clause"
            )
    if isinstance(upd, dict):
        unknown = [c for c in upd if c not in existing.columns]
        if unknown:
            raise ValueError(f"UPDATE SET of unknown columns: {unknown}")
        lpb = _logical_pb(m)
        if lpb and lpb in upd:
            raise ValueError(
                f"cannot UPDATE partition column {lpb!r} — rows "
                "would move directories; route through delete + insert"
            )

    hit: set[str] = set()
    if upd is not None or dele is not None:
        # source key bounds prune candidates driver-side before the
        # find-the-files semi-join (one tiny agg over the source)
        auto_prune = list(prune or [])
        if m.get("stats") and not auto_prune:
            aggs = []
            for k in keys:
                # stats keys are PHYSICAL; the source column is logical
                if _phys_col(m, k) in (stats_cols or []):
                    aggs += [F.min(k).alias(f"lo_{k}"),
                             F.max(k).alias(f"hi_{k}")]
            if aggs:
                row = source.agg(*aggs).collect()[0].asDict()
                for k in keys:
                    if f"lo_{k}" in row and row[f"lo_{k}"] is not None:
                        auto_prune.append(
                            (_phys_col(m, k), row[f"lo_{k}"], row[f"hi_{k}"])
                        )
        candidates = list(m["files"])
        if auto_prune:
            stats = m.get("stats") or {}

            def keep(f: str) -> bool:
                fs = stats.get(f)
                if not fs:
                    return True
                for col, lo, hi in auto_prune:
                    if col in fs:
                        fmin, fmax = fs[col]
                        if (hi is not None and fmin > hi) or (
                            lo is not None and fmax < lo
                        ):
                            return False
                return True

            candidates = [f for f in candidates if keep(f)]
        if candidates:
            cdf = spark.read.option("basePath", data).parquet(
                *[f"{data}/{f}" for f in candidates]
            )
            hit_uris = [
                r[0]
                for r in _to_logical(cdf, m).select(
                    F.input_file_name().alias("_f"), *keys
                )
                .join(source.select(*keys).distinct(), keys, "left_semi")
                .select("_f")
                .distinct()
                .collect()
            ]
            known = set(m["files"])
            for u in hit_uris:
                rel = _rel_from_file_uri(u, data_abs)
                if rel not in known:
                    raise ValueError(
                        f"matched file {rel!r} is not in version "
                        f"{m['version']}'s manifest"
                    )
                hit.add(rel)

    new_files: list[str] = []
    n_t = n_out = 0
    mor_side_rel = None
    n_mor_del = 0
    if mode in ("mor", "auto") and hit:
        # merge-on-read: mask ONLY the matched rows a clause touches
        # (updated old images + deleted rows) via a positional sidecar
        # scoped to the hit files; updated images join the insert
        # staging below.  Untouched matched rows never leave their
        # file — zero data files rewritten.
        t = _to_logical(
            _plan_with_deletes(spark, data, sorted(hit),
                               m.get("deletes"), _synth_of(m),
                               positions=True),
            m,
        ).alias("t")
        s = source.withColumn("__smatch", F.lit(True)).alias("s")
        on = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys]
        cond_j = on[0]
        for c in on[1:]:
            cond_j = cond_j & c
        joined = t.join(s, cond_j, "left")
        matched = F.coalesce(F.col("s.__smatch"), F.lit(False))
        take_delete = (
            matched & _merge_cond(dele) if dele is not None
            else F.lit(False)
        )
        take_update = F.lit(False)
        if upd is not None:
            take_update = matched & ~take_delete & (
                _merge_cond(upd_cond) if upd_cond is not None
                else F.lit(True)
            )
        # ONE aggregate job answers everything the routing needs: the
        # (file, pos) annotation is an injective target-row id, so
        # "some target row matched more than one source row" is
        # count(matched) > count_distinct(id | matched) — no separate
        # t.count()/joined.count() scans (each a full pass over the
        # hit files; at scale the dominant cost of the merge)
        row_id = F.when(matched, F.concat_ws(
            "\x00", F.col(f"t.{_POS_COLS[0]}"),
            F.col(f"t.{_POS_COLS[1]}")))
        n_matched, n_tgt_matched, n_touched, n_upd_probe = joined.agg(
            F.count(F.when(matched, 1)),
            F.count_distinct(row_id),
            F.count(F.when(take_delete | take_update, 1)),
            F.count(F.when(take_update, 1)),
        ).first()
        if n_matched > n_tgt_matched:
            raise ValueError(
                "MERGE: a target row matches more than one source row "
                "— which source row wins would be nondeterministic; "
                "de-duplicate the source on the merge keys first "
                "(Delta raises the same error)"
            )
        touched = joined.filter(take_delete | take_update)
        if mode == "auto" and n_touched > mor_max_rows:
            mode = "cow"  # broad match: pay the rewrite once
        else:
            if mode == "mor":  # auto never refuses; explicit mor does
                _check_mor_size(n_touched, mor_max_rows, "MoR merge",
                                path)
            mode = "mor"
            if n_touched:
                old_images = touched.select(
                    *[F.col(f"t.{c}").alias(c)
                      for c in existing.columns],
                    F.col(f"t.{_POS_COLS[0]}").alias(_POS_COLS[0]),
                    F.col(f"t.{_POS_COLS[1]}").alias(_POS_COLS[1]),
                )
                upd_rows = joined.filter(take_update)
                proj_u = []
                for c in existing.columns:
                    if upd == "*":
                        v = F.col(f"s.{c}")
                    elif isinstance(upd, dict) and c in upd:
                        vv = upd[c]
                        v = F.expr(vv) if isinstance(vv, str) else vv
                    else:
                        v = F.col(f"t.{c}")
                    proj_u.append(
                        v.cast(existing.schema[c].dataType).alias(c)
                    )
                updated = upd_rows.select(*proj_u)
                n_upd = n_upd_probe
                if n_upd:
                    _validate_constraints(
                        updated, m.get("constraints"),
                        f"merge into {path}"
                    )
                    new_files += _stage_files(
                        _to_physical(updated, m), path, partition_by
                    )
                mor_side_rel = _stage_delete_sidecar(
                    _sidecar_rows(old_images, m), path
                )
                n_mor_del = n_touched - n_upd
            else:
                # nothing to mask: no rewrite, no sidecar — inserts
                # may still land as a pure append below
                hit = set()
                n_t = 0
    if hit and mode != "mor":
        t = _to_logical(
            _plan_with_deletes(spark, data, sorted(hit), m.get("deletes"),
                             _synth_of(m)),
            m,
        ).alias("t")
        s = source.withColumn("__smatch", F.lit(True)).alias("s")
        # plain equality, Delta's ON semantics: a NULL key never
        # matches — it neither updates nor blocks the insert anti-join
        # (eqNullSafe here would make a NULL-key source row BOTH update
        # and insert)
        on = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys]
        cond = on[0]
        for c in on[1:]:
            cond = cond & c
        joined = t.join(s, cond, "left")
        n_t = t.count()
        n_joined = joined.count()
        if n_joined > n_t:
            raise ValueError(
                "MERGE: a target row matches more than one source row — "
                "which source row wins would be nondeterministic; "
                "de-duplicate the source on the merge keys first "
                "(Delta raises the same error)"
            )
        matched = F.coalesce(F.col("s.__smatch"), F.lit(False))
        take_delete = (
            matched & _merge_cond(dele) if dele is not None else F.lit(False)
        )
        take_update = F.lit(False)
        if upd is not None:
            take_update = matched & ~take_delete & (
                _merge_cond(upd_cond) if upd_cond is not None else F.lit(True)
            )
        proj = []
        for c in existing.columns:
            old = F.col(f"t.{c}")
            if upd == "*":
                newv = F.col(f"s.{c}")
            elif isinstance(upd, dict) and c in upd:
                v = upd[c]
                newv = F.expr(v) if isinstance(v, str) else v
            else:
                newv = None
            if newv is not None:
                proj.append(
                    F.when(
                        take_update,
                        newv.cast(existing.schema[c].dataType),
                    ).otherwise(old).alias(c)
                )
            else:
                proj.append(old.alias(c))
        rewritten = joined.filter(~take_delete).select(*proj)
        n_out = rewritten.count()
        _validate_constraints(
            rewritten, m.get("constraints"), f"merge into {path}"
        )
        if n_out:
            new_files += _stage_files(
                _to_physical(rewritten, m), path, partition_by
            )

    n_ins = 0
    if ins is not None:
        # aliased 's' so insert conditions keep the s.-qualified form
        # the matched clauses use
        anti = source.alias("s").join(
            existing.select(*keys), keys, "left_anti"
        )
        if not _merge_always(ins):
            anti = anti.filter(_merge_cond(ins))
        inserted = anti.select(*[
            F.col(c).cast(existing.schema[c].dataType).alias(c)
            for c in existing.columns
        ])
        n_ins = inserted.count()
        if n_ins:
            _validate_constraints(
                inserted, m.get("constraints"), f"merge into {path}"
            )
            new_files += _stage_files(
                _to_physical(inserted, m), path, partition_by
            )

    if not hit and not n_ins:
        return head  # nothing matched, nothing to insert
    if mor_side_rel is not None:
        # merge-on-read commit: every data file carries over verbatim;
        # the new sidecar masks touched old images, updated images and
        # inserts arrive as appended files
        stats = dict(m.get("stats") or {})
        stats.update(
            _new_file_meta(spark, path, new_files, stats_cols,
                           bloom_conf)
        )
        return _commit(
            path, m["files"] + new_files,
            m["count"] - n_mor_del + n_ins, head, partition_by,
            stats_cols, stats, bloom_conf=bloom_conf, op="merge(mor)",
            deletes=list(m.get("deletes") or []) + [
                {"path": mor_side_rel, "files": sorted(hit)}
            ],
        )
    carried = [f for f in m["files"] if f not in hit]
    total = m["count"] - (n_t - n_out) + n_ins
    old_stats = m.get("stats") or {}
    stats = {f: old_stats[f] for f in carried if f in old_stats}
    stats.update(
        _new_file_meta(spark, path, new_files, stats_cols, bloom_conf)
    )
    schema = (
        _to_physical(existing.limit(0), m).schema.jsonValue()
        if not (carried or new_files)
        else None
    )
    return _commit(
        path, carried + new_files, total, head, partition_by,
        stats_cols, stats, schema, bloom_conf=bloom_conf, op="merge",
        deletes=_carry_deletes(m.get("deletes"), carried),
    )
