"""Layout maintenance: alter_table_version (re-snapshot under a new
layout) and metadata-only column renames.

Mechanical split of the former single-module versions.py (r11); see the package __init__ for the public surface."""

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
    _column_map,
    _parse_partition_spec,
    _transform_expr,
    _transform_of,
)
from .metadata import (
    _validate_constraints,
)
from .read import (
    read_table_version,
)
from .stats import (
    _new_file_meta,
)


def alter_table_version(
    spark: SparkSession,
    path: str,
    drop: list[str] | None = None,
    rename: dict[str, str] | None = None,
    new_partition_by: str | None | type(...) = ...,
    cast: dict[str, str] | None = None,
) -> int:
    """Schema / partition evolution as a new version: DROP COLUMN,
    RENAME COLUMN, and repartitioning-by-a-different-column, committed
    as a FULL re-snapshot on the same version chain — the other half of
    the evolution story next to upsert's add-column path, and the same
    honest plain-parquet cost (no table-level schema metadata means
    mixed-schema or mixed-layout directories are a read-order hazard;
    table formats pay a metadata commit instead).  Old versions keep
    reading their own files with their own schema and layout
    byte-identically.

    ``new_partition_by`` defaults to "keep the current one" (the
    sentinel ``...``); pass a column name to re-partition or ``None``
    to flatten.  Per-file stats_cols follow renames and drop dropped
    columns; bloom columns likewise.

    ``cast`` (r10: ALTER COLUMN TYPE) maps column → Spark DDL type
    (``{"k": "bigint"}``).  Casts apply BEFORE renames in the same
    simultaneous projection.  NARROWING that loses values is rejected:
    any row where the cast produces NULL from a non-NULL input aborts
    the alter with a per-column violation count, before anything
    commits — the widening-only contract Delta enforces statically,
    enforced here against the data itself."""
    drop = list(drop or [])
    rename = dict(rename or {})
    cast = dict(cast or {})
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, head)
    old_partition_by = m.get("partition_by") or None
    existing = read_table_version(spark, path, head)
    cols = set(existing.columns)
    missing = [c for c in drop + list(rename) + list(cast) if c not in cols]
    if missing:
        raise ValueError(f"no such columns: {missing}")
    both = sorted(set(drop) & (set(rename) | set(cast)))
    if both:
        raise ValueError(f"columns both dropped and renamed/cast: {both}")
    # renames are SIMULTANEOUS (one select projection, ADVICE r9):
    # swap ({'a':'b','b':'a'}) and chain ({'a':'b','b':'c'}) maps are
    # legal — every SOURCE evaluates against the old row, exactly SQL
    # UPDATE's simultaneous-SET semantics.  The only illegal maps are
    # the ones whose FINAL column list duplicates a name.
    final = [
        rename.get(c, c) for c in existing.columns if c not in drop
    ]
    dups = sorted({n for n in final if final.count(n) > 1})
    if dups:
        raise ValueError(f"rename would duplicate columns: {dups}")
    if old_partition_by in drop and new_partition_by is ...:
        raise ValueError(
            f"cannot drop partition column {old_partition_by!r} without "
            "choosing new_partition_by"
        )

    def follow(c: str | None) -> str | None:
        return rename.get(c, c) if c is not None else None

    # hidden partitioning: the synth column is never in the logical
    # frame, so the transform (not the directory column) is what
    # evolves — it follows renames/casts of its SOURCE column, and
    # dropping the source needs an explicit new layout.  Passing a
    # transform TUPLE as new_partition_by sets hidden partitioning
    # via ALTER.
    t_head = _transform_of(m)
    t_new = None
    if new_partition_by is ...:
        if t_head is not None:
            inv = {p: l for l, p in _column_map(m).items()}
            src_l = inv.get(t_head["source"], t_head["source"])
            if src_l in drop:
                raise ValueError(
                    f"cannot drop {src_l!r} — it is the source of the "
                    f"table's {t_head['kind']} partition transform; "
                    "choose new_partition_by"
                )
            t_new = {**t_head, "source": follow(src_l)}
            partition_by = (
                f"_p_{t_new['kind']}{t_new.get('n', '')}_{t_new['source']}"
            )
        else:
            partition_by = follow(old_partition_by)
    else:
        partition_by, t_new = _parse_partition_spec(new_partition_by, None)

    def _src(c: str):
        return F.col(c).cast(cast[c]) if c in cast else F.col(c)

    out = existing.select(
        *[
            _src(c).alias(rename.get(c, c))
            for c in existing.columns
            if c not in drop
        ]
    )
    if cast:
        # widening-only contract, checked against the DATA: a cast that
        # loses any non-NULL value (overflow, unparseable string) would
        # silently corrupt the re-snapshot — abort with counts instead,
        # before anything is staged.  try_cast so the check itself
        # yields COUNTS under ANSI mode (where a plain narrowing cast
        # throws mid-scan); once the check passes, the projection's
        # plain cast cannot fail
        checks = existing.select(
            *[
                F.sum(
                    (
                        F.col(c).isNotNull()
                        & F.col(c).try_cast(cast[c]).isNull()
                    ).cast("long")
                ).alias(c)
                for c in cast
            ]
        ).collect()[0]
        lossy = {c: checks[c] for c in cast if checks[c]}
        if lossy:
            raise ValueError(
                f"cast would lose values (non-NULL → NULL row counts): "
                f"{lossy} — ALTER COLUMN TYPE is widening-only; route "
                "lossy conversions through an explicit UPDATE first"
            )
    if t_new is not None:
        # validate the (possibly new) transform against the RESULT
        # schema — and take its freshly recorded src_type (a cast may
        # have changed the source dtype) — then materialize the
        # directory column for staging
        _, t_new = _parse_partition_spec(
            (t_new["kind"], t_new["source"], t_new["n"])
            if "n" in t_new
            else (t_new["kind"], t_new["source"]),
            out,
        )
        out = out.withColumn(partition_by, _transform_expr(t_new))
    if partition_by is not None and partition_by not in out.columns:
        raise ValueError(f"partition column {partition_by!r} not in result")
    # constraints must still RESOLVE against the altered schema (a
    # rename/drop of a referenced column is caught here with the
    # drop-the-constraint-first remediation) and still hold on the data
    _validate_constraints(out, m.get("constraints"), f"alter of {path}")
    stats_cols = [
        follow(c) for c in (m.get("stats_cols") or []) if c not in drop
    ] or None
    bloom_conf = m.get("blooms_conf")
    if bloom_conf:
        bcols = [follow(c) for c in bloom_conf["cols"] if c not in drop]
        bloom_conf = {**bloom_conf, "cols": bcols} if bcols else None
    n = out.count()
    if n == 0:
        return _retry_conflicts(
            lambda: _commit(
                path, [], 0, latest_version(path), partition_by,
                stats_cols, None, out.schema.jsonValue(), bloom_conf,
                "alter", column_map=None, transform=t_new,
            ),
            f"alter of {path}",
        )
    files = _stage_files(out, path, partition_by)
    stats = _new_file_meta(spark, path, files, stats_cols, bloom_conf) or None
    return _retry_conflicts(
        lambda: _commit(
            path, files, n, latest_version(path), partition_by,
            stats_cols, stats, bloom_conf=bloom_conf, op="alter",
            column_map=None,  # full re-snapshot: physical = logical
            transform=t_new,
        ),
        f"alter of {path}",
    )


def rename_columns(spark: SparkSession, path: str,
                   rename: dict[str, str]) -> int:
    """METADATA-ONLY column rename (r10 s2, Delta column-mapping 'name'
    mode): commit a new version whose files, stats, blooms and sidecars
    are the head's VERBATIM, carrying a logical-to-physical
    ``column_map`` applied at read time — at 100 TB a rename costs one
    KB-sized manifest instead of :func:`alter_table_version`'s full
    re-snapshot.  Renames are simultaneous (swap/chain maps legal,
    duplicate-producing maps rejected — the alter rule); the partition
    column may be renamed (directories keep their physical name, the
    read surfaces the logical one).  Constraints must still resolve
    against the renamed schema — a constraint referencing an old name
    aborts with the drop-first remediation.

    Mapped tables stamp manifest ``format: 2``: pre-mapping readers
    refuse them loudly instead of misreading (the format gate's
    purpose).  The jar-free ``versioned_table`` DataSource declares
    non-support and rejects mapped tables; every versions.py operation
    composes (reads, prune/point skipping, DELETE/UPDATE/MERGE in
    logical names over physical scans — filter pushdown survives the
    alias projection — CoW and MoR, CDC, clone, compact).  A full
    re-snapshot op (alter's data path, write_table_version, upsert's
    add-column evolution) RE-BASELINES: files are rewritten with the
    logical names and the map clears.

    CDC consumers treat a rename as a SCHEMA BOUNDARY: a
    read_table_changes window crossing the rename step compares frames
    with different column names — renamed KEYS fail loudly, and a
    renamed payload column can surface as whole-table update_postimages
    (correct but wasteful — the fingerprint concatenates values in
    sorted-COLUMN-NAME order).  Rename the downstream table first, or
    re-bootstrap the consumer from the post-rename head."""
    if not rename:
        raise ValueError("nothing to rename")
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no committed versions under {path}")
    m = _load_manifest(path, head)
    cm = _column_map(m)
    inv = {p: l for l, p in cm.items()}
    # current LOGICAL columns, no Spark job: a data-file footer (plus
    # the physical partition directory column), or the recorded schema
    # of an empty head
    if m["files"]:
        import pyarrow.parquet as pq

        phys = list(
            pq.read_schema(
                str(Path(path) / "data" / m["files"][0])
            ).names
        )
        pb = m.get("partition_by") or None
        if pb and pb not in phys:
            phys.append(pb)
    elif m.get("schema"):
        phys = [f["name"] for f in m["schema"]["fields"]]
    else:
        raise ValueError(f"{path} has no schema to rename")
    logical = [inv.get(c, c) for c in phys]
    missing = [c for c in rename if c not in logical]
    if missing:
        raise ValueError(f"no such columns: {missing}")
    final = [rename.get(c, c) for c in logical]
    dups = sorted({n for n in final if final.count(n) > 1})
    if dups:
        raise ValueError(f"rename would duplicate columns: {dups}")
    new_cm = {}
    for p, lg in zip(phys, logical):
        n = rename.get(lg, lg)
        if n != p:
            new_cm[n] = p
    if m.get("constraints"):
        # constraints reference LOGICAL names: verify they still
        # resolve post-rename (zero-row frame, tiny job)
        probe = read_table_version(spark, path, head).limit(0)
        probe = probe.select(
            *[F.col(c).alias(rename.get(c, c)) for c in probe.columns]
        )
        try:
            _validate_constraints(
                probe, m["constraints"], f"rename on {path}"
            )
        except Exception as exc:
            raise ValueError(
                f"rename breaks CHECK constraints ({exc}) — drop the "
                "constraint first, rename, then re-add it under the "
                "new name"
            ) from None

    def once() -> int:
        return _commit(
            path, m["files"], m["count"], latest_version(path),
            m.get("partition_by") or None, m.get("stats_cols") or None,
            m.get("stats") or None, m.get("schema"),
            m.get("blooms_conf"),
            f"rename-metadata({sorted(rename.items())})",
            m.get("deletes"), column_map=new_cm or None,
        )

    return _retry_conflicts(once, f"rename on {path}")
