"""Versioned parquet tables: snapshot-isolated commits over a
manifest log (the jar-free Delta/Iceberg-shaped table layer).

Split across submodules in r11 (the former 4.3-kLoC single module);
this facade re-exports every name — public API and the private
helpers peer modules and tests address — so ``from etl_rust_spark
import versions as V`` sees exactly the pre-split surface.
"""

from __future__ import annotations

__all__ = [
    "write_table_version",
    "commit_appended_files",
    "upsert_table_version",
    "read_table_version",
    "version_at_timestamp",
    "list_versions",
    "latest_version",
    "alter_table_version",
    "rename_columns",
    "delete_table_version",
    "update_table_version",
    "merge_table_version",
    "diff_table_versions",
    "read_table_changes",
    "compact_table_version",
    "expire_versions",
    "CommitConflict",
    "Pin",
    "pin_version",
    "tag_version",
    "restore_table_version",
    "add_table_constraint",
    "drop_table_constraint",
    "table_constraints",
    "clone_table",
    "table_detail",
    "aggregate_table_metadata",
    "table_partitions",
    "MetadataInsufficient",
    "set_table_properties",
    "unset_table_properties",
    "table_properties",
    "history",
    "delete_tag",
    "list_tags",
    "table_metrics",
]


from . import (  # noqa: E402  (dependency order)
    layout,
    core,
    stats,
    read,
    metadata,
    refs,
    dml,
    merge,
    compact,
    maintain,
)

# One namespace, exactly as the single module had: every top-level
# name (public + private) of every submodule is addressable here.
for _m in (layout, core, stats, read, metadata, refs, dml,
           merge, compact, maintain):
    globals().update({
        _k: _v for _k, _v in vars(_m).items()
        if not _k.startswith("__")
    })
del _m
