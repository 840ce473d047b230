"""Model-based interop fuzz: a seeded random DML chain on a versioned
table, then BOTH exporters replay it and BOTH independent readers must
reproduce every surviving version exactly — the certification that the
export paths are correct for arbitrary op compositions, not just the
hand-written cases.

The op mix covers CoW DML, compaction/zorder, restore — and since r12
merge-on-read deletes/updates AND logical renames: outstanding sidecar
debt exports as Delta DELETION VECTORS and Iceberg POSITION DELETES,
and column mapping exports as Delta columnMapping-name / Iceberg
stable physical-name field ids, so mor and rename ops are in the fuzz
mix, not refusals.  A second fuzz drives a hidden-transform (days)
table through BOTH legs (Iceberg native day transform; Delta as a
generated partition column since r12).
"""

from __future__ import annotations

import random

from etl_rust_spark import versions as V
from etl_rust_spark.deltalake import export_delta_log, read_delta_table
from etl_rust_spark.iceberg import (
    export_iceberg_metadata,
    read_iceberg_table,
)


def test_interop_export_parity_fuzz(spark, tmp_path):
    rng = random.Random(0x1CE)
    p = str(tmp_path / "t")
    vc = "val"  # current logical name of the value column

    def frame(rows):
        return spark.createDataFrame(
            [(k, k * 7 % 5, v) for k, v in rows], ["k", "y", vc]
        )

    V.write_table_version(frame([(1, "s0"), (2, "s1")]), p,
                          stats_cols=["k", "y"])
    state = {1: "s0", 2: "s1"}
    counter = 0
    for step in range(14):
        op = rng.choice(
            ["upsert", "upsert", "delete", "update", "merge",
             "compact", "zorder", "restore",
             "mor_delete", "mor_update", "mor_merge", "rename"]
        )
        if op == "rename":
            # metadata-only logical rename (column mapping): both
            # export legs must keep reading data under the NEW name —
            # Delta via columnMapping mode name, Iceberg via stable
            # physical-name field ids + name mapping
            new = "vl" if vc == "val" else "val"
            V.rename_columns(spark, p, {vc: new})
            vc = new
            continue
        if op == "mor_delete":
            k = rng.randint(1, 10)
            V.delete_table_version(spark, p, f"k = {k}", mode="mor")
            state.pop(k, None)
        elif op == "mor_update":
            k = rng.randint(1, 10)
            V.update_table_version(
                spark, p, f"k = {k}", {vc: f"concat({vc}, '~')"},
                mode="mor")
            if k in state:
                state[k] += "~"
        elif op == "upsert":
            counter += 1
            rows = list({
                rng.randint(1, 10): f"u{counter}.{j}"
                for j in range(rng.randint(1, 3))
            }.items())
            V.upsert_table_version(spark, p, frame(rows), keys=["k"])
            state.update(dict(rows))
        elif op == "delete":
            k = rng.randint(1, 10)
            V.delete_table_version(spark, p, f"k = {k}")
            state.pop(k, None)
        elif op == "update":
            k = rng.randint(1, 10)
            V.update_table_version(
                spark, p, f"k = {k}", {vc: f"concat({vc}, '!')"})
            if k in state:
                state[k] += "!"
        elif op in ("merge", "mor_merge"):
            counter += 1
            feed = {rng.randint(1, 10): rng.choice(["U", "D", "I"])
                    for _ in range(rng.randint(1, 3))}
            src = spark.createDataFrame(
                [(k, k * 7 % 5, f"m{counter}.{k}", o)
                 for k, o in feed.items()],
                ["k", "y", vc, "op"],
            )
            V.merge_table_version(
                spark, p, src, keys=["k"],
                when_matched_update="*",
                when_matched_delete="s.op = 'D'",
                when_not_matched_insert="s.op = 'I'",
                update_condition="s.op = 'U'",
                mode="mor" if op == "mor_merge" else "cow",
            )
            for k, o in feed.items():
                if k in state:
                    if o == "D":
                        del state[k]
                    elif o == "U":
                        state[k] = f"m{counter}.{k}"
                elif o == "I":
                    state[k] = f"m{counter}.{k}"
        elif op == "compact":
            V.compact_table_version(spark, p)
        elif op == "zorder":
            V.compact_table_version(spark, p, 2, zorder_by=["k", "y"])
        else:
            tgt = rng.choice(V.list_versions(p))
            V.restore_table_version(p, tgt)
            ours = V.read_table_version(spark, p)
            vc = ours.columns[2]  # restore may revert a rename
            state = {r.k: r[2] for r in ours.collect()}

    versions = V.list_versions(p)
    # final-state sanity against the python model before export
    head_rows = {r.k: r[2]
                 for r in V.read_table_version(spark, p).collect()}
    assert head_rows == state

    n_delta = export_delta_log(spark, p, change_data_keys=["k"])
    assert n_delta == len(versions)
    n_ice = export_iceberg_metadata(spark, p)
    assert n_ice == len(versions)

    for i, v in enumerate(versions):
        ours = V.read_table_version(spark, p, v)
        cols = ours.columns
        expect = sorted(map(tuple, ours.collect()))
        via_delta = read_delta_table(spark, p, version=i)
        assert sorted(map(tuple, via_delta.select(*cols).collect())) \
            == expect, f"delta mismatch at our v{v} / delta {i}"
        via_ice = read_iceberg_table(spark, p, snapshot_id=v)
        assert sorted(map(tuple, via_ice.select(*cols).collect())) \
            == expect, f"iceberg mismatch at snapshot {v}"

    # CDF replay (r12): applying the exported Change Data Feed
    # version by version must reconstruct every snapshot exactly —
    # the model-level certification that the cdc files carry neither
    # more nor less than the real changes.  Windowed per version
    # (renames change the schema mid-chain; Delta's own reader has
    # the same restriction).
    from etl_rust_spark.deltalake import delta_table_changes

    replay: dict = {}
    for i, v in enumerate(versions):
        ch = delta_table_changes(spark, p, i, i).collect()
        for r in sorted(ch, key=lambda r: 0 if r._change_type
                        in ("delete", "update_preimage") else 1):
            if r._change_type == "delete":
                replay.pop(r.k, None)
            elif r._change_type in ("insert", "update_postimage"):
                replay[r.k] = r[2]
        truth = {row.k: row[2] for row in
                 V.read_table_version(spark, p, v).collect()}
        assert replay == truth, f"CDF replay diverges at v{v}"

    # Iceberg changelog replay: the net delete/insert stream must
    # reconstruct every snapshot too (updates arrive as delete+insert
    # pairs — apply deletes first within a step)
    from etl_rust_spark.iceberg import iceberg_table_changes

    replay = {}
    prev = None
    for v in versions:
        ch = iceberg_table_changes(spark, p, prev, v).collect()
        for r in sorted(ch, key=lambda r: r._change_type != "delete"):
            if r._change_type == "delete":
                replay.pop(r.k, None)
            else:
                replay[r.k] = r[2]
        truth = {row.k: row[2] for row in
                 V.read_table_version(spark, p, v).collect()}
        assert replay == truth, f"changelog replay diverges at v{v}"
        prev = v


def test_interop_iceberg_transform_fuzz(spark, tmp_path):
    """Seeded DML chain on a hidden-transform (days) table, exported
    through BOTH legs (Iceberg native day-transform spec; Delta as a
    generated partition column since r12): every surviving snapshot
    must reproduce exactly, masks included — the certification that
    transform export composes with MoR debt, compaction and restore,
    not just the hand-written cases."""
    import random

    rng = random.Random(0xDA45)
    p = str(tmp_path / "tt")

    def frame(rows):
        return spark.createDataFrame(
            [(k, k * 86400, v) for k, v in rows], ["k", "sec", "val"]
        ).selectExpr(
            "k", "timestamp_micros(sec * 1000000) as ts", "val")

    V.write_table_version(frame([(1, "s0"), (2, "s1"), (3, "s2")]), p,
                          partition_by=("days", "ts"))
    state = {1: "s0", 2: "s1", 3: "s2"}
    counter = 0
    for step in range(10):
        op = rng.choice(["upsert", "upsert", "delete", "mor_delete",
                         "mor_update", "compact", "restore"])
        if op == "upsert":
            counter += 1
            rows = list({rng.randint(1, 8): f"u{counter}.{j}"
                         for j in range(rng.randint(1, 3))}.items())
            V.upsert_table_version(spark, p, frame(rows), keys=["k"],
                                   partition_by=("days", "ts"))
            state.update(dict(rows))
        elif op == "delete":
            k = rng.randint(1, 8)
            V.delete_table_version(spark, p, f"k = {k}")
            state.pop(k, None)
        elif op == "mor_delete":
            k = rng.randint(1, 8)
            V.delete_table_version(spark, p, f"k = {k}", mode="mor")
            state.pop(k, None)
        elif op == "mor_update":
            k = rng.randint(1, 8)
            V.update_table_version(
                spark, p, f"k = {k}", {"val": "concat(val, '~')"},
                mode="mor")
            if k in state:
                state[k] += "~"
        elif op == "compact":
            V.compact_table_version(spark, p)
        else:
            tgt = rng.choice(V.list_versions(p))
            V.restore_table_version(p, tgt)
            state = {r.k: r.val
                     for r in V.read_table_version(spark, p).collect()}

    head = {r.k: r.val for r in V.read_table_version(spark, p).collect()}
    assert head == state
    versions = V.list_versions(p)
    assert export_iceberg_metadata(spark, p) == len(versions)
    assert export_delta_log(spark, p) == len(versions)
    for i, v in enumerate(versions):
        ours = V.read_table_version(spark, p, v)
        cols = ours.columns
        expect = sorted(map(tuple, ours.collect()))
        theirs = read_iceberg_table(spark, p, snapshot_id=v)
        assert sorted(map(tuple, theirs.select(*cols).collect())) \
            == expect, f"iceberg mismatch at snapshot {v}"
        via_delta = read_delta_table(spark, p, version=i)
        assert sorted(map(tuple, via_delta.select(*cols).collect())) \
            == expect, f"delta mismatch at our v{v} / delta {i}"

    # the import legs: BOTH formats re-import as fresh versioned
    # tables with the HIDDEN transform reconstructed (Delta from the
    # canonical generationExpression, Iceberg from the day spec),
    # every surviving version equal, masks included
    from etl_rust_spark.deltalake import import_delta_log
    from etl_rust_spark.iceberg import import_iceberg_table

    for leg, imp in (("delta", import_delta_log),
                     ("iceberg", import_iceberg_table)):
        q = str(tmp_path / f"imp_{leg}")
        assert imp(spark, p, q) == len(versions)
        mq = V._load_manifest(q, 1)
        assert (mq.get("partition_transform") or {}).get("kind") \
            == "days", leg
        for i, v in enumerate(versions):
            a = sorted(map(tuple,
                           V.read_table_version(spark, p, v).collect()))
            b = sorted(map(tuple,
                           V.read_table_version(spark, q, i + 1)
                           .collect()))
            assert a == b, f"{leg} import mismatch at v{v}"
