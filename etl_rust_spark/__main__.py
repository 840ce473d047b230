"""CLI mirroring the reference's commands (``python -m etl_rust_spark``).

Reference CLI (/root/reference/src/main.rs:49-105): ``index-range``,
``index-list``, ``index-subscription``, ``save-range``,
``create-test-set``.  Same verbs here, Spark execution underneath; the
chain is selected by name (only ``synthetic`` ships in-repo — real chain
configs register via the :class:`ChainConfig` protocol, SURVEY §2.7).
"""

from __future__ import annotations

import argparse
import json
import sys

from etl_rust_spark import get_spark
from etl_rust_spark.etl import create_test_set, run_range, save_range
from etl_rust_spark.sources.chain import SyntheticChain
from etl_rust_spark.sources.ranges import block_list_csv

CHAINS = {"synthetic": SyntheticChain}


def _read_input(spark, path: str, fmt: str):
    """Corpus/table input dispatch for the data-pipeline verbs: the
    corpus arrives however the lakehouse stores it — plain parquet, a
    Delta or Iceberg table (jar-free readers), or a versioned table —
    and every downstream operator sees one DataFrame either way."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "delta":
        from etl_rust_spark.deltalake import read_delta_table

        return read_delta_table(spark, path)
    if fmt == "iceberg":
        from etl_rust_spark.iceberg import read_iceberg_table

        return read_iceberg_table(spark, path)
    if fmt == "versioned":
        from etl_rust_spark.versions import read_table_version

        return read_table_version(spark, path)
    raise ValueError(f"unknown input format {fmt!r}")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_rust_spark")
    p.add_argument("--chain", default="synthetic", choices=sorted(CHAINS))
    p.add_argument(
        "--metrics-port",
        type=int,
        default=None,
        help="serve /metrics, /healthz, /ready on this port for the run "
        "(reference METRICS_PORT / HEALTH_CHECKS_PORT, src/main.rs:279-345)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("index-range", help="extract blocks [start, end)")
    pr.add_argument("start", type=int)
    pr.add_argument("end", type=int)
    pr.add_argument("--out", required=True)
    pr.add_argument("--resume", action="store_true")
    pr.add_argument(
        "--reverse",
        action="store_true",
        help="work the range from end-1 toward start (guarded at genesis)",
    )
    pr.add_argument("--format", default="parquet", choices=["parquet", "jsonl"])
    pr.add_argument("--layout", default="block", choices=["block", "time", "flat"])

    pl = sub.add_parser("index-list", help="extract blocks from a CSV list")
    pl.add_argument("csv")
    pl.add_argument("--out", required=True)
    pl.add_argument("--format", default="parquet", choices=["parquet", "jsonl"])

    pb = sub.add_parser(
        "index-subscription",
        help="consume work items (block ranges) from a Pub/Sub subscription "
        "or a work-file directory",
    )
    pb.add_argument(
        "work_dir",
        nargs="?",
        default=None,
        help="directory receiving {start,end} JSONL work files "
        "(file-queue transport; omit when using --subscription)",
    )
    pb.add_argument("--out", required=True)
    pb.add_argument(
        "--checkpoint",
        default=None,
        help="streaming checkpoint dir (file-queue transport only)",
    )
    # Pub/Sub pull transport (reference: IndexSubscription{subscription},
    # src/main.rs:357-389): ack-after-process against the public REST
    # surface (emulator-compatible).
    pb.add_argument("--subscription", help="Pub/Sub subscription name")
    pb.add_argument("--pubsub-endpoint", help="Pub/Sub REST endpoint URL")
    pb.add_argument("--pubsub-project", help="GCP project id")
    pb.add_argument(
        "--max-empty-pulls",
        type=int,
        default=None,
        help="exit after N consecutive empty pulls (default: run forever)",
    )

    ps = sub.add_parser("save-range", help="persist raw extracted data")
    ps.add_argument("start", type=int)
    ps.add_argument("end", type=int)
    ps.add_argument("--out", required=True)

    pt = sub.add_parser("create-test-set", help="persist raw + expected outputs")
    pt.add_argument("start", type=int)
    pt.add_argument("end", type=int)
    pt.add_argument("--name", required=True)
    pt.add_argument("--dir", default="tests/examples")

    pi = sub.add_parser(
        "ingest-corpus",
        help="ingest a JSONL/CSV document feed into the canonical "
        "documents parquet shape",
    )
    pi.add_argument("path", help="input JSONL/CSV path or glob")
    pi.add_argument("--out", required=True)
    pi.add_argument("--format", default="jsonl", choices=["jsonl", "csv", "avro", "warc"])
    pi.add_argument(
        "--no-id-field",
        action="store_true",
        help="derive doc_id from the text content hash (feed has no ids)",
    )

    pia = sub.add_parser(
        "ingest-assets",
        help="unpack zip/tar media shards into the multimodal asset "
        "parquet shape (optionally with features extracted)",
    )
    pia.add_argument("path", help="archive path or glob (*.zip / *.tar[.gz])")
    pia.add_argument("--out", required=True)
    pia.add_argument(
        "--skip-bad-archives", action="store_true",
        help="drop unreadable archives instead of failing the job",
    )
    pia.add_argument(
        "--features", action="store_true",
        help="also write <out>_features (real in-container decode)",
    )

    # LLM-data surface: run the composed curation pipeline over a
    # parquet corpus (doc_id, text[, lang]) from the command line.
    pc = sub.add_parser(
        "curate",
        help="curate a parquet document corpus (language filter, quality "
        "floor, exact + near dedup, optional PII scrub / markup strip)",
    )
    pc.add_argument("corpus", help="input corpus path with doc_id, text columns")
    pc.add_argument(
        "--input-format", default="parquet",
        choices=["parquet", "delta", "iceberg", "versioned"],
        help="how to read CORPUS: plain parquet (default), a Delta "
        "table (jar-free log reader), an Iceberg table, or a "
        "versioned table — the corpus arrives however the lakehouse "
        "stores it",
    )
    pc.add_argument("--out", required=True, help="curated parquet output path")
    pc.add_argument("--languages", default=None, help="comma list, e.g. en,de")
    pc.add_argument(
        "--scripts",
        default=None,
        help="comma list of allowed dominant unicode scripts, e.g. latin",
    )
    pc.add_argument("--min-quality-bp", type=int, default=0)
    pc.add_argument("--near-dup-threshold", type=float, default=0.5)
    pc.add_argument(
        "--near-dup-strategy", default="greedy", choices=["greedy", "components"]
    )
    pc.add_argument("--strip-markup", action="store_true")
    pc.add_argument(
        "--c4-clean",
        action="store_true",
        help="C4 line-level cleaning: drop boilerplate lines and pages "
        "failing the C4 page rules before the quality/dedup stages",
    )
    pc.add_argument(
        "--dedup-lines",
        action="store_true",
        help="intra-document exact line dedup (RefinedWeb repetition "
        "removal): every line keeps its first occurrence within a page",
    )
    pc.add_argument(
        "--substring-k",
        type=int,
        default=None,
        help="cut repeated k-gram spans (exact substring dedup) before "
        "the quality/dedup stages",
    )
    pc.add_argument("--scrub-pii", action="store_true")
    pc.add_argument(
        "--reference",
        default=None,
        help="reference documents parquet: train a bigram LM on it and "
        "drop documents whose perplexity exceeds --max-perplexity",
    )
    pc.add_argument("--max-perplexity", type=float, default=None)
    pc.add_argument(
        "--lsh-stats",
        action="store_true",
        help="include hot-bucket cap counters in the report (extra agg job)",
    )

    pm = sub.add_parser(
        "dedup-media",
        help="find perceptual near-duplicate pairs in a multimodal asset "
        "parquet (asset_id, modality, payload, meta) — dHash for images, "
        "spectral fingerprints for audio, frame-level matching for video",
    )
    pm.add_argument("assets", help="input parquet path with the asset schema")
    pm.add_argument("--out", required=True, help="pairs parquet output path")
    pm.add_argument("--max-hamming", type=int, default=4)
    pm.add_argument(
        "--min-matching-frames",
        type=int,
        default=2,
        help="video pairs need at least this many perceptually-matching frames",
    )
    pm.add_argument(
        "--stub-decode",
        action="store_true",
        help="use the deterministic byte-hash stub instead of real codecs "
        "(plumbing dry-runs; video always decodes for real)",
    )

    pp = sub.add_parser(
        "profile",
        help="profile a parquet table: per-column row/null/distinct "
        "counts and min/max in one aggregation pass",
    )
    pp.add_argument("table", help="input parquet path")
    pp.add_argument(
        "--input-format", default="parquet",
        choices=["parquet", "delta", "iceberg", "versioned"],
        help="how to read TABLE (parquet | delta | iceberg | versioned)",
    )
    pp.add_argument("--columns", default=None, help="comma list (default: all)")
    pp.add_argument(
        "--exact-ndv",
        action="store_true",
        help="exact distinct counts instead of HyperLogLog estimates",
    )
    pp.add_argument(
        "--percentiles",
        default=None,
        help="comma list of quantiles in [0,1] for numeric columns, "
        "e.g. 0.5,0.95",
    )

    psp = sub.add_parser(
        "split",
        help="assign deterministic train/val/test splits to a documents "
        "parquet (optionally leakage-safe against a near-dup pairs "
        "parquet: clusters move as one unit)",
    )
    psp.add_argument("corpus", help="documents parquet path")
    psp.add_argument("--out", required=True)
    psp.add_argument(
        "--weights",
        default="train=0.98,val=0.01,test=0.01",
        help="name=frac comma list summing to 1",
    )
    psp.add_argument(
        "--pairs",
        default=None,
        help="near-dup pairs parquet (qid, cid) for leakage-safe splits",
    )

    pab = sub.add_parser(
        "ann-build",
        help="build (or incrementally update) a persisted IVF ANN index "
        "over an embeddings parquet (vec_id, embedding)",
    )
    pab.add_argument("embeddings", help="embeddings parquet path")
    pab.add_argument("--out", required=True, help="index path")
    pab.add_argument("--n-lists", type=int, default=64)
    pab.add_argument(
        "--update",
        action="store_true",
        help="fold the embeddings as a delta into the existing index "
        "(stored centroids, dirty lists only) instead of retraining",
    )
    pab.add_argument(
        "--kind",
        choices=("ivf", "ivfpq"),
        default="ivf",
        help="ivfpq stores m-byte PQ codes instead of raw vectors "
        "(the billion-vector memory-scale layout)",
    )
    pab.add_argument("--pq-m", type=int, default=8, help="PQ subspaces")
    pab.add_argument("--pq-codes", type=int, default=16, help="codewords/subspace")
    pab.add_argument(
        "--residual",
        action="store_true",
        help="(ivfpq) IVFADC: train/encode on coarse-quantizer residuals "
        "— better recall at the same bit budget; recorded in the index "
        "meta so search/update dispatch automatically",
    )

    pas = sub.add_parser(
        "ann-search",
        help="search a persisted IVF index: top-k neighbors per query",
    )
    pas.add_argument("index", help="index path from ann-build")
    pas.add_argument("queries", help="queries parquet (vec_id, embedding)")
    pas.add_argument("--out", required=True, help="hits parquet output path")
    pas.add_argument("--k", type=int, default=10)
    pas.add_argument("--n-probe", type=int, default=8)
    pas.add_argument(
        "--kind", choices=("ivf", "ivfpq"), default="ivf",
        help="must match the ann-build kind",
    )
    pas.add_argument(
        "--refine",
        default=None,
        help="(ivfpq) raw-vector parquet for the IVFADC+R exact re-rank "
        "of the ADC shortlist",
    )

    proll = sub.add_parser(
        "rollup",
        help="build or incrementally update a persisted hypertable "
        "rollup from an events parquet (ts, event_type, value, user_id)",
    )
    proll.add_argument("events", help="raw events parquet path")
    proll.add_argument("--out", required=True, help="rollup state path")
    proll.add_argument("--bucket-sec", type=int, default=3600)
    proll.add_argument("--hist-bins", type=int, default=None)
    proll.add_argument(
        "--update",
        action="store_true",
        help="fold the events as a DELTA into the existing rollup "
        "(dirty date partitions only) instead of a fresh build",
    )
    proll.add_argument(
        "--drop-before",
        default=None,
        help="after writing, expire partitions older than this ISO date",
    )
    proll.add_argument(
        "--kll",
        action="store_true",
        help="attach the mergeable KLL value-quantile sketch state "
        "(unbounded domain — no --hist-bins edges to declare)",
    )
    proll.add_argument(
        "--theta",
        action="store_true",
        help="attach the mergeable Theta user-set state (enables the "
        "retention verb)",
    )

    pret = sub.add_parser(
        "retention",
        help="bucket-over-bucket user retention/churn from a persisted "
        "rollup's Theta state (set algebra on sketches — raw events "
        "never re-read)",
    )
    pret.add_argument("rollup", help="rollup state path (built with --theta)")
    pret.add_argument(
        "--bucket-sec",
        type=int,
        required=True,
        help="retention period; the rollup is merged to this "
        "granularity first (must be a multiple of its bucket)",
    )
    pret.add_argument(
        "--dims", default="event_type", help="comma list of dims ('' for none)"
    )
    pret.add_argument(
        "--periods",
        type=int,
        default=1,
        help="retention lag in buckets (7 on a daily rollup = D7)",
    )
    pret.add_argument("--out", default=None, help="write the matrix parquet here")

    pcard = sub.add_parser(
        "card",
        help="dataset card for a documents parquet: totals, token "
        "budget, language/source mix, length percentiles (JSON)",
    )
    pcard.add_argument("corpus", help="documents parquet path")
    pcard.add_argument(
        "--scripts",
        action="store_true",
        help="include the dominant-unicode-script distribution",
    )

    pv = sub.add_parser(
        "table",
        help="versioned-table maintenance (manifest snapshots, time "
        "travel, retention — versions.py)",
    )
    pv.add_argument("table", help="versioned table root")
    pv.add_argument(
        "--snapshot", default=None,
        help="commit this parquet path's rows as a new version",
    )
    pv.add_argument(
        "--upsert", default=None,
        help="MERGE this parquet path as a new version (needs --keys)",
    )
    pv.add_argument(
        "--keys", default=None,
        help="comma key list for --upsert/--merge/--changes",
    )
    pv.add_argument(
        "--merge", default=None, metavar="PARQUET",
        help="MERGE INTO: conditional keyed merge of this parquet "
        "source (needs --keys and at least one WHEN clause below)",
    )
    pv.add_argument(
        "--matched-update", action="append", default=None,
        metavar="*|COL=EXPR",
        help="WHEN MATCHED UPDATE: '*' takes every source column, or "
        "repeat COL=EXPR (expressions see target as t, source as s)",
    )
    pv.add_argument(
        "--matched-delete", default=None, metavar="SQL|true",
        help="WHEN MATCHED DELETE (evaluated before update)",
    )
    pv.add_argument(
        "--not-matched-insert", default=None, metavar="SQL|true",
        help="WHEN NOT MATCHED INSERT the source row (optionally "
        "conditional)",
    )
    pv.add_argument(
        "--update-condition", default=None, metavar="SQL",
        help="extra AND condition on --matched-update",
    )
    pv.add_argument(
        "--partition-by", default=None,
        help="partition column, or a hidden-partitioning transform: "
        "days(ts) | hours(ts) | bucket(n,col) | truncate(w,col)",
    )
    pv.add_argument(
        "--read", default=None, metavar="V",
        help="time-travel: write version V ('latest' ok) to --out",
    )
    pv.add_argument(
        "--as-of", default=None, metavar="TS",
        help="time-travel by timestamp: read the table AS OF this "
        "ISO-8601 instant / epoch seconds (instead of --read)",
    )
    pv.add_argument("--out", default=None)
    pv.add_argument(
        "--restore", default=None, metavar="V|TAG",
        help="RESTORE: commit a new head whose content equals this "
        "version (pure metadata, zero data movement)",
    )
    pv.add_argument(
        "--history", action="store_true",
        help="DESCRIBE HISTORY: print one row per version",
    )
    pv.add_argument(
        "--detail", action="store_true",
        help="DESCRIBE DETAIL: head version, rows, files, bytes, "
        "layout, constraints, sidecar debt",
    )
    pv.add_argument(
        "--partitions", action="store_true",
        help="SHOW PARTITIONS: per-partition files/bytes and (where the "
        "log is exact) row counts — metadata only, no Spark job",
    )
    pv.add_argument(
        "--agg", action="append", default=None,
        metavar="'count(*)'|'min(COL)'|'max(COL)'",
        help="metadata-only aggregate answered from the manifest log "
        "alone (repeatable); raises if the log cannot answer exactly",
    )
    pv.add_argument(
        "--clone", default=None, metavar="DST",
        help="CLONE: hardlink-shallow copy of the table (head or "
        "--clone-version) as a NEW independent version chain at DST",
    )
    pv.add_argument(
        "--clone-version", default=None, metavar="V|TAG",
        help="version (or tag) to clone instead of head",
    )
    pv.add_argument(
        "--add-constraint", default=None, metavar="NAME=EXPR",
        help="CHECK constraint: validate the whole head, then enforce "
        "EXPR on every future snapshot/upsert/update",
    )
    pv.add_argument(
        "--drop-constraint", default=None, metavar="NAME",
    )
    pv.add_argument(
        "--rename-column", action="append", default=None,
        metavar="OLD=NEW",
        help="METADATA-ONLY rename (column mapping): zero data files "
        "rewritten; repeat for multiple columns (simultaneous)",
    )
    pv.add_argument(
        "--set-property", action="append", default=None, metavar="K=V",
        help="TBLPROPERTIES: merge key=value metadata (repeatable)",
    )
    pv.add_argument(
        "--unset-property", action="append", default=None, metavar="K",
    )
    pv.add_argument(
        "--tag", default=None, metavar="NAME[=V]",
        help="name a version (default: head) — tagged versions survive "
        "expiry; --read accepts tag names",
    )
    pv.add_argument(
        "--delete-where", default=None, metavar="SQL",
        help="row-level DELETE: commit a new version without the rows "
        "matching this SQL predicate (file-level copy-on-write)",
    )
    pv.add_argument(
        "--mor", action="store_true",
        help="merge-on-read: --delete-where/--update-where write a "
        "fingerprint sidecar (+ appended rows for update) instead of "
        "rewriting hit files (fold with --compact)",
    )
    pv.add_argument(
        "--dml-mode", default=None, choices=("cow", "mor", "auto"),
        help="explicit DML mode for --delete-where/--update-where; "
        "auto routes by match size (small -> sidecar, broad -> CoW); "
        "overrides --mor",
    )
    pv.add_argument(
        "--update-where", default=None, metavar="SQL",
        help="row-level UPDATE of rows matching this predicate "
        "(needs --set)",
    )
    pv.add_argument(
        "--set", action="append", default=None, metavar="COL=EXPR",
        help="SET clause for --update-where (repeat the flag for "
        "multiple columns; expressions see the old row)",
    )
    pv.add_argument(
        "--compact", type=int, default=None, metavar="N",
        help="OPTIMIZE: coalesce partitions with more than N files",
    )
    pv.add_argument(
        "--compact-bytes", type=int, default=None, metavar="BYTES",
        help="OPTIMIZE bin-packing: rewrite partitions whose file count "
        "exceeds ceil(partition_bytes / BYTES) toward BYTES-sized files "
        "(never splits an over-target file)",
    )
    pv.add_argument(
        "--zorder", default=None, metavar="COLS",
        help="with --compact: OPTIMIZE ZORDER BY this comma column "
        "list (rewrites every file z-order clustered)",
    )
    pv.add_argument(
        "--expire-keep", type=int, default=None,
        help="retention: keep only the newest N versions",
    )
    pv.add_argument(
        "--changes", default=None, metavar="FROM[:TO]",
        help="CDC feed over (FROM, TO] (TO defaults to head) to --out; "
        "needs --keys",
    )
    pv.add_argument(
        "--export-delta", action="store_true",
        help="write a Delta Lake _delta_log next to _manifests so "
        "external Delta readers consume this table (zero data copied; "
        "our version N becomes Delta commit N-first)",
    )
    pv.add_argument(
        "--checkpoint-format", default="classic",
        choices=("classic", "v2"),
        help="checkpoint form for --export-delta: classic single "
        "parquet, or the v2 manifest+sidecar shape Delta 3.x writes",
    )
    pv.add_argument(
        "--change-data-keys", default=None, metavar="COL[,COL...]",
        help="with --export-delta: also export the Change Data Feed "
        "(cdc files per change commit, keyed snapshot diff on these "
        "columns)",
    )
    pv.add_argument(
        "--read-delta", default=None, metavar="V|latest",
        help="read TABLE as a Delta Lake table (jar-free log reader) "
        "at this Delta version, to --out; combine with --as-of for "
        "timestamp travel",
    )
    pv.add_argument(
        "--import-delta", default=None, metavar="DEST",
        help="replay TABLE's Delta log into a fresh versioned table at "
        "DEST — history preserved commit-for-commit, data files "
        "hardlinked (zero bytes copied)",
    )
    pv.add_argument(
        "--export-iceberg", action="store_true",
        help="write Iceberg (v1) metadata next to _manifests so "
        "Iceberg readers consume this table (zero data copied; our "
        "version N becomes snapshot id N)",
    )
    pv.add_argument(
        "--import-iceberg", default=None, metavar="DEST",
        help="replay TABLE's Iceberg snapshot history into a fresh "
        "versioned table at DEST — hardlinked files, stats and commit "
        "instants carried",
    )
    pv.add_argument(
        "--read-iceberg", default=None, metavar="SNAPSHOT|latest",
        help="read TABLE as an Apache Iceberg table (jar-free metadata "
        "reader) at this snapshot id, to --out; combine with --as-of "
        "for timestamp travel",
    )

    pd = sub.add_parser(
        "diff",
        help="snapshot diff two parquet tables by key: added/removed/"
        "changed rows (fingerprint join — payload never shuffles)",
    )
    pd.add_argument("old", help="old snapshot parquet path")
    pd.add_argument("new", help="new snapshot parquet path")
    pd.add_argument("--keys", required=True, help="comma list of key columns")
    pd.add_argument("--out", default=None, help="write per-key diff parquet here")

    args = p.parse_args(argv)

    # O-04: reject invalid feature combos before any Spark work — the
    # runtime analog of the reference's compile_error! gates.
    from etl_rust_spark.config import ConfigError, FeatureConfig

    try:
        # ingest-corpus's --format is an INPUT format, not a sink.
        sink = "parquet" if args.cmd == "ingest-corpus" else getattr(
            args, "format", "parquet"
        )
        FeatureConfig(chain=args.chain, sinks={sink}).validate()
    except ConfigError as exc:
        p.error(str(exc))

    srv = None
    if args.metrics_port is not None:
        # Servers come up before the command dispatch, readiness flips
        # once the session exists — the reference's ordering
        # (src/main.rs:279-353: spawn metric + health servers, then
        # match on the command).
        from etl_rust_spark.observability import MetricsServer

        srv = MetricsServer(port=args.metrics_port).start()

    spark = get_spark(app_name=f"etl-rust-spark-{args.cmd}")
    chain = CHAINS[args.chain]()

    if srv is not None:
        from etl_rust_spark.sources.rpc import RpcMetrics

        srv.register("rpc", RpcMetrics.create(spark).snapshot)
        srv.ready.set()

    if args.cmd == "index-range":
        stats = run_range(
            spark, chain, args.start, args.end, args.out,
            resume=args.resume, reverse=args.reverse,
            fmt=args.format, layout=args.layout,
        )
        print(json.dumps({"raw_blocks": stats.raw_blocks, "records": stats.records}))
    elif args.cmd == "index-list":
        from etl_rust_spark.etl.writer import write_tables

        indices = block_list_csv(spark, args.csv)
        raw = chain.fetch(indices)
        counts = write_tables(chain.transform(raw), args.out, fmt=args.format)
        print(json.dumps({"records": counts}))
    elif args.cmd == "index-subscription":
        if args.subscription:
            if not (args.pubsub_endpoint and args.pubsub_project):
                p.error("--subscription requires --pubsub-endpoint and --pubsub-project")
            from etl_rust_spark.etl.transports import PubSubRestClient
            from etl_rust_spark.streaming.subscription import run_pubsub_subscription

            client = PubSubRestClient(args.pubsub_endpoint, args.pubsub_project)
            done = run_pubsub_subscription(
                spark, chain, client, args.subscription, args.out,
                max_empty_pulls=args.max_empty_pulls,
            )
            print(json.dumps({"work_items": done}))
        else:
            if not (args.work_dir and args.checkpoint):
                p.error("file-queue transport requires work_dir and --checkpoint")
            from etl_rust_spark.streaming import run_subscription

            q = run_subscription(spark, chain, args.work_dir, args.out, args.checkpoint)
            try:
                q.awaitTermination()  # runs until interrupted, like the reference
            except KeyboardInterrupt:
                q.stop()  # graceful disconnect (K-09 parity)
    elif args.cmd == "ingest-assets":
        from etl_rust_spark.operators import multimodal

        assets = multimodal.read_archive_assets(
            spark, args.path,
            on_error="skip" if args.skip_bad_archives else "raise",
        )
        assets.write.mode("overwrite").parquet(args.out)
        report = {"assets": spark.read.parquet(args.out).count()}
        if args.features:
            feats = multimodal.extract_features(
                spark.read.parquet(args.out), decode_stub=False
            )
            feats.write.mode("overwrite").parquet(args.out + "_features")
            report["features"] = spark.read.parquet(args.out + "_features").count()
        print(json.dumps(report))
    elif args.cmd == "ingest-corpus":
        from etl_rust_spark.etl.ingest import ingest_corpus

        n = ingest_corpus(
            spark, args.path, args.out, fmt=args.format,
            id_field=None if args.no_id_field else "doc_id",
        )
        print(json.dumps({"documents": n}))
    elif args.cmd == "curate":
        from etl_rust_spark.operators import curate, scrub

        docs = _read_input(spark, args.corpus, args.input_format)
        ref_lm = None
        if args.max_perplexity is not None:
            if not args.reference:
                p.error("--max-perplexity requires --reference")
            from etl_rust_spark.operators import lm as _lm

            ref_lm = _lm.train_bigram_lm(
                spark.read.parquet(args.reference), lazy_vocab=True
            )
        cur = curate.curate_corpus(
            docs,
            languages=args.languages.split(",") if args.languages else None,
            scripts=args.scripts.split(",") if args.scripts else None,
            min_quality_bp=args.min_quality_bp,
            near_dup_threshold=args.near_dup_threshold,
            near_dup_strategy=args.near_dup_strategy,
            strip_markup=args.strip_markup,
            c4_clean=args.c4_clean,
            dedup_lines=args.dedup_lines,
            substring_k=args.substring_k,
            reference_lm=ref_lm,
            max_perplexity=args.max_perplexity,
        )
        if args.scrub_pii:
            scrubbed = scrub.scrub_pii(cur, "text", "doc_id")
            cur = cur.drop("text").join(scrubbed, "doc_id").withColumnRenamed(
                "text_clean", "text"
            )
        cur.write.mode("overwrite").parquet(args.out)
        report = curate.curation_report(
            docs, spark.read.parquet(args.out), lsh_stats=args.lsh_stats
        )
        print(json.dumps(report))
    elif args.cmd == "profile":
        from etl_rust_spark.operators import profile as _profile

        df = _read_input(spark, args.table, args.input_format)
        prof = _profile.profile_table(
            df,
            columns=args.columns.split(",") if args.columns else None,
            exact_ndv=args.exact_ndv,
            percentiles=(
                [float(x) for x in args.percentiles.split(",")]
                if args.percentiles
                else None
            ),
        )
        for r in prof.collect():
            print(json.dumps(r.asDict()))
    elif args.cmd == "split":
        from etl_rust_spark.operators import pack as _pack

        weights = {
            k: float(v)
            for k, v in (kv.split("=") for kv in args.weights.split(","))
        }
        docs = spark.read.parquet(args.corpus)
        if args.pairs:
            out_df = _pack.leakage_safe_split(
                docs, spark.read.parquet(args.pairs), weights
            )
        else:
            out_df = _pack.assign_split(docs, weights)
        out_df.write.mode("overwrite").parquet(args.out)
        counts = {
            r["split"]: r["count"]
            for r in spark.read.parquet(args.out).groupBy("split").count().collect()
        }
        print(json.dumps(counts))
    elif args.cmd == "ann-build":
        from etl_rust_spark.operators import similarity as _sim

        emb = spark.read.parquet(args.embeddings)
        if args.kind == "ivfpq":
            if args.update:
                _sim.update_ivfpq_index(emb, args.out)
            else:
                _sim.build_ivfpq_index(
                    emb, args.out, n_lists=args.n_lists,
                    m=args.pq_m, k_codes=args.pq_codes,
                    residual=args.residual,
                )
            n = spark.read.parquet(f"{args.out}/codes").count()
        else:
            if args.update:
                _sim.update_ivf_index(emb, args.out)
            else:
                _sim.build_ivf_index(emb, args.out, n_lists=args.n_lists)
            n = spark.read.parquet(f"{args.out}/corpus").count()
        print(json.dumps({"indexed_vectors": n}))
    elif args.cmd == "ann-search":
        from etl_rust_spark.operators import similarity as _sim

        if args.kind == "ivfpq":
            hits = _sim.ivfpq_search(
                spark.read.parquet(args.queries), args.index,
                k=args.k, nprobe=args.n_probe,
                refine_with=(
                    spark.read.parquet(args.refine) if args.refine else None
                ),
            )
        else:
            hits = _sim.ivf_search(
                spark.read.parquet(args.queries), args.index,
                k=args.k, n_probe=args.n_probe,
            )
        hits.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"hits": n}))
    elif args.cmd == "rollup":
        from etl_rust_spark.operators import rollup as _rollup

        ev = spark.read.parquet(args.events)
        if args.update:
            _rollup.update_rollup(
                spark, args.out, ev, bucket_sec=args.bucket_sec
            )
        else:
            _rollup.write_rollup(
                _rollup.time_rollup(
                    ev, bucket_sec=args.bucket_sec, hist_bins=args.hist_bins,
                    kll=args.kll, theta=args.theta,
                ),
                args.out,
            )
        dropped = (
            _rollup.drop_chunks(args.out, args.drop_before)
            if args.drop_before
            else 0
        )
        n = _rollup.read_rollup(spark, args.out).count()
        print(json.dumps({"rollup_rows": n, "dropped_partitions": dropped}))
    elif args.cmd == "retention":
        from etl_rust_spark.operators import rollup as _rollup

        roll = _rollup.read_rollup(spark, args.rollup)
        if "user_theta" not in roll.columns:
            p.error("rollup at %s carries no Theta state — build it with "
                    "`rollup --theta`" % args.rollup)
        dims = tuple(d for d in args.dims.split(",") if d)
        merged = _rollup.merge_rollup(
            roll, args.bucket_sec, dims=dims, estimate=False
        )
        m = _rollup.retention_matrix(
            merged, args.bucket_sec, dims=dims, periods=args.periods
        )
        if args.out:
            m.write.mode("overwrite").parquet(args.out)
            m = spark.read.parquet(args.out)
        rows = [r.asDict() for r in m.orderBy("bs", *dims).collect()]
        for r in rows:
            r["bs"], r["bs_next"] = str(r["bs"]), str(r["bs_next"])
        print(json.dumps({"pairs": len(rows), "rows": rows}))
    elif args.cmd == "card":
        from etl_rust_spark.operators.card import dataset_card

        print(
            json.dumps(
                dataset_card(
                    spark.read.parquet(args.corpus), scripts=args.scripts
                )
            )
        )
    elif args.cmd == "table":
        import re as _re

        from etl_rust_spark import versions as _v

        pb = args.partition_by
        tm = _re.fullmatch(r"(\w+)\(([^()]*)\)", pb) if pb else None
        if tm:  # days(ts) / hours(ts) / bucket(8,k) / truncate(4,url)
            kind, inner = tm.group(1), [
                a.strip() for a in tm.group(2).split(",")
            ]
            pb = (
                (kind, inner[1], int(inner[0]))
                if len(inner) == 2
                else (kind, inner[0])
            )
        out: dict = {}
        if args.snapshot:
            out["version"] = _v.write_table_version(
                spark.read.parquet(args.snapshot), args.table,
                partition_by=pb,
            )
        dml_mode = args.dml_mode or ("mor" if args.mor else "cow")
        if args.upsert:
            if not args.keys:
                p.error("--upsert requires --keys")
            out["version"] = _v.upsert_table_version(
                spark, args.table, spark.read.parquet(args.upsert),
                keys=args.keys.split(","), partition_by=pb,
                mode=dml_mode,
            )
        if args.restore is not None:
            v = int(args.restore) if args.restore.isdigit() else args.restore
            out["version"] = _v.restore_table_version(args.table, v)
        if args.history:
            out["history"] = _v.history(args.table)
        if args.detail:
            out["detail"] = _v.table_detail(args.table)
        if args.partitions:
            out["partitions"] = _v.table_partitions(args.table)
        if args.agg:
            out["agg"] = _v.aggregate_table_metadata(args.table, args.agg)
        if args.clone is not None:
            cv = args.clone_version
            if cv is not None and cv.isdigit():
                cv = int(cv)
            out["cloned_version"] = _v.clone_table(
                args.table, args.clone, cv
            )
        if args.tag is not None:
            name, _, tv = args.tag.partition("=")
            out["tagged"] = {
                name: _v.tag_version(
                    args.table, name, int(tv) if tv else None
                )
            }
        if args.add_constraint is not None:
            cname, _, cexpr = args.add_constraint.partition("=")
            if not cexpr:
                p.error("--add-constraint needs NAME=EXPR")
            out["version"] = _v.add_table_constraint(
                spark, args.table, cname, cexpr
            )
        if args.drop_constraint is not None:
            out["version"] = _v.drop_table_constraint(
                args.table, args.drop_constraint
            )
        if args.rename_column:
            out["version"] = _v.rename_columns(
                spark, args.table,
                dict(pair.split("=", 1) for pair in args.rename_column),
            )
        if args.set_property:
            out["version"] = _v.set_table_properties(
                args.table,
                dict(pair.split("=", 1) for pair in args.set_property),
            )
        if args.unset_property:
            out["version"] = _v.unset_table_properties(
                args.table, args.unset_property
            )
        if (args.read is not None or args.as_of is not None) and \
                args.read_delta is None and args.read_iceberg is None:
            if not args.out:
                p.error("--read/--as-of requires --out")
            if args.read is not None and args.as_of is not None:
                p.error("pass --read or --as-of, not both")
            if args.as_of is not None:
                try:
                    ts = float(args.as_of)  # epoch form
                except ValueError:
                    ts = args.as_of  # ISO-8601 form
                v = _v.version_at_timestamp(args.table, ts)
                out["resolved_version"] = v
            elif args.read == "latest":
                v = None
            elif args.read.isdigit():
                v = int(args.read)
            else:
                v = args.read  # tag name
            df = _v.read_table_version(spark, args.table, v)
            df.write.mode("overwrite").parquet(args.out)
            out["read_rows"] = spark.read.parquet(args.out).count()
        if args.merge is not None:
            if not args.keys:
                p.error("--merge requires --keys")

            def _clause(v):
                if v is None:
                    return None
                return True if v.lower() == "true" else v

            upd = None
            if args.matched_update:
                upd = (
                    "*"
                    if args.matched_update == ["*"]
                    else dict(
                        pair.split("=", 1) for pair in args.matched_update
                    )
                )
            out["version"] = _v.merge_table_version(
                spark, args.table, spark.read.parquet(args.merge),
                args.keys.split(","),
                when_matched_update=upd,
                when_matched_delete=_clause(args.matched_delete),
                when_not_matched_insert=_clause(args.not_matched_insert),
                update_condition=args.update_condition,
                mode=dml_mode,
            )
        if args.delete_where is not None:
            out["version"] = _v.delete_table_version(
                spark, args.table, args.delete_where, mode=dml_mode,
            )
        if args.update_where is not None:
            if not args.set:
                p.error("--update-where requires --set")
            sets = dict(pair.split("=", 1) for pair in args.set)
            out["version"] = _v.update_table_version(
                spark, args.table, args.update_where, sets,
                mode=dml_mode,
            )
        if args.compact is not None or args.compact_bytes is not None:
            out["version"] = _v.compact_table_version(
                spark, args.table,
                max_files_per_partition=(
                    args.compact if args.compact is not None else 1
                ),
                zorder_by=args.zorder.split(",") if args.zorder else None,
                target_file_bytes=args.compact_bytes,
            )
        if args.expire_keep is not None:
            out["expire"] = _v.expire_versions(args.table, args.expire_keep)
        if args.export_delta:
            from etl_rust_spark.deltalake import export_delta_log

            out["delta_commits"] = export_delta_log(
                spark, args.table,
                checkpoint_format=args.checkpoint_format,
                change_data_keys=(
                    args.change_data_keys.split(",")
                    if args.change_data_keys else None
                ),
            )
        if args.read_delta is not None:
            if not args.out:
                p.error("--read-delta requires --out")
            from etl_rust_spark.deltalake import read_delta_table

            dv = (None if args.read_delta == "latest"
                  else int(args.read_delta))
            das_of = None
            if args.as_of is not None and args.read is None:
                try:
                    das_of = float(args.as_of)
                except ValueError:
                    das_of = args.as_of
                dv = None
            ddf = read_delta_table(spark, args.table, dv, as_of=das_of)
            ddf.write.mode("overwrite").parquet(args.out)
            out["read_rows"] = spark.read.parquet(args.out).count()
        if args.import_delta is not None:
            from etl_rust_spark.deltalake import import_delta_log

            out["imported_versions"] = import_delta_log(
                spark, args.table, args.import_delta
            )
        if args.export_iceberg:
            from etl_rust_spark.iceberg import export_iceberg_metadata

            out["iceberg_snapshots"] = export_iceberg_metadata(
                spark, args.table
            )
        if args.import_iceberg is not None:
            from etl_rust_spark.iceberg import import_iceberg_table

            out["imported_versions"] = import_iceberg_table(
                spark, args.table, args.import_iceberg
            )
        if args.read_iceberg is not None:
            if not args.out:
                p.error("--read-iceberg requires --out")
            from etl_rust_spark.iceberg import read_iceberg_table

            sid = (None if args.read_iceberg == "latest"
                   else int(args.read_iceberg))
            ias_of = None
            if args.as_of is not None and args.read is None:
                try:
                    ias_of = float(args.as_of)
                except ValueError:
                    ias_of = args.as_of
                sid = None
            idf = read_iceberg_table(spark, args.table, sid,
                                     as_of=ias_of)
            idf.write.mode("overwrite").parquet(args.out)
            out["read_rows"] = spark.read.parquet(args.out).count()
        if args.changes is not None:
            if not args.keys or not args.out:
                p.error("--changes requires --keys and --out")
            lo, _, hi = args.changes.partition(":")
            ch = _v.read_table_changes(
                spark, args.table, args.keys.split(","),
                from_version=int(lo), to_version=int(hi) if hi else None,
            )
            ch.write.mode("overwrite").parquet(args.out)
            back = spark.read.parquet(args.out)
            out["change_rows"] = back.count()
            out["change_types"] = {
                r["_change_type"]: r["count"]
                for r in back.groupBy("_change_type").count().collect()
            }
        out["versions"] = _v.list_versions(args.table)
        print(json.dumps(out))
    elif args.cmd == "diff":
        from etl_rust_spark.operators.profile import diff_summary, table_diff

        d = table_diff(
            spark.read.parquet(args.old),
            spark.read.parquet(args.new),
            args.keys.split(","),
        )
        if args.out:
            d.write.mode("overwrite").parquet(args.out)
            d = spark.read.parquet(args.out)
        print(json.dumps(diff_summary(d)))
    elif args.cmd == "dedup-media":
        from pyspark.sql import functions as F

        from etl_rust_spark.operators import multimodal

        assets = spark.read.parquet(args.assets)
        stub = args.stub_decode
        pairs = (
            multimodal.near_dup_images(assets, args.max_hamming, decode_stub=stub)
            .withColumn("modality", F.lit("image"))
            .withColumn("n_frames", F.lit(None).cast("long"))
            .unionByName(
                multimodal.near_dup_audio(assets, args.max_hamming, decode_stub=stub)
                .withColumn("modality", F.lit("audio"))
                .withColumn("n_frames", F.lit(None).cast("long"))
            )
            .unionByName(
                multimodal.near_dup_videos(
                    assets, args.max_hamming,
                    min_matching_frames=args.min_matching_frames,
                )
                .withColumnRenamed("min_hamming", "hamming")
                .withColumn("modality", F.lit("video"))
            )
        )
        pairs.write.mode("overwrite").parquet(args.out)
        counts = {
            r["modality"]: r["n"]
            for r in spark.read.parquet(args.out)
            .groupBy("modality").agg(F.count("*").alias("n")).collect()
        }
        print(json.dumps({m: counts.get(m, 0) for m in ("image", "audio", "video")}))
    elif args.cmd == "save-range":
        print(save_range(spark, chain, args.start, args.end, args.out))
    elif args.cmd == "create-test-set":
        print(create_test_set(spark, chain, args.start, args.end, args.name, args.dir))
    if srv is not None:
        srv.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
