"""Streaming continuous aggregate: the hypertable rollup fed by a stream.

``operators.rollup.update_rollup`` is the BATCH incremental path; its
read-modify-write is not idempotent under replay (its docstring says
so), which is exactly what a foreachBatch retry does.  The streaming
loop therefore uses the epoch-delta discipline instead (the same
idempotent-bucket rule as the ETL writer and the dedup stream):

- each micro-batch rolls up ONLY its own rows and overwrites
  ``delta/batch=<epoch>/`` — a replayed epoch rewrites the same
  directory byte-identically instead of double-counting;
- the rollup READ is :func:`read_continuous_rollup`: merge the
  per-epoch partials with one ``merge_rollup`` at the same bucket
  width (bucket flooring is idempotent, counters SUM, sketches
  ``hll_union_agg``, histograms element-wise SUM) — an LSM-style
  state layout where reads fold the log;
- :func:`compact_rollup` bounds the log: fold all epochs into one
  ``base/`` generation so read cost stays O(base + recent deltas)
  no matter how long the stream runs.

Scale: each micro-batch shuffles only its own bucket×dims partials;
the read merges rollup-sized frames (orders of magnitude below raw);
compaction rewrites rollup rows only — raw events are never rescanned
anywhere in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_rust_spark.operators import rollup as _r

__all__ = ["run_rollup_stream", "read_continuous_rollup", "compact_rollup"]


def run_rollup_stream(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    ts: str = "ts",
    bucket_sec: int = 3600,
    dims: tuple[str, ...] = ("event_type",),
    value: str = "value",
    user: str = "user_id",
    hist_bins: int | None = None,
    kll: bool = False,
    theta: bool = False,
):
    """Start the continuous-aggregate query; returns the StreamingQuery.

    Layout under ``out_dir``: ``delta/batch=<epoch>/`` per-epoch partial
    rollups (and ``base/gen=<n>/`` once :func:`compact_rollup` has
    run)."""
    process = _epoch_processor(
        out_dir, ts=ts, bucket_sec=bucket_sec, dims=dims, value=value,
        user=user, hist_bins=hist_bins, kll=kll, theta=theta,
    )
    return (
        events_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _epoch_processor(
    out_dir: str,
    ts: str = "ts",
    bucket_sec: int = 3600,
    dims: tuple[str, ...] = ("event_type",),
    value: str = "value",
    user: str = "user_id",
    hist_bins: int | None = None,
    kll: bool = False,
    theta: bool = False,
):
    """The foreachBatch body, exposed so tests can drive a REPLAYED
    epoch directly (Spark re-invokes the same epoch_id with the same
    rows after a crash): processing an epoch twice must leave the state
    byte-identical, which the overwrite-into-own-directory layout
    guarantees."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        part = _r.time_rollup(
            batch_df, ts=ts, bucket_sec=bucket_sec, dims=dims, value=value,
            user=user, exact_ndv=False, sketch=True, hist_bins=hist_bins,
            kll=kll, theta=theta,
        )
        part.write.mode("overwrite").parquet(f"{out_dir}/delta/batch={epoch_id}")

    return process


def _generations(spark: SparkSession, out_dir: str) -> DataFrame | None:
    frames = []
    for sub in ("base", "delta"):
        try:
            frames.append(spark.read.parquet(f"{out_dir}/{sub}").drop("gen", "batch"))
        except Exception:
            continue
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def read_continuous_rollup(
    spark: SparkSession,
    out_dir: str,
    bucket_sec: int = 3600,
    dims: tuple[str, ...] = ("event_type",),
    estimate: bool = True,
) -> DataFrame:
    """Current rollup state: fold base + deltas with one merge at the
    SAME bucket width (pass a coarser multiple to read a coarser level
    directly off the same state)."""
    log = _generations(spark, out_dir)
    if log is None:
        raise FileNotFoundError(f"no rollup state under {out_dir}")
    merged = _r.merge_rollup(log, bucket_sec, dims=dims, estimate=estimate)
    return merged


def compact_rollup(
    spark: SparkSession,
    out_dir: str,
    bucket_sec: int = 3600,
    dims: tuple[str, ...] = ("event_type",),
) -> int:
    """Fold every existing generation into one new ``base/gen=<n>`` and
    drop the folded deltas.  Returns the new generation number.

    Ordering vs the running stream: the fold reads a snapshot of the
    delta listing, localCheckpoints the merged state (breaking lineage
    to the files about to be removed), writes the new base, then
    deletes exactly the folded directories — an epoch that lands
    mid-compaction is simply left in the log for the next fold.
    """
    import shutil
    from pathlib import Path

    delta_dirs = sorted(Path(out_dir, "delta").glob("batch=*"))
    base_dirs = sorted(Path(out_dir, "base").glob("gen=*"))
    if not delta_dirs and not base_dirs:
        raise FileNotFoundError(f"no rollup state under {out_dir}")
    frames = [
        spark.read.parquet(str(p)) for p in [*base_dirs, *delta_dirs]
    ]
    log = frames[0]
    for f in frames[1:]:
        log = log.unionByName(f)
    merged = _r.merge_rollup(
        log, bucket_sec, dims=dims, estimate=False
    ).localCheckpoint(eager=True)
    gen = (
        max((int(p.name.split("=")[1]) for p in base_dirs), default=-1) + 1
    )
    merged.write.mode("overwrite").parquet(f"{out_dir}/base/gen={gen}")
    for p in [*base_dirs, *delta_dirs]:
        shutil.rmtree(p)
    return gen
