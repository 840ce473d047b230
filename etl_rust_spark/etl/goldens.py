"""Golden-set generation and checking (reference S-09).

The reference CLI offers ``save-range`` (persist raw extracted data) and
``create-test-set`` (persist raw + expected transformed outputs under
``tests/examples/<name>_<start>_<end>``) so regressions diff against
frozen expectations (/root/reference/src/main.rs:434-462,
tests/README.md:2-6).

Spark-native: raw responses land as JSONL (human-diffable, matching the
reference's JSON-on-disk idiom), expected per-table outputs as parquet.
``check_golden`` re-runs the transform and diffs row sets exactly —
an empty symmetric difference is the pass condition.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from etl_rust_spark.sources.chain import ChainConfig
from etl_rust_spark.sources.ranges import block_range

__all__ = ["save_range", "create_test_set", "check_golden"]


def save_range(
    spark: SparkSession, chain: ChainConfig, start: int, end: int, out_dir: str
) -> str:
    """Persist raw extracted responses for ``[start, end)`` (save-range)."""
    raw = chain.fetch(block_range(spark, start, end))
    path = f"{out_dir}/raw_{start}_{end}"
    raw.coalesce(1).write.mode("overwrite").json(path)
    return path


def create_test_set(
    spark: SparkSession,
    chain: ChainConfig,
    start: int,
    end: int,
    name: str,
    dir: str = "tests/examples",
) -> str:
    """Persist raw + expected transformed outputs (create-test-set)."""
    base = f"{dir}/{name}_{start}_{end}"
    raw = chain.fetch(block_range(spark, start, end))
    raw.coalesce(1).write.mode("overwrite").json(f"{base}/raw")
    for table, df in chain.transform(raw).items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{base}/expected/{table}")
    return base


def _diff_count(a: DataFrame, b: DataFrame) -> int:
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def check_golden(spark: SparkSession, chain: ChainConfig, base: str) -> dict[str, int]:
    """Re-run the transform over the frozen raw data and diff per table.

    Returns ``{table: n_differing_rows}`` — all zeros ⇔ pass.
    """
    from etl_rust_spark.sources.chain import RESPONSE_SCHEMA  # noqa: F401 (doc link)

    raw = spark.read.schema(
        "block_index long, response_json string"
    ).json(f"{base}/raw")
    got = chain.transform(raw)
    out: dict[str, int] = {}
    for tdir in sorted(Path(f"{base}/expected").iterdir()):
        table = tdir.name
        expected = spark.read.parquet(str(tdir))
        out[table] = _diff_count(
            got[table].select(*expected.columns), expected
        )
    return out
