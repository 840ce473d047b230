"""Corpus sampling + sequence packing for training-data pipelines.

Two operators the reference has no analog for (it is extract→publish
only, SURVEY §2.5); both are standard stages between a curated corpus
and a trainer:

- :func:`hash_sample` — deterministic, reproducible sampling by content
  of the id (not ``rand()``): the same row set survives re-runs,
  retries, and engine changes, which is what makes a sampled corpus
  auditable.  Per-stratum rates supported (e.g. upsample low-resource
  languages).  Pure filter — scan-shaped, no shuffle, trivially 100 TB.
- :func:`pack_sequences` — greedy first-fit-decreasing packing of
  documents into fixed token budgets (context windows).  Packing is
  inherently sequential, so the distributed form shards the corpus into
  ``n_shards`` hash groups and packs each shard independently in one
  ``applyInPandas`` pass: deterministic regardless of cluster layout
  (shard = hash(id), order inside a shard is (tokens desc, id)), state
  bounded by shard size, parallelism = ``n_shards``.  Cross-shard
  packing would give marginally tighter packs at the cost of a global
  sort + sequential pass — the wrong trade at scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rust_spark.operators.hashes import MINHASH_P, duck_h, spark_h

__all__ = ["hash_sample", "hash_sample_sql", "pack_sequences"]

_MOD = 10_000


def hash_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    strata_rates: dict[str, float] | None = None,
    strata_col: str = "lang",
    seed: str = "s0",
) -> DataFrame:
    """Keep rows whose 62-bit content hash of ``(seed, id)`` lands under
    the rate threshold; ``strata_rates`` overrides the base ``rate`` per
    stratum value.  Changing ``seed`` draws an independent sample."""
    key = f"concat('{seed}', ':', CAST({id_col} AS STRING))"
    h = F.expr(f"{spark_h(x=key)} % {MINHASH_P} % {_MOD}")
    if strata_rates:
        thresh = F.lit(int(rate * _MOD))
        for val, r in sorted(strata_rates.items()):
            thresh = F.when(F.col(strata_col) == val, int(r * _MOD)).otherwise(thresh)
    else:
        thresh = F.lit(int(rate * _MOD))
    return df.filter(h < thresh)


def hash_sample_sql(
    rate: float,
    source: str = "documents",
    id_col: str = "doc_id",
    seed: str = "s0",
) -> tuple[str, str]:
    """Dual-dialect mirror of the unstratified form."""
    thresh = int(rate * _MOD)
    sp = spark_h(x=f"concat('{seed}', ':', CAST({id_col} AS STRING))")
    du = duck_h(x=f"'{seed}' || ':' || CAST({id_col} AS VARCHAR)")
    spark = f"SELECT * FROM {source} WHERE {sp} % {MINHASH_P} % {_MOD} < {thresh} ORDER BY {id_col}"
    duck = f"SELECT * FROM {source} WHERE {du} % {MINHASH_P} % {_MOD} < {thresh} ORDER BY {id_col}"
    return spark, duck


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 64,
) -> DataFrame:
    """(id, n_tokens, shard, pack_id, pack_offset): assign every doc to a
    pack (training sequence) of at most ``max_tokens`` tokens.

    Greedy first-fit-decreasing inside each hash shard.  A doc longer
    than ``max_tokens`` gets a singleton pack (the trainer's truncation
    problem, not the packer's).  ``pack_id`` is globally unique as
    ``shard * 2^32 + local_pack``; ``pack_offset`` is the token offset
    of the doc inside its pack.  Deterministic for a given
    ``n_shards`` — independent of partitioning and executor count.
    """
    id_key = f"CAST({id_col} AS STRING)"
    shard_expr = F.expr(f"{spark_h(x=id_key)} % {MINHASH_P} % {n_shards}").cast("int")
    src = df.select(
        F.col(id_col), F.col(token_col).cast("long").alias("n_tokens"), shard_expr.alias("shard")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", id_col], ascending=[False, True])
        shard = int(pdf["shard"].iloc[0])
        # open packs: list of remaining capacities; first-fit scan.
        caps: list[int] = []
        assign: list[int] = []
        offset: list[int] = []
        for n in pdf["n_tokens"].astype(int):
            for i, c in enumerate(caps):
                if n <= c:
                    assign.append(i)
                    offset.append(max_tokens - c)
                    caps[i] = c - n
                    break
            else:
                assign.append(len(caps))
                offset.append(0)
                caps.append(max(max_tokens - n, 0))
        out = pdf.copy()
        out["pack_id"] = [shard * (1 << 32) + a for a in assign]
        out["pack_offset"] = offset
        return out

    schema = f"{id_col} long, n_tokens long, shard int, pack_id long, pack_offset long"
    return src.groupBy("shard").applyInPandas(pack, schema=schema)
