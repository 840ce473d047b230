"""Engine-form overrides for declared queries (dq13 precedent).

A declared query's SEMANTICS are fixed by its SQL text (what the DuckDB
oracle runs); the ENGINE may run any plan that returns identical rows.
dq13 rewrote a quadratic decorrelated as-of subquery into distinct-ts +
LAG inside the SQL text itself; dq33's rewrite needs Python (BLAS), so
it lives here and `__spark_entry__._declared_runner` dispatches to it.

dq33 — brute-force top-1 dot product, qids 1..10 vs all higher vec_ids.
The SQL form's zip_with/aggregate higher-order functions are interpreted
(never enter whole-stage codegen) and build a qid×cid pair *relation*
before ranking: 1.7 s at sf1 and growing linearly in |corpus|.  The
engine form streams the corpus ONCE through an Arrow-batched
mapInPandas: broadcast 10×64 query matrix, per batch one (10×B) BLAS
matmul, reduce to a per-qid top-1 *within the batch*, then a tiny final
reduce over n_batches×10 candidate rows.  No pair relation ever
materializes — at 10⁹ corpus vectors the shuffle is 10 rows per batch.

Float parity: the SQL form folds products left-to-right
(aggregate(zip_with(...)) = ((0+p₁)+p₂)+…) and rounds HALF_UP to 3
decimals BEFORE ranking (ties then break on cid).  Matmul sums in SIMD
/pairwise order, which can differ in ULPs and flip a boundary round, so
the batch kernel reproduces the sequential fold with a cumulative sum
along the dim axis and applies the same sign-aware HALF_UP round before
any comparison.  Identical bytes in → identical rows out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rust_spark.catalog import load_table

__all__ = ["ENGINE_FORMS", "dq33_engine"]


def _half_up_3(x: np.ndarray) -> np.ndarray:
    # Spark/DuckDB ROUND(x, 3): half away from zero.  + 0.0 folds IEEE
    # negative zero to +0.0, matching the `ROUND(...) + 0.0` the SQL
    # forms now apply (sign(x)*floor(...) yields -0.0 for tiny x < 0).
    return np.sign(x) * np.floor(np.abs(x) * 1000.0 + 0.5) / 1000.0 + 0.0


def dq33_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q_rows = sorted(
        (r[0], list(r[1]))
        for r in emb.filter(F.col("vec_id") <= 10).select("vec_id", "embedding").collect()
    )  # 10 rows — a bounded, broadcast-sized query set, not a data-plane collect
    qids = np.array([q[0] for q in q_rows], dtype=np.int64)
    qmat = np.array([q[1] for q in q_rows], dtype=np.float64)  # (nq, dim)
    bq = spark.sparkContext.broadcast((qids, qmat))

    out_schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("cid", T.LongType()),
            T.StructField("dot", T.DoubleType()),
        ]
    )

    def topk_gen(batches):
        qids_, qmat_ = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cmat = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            # sequential-fold dot: elementwise products cumsum'd along dim
            # reproduces ((0+p1)+p2)+... exactly (see module docstring).
            prods = qmat_[:, None, :] * cmat[None, :, :]  # (nq, B, dim)
            dots = _half_up_3(np.cumsum(prods, axis=2)[:, :, -1])
            # mask cid <= qid (join condition a.vec_id < b.vec_id)
            valid = cids[None, :] > qids_[:, None]
            best_q, best_c, best_d = [], [], []
            for i in range(len(qids_)):
                m = valid[i]
                if not m.any():
                    continue
                d, c = dots[i][m], cids[m]
                # top-1: dot DESC, cid ASC — lexsort on (-d, c)
                j = np.lexsort((c, -d))[0]
                best_q.append(qids_[i])
                best_c.append(c[j])
                best_d.append(d[j])
            if best_q:
                yield pd.DataFrame({"qid": best_q, "cid": best_c, "dot": best_d})

    candidates = emb.select("vec_id", "embedding").mapInPandas(topk_gen, out_schema)
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("cid"))
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("qid", "cid", "dot")
        .orderBy("qid")
    )


ENGINE_FORMS = {"dq33": dq33_engine}
