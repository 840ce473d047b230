"""Explicit skew-mitigation operators: salted aggregation and salted join.

Blockchain data is power-law (the synthetic chain plants it: ~30% of
instructions hit one program, ~30% of transfers one mint — FIXTURES §4),
so a shuffle keyed on ``program``/``mint`` sends a third of 100 TB to
one reducer.  AQE's skew-join splitting handles the *join* case at
runtime when partition-size thresholds trip; these operators are the
*explicit* form for when the skew is known in advance — aggregations
(AQE does not split skewed aggregation keys) and joins where the planner
lacks statistics.

Both are pure DataFrame compositions and preserve results exactly; the
salt only changes physical row placement:

- ``salted_agg``: stage 1 aggregates on (keys, salt) — the hot key's
  rows spread over ``n_salts`` reducers and collapse to ``n_salts``
  partial rows; stage 2 merges partials on the true keys.  Classic
  two-stage combine; only algebraic aggregates (sum/count/min/max) are
  offered, since they re-associate exactly.
- ``salted_join``: fact rows scatter to a random salt, the small side
  replicates ``n_salts``× (explode of a literal range — broadcastable),
  and the equi-join runs on (key, salt) so no reducer owns a whole hot
  key.

Salt assignment uses ``rand(seed)`` — placement may vary between runs,
results never do (re-association is exact for the offered aggregates;
the join is key-correct for every salt value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join"]

_PARTIAL = {
    "sum": F.sum,
    "count": None,  # count partials merge via sum
    "min": F.min,
    "max": F.max,
}
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Two-stage aggregation spreading hot grouping keys.

    ``aggs`` maps output column → (function, input column) with function
    in {sum, count, min, max}; ``("count", "*")`` counts rows.

    Example::

        salted_agg(instructions, ["program"],
                   {"n": ("count", "*"), "total": ("sum", "lamports")})
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"{name}: {fn!r} is not an algebraic aggregate")
    salted = df.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    partials = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            partials.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(name))
        else:
            partials.append(_PARTIAL[fn](F.col(col)).alias(name))
    stage1 = salted.groupBy(*keys, "__salt").agg(*partials)
    finals = [_MERGE[fn](F.col(name)).alias(name) for name, (fn, _c) in aggs.items()]
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
    n_salts: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Equi-join with the fact side's hot keys spread over ``n_salts``.

    The dim side replicates ``n_salts``× — keep it the SMALL side (at
    broadcast size prefer ``broadcast()`` outright; salting matters when
    the dim is too big to broadcast but far smaller than the facts).

    ``how`` is restricted to joins that are result-preserving under dim
    replication: every fact row carries exactly one salt, so fact-side
    semantics (inner/left/left_semi/left_anti) are exact — but a dim key
    unmatched in the facts exists once per salt, so right/full (and
    right_semi/right_anti) would emit it ``n_salts`` times (ADVICE r1).
    Those modes raise; swap the operands instead.
    """
    safe = {"inner", "left", "leftouter", "left_outer", "semi", "left_semi",
            "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join(how={how!r}) is not result-preserving: the dim "
            f"side is replicated {n_salts}x, so unmatched dim keys would "
            "be duplicated under right/full joins — swap the operands or "
            "use a plain join with AQE skew handling"
        )
    keys = [on] if isinstance(on, str) else list(on)
    f = facts.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = f.join(d, keys + ["__salt"], how)
    return out.drop("__salt")
