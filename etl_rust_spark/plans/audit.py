"""Physical-plan audit: the 100 TB design pass as code (SURVEY §7 P6).

The reference has no optimizer to audit (SURVEY §4.1 — its plan is fixed
at compile time).  This engine delegates planning to Catalyst, so the
scale guarantee lives in *properties of the produced plan*: filters
reach the parquet scan, projections prune the read schema, small
dimensions broadcast, Python never appears in a hot path, shuffles stay
bounded.  This module extracts those properties from
``explain("formatted")`` so they can be asserted in tests and inspected
per query — regressions in plan shape fail CI instead of surfacing as a
10× slowdown at the next scale-up.

Usage::

    rep = audit(df)
    rep.pushed_filters      # ["IsNotNull(l_orderkey)", ...] per scan
    rep.num_exchanges       # shuffle count
    rep.broadcast_joins     # count of BroadcastHashJoin nodes
    rep.warnings            # ["python-udf in plan", "cartesian product", ...]
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = ["PlanReport", "explain_string", "audit"]


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The plan text ``df.explain(mode)`` would print, as a string."""
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jqe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@dataclass
class PlanReport:
    plan: str
    scans: list[dict] = field(default_factory=list)
    num_exchanges: int = 0
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    broadcast_nl_joins: int = 0
    cartesian_products: int = 0
    python_evals: int = 0
    rowwise_python_evals: int = 0
    arrow_evals: int = 0
    warnings: list[str] = field(default_factory=list)

    @property
    def pushed_filters(self) -> list[str]:
        return [f for s in self.scans for f in s["pushed_filters"]]

    def read_columns(self, table_hint: str | None = None) -> set[str]:
        """Union of columns the parquet scans actually read."""
        cols: set[str] = set()
        for s in self.scans:
            if table_hint and table_hint not in s["location"]:
                continue
            cols |= set(s["read_schema"])
        return cols


_SCAN_RE = re.compile(r"\(\d+\) Scan parquet ?\n(.*?)(?:\n\n|\Z)", re.S)
_FIELD_RE = re.compile(r"^(\w[\w ]*): (.*)$", re.M)


def _split_top_level(s: str) -> list[str]:
    """Split on commas outside parentheses (filter exprs contain commas)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [p for p in out if p]


def _parse_scan(block: str) -> dict:
    fields = dict(_FIELD_RE.findall(block))
    pushed = fields.get("PushedFilters", "[]").strip("[]")
    schema = fields.get("ReadSchema", "struct<>")
    cols = re.findall(r"(\w+):", schema.split("<", 1)[-1])
    return {
        "location": fields.get("Location", ""),
        "pushed_filters": _split_top_level(pushed),
        "read_schema": cols,
    }


def audit(df: DataFrame, expect_columns: dict[str, set[str]] | None = None) -> PlanReport:
    """Analyze ``df``'s physical plan; flag scale anti-patterns.

    ``expect_columns``: optional {table-path-substring: allowed column
    set}; any scan of that table reading extra columns raises a warning
    (projection-pruning regression).
    """
    text = explain_string(df)
    rep = PlanReport(plan=text)
    rep.scans = [_parse_scan(m.group(0)) for m in _SCAN_RE.finditer(text)]
    rep.num_exchanges = len(re.findall(r"\(\d+\) Exchange", text))
    rep.broadcast_joins = len(re.findall(r"\(\d+\) BroadcastHashJoin", text))
    rep.sort_merge_joins = len(re.findall(r"\(\d+\) SortMergeJoin", text))
    rep.broadcast_nl_joins = len(
        re.findall(r"\(\d+\) BroadcastNestedLoopJoin", text)
    )
    rep.cartesian_products = len(re.findall(r"\(\d+\) CartesianProduct", text))
    rep.python_evals = len(
        re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", text)
    )
    # Row-at-a-time Python (pickled per row) is ALWAYS a plan bug;
    # Arrow-batched evals are the declared vectorized fast path
    # (dq33 engine, ANN signatures, portable-hash kernels) — callers
    # assert rowwise == 0 everywhere and bound arrow_evals explicitly.
    rep.rowwise_python_evals = len(re.findall(r"BatchEvalPython", text))
    rep.arrow_evals = rep.python_evals - rep.rowwise_python_evals

    if rep.python_evals:
        rep.warnings.append(
            "python eval in plan — acceptable only for declared pandas-UDF operators"
        )
    if rep.cartesian_products:
        rep.warnings.append("CartesianProduct — unbounded pairwise blowup at scale")
    if expect_columns:
        for hint, allowed in expect_columns.items():
            got = rep.read_columns(hint)
            extra = got - allowed
            if extra:
                rep.warnings.append(
                    f"scan of {hint} reads unpruned columns: {sorted(extra)}"
                )
    return rep
