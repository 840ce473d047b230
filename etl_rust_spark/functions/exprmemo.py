"""Memoize pure Column-expression builders.

Query CONSTRUCTION is driver-side Py4J chatter: each DataFrame method is
~10 ms and each Column/F.expr a few ms, so operators that assemble wide
projections (text profile, sketches, histograms) pay 0.1-0.7 s per call
before Spark sees a plan.  Unresolved Column trees are immutable and
session-independent within one JVM, so a builder that depends only on
hashable arguments (column NAMES and scalars — never DataFrames) can
return the same objects every call.

Memoizing EXPRESSIONS is safe where memoizing DataFrames is not: a
fresh plan is still built per query, so there is no RDD-instance
shuffle-file reuse across bench laps (the r6 trap).  Builders called
with unhashable arguments fall through to a plain call.
"""

from __future__ import annotations

import functools

__all__ = ["column_memo"]


def column_memo(fn):
    """Decorator: cache ``fn(*args)`` per args tuple.  Use ONLY on pure
    builders of Column expressions / Column collections whose output
    depends on nothing but the (hashable) arguments."""
    cache: dict = {}

    @functools.wraps(fn)
    def wrapped(*args):
        try:
            hash(args)
        except TypeError:
            return fn(*args)
        out = cache.get(args)
        if out is None:
            out = cache[args] = fn(*args)
        return out

    return wrapped
