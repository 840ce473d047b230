"""Per-file metadata: footer [min,max] stats with truncation, bloom
indexes (build + probe), and the sparkless footer stats used by the
jar-free sink.

Mechanical split of the former single-module versions.py (r11); see the package __init__ for the public surface."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .layout import _trunc_upper  # noqa: F401  (re-export: pre-split home)


_ROWS_KEY = "rows:"    # per-file stats-dict key: exact footer row count
_TRUNC_KEY = "trunc:"  # per-file marker: "trunc:<col>" → bounds widened

# String min/max longer than this are stored as WIDENED bounds (Iceberg's
# truncate(w) semantics): min keeps its first _STATS_TRUNCATE code points
# (a prefix is <= the full value, a sound lower bound); max keeps the
# prefix with its last code point incremented (strictly above every value
# sharing the prefix, a sound upper bound).  Pruning only ever KEEPS more
# files under widened bounds, so every prune path stays correct; exact
# consumers (aggregate_table_metadata) see the "trunc:<col>" marker and
# refuse.  Without this, one wide-string stats column (document text,
# URLs) makes manifest size O(files x value width) — the 100 TB metadata
# hazard delta-form manifests were built to avoid.
_STATS_TRUNCATE = 64


def _file_stats(table: str, files: list[str], cols: list[str]) -> dict:
    """Per-file [min, max] of ``cols`` from the parquet FOOTERS (pyarrow,
    driver-side metadata read — the layout_report mechanics), keyed by
    data-relative path.  Columns a file lacks or carries no stats for
    are simply absent — pruning treats that as "cannot skip".

    Every file additionally records its exact footer row count under
    ``rows:`` (Delta/Iceberg parity) — the key metadata-only COUNTs and
    per-partition row reporting read; string bounds wider than
    ``_STATS_TRUNCATE`` are stored widened with a ``trunc:<col>``
    marker (see above).

    Caveat (measured r10 s3, SCALE.md): parquet-mr OMITS footer
    min/max whenever min+max together exceed 4 KB, so a stats column
    over document-body text records no bounds at all — those files
    simply lack the entry and pruning keeps them.  Range stats belong
    on keys/URLs/timestamps; document text wants a fingerprint or
    bloom column instead."""
    import pyarrow.parquet as pq

    data = Path(table) / "data"
    out: dict[str, dict[str, object]] = {}
    for rel in files:
        meta = pq.ParquetFile(str(data / rel)).metadata
        fstats: dict[str, object] = {_ROWS_KEY: meta.num_rows}
        out[rel] = fstats
        if not meta.num_row_groups:
            continue
        idx = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        }
        for c in cols:
            if c not in idx:
                continue
            lo = hi = None
            ok = True
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if not ok:
                continue
            if isinstance(lo, str) and (
                len(lo) > _STATS_TRUNCATE or len(hi) > _STATS_TRUNCATE
            ):
                up = (
                    hi if len(hi) <= _STATS_TRUNCATE
                    else _trunc_upper(hi, _STATS_TRUNCATE)
                )
                if up is None:
                    continue  # unbounded above: no sound entry possible
                fstats[c] = [lo[:_STATS_TRUNCATE], up]
                fstats[_TRUNC_KEY + c] = True
            else:
                fstats[c] = [lo, hi]
    return out


_BLOOM_KEY = "bloom:"  # per-file stats-dict key prefix for bloom entries


def _bloom_positions(value: str, bits: int, k: int) -> list[int]:
    """k bit positions via double hashing over one blake2b digest —
    deterministic across processes (no PYTHONHASHSEED dependence)."""
    import hashlib

    d = hashlib.blake2b(value.encode("utf-8"), digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + i * h2) % bits for i in range(k)]


def _point_probe_str(col: str, val) -> str:
    """Render a point-probe value EXACTLY as the bloom build did (the
    build hashes ``CAST(col AS STRING)``).  Python ``str()`` diverges
    from Spark's cast for bool ('True' vs 'true'), float, date and
    timestamp — a diverging rendering makes the bloom report a FALSE
    NEGATIVE and the file is silently pruned: rows dropped from reads,
    rows MISSED by delete/update (a GDPR-erasure hazard).  So bool is
    normalized to Spark's rendering, str/int pass through (identical in
    both engines), and everything else is rejected LOUDLY (ADVICE r9 —
    the limitation used to be documented but unenforced)."""
    if isinstance(val, bool):  # before int: bool is an int subtype
        return "true" if val else "false"
    if isinstance(val, (str, int)):
        return str(val)
    raise TypeError(
        f"point probe on {col!r} supports str/int/bool values only, got "
        f"{type(val).__name__}: Python's rendering of float/date/"
        "timestamp diverges from the CAST(col AS STRING) the bloom was "
        "built from, which would silently prune files that DO contain "
        "the key — pass the value pre-rendered with Spark cast semantics"
    )


def _bloom_might_contain(entry: dict, value: str) -> bool:
    import base64

    import numpy as np

    bits = np.unpackbits(
        np.frombuffer(base64.b64decode(entry["b"]), dtype=np.uint8)
    )
    return all(bits[p] for p in _bloom_positions(value, entry["m"], entry["k"]))


def _file_blooms(
    spark: SparkSession, table: str, files: list[str], cols: list[str],
    bits: int, k: int,
) -> dict[str, dict]:
    """Per-file bloom filters over ``CAST(col AS STRING)`` — the
    point-lookup complement to min/max stats: a high-cardinality
    UNORDERED key (doc_id, uuid, address) has every file's [min, max]
    spanning the whole domain, so range stats prune nothing, while a
    1 KB bloom per file answers "could this file hold key X" with no
    false negatives (false positives only cost a read that min/max
    would have paid anyway).

    Built executor-side with ZERO shuffle: one columnar scan of only
    the bloom columns, per-Arrow-batch partial bitmaps, OR-merged on
    the driver (n_batches × n_cols tiny rows — control-plane sized).
    Size ``bits`` to ~10× the expected distinct keys per file; for
    very fat files prefer engine-native parquet bloom filters at write
    time and keep these for file-level (not row-group) skipping."""
    import base64

    import numpy as np
    import pandas as pd

    if not files or not cols:
        return {}
    data_abs = (Path(table) / "data").resolve()
    data = str(Path(table) / "data")
    df = spark.read.option("basePath", data).parquet(
        *[f"{data}/{f}" for f in files]
    )
    present = [c for c in cols if c in df.columns]
    if not present:
        return {}
    sel = df.select(
        F.input_file_name().alias("__f"),
        *[F.col(c).cast("string").alias(c) for c in present],
    )

    def gen(batches):
        for pdf in batches:
            fs, cs, bs = [], [], []
            for fname, sub in pdf.groupby("__f"):
                for c in present:
                    arr = np.zeros(bits, dtype=bool)
                    for v in sub[c]:
                        if v is None:
                            continue
                        for p in _bloom_positions(v, bits, k):
                            arr[p] = True
                    fs.append(fname)
                    cs.append(c)
                    bs.append(np.packbits(arr).tobytes())
            yield pd.DataFrame({"f": fs, "c": cs, "b": bs})

    def or_merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        acc = np.zeros(bits // 8 + (1 if bits % 8 else 0),
                       dtype=np.uint8)
        for b in pdf["b"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"f": pdf["f"].iloc[:1],
                             "c": pdf["c"].iloc[:1],
                             "b": [acc.tobytes()]})

    # OR-merge the per-partition partials SPARK-SIDE so the collect is
    # exactly one row per (file, col) — without this, a file split
    # across P scan partitions ships P bitmaps to the driver (the
    # n_files x n_cols x P x bits/8 partial-collect VERDICT r10 named)
    partials = sel.mapInPandas(gen, "f string, c string, b binary")
    merged_df = partials.groupBy("f", "c").applyInPandas(
        or_merge, "f string, c string, b binary"
    )
    out: dict[str, dict] = {}
    for row in merged_df.collect():
        rel = _rel_from_file_uri(row["f"], data_abs)
        out.setdefault(rel, {})[_BLOOM_KEY + row["c"]] = {
            "m": bits,
            "k": k,
            "b": base64.b64encode(row["b"]).decode("ascii"),
        }
    return out


def _new_file_meta(
    spark: SparkSession, table: str, files: list[str],
    stats_cols: list[str] | None, bloom_conf: dict | None,
) -> dict:
    """Per-file metadata for freshly staged files: [min,max] footer
    stats for ``stats_cols`` plus bloom entries per ``bloom_conf`` —
    both live in the same per-file dict so every carry/reconstruct
    path moves them together.  Called with stats_cols=None it still
    records each file's exact ``rows:`` count (one driver-side footer
    read per NEW file — delta commits touch few)."""
    meta: dict[str, dict] = _file_stats(table, files, stats_cols or [])
    if bloom_conf and bloom_conf.get("cols"):
        for f, d in _file_blooms(
            spark, table, files, bloom_conf["cols"],
            int(bloom_conf.get("bits", 8192)), int(bloom_conf.get("k", 4)),
        ).items():
            meta.setdefault(f, {}).update(d)
    return meta


def _new_file_meta_local(
    table: str, files: list[str], stats_cols: list[str] | None,
    bloom_conf: dict | None,
) -> dict:
    """Sparkless per-file metadata (the sink's commit hook): [min,max]
    via parquet footers, blooms via a pyarrow column read hashed with
    the SAME rendering contract as the probes (str/int pass through,
    bool normalizes, float/date/timestamp REJECTED — a diverging
    rendering would poison the bloom with false negatives)."""
    import base64

    import numpy as np
    import pyarrow.parquet as pq

    meta: dict[str, dict] = _file_stats(table, files, stats_cols or [])
    if bloom_conf and bloom_conf.get("cols"):
        data = Path(table) / "data"
        bits = int(bloom_conf.get("bits", 8192))
        k = int(bloom_conf.get("k", 4))
        for rel in files:
            t = pq.read_table(str(data / rel))
            for c in bloom_conf["cols"]:
                if c not in t.column_names:
                    continue
                arr = np.zeros(bits, dtype=bool)
                for v in t.column(c).to_pylist():
                    if v is None:
                        continue
                    for pos in _bloom_positions(
                        _point_probe_str(c, v), bits, k
                    ):
                        arr[pos] = True
                meta.setdefault(rel, {})[_BLOOM_KEY + c] = {
                    "m": bits,
                    "k": k,
                    "b": base64.b64encode(
                        np.packbits(arr).tobytes()
                    ).decode("ascii"),
                }
    return meta


def _rel_from_file_uri(uri: str, data_abs: Path) -> str:
    """Map a Spark ``input_file_name()`` URI back to a data-relative
    manifest path.  Spark percent-encodes the path segments of the URI
    it reports, and Hive-escaped partition directories already CONTAIN
    percent escapes on disk (``p=a%3Ab``), so the URI shows them
    double-encoded (``p=a%253Ab``) — one ``unquote`` restores exactly
    the on-disk name."""
    from urllib.parse import unquote, urlparse

    p = unquote(urlparse(uri).path)
    return str(Path(p).relative_to(data_abs))
