"""The declared query inventory (SURVEY.md §2.6, DQ-01…DQ-44).

These 40 queries are the t2 correctness surface: every operator category
the engine provides, expressed as deterministic SQL (total ORDER BY;
money sums via the integer-cents trick; residual floats ROUNDed) so a
DuckDB oracle hash-match is meaningful.

Each entry carries the Spark-dialect text (what the engine runs — pure
Catalyst-optimized SQL, no UDFs) and the DuckDB-dialect text (what the
oracle runs).  For 28/40 the texts are identical; the dual-form ones are
DQ-19 (unix_timestamp vs epoch), DQ-30 (get_json_object vs
json_extract_string), DQ-31/33 (array HOFs vs list functions), and the
seven integer-SUM queries DQ-04/07/08/18/35/36/40, whose oracle text
wraps each integer sum in CAST(... AS BIGINT): DuckDB's SUM(BIGINT)
yields HUGEINT (int128) while Spark yields BIGINT — same values, but the
driver's type-aware canonicalization distinguishes them.

Reference parity notes: the reference implements NO relational operators
(extract→transform→publish only, see SURVEY §2.5); this surface is the
new engine's analytics layer required by the north star.  DQ-44 is the
one direct ETL-parity query: the reference's GCS 30-minute time-bucket
partitioner (/root/reference/src/output/gcs.rs:105-115).

Scale notes are per-query in ``notes`` where non-obvious.
"""

from __future__ import annotations

from dataclasses import dataclass, field

__all__ = ["Query", "DECLARED"]


@dataclass(frozen=True)
class Query:
    name: str
    category: str
    spark_sql: str
    duck_sql: str | None = None  # None → portable, same text as spark_sql
    notes: str = ""

    @property
    def oracle_sql(self) -> str:
        return self.duck_sql or self.spark_sql


def _q(name: str, category: str, spark_sql: str, duck_sql: str | None = None, notes: str = "") -> Query:
    return Query(name, category, spark_sql.strip(), duck_sql.strip() if duck_sql else None, notes)


DECLARED: dict[str, Query] = {
    q.name: q
    for q in [
        _q(
            "dq01",
            "scan/project",
            """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_orderkey <= 100 ORDER BY l_orderkey, l_linenumber
""",
            notes="Predicate + projection both push into the parquet scan "
            "(PushedFilters + 3-column ReadSchema).",
        ),
        _q(
            "dq02",
            "filter",
            """
SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
WHERE o_orderstatus IN ('F','O') AND o_totalprice BETWEEN 1000 AND 100000
  AND o_orderpriority LIKE '1%' AND o_custkey IS NOT NULL
ORDER BY o_orderkey
""",
        ),
        _q(
            "dq03",
            "project",
            """
SELECT l_orderkey, l_linenumber,
  CASE WHEN l_discount > 0.05 THEN 'HI' ELSE 'LO' END AS disc_band,
  ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charge
FROM lineitem WHERE l_orderkey <= 50 ORDER BY l_orderkey, l_linenumber
""",
        ),
        _q(
            "dq04",
            "aggregation",
            """
SELECT l_returnflag, l_linestatus,
  SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS sum_qty_c,
  SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS sum_price_c,
  ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / (COUNT(*) * 100.0), 2) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
""",
            """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_c,
  ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / (COUNT(*) * 100.0), 2) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
""",
            notes="TPC-H Q1 shape; partial (map-side) aggregation then one "
            "shuffle on a 6-value grouping key — scales linearly.  "
            "Dual-form: DuckDB SUM(BIGINT) returns HUGEINT (int128), Spark "
            "returns BIGINT; the oracle casts the sum back to BIGINT so the "
            "driver's type-aware canonicalization matches (identical values). "
            "avg_price: Spark's BIGINT/DECIMAL division yields DECIMAL(24,2) "
            "while DuckDB's HUGEINT/DECIMAL goes through DOUBLE — the Spark "
            "form casts the SUM to DOUBLE first so both engines do identical "
            "IEEE double division + rounding (r2 driver hash mismatch fix).",
        ),
        _q(
            "dq05",
            "aggregation",
            """
SELECT COUNT(DISTINCT l_partkey) AS d_parts, COUNT(DISTINCT l_suppkey) AS d_supps,
  COUNT(DISTINCT l_returnflag) AS d_flags FROM lineitem
""",
            notes="Multi count-distinct → Catalyst Expand (3x rows) + 2-phase "
            "agg.  At 100 TB prefer approx_count_distinct unless exactness "
            "is gated (here it is).",
        ),
        _q(
            "dq06",
            "aggregation",
            """
SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls
""",
        ),
        _q(
            "dq07",
            "join",
            """
SELECT c_mktsegment, COUNT(*) AS n_orders,
  SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev_c
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
            """
SELECT c_mktsegment, COUNT(*) AS n_orders,
  CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_c
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
            notes="customer is the small side → AQE picks broadcast-hash; no "
            "shuffle of orders.  Dual-form for DuckDB HUGEINT sums (see dq04).",
        ),
        _q(
            "dq08",
            "join",
            """
SELECT n_name, SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS rev_c
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY rev_c DESC, n_name
""",
            """
SELECT n_name, CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS rev_c
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY rev_c DESC, n_name
""",
            notes="TPC-H Q5 shape; region/nation/customer broadcast, single "
            "big shuffle lineitem⋈orders.  r_name filter prunes before join "
            "reorder (CBO/AQE).  Dual-form for DuckDB HUGEINT sums (see dq04).",
        ),
        _q(
            "dq09",
            "join",
            """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey ORDER BY n_orders DESC, c_custkey LIMIT 50
""",
        ),
        _q(
            "dq10",
            "join",
            """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 50000)
ORDER BY c_custkey
""",
            notes="EXISTS → left-semi join rewrite by Catalyst.",
        ),
        _q(
            "dq11",
            "join",
            """
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
""",
            notes="NOT EXISTS → left-anti join rewrite.",
        ),
        _q(
            "dq12",
            "join",
            """
SELECT a.event_id AS eid, COUNT(*) AS n_follow
FROM events a JOIN events b
  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
WHERE a.event_type = 'click'
GROUP BY a.event_id ORDER BY n_follow DESC, eid LIMIT 100
""",
            notes="Range self-join: the user_id equi-key carries the join "
            "(hash/SMJ), the time range is a post-filter — NOT a BNLJ.  "
            "Streaming analog = interval join with watermark.",
        ),
        _q(
            "dq13",
            "join",
            # Engine implementation: the spec's correlated scalar subquery
            # (the duck_sql below) decorrelates into a non-equi join that is
            # quadratic per user (measured 356 s at sf0.1 vs 0.5 s for this
            # form).  MAX(ts) over strictly-earlier rows of the same user is
            # exactly the previous DISTINCT ts, so the engine rewrites the
            # as-of lookup to a LAG window over distinct (user_id, ts) plus
            # an equi-join back — one shuffle on (user_id, ts), O(n log n),
            # scale-safe.
            """
WITH d AS (SELECT DISTINCT user_id, ts FROM events),
     w AS (SELECT user_id, ts, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM d)
SELECT e.event_id, w.prev_ts
FROM events e JOIN w ON e.user_id = w.user_id AND e.ts = w.ts
WHERE e.event_type = 'purchase' ORDER BY e.event_id LIMIT 200
""",
            """
SELECT e.event_id,
  (SELECT MAX(p.ts) FROM events p WHERE p.user_id = e.user_id AND p.ts < e.ts) AS prev_ts
FROM events e WHERE e.event_type = 'purchase' ORDER BY e.event_id LIMIT 200
""",
            notes="As-of lookup.  Spec form (oracle) = correlated scalar "
            "subquery; engine form = distinct-ts + LAG + equi-join rewrite "
            "(as-of join via window), avoiding the quadratic decorrelated "
            "plan.",
        ),
        _q(
            "dq14",
            "join",
            """
SELECT r_name, COUNT(*) AS n FROM region CROSS JOIN nation GROUP BY r_name ORDER BY r_name
""",
        ),
        _q(
            "dq16",
            "window",
            """
SELECT o_custkey, o_orderkey, rnk FROM (
  SELECT o_custkey, o_orderkey,
    RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) t WHERE rnk <= 2 ORDER BY o_custkey, rnk, o_orderkey
""",
            notes="Top-N per group; Spark inserts WindowGroupLimit (rank "
            "pushdown) so per-partition sort keeps only 2 rows per key.",
        ),
        _q(
            "dq17",
            "window",
            """
SELECT event_id, user_id,
  ROUND(value - LAG(value, 1, 0.0) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) + 0.0 AS delta,
  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events WHERE user_id <= 20 ORDER BY user_id, event_id
""",
        ),
        _q(
            "dq18",
            "window",
            """
SELECT event_id, user_id,
  SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_c
FROM events WHERE user_id <= 20 ORDER BY user_id, event_id
""",
            """
SELECT event_id, user_id,
  CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_c
FROM events WHERE user_id <= 20 ORDER BY user_id, event_id
""",
            notes="Dual-form for DuckDB HUGEINT window sums (see dq04).",
        ),
        _q(
            "dq19",
            "window",
            """
SELECT event_id,
  COUNT(*) OVER (PARTITION BY user_id ORDER BY unix_timestamp(ts)
    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS n_10min
FROM events WHERE user_id <= 20 ORDER BY event_id
""",
            """
SELECT event_id,
  COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS n_10min
FROM events WHERE user_id <= 20 ORDER BY event_id
""",
            notes="Time-range window frame over epoch seconds (dual-form: "
            "unix_timestamp vs floor(epoch())).",
        ),
        _q(
            "dq20",
            "window",
            """
SELECT o_orderkey, NTILE(4) OVER w AS quartile,
  ROUND(PERCENT_RANK() OVER w, 4) AS pr, ROUND(CUME_DIST() OVER w, 4) AS cd
FROM orders WHERE o_orderkey <= 400 WINDOW w AS (ORDER BY o_totalprice, o_orderkey) ORDER BY o_orderkey
""",
            notes="Empty PARTITION BY = single-partition window; fine on "
            "filtered input, a deliberate anti-pattern at full scale.",
        ),
        _q(
            "dq21",
            "sort/limit",
            """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS tp FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
            notes="Global top-k → TakeOrderedAndProject: per-partition heaps, "
            "no global sort.",
        ),
        _q(
            "dq23",
            "set op",
            """
SELECT nk FROM (SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier) t
ORDER BY nk
""",
        ),
        _q(
            "dq24",
            "set op",
            """
SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk
""",
        ),
        _q(
            "dq25",
            "set op",
            """
SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk
""",
        ),
        _q(
            "dq26",
            "scalar str",
            """
SELECT p_partkey, UPPER(p_brand) AS ub, LOWER(p_type) AS lt,
  SUBSTRING(p_name, 1, 8) AS pre, LENGTH(p_name) AS ln,
  REPLACE(p_brand, 'Brand#', 'B') AS rb, CONCAT(p_brand, ':', p_type) AS ct,
  LPAD(CAST(p_size AS STRING), 4, '0') AS pad, TRIM('  x  ') AS tr,
  POSITION('#' IN p_brand) AS pos
FROM part WHERE p_partkey <= 60 ORDER BY p_partkey
""",
        ),
        _q(
            "dq27",
            "scalar regex",
            """
SELECT p_partkey, regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS bnum
FROM part WHERE p_partkey <= 60 ORDER BY p_partkey
""",
        ),
        _q(
            "dq28",
            "scalar date",
            """
SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS om,
  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS oy,
  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS omn,
  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS od
FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
""",
        ),
        _q(
            "dq29",
            "scalar math",
            """
SELECT l_orderkey, l_linenumber, ABS(l_discount - 0.05) > 0.001 AS far,
  CAST(CEIL(l_quantity) AS BIGINT) AS cq, CAST(FLOOR(l_quantity) AS BIGINT) AS fq,
  ROUND(SQRT(l_extendedprice), 3) AS sq, ROUND(LN(l_extendedprice), 4) AS lnp,
  ROUND(POWER(l_tax + 1, 2), 4) AS p2, MOD(l_orderkey, 7) AS m7
FROM lineitem WHERE l_orderkey <= 40 ORDER BY l_orderkey, l_linenumber
""",
        ),
        _q(
            "dq30",
            "scalar json",
            """
SELECT event_id, CAST(get_json_object(props, '$.k') AS INT) AS k
FROM events WHERE event_id <= 300 ORDER BY event_id
""",
            """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events WHERE event_id <= 300 ORDER BY event_id
""",
            notes="The reference's dynamic-JSON boundary (X-01).  At scale "
            "prefer from_json with an explicit schema (single parse) over "
            "repeated get_json_object calls.",
        ),
        _q(
            "dq31",
            "array",
            """
SELECT vec_id, size(embedding) AS dim, ROUND(element_at(embedding, 1), 4) + 0.0 AS e1,
  ROUND(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x), 3) + 0.0 AS ssum
FROM embeddings WHERE vec_id <= 50 ORDER BY vec_id
""",
            """
SELECT vec_id, len(embedding) AS dim, ROUND(embedding[1], 4) + 0.0 AS e1,
  ROUND(list_sum(embedding), 3) + 0.0 AS ssum
FROM embeddings WHERE vec_id <= 50 ORDER BY vec_id
""",
            notes="Proto repeated-field analog (X-02); array HOFs stay inside "
            "codegen — no UDF.",
        ),
        _q(
            "dq32",
            "llm dedup",
            """
SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_uniq
FROM documents GROUP BY lang ORDER BY lang
""",
            notes="Exact-dup rate per group.  operators/dedup.py provides the "
            "full exact + MinHash-LSH surface.",
        ),
        _q(
            "dq33",
            "llm similarity",
            """
WITH pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid,
    ROUND(aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v), 3) + 0.0 AS dot
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE a.vec_id <= 10)
SELECT qid, cid, dot FROM (
  SELECT qid, cid, dot, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rn FROM pairs) t
WHERE rn = 1 ORDER BY qid
""",
            """
WITH pairs AS (
  SELECT a.vec_id AS qid, b.vec_id AS cid,
    ROUND(list_sum(list_transform(range(1, 65), i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), 3) + 0.0 AS dot
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE a.vec_id <= 10)
SELECT qid, cid, dot FROM (
  SELECT qid, cid, dot, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rn FROM pairs) t
WHERE rn = 1 ORDER BY qid
""",
            notes="Brute-force dot-product top-1 (correctness baseline); "
            "operators/similarity.py provides the scalable LSH/ANN path.",
        ),
        _q(
            "dq34",
            "llm text",
            """
SELECT doc_id, LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens,
  CAST((LENGTH(text) - LENGTH(REPLACE(text, 'join', ''))) / 4 AS INT) AS n_join
FROM documents WHERE doc_id <= 100 ORDER BY doc_id
""",
        ),
        _q(
            "dq35",
            "streaming session (batch analog)",
            """
WITH marks AS (
  SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      > INTERVAL 30 MINUTE OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
    THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, SUM(new_s) AS n_sessions FROM marks GROUP BY user_id
ORDER BY user_id LIMIT 100
""",
            """
WITH marks AS (
  SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      > INTERVAL 30 MINUTE OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
    THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions FROM marks GROUP BY user_id
ORDER BY user_id LIMIT 100
""",
            notes="Gaps-and-islands sessionization; streaming/windows.py runs "
            "the session_window() equivalent and tests assert they agree.  "
            "Dual-form for DuckDB HUGEINT sums (see dq04).",
        ),
        _q(
            "dq36",
            "streaming tumbling (batch analog)",
            """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
  CAST(FLOOR(EXTRACT(minute FROM ts) / 10) AS INT) AS bucket10,
  COUNT(*) AS n, SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS v_c
FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 200
""",
            """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
  CAST(FLOOR(EXTRACT(minute FROM ts) / 10) AS INT) AS bucket10,
  COUNT(*) AS n, CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v_c
FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 200
""",
            notes="Dual-form for DuckDB HUGEINT sums (see dq04).",
        ),
        _q(
            "dq38",
            "subquery",
            """
SELECT c_custkey, ROUND(c_acctbal, 2) AS bal FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer) ORDER BY c_custkey
""",
            notes="Uncorrelated scalar subquery → broadcast scalar.",
        ),
        _q(
            "dq39",
            "subquery",
            """
SELECT s_suppkey, s_name FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE')
ORDER BY s_suppkey
""",
        ),
        _q(
            "dq40",
            "cte",
            """
WITH seg AS (
  SELECT c_mktsegment AS seg, SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS rev_c
  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment)
SELECT seg, rev_c FROM seg WHERE rev_c > (SELECT AVG(rev_c) FROM seg) ORDER BY seg
""",
            """
WITH seg AS (
  SELECT c_mktsegment AS seg, CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_c
  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment)
SELECT seg, rev_c FROM seg WHERE rev_c > (SELECT AVG(rev_c) FROM seg) ORDER BY seg
""",
            notes="Dual-form for DuckDB HUGEINT sums (see dq04).",
        ),
        _q(
            "dq41",
            "misc",
            """
SELECT t.code, COUNT(e.event_id) AS n
FROM (VALUES ('click'), ('view'), ('bogus')) AS t(code)
LEFT JOIN events e ON e.event_type = t.code
GROUP BY t.code ORDER BY t.code
""",
            notes="Inline VALUES (late/unknown-key handling); 3-row side "
            "broadcasts.",
        ),
        _q(
            "dq42",
            "misc",
            """
SELECT event_id, COALESCE(NULLIF(event_type, 'error'), 'ERR!') AS et,
  CASE WHEN value >= 100 THEN 'big' WHEN value >= 10 THEN 'mid' ELSE 'small' END AS vb
FROM events WHERE event_id <= 200 ORDER BY event_id
""",
        ),
        _q(
            "dq44",
            "etl parity",
            """
SELECT CAST(CAST(ts AS DATE) AS STRING) AS d,
  CAST(EXTRACT(hour FROM ts) AS INT) AS h,
  CASE WHEN EXTRACT(minute FROM ts) < 30 THEN 0 ELSE 30 END AS half,
  COUNT(*) AS n_records
FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3 LIMIT 300
""",
            notes="The reference's GCS 30-minute time-bucket partitioner "
            "(/root/reference/src/output/gcs.rs:105-115) as a derived-"
            "partition-column aggregation; etl/writer.py uses the same "
            "columns for partitionBy layout.",
        ),
    ]
}
