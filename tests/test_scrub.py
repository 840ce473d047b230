"""PII scrubbing (operators/scrub.py): planted-PII differential tests."""

from __future__ import annotations

import duckdb
import pytest

from etl_rust_spark.functions.hashing import canonical_hash
from etl_rust_spark.operators import scrub

PLANTED = [
    (1, "contact alice.smith+spam@example.co.uk for details"),
    (2, "server at 10.0.255.3 timed out, retry 192.168.1.1"),
    (3, "call +1 (555) 123-4567 or 555-867-5309 now"),
    (4, "mixed: bob@corp.io from 172.16.0.9 dialed 020 7946 0958"),
    (5, "no pii here, just spark and duckdb words"),
    (6, "edge e@x.io end, ip 1.2.3.4, phone 1234567"),
    (7, "not-an-ip 999.999 and not-a-phone 12-34"),
    (8, "double emails a@b.cc c@d.ee and versions 1.2.3.4.5"),
]


@pytest.fixture(scope="module")
def pii_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pii") / "docs.parquet")
    df = spark.createDataFrame(PLANTED, ["doc_id", "text"])
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_scrub_operator_matches_duckdb(spark, pii_dir):
    df = spark.read.parquet(pii_dir)
    res = scrub.scrub_pii(df).orderBy("doc_id")
    rows = [tuple(r) for r in res.collect()]
    cols = list(res.columns)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW pii AS SELECT * FROM read_parquet('{pii_dir}/*.parquet')"
    )
    _, duck_sql = scrub.scrub_pii_sql("pii")
    tbl = con.execute(duck_sql).fetch_arrow_table()
    drows = [tuple(v) for v in zip(*[tbl.column(i).to_pylist() for i in range(tbl.num_columns)])]
    assert canonical_hash(rows, cols) == canonical_hash(drows, tbl.column_names)


def test_scrub_sql_form_matches_operator(spark, pii_dir):
    spark.read.parquet(pii_dir).createOrReplaceTempView("pii_v")
    spark_sql, _ = scrub.scrub_pii_sql("pii_v")
    df_sql = spark.sql(spark_sql)
    df_op = scrub.scrub_pii(spark.read.parquet(pii_dir)).orderBy("doc_id")
    assert canonical_hash(
        [tuple(r) for r in df_sql.collect()], list(df_sql.columns)
    ) == canonical_hash([tuple(r) for r in df_op.collect()], list(df_op.columns))


def test_scrub_semantics(spark, pii_dir):
    res = {
        r["doc_id"]: r
        for r in scrub.scrub_pii(spark.read.parquet(pii_dir)).collect()
    }
    assert "<EMAIL>" in res[1]["text_clean"] and res[1]["n_email"] == 1
    assert res[2]["n_ip"] == 2 and "10.0.255.3" not in res[2]["text_clean"]
    assert res[3]["n_phone"] == 2
    # each category redacted in doc 4
    assert res[4]["n_email"] == 1 and res[4]["n_ip"] == 1 and res[4]["n_phone"] == 1
    assert res[5]["n_pii"] == 0 and res[5]["text_clean"].startswith("no pii")
    # an email's digits must never double-count as a phone
    assert res[8]["n_email"] == 2 and res[8]["n_phone"] == 0


def test_scrub_runs_on_documents(spark, sf_dir):
    from etl_rust_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = scrub.scrub_pii(docs)
    assert out.count() == docs.count()
    # synthetic corpus has no PII — scrub must be a no-op on it
    assert out.filter("n_pii != 0").count() == 0
