"""WARC ingestion: record parsing (plain + multi-member gzip), HTTP
envelope splitting, and the end-to-end archive → documents →
strip_markup path."""

from __future__ import annotations

import gzip

from etl_rust_spark.etl.warc import iter_warc_records, read_warc, warc_to_documents


def _record(warc_type: str, uri: str | None, payload: bytes, extra: str = "") -> bytes:
    headers = [f"WARC/1.0", f"WARC-Type: {warc_type}",
               "WARC-Date: 2024-01-01T00:00:00Z",
               "WARC-Record-ID: <urn:uuid:0000>"]
    if uri:
        headers.append(f"WARC-Target-URI: {uri}")
    if extra:
        headers.append(extra)
    headers.append(f"Content-Length: {len(payload)}")
    return "\r\n".join(headers).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, ctype: str = "text/html; charset=utf-8") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode()
        + b"\r\nServer: x\r\n\r\n" + body
    )


HTML = b"<html><body><p>Real page text here.</p></body></html>"
ARCHIVE = (
    _record("warcinfo", None, b"software: test\r\n")
    + _record("request", "http://a.example/x", b"GET /x HTTP/1.1\r\n")
    + _record("response", "http://a.example/x", _http(HTML))
    + _record("response", "http://a.example/img", _http(b"\x89PNG...", "image/png"))
)


def test_iter_warc_records_plain_and_gzip():
    for data in (
        ARCHIVE,
        gzip.compress(ARCHIVE),  # single member
        b"".join(  # one gzip member per record (the .warc.gz norm)
            gzip.compress(r)
            for r in (
                _record("warcinfo", None, b"software: test\r\n"),
                _record("response", "http://a.example/x", _http(HTML)),
            )
        ),
    ):
        recs = list(iter_warc_records(data))
        types = [r["headers"]["WARC-Type"] for r in recs]
        assert types[0] == "warcinfo"
        resp = [r for r in recs if r["headers"]["WARC-Type"] == "response"]
        assert resp[0]["payload"] == HTML  # HTTP envelope stripped
        assert resp[0]["http_content_type"].startswith("text/html")


def test_read_warc_and_documents(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(gzip.compress(ARCHIVE))
    (d / "b.warc").write_bytes(
        _record("response", "http://b.example/y", _http(b"<p>Other page body.</p>"))
    )
    warc = read_warc(spark, str(d))
    rows = {r.url: r for r in warc.collect()}
    # responses only (default); the image row is kept at this layer
    assert set(rows) == {"http://a.example/x", "http://a.example/img", "http://b.example/y"}
    assert bytes(rows["http://a.example/x"].payload) == HTML

    docs = warc_to_documents(warc)
    got = {r.source: r for r in docs.collect()}
    # image/png dropped; text pages became canonical documents
    assert set(got) == {"http://a.example/x", "http://b.example/y"}
    assert got["http://a.example/x"].n_chars == len(HTML)
    assert got["http://a.example/x"].doc_id == got["http://a.example/x"].doc_id > 0

    # composes with the markup stripper
    from etl_rust_spark.operators import text as text_ops

    clean = text_ops.strip_markup(docs, "text", "doc_id")
    texts = {r.text_clean for r in clean.collect()}
    assert "Real page text here." in texts


def test_iter_warc_rejects_garbage():
    import pytest

    with pytest.raises(ValueError, match="not a WARC record"):
        list(iter_warc_records(b"NOT A WARC\r\n\r\n"))


def test_cli_ingest_warc(spark, tmp_path, capsys):
    import json as _json

    from etl_rust_spark.__main__ import main

    d = tmp_path / "w"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(gzip.compress(ARCHIVE))
    out = str(tmp_path / "docs")
    rc = main(["ingest-corpus", str(d), "--out", out, "--format", "warc"])
    assert rc == 0
    n = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert n == {"documents": 1}
    got = spark.read.parquet(out).collect()
    assert got[0].source == "http://a.example/x"


def test_iter_warc_tolerates_trailing_padding_and_odd_newlines():
    """ADVICE r6: a lone trailing newline (or any CR/LF run between
    records) must not abort parsing of an otherwise valid archive."""
    for tail in (b"\n", b"\r\n\n", b"\n\n\n", b"\r\n\r\n\r\n"):
        recs = list(iter_warc_records(ARCHIVE + tail))
        assert len(recs) == 4
    # odd-length separator run BETWEEN records too
    data = (
        _record("warcinfo", None, b"software: test\r\n")
        + b"\n"
        + _record("response", "http://a.example/x", _http(HTML))
    )
    assert [r["headers"]["WARC-Type"] for r in iter_warc_records(data)] == [
        "warcinfo", "response",
    ]


def test_iter_warc_truncated_archive_raises_descriptive_error():
    """A header cut off before its terminating blank line must raise a
    WARC-context error, not a bare substring-not-found ValueError."""
    import pytest

    truncated = ARCHIVE[: ARCHIVE.index(b"\r\n\r\n")]  # first record's head, cut
    with pytest.raises(ValueError, match="truncated WARC"):
        list(iter_warc_records(truncated[:20]))
