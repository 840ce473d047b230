"""WARC (Web ARChive, ISO 28500) ingestion: the Common Crawl on-ramp.

Web-scale corpora arrive as ``.warc.gz`` — concatenated records
(request/response/metadata/warcinfo), each usually its own gzip member
so archives are seekable.  This module parses the public format with
the stdlib only (the jar-free discipline of the Avro/proto codecs):

- :func:`iter_warc_records` — records out of one archive's bytes
  (plain or multi-member gzip), headers parsed, HTTP envelope split
  from response bodies;
- :func:`read_warc` — DataFrame of records over a directory of
  archives (``binaryFile`` + ``mapInPandas`` — per-ARCHIVE parallel,
  the natural unit since Common Crawl ships ~1 GB archives in the
  thousands; records inside an archive are sequential by format);
- :func:`warc_to_documents` — response records → the canonical
  ``documents`` shape (utf-8 text, content-hash ids, URL as source),
  ready for ``strip_markup`` → ``c4_clean`` → the curation pipeline.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rust_spark.operators.hashes import MINHASH_P, spark_h

__all__ = ["iter_warc_records", "read_warc", "warc_to_documents"]


def _split_http(payload: bytes) -> tuple[str, bytes]:
    """(http_content_type, body) from an HTTP response envelope; the
    whole payload comes back as body when it isn't HTTP."""
    if not payload.startswith(b"HTTP/"):
        return "", payload
    head, _, body = payload.partition(b"\r\n\r\n")
    ctype = ""
    for line in head.split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return ctype, body


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield ``{headers: dict, payload: bytes, http_content_type: str}``
    per record.  Accepts plain WARC bytes or gzip (single- or
    multi-member — ``GzipFile`` reads concatenated members as one
    stream, which is exactly the multistream layout)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    pos = 0
    n = len(data)
    while pos < n:
        # Skip ANY run of residual CR/LF between records (ADVICE r6):
        # the spec mandates \r\n\r\n separators, but real archives carry
        # lone trailing newlines / odd-length padding that the old
        # 2-byte-pair skip could not consume.
        while pos < n and data[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError(
                f"truncated WARC archive: record header starting at byte "
                f"{pos} has no terminating blank line "
                f"({data[pos : pos + 40]!r}...)"
            )
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at byte {pos}: {lines[0][:40]!r}")
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        length = int(headers["Content-Length"])
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        ctype, body = (
            _split_http(payload)
            if headers.get("WARC-Type") == "response"
            else ("", payload)
        )
        yield {
            "headers": headers,
            "payload": body,
            "http_content_type": ctype,
        }
        pos = body_start + length


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """(url, warc_type, warc_date, content_type, payload) — one row per
    kept record across every archive under ``path``."""
    import pandas as pd

    types = tuple(record_types)

    def gen(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                rows = []
                for rec in iter_warc_records(bytes(blob)):
                    h = rec["headers"]
                    if h.get("WARC-Type") not in types:
                        continue
                    rows.append(
                        {
                            "url": h.get("WARC-Target-URI"),
                            "warc_type": h.get("WARC-Type"),
                            "warc_date": h.get("WARC-Date"),
                            "content_type": rec["http_content_type"]
                            or h.get("Content-Type", ""),
                            "payload": rec["payload"],
                        }
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "url", "warc_type", "warc_date", "content_type", "payload",
                    ],
                )

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInPandas(
            gen,
            "url string, warc_type string, warc_date string, "
            "content_type string, payload binary",
        )
    )


def warc_to_documents(warc: DataFrame, text_types: str = "text/") -> DataFrame:
    """Response records → the canonical documents shape: utf-8 decoded
    text (non-``text/*`` content types are dropped), content-hash
    ``doc_id`` (re-ingest-stable, same rule as ``etl.ingest``), URL kept
    as ``source``.  Feed the result to ``text.strip_markup`` /
    ``clean.c4_clean_lines`` and the curation pipeline."""
    txt = F.decode(F.col("payload"), "UTF-8")
    key = "concat('warc:', text)"
    return (
        warc.filter(F.col("content_type").startswith(text_types))
        .select(
            txt.alias("text"),
            F.col("url").alias("source"),
        )
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select(
            F.expr(f"{spark_h(x=key)} % {MINHASH_P}").cast("long").alias("doc_id"),
            "text",
            F.lit(None).cast("string").alias("lang"),
            "source",
            F.length("text").cast("long").alias("n_chars"),
        )
    )
