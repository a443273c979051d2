"""WARC ingestion source (sources/warc.py): pure-bytes kernel round-trip,
leniency under corruption, and the distributed binaryFile → pages path
feeding the extraction pipeline byte-identically."""

import datetime as dt
import gzip

import pytest

from pdf_to_text_spark.sources.pages import build_pages_pdf
from pdf_to_text_spark.sources.warc import (
    MAX_RECORD_BYTES,
    build_warc_bytes,
    iter_warc_records,
    warc_to_page_rows,
)

TS = dt.datetime(2024, 3, 1, 12, 0, 0, tzinfo=dt.timezone.utc)


def _sample_rows(n=40, offset=0):
    pdf = build_pages_pdf(list(range(offset, offset + n)))
    return [
        (r.url, r.warc_ts.to_pydatetime().replace(tzinfo=dt.timezone.utc), bytes(r.html))
        for r in pdf.itertuples()
        if r.html is not None
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_byte_identical(gz):
    rows = _sample_rows()
    data = build_warc_bytes(rows, gzip_per_record=gz)
    got = warc_to_page_rows(data)
    assert [(u, ts, h) for u, ts, h, _, _ in got] == rows
    # payload bytes exact → extraction over WARC-ingested rows cannot diverge
    assert all(h == orig[2] for (_, _, h, _, _), orig in zip(got, rows))


def test_writer_is_deterministic():
    rows = _sample_rows(10)
    assert build_warc_bytes(rows) == build_warc_bytes(rows)


def test_non_document_records_skipped():
    rows = _sample_rows(6)
    data = build_warc_bytes(rows, gzip_per_record=False)
    # warcinfo leads the file and must not surface as a page
    kinds = [h.get("warc-type") for h, _ in iter_warc_records(data)]
    assert kinds[0] == "warcinfo"
    assert len(warc_to_page_rows(data)) == len(rows)


def test_non_200_responses_dropped():
    rows = _sample_rows(4)
    data = build_warc_bytes(rows, gzip_per_record=False)
    data = data.replace(b"HTTP/1.1 200 OK", b"HTTP/1.1 404 NF", 1)
    assert len(warc_to_page_rows(data)) == len(rows) - 1


def test_corrupt_record_resyncs_not_fails():
    rows = _sample_rows(8)
    plain = build_warc_bytes(rows, gzip_per_record=False)
    # mangle the 2nd record's Content-Length so it no longer parses
    first_end = plain.index(b"WARC/1.0", 10)
    second_end = plain.index(b"WARC/1.0", first_end + 10)
    broken = (
        plain[:second_end]
        + plain[second_end:].replace(b"Content-Length: ", b"Content-Length: x", 1)
    )
    got = warc_to_page_rows(broken)
    # EXACTLY the broken record is dropped; later records still parse
    assert len(got) == len(rows) - 1
    assert got[-1][0] == rows[-1][0]


def test_truncated_gzip_member_keeps_prior_records():
    rows = _sample_rows(8, offset=1)  # offset skips row 0's megabyte PDF
    data = build_warc_bytes(rows, gzip_per_record=True)
    got = warc_to_page_rows(data[: len(data) - len(data) // 4])
    assert 0 < len(got) < len(rows)


def test_oversized_content_length_skipped():
    big = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/a\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
        + b"Content-Length: " + str(MAX_RECORD_BYTES + 1).encode() + b"\r\n\r\n"
    )
    rows = _sample_rows(3)
    tail = build_warc_bytes(rows, gzip_per_record=False)
    assert len(warc_to_page_rows(big + tail)) == len(rows)


def test_conversion_record_and_content_language():
    body = b"plain converted text"
    rec = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: https://x/conv\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body + b"\r\n\r\n"
    )
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Language: de-DE, en\r\nContent-Length: 2\r\n\r\nhi"
    )
    rec2 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/lang\r\nWARC-Date: 2024-01-01T00:00:01Z\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n" + http + b"\r\n\r\n"
    )
    got = warc_to_page_rows(rec + rec2)
    assert [(r[0], r[2]) for r in got] == [
        ("https://x/conv", body),
        ("https://x/lang", b"hi"),
    ]
    assert got[0][4] is None and got[1][4] == "de"


def test_spark_warc_pages_matches_parquet_path(spark, tmp_path):
    """binaryFile → warc_pages equals the same rows via the synthetic
    table, and the extraction kernel output over both is identical."""
    from pdf_to_text_spark.operators.extraction import run_extraction
    from pdf_to_text_spark.sources.warc import warc_pages

    rows_a, rows_b = _sample_rows(30), _sample_rows(30, offset=60)
    (tmp_path / "seg-0.warc.gz").write_bytes(build_warc_bytes(rows_a))
    (tmp_path / "seg-1.warc").write_bytes(
        build_warc_bytes(rows_b, gzip_per_record=False)
    )
    (tmp_path / "ignored.txt").write_bytes(b"not a warc")

    pages = warc_pages(spark, str(tmp_path))
    assert pages.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>"
    )
    got = {
        (r["url"], bytes(r["html"])) for r in pages.collect()
    }
    assert got == {(u, h) for u, _, h in rows_a + rows_b}

    extracted_warc = {
        (r["url"], r["extracted_text"], r["parse_status"])
        for r in run_extraction(pages, dedup=False).select(
            "url", "extracted_text", "parse_status"
        ).collect()
    }
    from pdf_to_text_spark.sources.pages import PAGES_SCHEMA

    ref_pdf = build_pages_pdf(list(range(30)) + list(range(60, 90)))
    ref_pdf = ref_pdf[ref_pdf["html"].notna()].reset_index(drop=True)
    ref_pages = spark.createDataFrame(ref_pdf, schema=PAGES_SCHEMA)
    extracted_ref = {
        (r["url"], r["extracted_text"], r["parse_status"])
        for r in run_extraction(ref_pages, dedup=False).select(
            "url", "extracted_text", "parse_status"
        ).collect()
    }
    assert extracted_warc == extracted_ref


def test_gzip_bomb_member_capped_not_inflated():
    """A small gzip bomb must not inflate past MAX_RECORD_BYTES — flush()
    used to emit ALL remaining output uncapped (r3 review, reproduced at
    209 MB from 200 KB). Records before the bomb survive."""
    import gzip as _gz
    import io as _io

    from pdf_to_text_spark.sources.warc import _gunzip_members

    rows = _sample_rows(4, offset=1)
    good = build_warc_bytes(rows, gzip_per_record=True)
    bomb_out = _io.BytesIO()
    with _gz.GzipFile(fileobj=bomb_out, mode="wb", mtime=0) as gz:
        for _ in range(220):
            gz.write(b"A" * (1024 * 1024))
    data = good + bomb_out.getvalue()
    buf = _gunzip_members(data)
    assert len(buf) <= len(_gunzip_members(good)) + MAX_RECORD_BYTES + (1 << 20)
    got = warc_to_page_rows(data)
    assert [r[0] for r in got] == [u for u, _, _ in rows]


def test_empty_content_language_header_is_null():
    http = b"HTTP/1.1 200 OK\r\nContent-Language:\r\nContent-Length: 2\r\n\r\nhi"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/e\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n" + http + b"\r\n\r\n"
    )
    got = warc_to_page_rows(rec)
    assert len(got) == 1 and got[0][4] is None


def _manual_response_record(url: str, http_headers: bytes, payload: bytes) -> bytes:
    body = b"HTTP/1.1 200 OK\r\n" + http_headers + b"\r\n\r\n" + payload
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: %d\r\n" % len(body)
    )
    return head + b"\r\n" + body + b"\r\n\r\n"


def test_content_encoding_gzip_payload_decoded():
    """r5 review: real Common Crawl response records preserve the raw
    HTTP framing — a Content-Encoding: gzip page must reach the kernel
    as HTML bytes, not compressed garbage."""
    import gzip as _gzip

    from pdf_to_text_spark.sources.warc import warc_to_page_rows

    html = b"<html><body><p>compressed page body</p></body></html>"
    gz = _gzip.compress(html)
    rec = _manual_response_record(
        "https://x/enc.html",
        b"Content-Type: text/html\r\nContent-Encoding: gzip",
        gz,
    )
    rows = warc_to_page_rows(rec)
    assert len(rows) == 1 and rows[0][2] == html


def test_transfer_encoding_chunked_payload_dechunked():
    from pdf_to_text_spark.sources.warc import warc_to_page_rows

    html = b"<html><body>chunk one and chunk two</body></html>"
    chunked = (
        b"10\r\n" + html[:16] + b"\r\n"
        + (b"%x\r\n" % (len(html) - 16)) + html[16:] + b"\r\n"
        + b"0\r\n\r\n"
    )
    rec = _manual_response_record(
        "https://x/chunked.html",
        b"Content-Type: text/html\r\nTransfer-Encoding: chunked",
        chunked,
    )
    rows = warc_to_page_rows(rec)
    assert len(rows) == 1 and rows[0][2] == html


def test_undecodable_declared_encoding_keeps_raw_bytes():
    """A wrongly-declared Content-Encoding must not drop the row — the
    raw bytes flow through and the kernel's per-row status decides."""
    from pdf_to_text_spark.sources.warc import warc_to_page_rows

    raw = b"<html>not actually gzipped</html>"
    rec = _manual_response_record(
        "https://x/liar.html",
        b"Content-Type: text/html\r\nContent-Encoding: gzip",
        raw,
    )
    rows = warc_to_page_rows(rec)
    assert len(rows) == 1 and rows[0][2] == raw


def test_gunzip_members_linear_feeding_roundtrip():
    """The window-fed multi-member gunzip must reproduce every member
    byte-for-byte (r5 review replaced a quadratic-memcpy formulation)."""
    import gzip as _gzip

    from pdf_to_text_spark.sources.warc import _gunzip_members

    members = [(b"m%d " % i) * (1000 + i * 37) for i in range(50)]
    blob = b"".join(_gzip.compress(m) for m in members)
    assert _gunzip_members(blob) == b"".join(members)


def test_dechunk_rejects_malformed_size_tokens():
    """r6 (ADVICE high): int(x, 16) accepts '-', '+', '0x' and '_' — a
    negative chunk size made pos stop advancing and _dechunk spin
    forever on untrusted crawl bytes. Strict-hex tokens only."""
    from pdf_to_text_spark.sources.warc import _dechunk

    # the reproducer from the advisory: would infinite-loop before r6
    assert _dechunk(b"2\r\nAB\r\n-6\r\n") is None
    for bad in (b"-1\r\n\r\n", b"+2\r\nAB\r\n0\r\n\r\n",
                b"0x2\r\nAB\r\n0\r\n\r\n", b"1_0\r\n" + b"x" * 16 + b"\r\n",
                b"\r\nAB\r\n", b"g\r\n\r\n"):
        assert _dechunk(bad) is None
    # well-formed framing still decodes (uppercase hex is legal)
    assert _dechunk(b"A\r\n0123456789\r\n0\r\n\r\n") == b"0123456789"


def test_gzipped_empty_body_decodes_to_empty_not_raw():
    """r6 review: a valid gzip of b'' is a SUCCESSFUL decode — the old
    'if out' falsiness check returned None and the caller kept the
    20-byte compressed blob as the page payload (parse_failed garbage
    instead of a correct empty extraction)."""
    import gzip as _gzip

    from pdf_to_text_spark.sources.warc import warc_to_page_rows

    rec = _manual_response_record(
        "https://x/empty.html",
        b"Content-Type: text/html\r\nContent-Encoding: gzip",
        _gzip.compress(b""),
    )
    rows = warc_to_page_rows(rec)
    assert len(rows) == 1 and rows[0][2] == b""


def test_writer_rejects_subsecond_and_converts_non_utc():
    """WARC-Date is whole-second UTC: sub-second ts must be a loud error
    (truncation collapses distinct crawls into exact-ts collisions on the
    (url, warc_ts) rejoin), and an aware non-UTC ts must be CONVERTED —
    strftime+'Z' alone stamped local fields with a UTC marker (r6
    review)."""
    import datetime as dt

    payload = b"<html><body>x</body></html>"
    with pytest.raises(ValueError, match="sub-second"):
        build_warc_bytes(
            [("https://a.example/x", dt.datetime(2024, 1, 1, microsecond=1,
                                                 tzinfo=dt.timezone.utc), payload)]
        )
    plus2 = dt.timezone(dt.timedelta(hours=2))
    data = build_warc_bytes(
        [("https://a.example/x",
          dt.datetime(2024, 1, 1, 14, 30, 0, tzinfo=plus2), payload)],
        gzip_per_record=False,
    )
    assert b"WARC-Date: 2024-01-01T12:30:00Z" in data
    (got,) = warc_to_page_rows(data)
    assert got[1] == dt.datetime(2024, 1, 1, 12, 30, 0, tzinfo=dt.timezone.utc)


# ── hypothesis fuzz: the ingest walker is a crawl-facing parser ──────────────

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_to_text_spark.sources.warc import warc_to_page_rows


@settings(max_examples=200, deadline=3000)
@given(st.binary(max_size=4096))
def test_warc_walker_random_bytes_never_crash(data):
    """Arbitrary bytes (including gzip magic prefixes) must parse to a
    list — per-file fail-soft, never an executor exception."""
    rows = warc_to_page_rows(data)
    assert isinstance(rows, list)


@settings(max_examples=150, deadline=3000)
@given(st.binary(max_size=256), st.integers(0, 3), st.booleans())
def test_warc_walker_mutated_valid_file(junk, where, gz):
    """A valid WARC with junk spliced at structural boundaries degrades
    to fewer rows, never a crash; surviving rows keep the pages shape."""
    import datetime as dt

    base = build_warc_bytes(
        [("https://x.example/a", dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc),
          b"<html><body>ok</body></html>")],
        gzip_per_record=gz,
    )
    cut = [0, len(base) // 3, 2 * len(base) // 3, len(base)][where]
    rows = warc_to_page_rows(base[:cut] + junk + base[cut:])
    assert isinstance(rows, list)
    for url, ts, html, text, lang in rows:
        assert isinstance(url, str) and isinstance(html, (bytes, type(None)))
