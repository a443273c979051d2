"""Pluggable enrichment stage: regex default + mock-transport HTTP path."""

import json

import pytest

from pdf_to_text_spark.operators.enrichment import (
    HTTPEnricher,
    RegexEnricher,
    build_request,
    enrich_chunks,
)

CHUNK = (
    "Sucursal 001 - Centro 1\n  EAN 7790000000131 cantidad 8 importe 82.40\n"
    "* Total importe en la sucursal: 82.40\n\n"
    "Sucursal 002 - Centro 2\n  EAN 7790000000262 cantidad 3 importe 30.00\n"
    "* Total importe en la sucursal: 30.00"
)


@pytest.fixture()
def chunks(spark):
    return spark.createDataFrame(
        [("u1", 0, CHUNK), ("u1", 1, "no sucursal content here"), ("u2", 0, CHUNK)],
        "url string, chunk_id int, chunk_text string",
    )


def test_regex_enricher_default(spark, chunks):
    out = enrich_chunks(chunks).collect()
    recs = [r for r in out if r["record_pos"] is not None]
    empties = [r for r in out if r["record_pos"] is None]
    assert len(recs) == 4  # 2 records × 2 sucursal chunks
    assert len(empties) == 1  # the no-content chunk yields a status row
    assert all(r["enrich_status"] == "ok" for r in out)
    by = {(r["url"], r["chunk_id"], r["record_pos"]): r for r in recs}
    assert by[("u1", 0, 0)]["EAN"] == "7790000000131"
    assert by[("u1", 0, 1)]["SucursalName"] == "Sucursal 002 - Centro 2"


def test_http_enricher_requires_transport():
    with pytest.raises(NotImplementedError):
        HTTPEnricher()


def test_request_shape_matches_reference():
    req = build_request("XYZ")
    assert req["model"] == "gpt-4-turbo"
    assert req["temperature"] == 0 and req["max_tokens"] == 2000
    assert req["messages"][0]["role"] == "system"
    assert "valid JSON array" in req["messages"][0]["content"]
    assert "Here are some Sucursal blocks:\n\nXYZ\n\n" in req["messages"][1]["content"]


def test_http_enricher_with_mock_transport(spark, chunks):
    def mock_transport(requests):
        # encode the batch size into every record: proves the whole Arrow
        # batch reached the transport as ONE call (vs reference's serial loop)
        out = []
        for req in requests:
            if "no sucursal" in req["messages"][1]["content"]:
                out.append("garbage non-json response")
            else:
                out.append(
                    '```json '
                    + json.dumps([{"SucursalName": "M", "EAN": str(len(requests)),
                                   "CantidadVendida": "2", "Importe": "3.0"}])
                    + ' ```'
                )
        return out

    out = enrich_chunks(chunks.coalesce(1), HTTPEnricher(mock_transport)).collect()
    ok = [r for r in out if r["enrich_status"] == "ok" and r["record_pos"] is not None]
    failed = [r for r in out if r["enrich_status"] == "enrich_failed"]
    assert len(ok) == 2 and all(r["SucursalName"] == "M" for r in ok)
    assert len(failed) == 1  # bad response → status row, job survives
    assert all(r["EAN"] == "3" for r in ok)  # all 3 chunks in one transport call

def test_non_list_json_and_short_transport_degrade_not_crash(spark, chunks):
    """A dict/list-of-str response is valid JSON but not the record shape
    — it must become an enrich_failed row, not an AttributeError inside
    the task; a transport returning FEWER responses than requests must
    not silently drop the trailing chunks (r3 review)."""
    def bad_transport(requests):
        out = ['```json {"SucursalName": "x"} ```', '```json ["a", "b"] ```']
        return out[: max(0, len(requests) - 1)]  # short-read too

    rows = enrich_chunks(chunks.coalesce(1), HTTPEnricher(bad_transport)).collect()
    assert len(rows) == 3  # one status row per chunk, none vanished
    assert all(r["enrich_status"] == "enrich_failed" for r in rows)


def test_null_chunk_text_becomes_status_row(spark):
    """A NULL chunk_text must degrade to a per-row status, not an
    AttributeError (None.split) that kills the Spark task (r6 review)."""
    from pdf_to_text_spark.operators.enrichment import enrich_chunks

    df = spark.createDataFrame(
        [("u1", 0, None), ("u1", 1, "no records here")],
        "url string, chunk_id int, chunk_text string",
    )
    rows = enrich_chunks(df).collect()
    assert len(rows) == 2
    assert all(r["enrich_status"] == "ok" and r["record_pos"] is None for r in rows)


def test_regex_enricher_uses_config_delimiter(spark):
    """RegexEnricher must split on config.CHUNK_BLOCK_DELIM — the same
    constant the chunker joins blocks with — not a hardcoded literal
    (r6 review)."""
    import inspect

    from pdf_to_text_spark.operators import enrichment

    src = inspect.getsource(enrichment.RegexEnricher)
    assert ".split(CHUNK_BLOCK_DELIM)" in src
    assert '.split("\\n\\n")' not in src
