"""sources/crafted.py — generated driver-gate inputs (round 6).

The Spark-vs-DuckDB comparison itself runs in the driver gate and
tools.check_oracle; these tests pin the generator CONTRACT: pure
functions of the index, the declared edge classes all present, and the
VALUES rendering round-trips through DuckDB exactly.
"""

from __future__ import annotations

import duckdb

from pdf_to_text_spark.sources.crafted import (
    csv_record_rows,
    dup_line_rows,
    dup_span_rows,
    llm_response_rows,
    pii_rows,
    render_values,
    render_values_mixed,
)


def test_generators_are_pure_and_sized():
    assert pii_rows() == pii_rows() and len(pii_rows()) == 150
    assert dup_line_rows() == dup_line_rows() and len(dup_line_rows()) == 120
    assert dup_span_rows() == dup_span_rows() and len(dup_span_rows()) == 120
    assert csv_record_rows() == csv_record_rows() and len(csv_record_rows()) == 120
    assert llm_response_rows() == llm_response_rows() and len(llm_response_rows()) == 100


def test_pii_classes_present():
    texts = [t for _i, t in pii_rows()]
    assert any("@" in t and ".co.uk" in t for t in texts)       # emails
    assert any("192.168." in t for t in texts)                  # ips
    assert any("(555)" in t for t in texts)                     # phones
    assert any("nothing sensitive" in t for t in texts)         # clean
    assert any("999.999.999.999" in t for t in texts)           # near-miss
    assert any(t == "" for t in texts)                          # empty


def test_dup_line_classes_present():
    rows = dup_line_rows()
    all_lines = [ln for _i, t in rows for ln in t.split("\n")]
    # corpus-hot boilerplate repeats many times
    assert all_lines.count(
        "subscribe to our newsletter for weekly updates and offers"
    ) > 10
    # short lines (<5 words) present
    assert any(len(ln.split()) < 5 for ln in all_lines)
    # some docs are entirely boilerplate (will reassemble to '')
    assert any(
        all(ln.split()[0] in ("subscribe", "all", "cookie", "follow", "terms")
            for ln in t.split("\n"))
        for _i, t in rows if t
    )


def test_span_rows_have_cross_doc_and_intra_doc_repeats():
    texts = [t for _i, t in dup_span_rows()]
    block0 = " ".join(f"b{j}k0" for j in range(6))
    assert sum(1 for t in texts if block0 in t) > 5   # cross-doc block
    assert any(t.split()[:6] == t.split()[-6:] and len(t.split()) > 6
               for t in texts)                         # intra-doc repeat
    assert any(len(t.split()) < 6 for t in texts)      # sub-k docs


def test_render_values_roundtrips_through_duckdb():
    rows = dup_line_rows(20)
    sql = (
        "WITH t(doc_id, text) AS (VALUES "
        + render_values(rows)
        + ") SELECT doc_id, text FROM t ORDER BY doc_id"
    )
    assert duckdb.sql(sql).fetchall() == [(i, t) for i, t in rows]

    mixed = csv_record_rows(30)
    sql2 = (
        "WITH r(a,b,c,d,e,f,g,h) AS (VALUES "
        + render_values_mixed(mixed)
        + ") SELECT * FROM r"
    )
    assert duckdb.sql(sql2).fetchall() == mixed


def test_csv_rounding_class_present_and_keys_unique():
    rows = csv_record_rows()
    # three-decimal Importe values force %.2f rounding, last digit 4
    # keeps them off the .xx5 half boundary where the engines diverge
    three_dec = [r for r in rows if r[7].count(".") == 1
                 and r[7].split(".")[1].isdigit()
                 and len(r[7].split(".")[1]) == 3]
    assert three_dec and all(r[7].endswith("4") for r in three_dec)
    # (url, chunk, block, rec) unique: duplicate sort keys would make
    # Spark's sort_array (ties by line text) and DuckDB's string_agg
    # (ties by input order) hash-diverge
    keys = [(r[0], r[1], r[2], r[3]) for r in rows]
    assert len(set(keys)) == len(keys)


def test_llm_response_classes_present():
    texts = [t for _u, _c, t in llm_response_rows()]
    assert any(t.startswith("Here are the records: ```json") for t in texts)
    assert any(t.startswith("[{") for t in texts)            # unfenced
    assert any("```json [] ```" == t for t in texts)         # empty array
    assert any("[oops" in t for t in texts)                  # invalid json
    assert any("no structured output" in t for t in texts)   # no json
