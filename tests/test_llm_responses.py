"""JSON-fence response ingestion (SURVEY §2 #10) — JVM-side parsing."""

from pdf_to_text_spark.operators.records import records_from_llm_responses


def test_fenced_and_fallback_and_invalid(spark):
    rows = [
        ("u1", 0, 'Sure! ```json [{"SucursalName":"A","EAN":"1",'
                  '"CantidadVendida":"2","Importe":"3.5"}] ``` done'),
        ("u1", 1, '[{"SucursalName":"B","EAN":"9","CantidadVendida":"x","Importe":"y"}]'),
        ("u2", 0, "I could not parse this document, sorry."),
        ("u2", 1, "```json [] ```"),
    ]
    df = spark.createDataFrame(rows, "url string, chunk_id int, response string")
    out = records_from_llm_responses(df).collect()
    by_key = {(r["url"], r["chunk_id"], r["record_pos"]): r for r in out}

    fenced = by_key[("u1", 0, 0)]
    assert fenced["SucursalName"] == "A" and fenced["parse_ok"] == 1
    bare = by_key[("u1", 1, 0)]
    assert bare["EAN"] == "9" and bare["CantidadVendida"] == "x"
    # invalid JSON → parse_ok=0 status row, no crash
    bad = by_key[("u2", 0, None)]
    assert bad["parse_ok"] == 0 and bad["SucursalName"] is None
    # valid empty array → one row with null record (posexplode_outer)
    empty = by_key[("u2", 1, None)]
    assert empty["parse_ok"] == 1
    assert len(out) == 4


def test_non_array_shapes_reject(spark):
    """A bare JSON object is NOT a one-record array (r6 review):
    from_json(array<struct>) would silently wrap it, diverging from
    HTTPEnricher's list-of-records validation and the DuckDB oracle.
    Arrays of non-objects reject too."""
    rows = [
        ("u1", 0, '{"SucursalName":"X","EAN":"1","CantidadVendida":"2","Importe":"3"}'),
        ("u1", 1, '```json {"SucursalName":"X"} ```'),
        ("u1", 2, '["a","b"]'),
        ("u1", 3, '[{"SucursalName":"ok"}, "mixed"]'),
    ]
    df = spark.createDataFrame(rows, "url string, chunk_id int, response string")
    out = records_from_llm_responses(df).collect()
    assert len(out) == 4
    assert all(r["parse_ok"] == 0 and r["record_pos"] is None for r in out)
