"""Unit checks for the VALUES-oracle replication helpers.

The integration gate (tools/check_oracle) proves end-to-end equality with
Spark; these pin the individual replication rules so a refactor that
breaks one fails fast and locally.
"""

import math

from tools.oracle_values import fold_cosine, spark_dec18, spark_round, values_sql


def test_spark_round_half_up_on_shortest_repr():
    # BigDecimal.valueOf semantics: shortest-repr digits, HALF_UP
    assert spark_round(0.15625, 4) == 0.1563   # 5/32 exact: ...25 → up
    assert spark_round(0.46875, 4) == 0.4688   # 30/64 exact tie → up
    assert spark_round(0.21875, 4) == 0.2188
    assert spark_round(1.005, 2) == 1.01       # shortest repr "1.005" tie → up
    assert spark_round(-1.125, 2) == -1.13     # HALF_UP = away from zero
    assert spark_round(0.203125, 4) == 0.2031


def test_spark_dec18_pads_and_rounds():
    assert str(spark_dec18(0.5)) == "0.500000000000000000"
    # >18 decimal digits in the shortest repr rounds at the 18th place
    v = spark_dec18(1.2345678901234567e-3)
    assert v == spark_dec18(0.0012345678901234567)
    assert abs(float(v) - 0.0012345678901234567) < 1e-18


def test_fold_cosine_matches_sequential_ieee():
    a = [0.1, 0.2, 0.3, 0.4]
    b = [0.4, 0.3, 0.2, 0.1]
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    na = 0.0
    for x in a:
        na = na + x * x
    want = dot / (math.sqrt(na) * math.sqrt(na))  # symmetric norms here
    assert fold_cosine(a, b) == want
    assert fold_cosine(a, a) == 1.0 or abs(fold_cosine(a, a) - 1.0) < 1e-15


def test_values_sql_quoting_and_types():
    sql = values_sql(
        [("s", "VARCHAR"), ("x", "DOUBLE"), ("n", "BIGINT")],
        [("o'brien", 0.5, 3), (None, float(1e-7), -2)],
    )
    assert "'o''brien'" in sql  # single quotes doubled
    assert "NULL" in sql and "1e-07" in sql
    assert "s::VARCHAR AS s" in sql and "n::BIGINT AS n" in sql
    import duckdb

    rows = duckdb.sql(sql).fetchall()
    assert rows == [("o'brien", 0.5, 3), (None, 1e-07, -2)]


def test_values_sql_empty_set():
    sql = values_sql([("a", "BIGINT"), ("b", "VARCHAR")], [])
    import duckdb

    out = duckdb.sql(sql)
    assert out.fetchall() == []
    assert [d[0] for d in out.description] == ["a", "b"]


def test_asof_oracle_matches_spark_on_null_edges(spark):
    """r5 review: the events_asof_last_purchase DuckDB oracle had
    drifted from as_of_join's struct NULL semantics — latent because no
    fixture row exercised the edges. This pins oracle == Spark on a
    hand-built events set with a NULL-valued purchase (must WIN and
    coalesce to -1.0), a NULL-ts purchase (dropped from the axis), and
    a NULL-ts click (sees no purchases)."""
    import datetime as dt

    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from pdf_to_text_spark.operators import relational

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: purchase 7.0@1, NULL-value purchase @3, clicks @2,@4
        (1, 100, t(2), 1.0, "click"),
        (1, 101, t(4), 2.0, "click"),
        (1, 900, t(1), 7.0, "purchase"),
        (1, 901, t(3), None, "purchase"),
        # user 2: NULL-ts purchase only; click must see -1.0
        (2, 102, t(5), 3.0, "click"),
        (2, 902, None, 50.0, "purchase"),
        # user 3: NULL-ts click; purchases exist but none precede it
        (3, 103, None, 4.0, "click"),
        (3, 903, t(1), 9.0, "purchase"),
    ]
    cols = ["user_id", "event_id", "ts", "value", "event_type"]
    events = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double, "
              "event_type string",
    )
    got_spark = {
        r["event_id"]: r["last_purchase_value"]
        for r in relational.events_asof_last_purchase(events).collect()
    }
    con = duckdb.connect()
    con.register("events", pd.DataFrame(rows, columns=cols))
    sql = entry.oracle_sql(_only={"events_asof_last_purchase"})[
        "events_asof_last_purchase"
    ]
    got_oracle = {
        int(r[1]): r[4] for r in con.execute(sql).fetchall()
    }
    expect = {100: 7.0, 101: -1.0, 102: -1.0, 103: -1.0}
    assert got_spark == expect
    assert got_oracle == expect


def test_frame_hash_separator_ambiguity():
    """Cells carrying newlines (reassembled docs) or the cell separator
    itself must not let two DIFFERENT result sets hash equal — the bare
    join scheme masked a divergence that shifted a newline across a row
    boundary (r6 review)."""
    import pandas as pd

    from tools.check_oracle import frame_hash

    assert frame_hash(pd.DataFrame({"t": ["a\nb", "c"]})) != frame_hash(
        pd.DataFrame({"t": ["a", "b\nc"]})
    )
    assert frame_hash(
        pd.DataFrame({"t": ["x\x1fy"], "u": ["z"]})
    ) != frame_hash(pd.DataFrame({"t": ["x"], "u": ["y\x1fz"]}))
    # identical frames still agree regardless of row order
    assert frame_hash(pd.DataFrame({"t": ["p", "q"]})) == frame_hash(
        pd.DataFrame({"t": ["q", "p"]})
    )
