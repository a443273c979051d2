"""applyInPandasWithState operators: cross-microbatch dedup + stats."""

import datetime as dt

from pyspark.sql import functions as F

from pdf_to_text_spark.sources.pages import PAGES_SCHEMA
from pdf_to_text_spark.streaming.extract_stream import read_pages_stream
from pdf_to_text_spark.streaming.stateful import dedup_stream_by_url, url_crawl_stats_stream


def _write_batch(spark, src, rows):
    spark.createDataFrame(rows, schema=PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _run_stream(spark, stream_df, out, ckpt, mode="append"):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stateful_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 1, 1)

    _write_batch(spark, src, [
        ("u1", t, None, "a", "en"),
        ("u1", t + dt.timedelta(hours=1), None, "b", "en"),  # newer → emitted
        ("u2", t, None, "c", "es"),
    ])
    stream = dedup_stream_by_url(read_pages_stream(spark, src))
    _run_stream(spark, stream, out, ckpt)
    got1 = spark.read.parquet(out).collect()
    assert {(r["url"], r["warc_ts"]) for r in got1} == {
        ("u1", t), ("u1", t + dt.timedelta(hours=1)), ("u2", t)
    }
    firsts = {r["url"]: r["is_first_crawl"] for r in got1 if r["warc_ts"] == t}
    assert firsts == {"u1": 1, "u2": 1}

    # batch 2: a stale u1 recrawl (dropped), a newer u2 (emitted), new u3
    _write_batch(spark, src, [
        ("u1", t, None, "stale", "en"),
        ("u2", t + dt.timedelta(days=1), None, "d", "es"),
        ("u3", t, None, "e", "de"),
    ])
    _run_stream(spark, stream, out, ckpt)
    got2 = spark.read.parquet(out).collect()
    assert len(got2) == len(got1) + 2  # stale u1 NOT re-emitted
    u2_rows = [r for r in got2 if r["url"] == "u2"]
    assert {r["is_first_crawl"] for r in u2_rows} == {0, 1}


def test_stateful_crawl_stats(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 1, 1)

    _write_batch(spark, src, [
        ("u1", t, None, None, "en"),
        ("u1", t + dt.timedelta(days=2), None, None, "en"),
        ("u2", t, None, None, "es"),
    ])
    stream = url_crawl_stats_stream(read_pages_stream(spark, src))
    _run_stream(spark, stream, out, ckpt)
    _write_batch(spark, src, [("u1", t + dt.timedelta(days=5), None, None, "en")])
    _run_stream(spark, stream, out, ckpt)

    # last emitted row per url carries the running totals
    latest = (
        spark.read.parquet(out)
        .groupBy("url")
        .agg(F.max("crawls").alias("crawls"),
             F.min("first_seen").alias("first_seen"),
             F.max("last_seen").alias("last_seen"))
        .collect()
    )
    by_url = {r["url"]: r for r in latest}
    assert by_url["u1"]["crawls"] == 3
    assert by_url["u1"]["first_seen"] == t
    assert by_url["u1"]["last_seen"] == t + dt.timedelta(days=5)
    assert by_url["u2"]["crawls"] == 1
