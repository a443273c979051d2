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


def test_streaming_extraction_equals_batch_on_same_pages(spark, tmp_path):
    """Cross-family gate (VERDICT r3 #6): the STREAMING extraction path
    (file-source stream → kernel → parquet sink, availableNow) must equal
    the BATCH path on the same 200 pages — and the batch path is itself
    DuckDB-replay-checked in the driver gate, so a streaming-plumbing bug
    (batch slicing, checkpoint replay, schema drift) cannot hide behind a
    same-kernel VALUES oracle."""
    from pdf_to_text_spark.operators.extraction import run_extraction
    from pdf_to_text_spark.sources.pages import pages_df
    from pdf_to_text_spark.streaming.extract_stream import run_available_now

    src = str(tmp_path / "pages_src")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    pages_df(spark, 200, num_partitions=4).write.mode("overwrite").parquet(src)

    run_available_now(spark, src, out, ckpt)
    streamed = spark.read.parquet(out).select(
        "url", "warc_ts", "extracted_text", "n_pages", "n_chars", "parse_status"
    )
    batch = run_extraction(spark.read.parquet(src), dedup=False).select(
        "url", "warc_ts", "extracted_text", "n_pages", "n_chars", "parse_status"
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0

    # a second availableNow run over the same checkpoint must be a no-op
    # (exactly-once), not double the sink
    run_available_now(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == batch.count()


def test_streaming_minute_metrics_equal_batch_windows(spark, tmp_path):
    """Cross-family gate (VERDICT r3 #6): the watermarked streaming
    minute rollup equals the same window aggregation computed in BATCH
    mode over identical extracted rows (batch window aggs share no
    streaming state machinery)."""
    from pyspark.sql import functions as F

    from pdf_to_text_spark.operators.extraction import run_extraction
    from pdf_to_text_spark.sources.pages import pages_df
    from pdf_to_text_spark.streaming.extract_stream import (
        crawl_minute_metrics,
        extract_stream,
        read_pages_stream,
    )

    src = str(tmp_path / "pages_src2")
    pages_df(spark, 120, num_partitions=2).write.mode("overwrite").parquet(src)

    q = (
        crawl_minute_metrics(extract_stream(read_pages_stream(spark, src)))
        .writeStream.format("memory")
        .queryName("pts_minute_gate")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("pts_minute_gate")

    batch = (
        run_extraction(spark.read.parquet(src), dedup=False)
        .groupBy(F.window("warc_ts", "1 minute").alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars").alias("chars"),
            F.sum("parse_failed").alias("parse_failures"),
        )
        .select(F.col("w.start").alias("minute_start"), "lang", "docs",
                "chars", "parse_failures")
    )
    assert streamed.count() == batch.count() > 0
    assert streamed.exceptAll(batch).count() == 0
