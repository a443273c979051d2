"""The extraction pipeline: pages → extracted text + metrics.

Spark-first restatement of the reference's /upload dataflow
(src/main.ts:133-263): scan → validity dispatch → dedup-by-url →
salted repartition → Arrow-batched extraction kernel → metrics rollup.
Everything before and after the one mapInPandas stage is built-in
Catalyst expressions (pushdown/pruning-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.udfs import EXTRACT_SCHEMA, content_type_col, extract_batches
from ..plans.layout import salted_repartition, with_bucket

PAGES_COLS = ["url", "warc_ts", "html", "text", "lang"]


def dedup_latest_by_url(pages: DataFrame) -> DataFrame:
    """Keep the newest crawl per url (Common-Crawl inputs repeat urls).

    row_number over (url ORDER BY warc_ts DESC) == 1 — SURVEY.md §2.1.
    At scale this is a single hash-shuffle on url; AQE handles stragglers.
    """
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def run_extraction(
    pages: DataFrame,
    *,
    num_partitions: int | None = None,
    dedup: bool = True,
    shuffle_payloads: bool = False,
) -> DataFrame:
    """pages → extracted (url, warc_ts, lang, content_type, extracted_text,
    n_pages, n_chars, parse_status, parse_failed, bucket, partition_id).

    Scale-critical ordering: NEVER shuffle raw payloads. The kernel maps
    directly over the size-bounded scan splits (maxPartitionBytes already
    caps task input, which is what actually balances megabyte-PDF skew at
    the scan), and the dedup window runs AFTER extraction on the derived
    rows — extracted text is ~100-1000× smaller than PDF bytes, so the
    row_number shuffle moves kilobytes per doc instead of megabytes.
    Extracting a duplicated url twice costs ~2% redundant kernel CPU
    (FIXTURES dup rate) vs two full-corpus payload shuffles — at 100 TB
    that trade is not close.

    `shuffle_payloads=True` restores the pre-shuffle layout (bucket +
    salted repartition before the kernel) for inputs that arrive so
    skewed that scan splits can't balance them (e.g. one giant file of
    mega-PDFs with tiny row groups).
    """
    df = pages.select(*PAGES_COLS)
    if shuffle_payloads:
        df = with_bucket(df)
        df = salted_repartition(df, num_partitions or 64).select(*PAGES_COLS)
    extracted = df.mapInPandas(extract_batches, schema=EXTRACT_SCHEMA)
    extracted = extracted.withColumn("partition_id", F.spark_partition_id())
    if dedup:
        w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc())
        extracted = (
            extracted.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    # bucket is recomputed (cheap, deterministic) rather than shipped
    # through the Python worker.
    return with_bucket(extracted)


def metrics_rollup(extracted: DataFrame) -> DataFrame:
    """Per-bucket extraction metrics (north_star: pages, chars, failures).

    Partial aggregation happens map-side (built-in hash agg), so the
    shuffle carries one row per (partition, bucket).
    """
    return extracted.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_pages").alias("pages"),
        F.sum("n_chars").alias("chars"),
        F.sum("parse_failed").alias("parse_failures"),
        F.sum(F.when(F.col("parse_status") == "passthrough", 1).otherwise(0)).alias(
            "passthrough_docs"
        ),
        F.sum(F.when(F.col("parse_status") == "empty", 1).otherwise(0)).alias("empty_docs"),
        F.countDistinct("partition_id").alias("n_tasks"),
    )


def wrap_documents_as_pages(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang) → pages rows whose html wraps the text
    in realistic boilerplate (nav/header/footer link farms + one article).

    Used by the flagship round-trip check: the extraction pipeline must
    strip the boilerplate and recover `text` byte-identically, which gives
    the extractor a DuckDB-checkable oracle (SELECT doc_id, text)."""
    import datetime as _dt

    import pandas as pd

    def gen(batches):
        import html as _html

        nav = "".join(f'<a href="/s/{i}">section link {i}</a> | ' for i in range(8))
        for b in batches:
            # escape markup chars (the kernel decodes entities, so the
            # round-trip inverts); a raw '<' in text would otherwise open
            # a bogus tag the extractor cannot recover byte-identically,
            # and a NULL text would render as the literal 'None'
            htmls = [
                (
                    "<!DOCTYPE html><html><head><title>d</title>"
                    "<style>p{margin:0}</style><script>var x=1;</script></head>"
                    f"<body><nav><div>{nav}</div></nav>"
                    f"<article><p>{_html.escape(t or '', quote=False)}</p></article>"
                    '<footer><div><a href="/a">about</a> <a href="/b">legal</a>'
                    " &copy; 2024</div></footer></body></html>"
                ).encode()
                for t in b["text"]
            ]
            yield pd.DataFrame(
                {
                    "url": [f"https://corpus/{d:012d}.html" for d in b["doc_id"]],
                    "warc_ts": _dt.datetime(2024, 1, 1),
                    "html": htmls,
                    "text": None,
                    "lang": b["lang"],
                }
            )

    return documents.select("doc_id", "text", "lang").mapInPandas(
        gen, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )


def html_roundtrip_extract(documents: DataFrame) -> DataFrame:
    """Flagship: wrap corpus text in boilerplate HTML, extract, return
    (doc_id, extracted_text). Oracle: SELECT doc_id, text FROM documents."""
    pages = wrap_documents_as_pages(documents)
    extracted = run_extraction(pages, dedup=False)
    return extracted.select(
        F.regexp_extract("url", r"/(\d+)\.html$", 1).try_cast("long").alias("doc_id"),
        "extracted_text",
    )


def content_type_dispatch(pages: DataFrame) -> DataFrame:
    """Pure-projection content-type classification (SURVEY §2 #2/#16).

    Built-in expressions only — exercises pushdown/codegen, used by the
    driver oracle checks as a SQL-expressible stand-in for the UDF path.
    """
    return pages.select(
        "url",
        content_type_col().alias("content_type"),
        F.when(F.col("html").isNull() & F.col("text").isNull(), 1)
        .otherwise(0)
        .alias("is_empty"),
    )
