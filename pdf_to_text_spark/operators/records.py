"""Downstream record dataflow: extracted text → blocks → chunks → records
→ CSV/JSON documents.

Spark-first restatement of src/main.ts:70-124,169-250. Key idiom choices:

  * ``posexplode`` gives the per-url block ordinal for free (array
    position) — no window shuffle needed for chunk assignment
    (chunk_id = floor(block_pos / 10), src/main.ts:166);
  * ordered reassembly uses ``sort_array(collect_list(struct(pos, …)))``
    — a single hash aggregation, order restored inside the array, no
    global sort;
  * the CSV coercion quirks (`parseInt||0`, `parseFloat||0`, toFixed(2),
    unescaped quotes, no trailing newline — src/main.ts:39-56) are
    expressed with BUILT-IN functions (regexp_extract / format_string) so
    the serialization hot path never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CHUNK_BLOCK_DELIM, CSV_HEADER, MAX_BLOCKS_PER_CHUNK
from ..functions.udfs import parse_records_udf, pretty_json_udf, segment_blocks_udf


def blocks_df(extracted: DataFrame) -> DataFrame:
    """extracted → one row per (url, block_pos, block)."""
    return extracted.select(
        "url",
        F.posexplode(segment_blocks_udf(F.col("extracted_text"))).alias(
            "block_pos", "block"
        ),
    )


def with_chunk_id(blocks: DataFrame, max_per_chunk: int = MAX_BLOCKS_PER_CHUNK) -> DataFrame:
    """chunk_id = floor(block_pos / 10) — array position replaces the
    reference's sequential slicing (src/main.ts:116-124)."""
    return blocks.withColumn(
        "chunk_id", (F.col("block_pos") / F.lit(max_per_chunk)).cast("int")
    )


def chunks_df(blocks_with_chunk: DataFrame) -> DataFrame:
    """Reassemble chunk text: blocks joined with "\\n\\n" (src/main.ts:177)."""
    return blocks_with_chunk.groupBy("url", "chunk_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("block_pos", "block"))),
                lambda s: s["block"],
            ),
            CHUNK_BLOCK_DELIM,
        ).alias("chunk_text"),
        F.count(F.lit(1)).alias("n_blocks"),
    )


def records_df(blocks_with_chunk: DataFrame) -> DataFrame:
    """blocks → exploded sale records with stable (chunk_id, block_pos,
    record_pos) ordering, schema = reference prompt schema
    (src/main.ts:186-191) with CSV-stage string types."""
    recs = blocks_with_chunk.select(
        "url",
        "chunk_id",
        "block_pos",
        F.posexplode(parse_records_udf(F.col("block"))).alias("record_pos", "rec"),
    )
    return recs.select(
        "url",
        "chunk_id",
        "block_pos",
        "record_pos",
        F.col("rec.SucursalName").alias("SucursalName"),
        F.col("rec.EAN").alias("EAN"),
        F.col("rec.CantidadVendida").alias("CantidadVendida"),
        F.col("rec.Importe").alias("Importe"),
    )


# ── CSV serialization (JVM-side, quirks preserved) ──────────────────────────


def _js_int_col(c):
    """`parseInt(x, 10) || 0` as a built-in expression.

    try_cast, not cast: Spark 4 runs ANSI mode by default, where a plain
    cast on a non-numeric string aborts the job instead of yielding null.
    """
    lead = F.regexp_extract(F.coalesce(F.col(c), F.lit("")), r"^\s*([+-]?\d+)", 1)
    return F.coalesce(lead.try_cast("long"), F.lit(0))


def _js_float_col(c):
    """`parseFloat(x) || 0` as a built-in expression (ANSI-safe try_cast).

    parseFloat accepts leading Infinity literals too (truthy, so they
    survive ||0); format_string('%.2f') then renders Java's 'Infinity' /
    '-Infinity', same as the kernel's pinned toFixed behavior."""
    s = F.coalesce(F.col(c), F.lit(""))
    lead = F.regexp_extract(
        s, r"^\s*([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)", 1
    )
    return (
        F.when(s.rlike(r"^\s*[+]?Infinity"), F.lit(float("inf")))
        .when(s.rlike(r"^\s*-Infinity"), F.lit(float("-inf")))
        .otherwise(F.coalesce(lead.try_cast("double"), F.lit(0.0)))
    )


def csv_line_col():
    """One record → one CSV line; format_string('%.2f') = Java HALF_UP,
    matching the pinned toFixed(2) round-half-away-from-zero contract."""
    return F.format_string(
        '"%s","%s",%d,%.2f',
        F.coalesce(F.col("SucursalName"), F.lit("")),
        F.coalesce(F.col("EAN"), F.lit("")),
        _js_int_col("CantidadVendida"),
        _js_float_col("Importe"),
    )


def csv_documents(records: DataFrame, urls: DataFrame | None = None) -> DataFrame:
    """Per-url CSV document: header + ordered rows, no trailing newline.

    `urls` (a one-column url relation, e.g. the extracted url universe)
    restores the reference's always-emit contract: a url whose upload
    parsed to ZERO records still gets a header-only CSV (main.ts:55 emits
    the header when allJsonData is empty — ADVICE r1). Without it, the
    groupBy can only see urls that produced records."""
    lines = records.select(
        "url",
        F.struct("chunk_id", "block_pos", "record_pos").alias("ord"),
        csv_line_col().alias("line"),
    )
    assembled = lines.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ord", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("body")
    )
    if urls is not None:
        assembled = urls.select("url").distinct().join(assembled, "url", "left")
    return assembled.select(
        "url",
        F.when(
            F.col("body").isNull() | (F.col("body") == ""), F.lit(CSV_HEADER + "\n")
        )
        .otherwise(F.concat(F.lit(CSV_HEADER + "\n"), F.col("body")))
        .alias("csv"),
    )


RECORD_STRUCT = (
    "array<struct<SucursalName:string,EAN:string,CantidadVendida:string,Importe:string>>"
)


def records_from_llm_responses(responses: DataFrame) -> DataFrame:
    """LLM-response ingestion (SURVEY §2 #10, src/main.ts:25-36): extract
    the ```json fenced``` body (whole-text fallback), parse against the
    record schema, explode to rows. Invalid JSON → parse_ok=0 row instead
    of the reference's request-aborting throw (#18 softening).

    Input: (url string, chunk_id int, response string). All JVM built-ins
    (regexp_extract + from_json) — the enrichment responses never touch
    Python."""
    fenced = F.regexp_extract(F.col("response"), r"```json([\s\S]+?)```", 1)
    candidate = F.trim(F.when(fenced != "", fenced).otherwise(F.col("response")))
    parsed = F.from_json(candidate, RECORD_STRUCT)
    base = responses.select(
        "url",
        "chunk_id",
        parsed.alias("recs"),
        F.when(parsed.isNotNull(), 1).otherwise(0).alias("parse_ok"),
    )
    good = base.where(F.col("parse_ok") == 1).select(
        "url",
        "chunk_id",
        F.lit(1).alias("parse_ok"),
        F.posexplode_outer("recs").alias("record_pos", "rec"),
    )
    return good.select(
        "url",
        "chunk_id",
        "record_pos",
        "parse_ok",
        F.col("rec.SucursalName").alias("SucursalName"),
        F.col("rec.EAN").alias("EAN"),
        F.col("rec.CantidadVendida").alias("CantidadVendida"),
        F.col("rec.Importe").alias("Importe"),
    ).unionByName(
        base.where(F.col("parse_ok") == 0).select(
            "url",
            "chunk_id",
            F.lit(None).cast("int").alias("record_pos"),
            F.lit(0).alias("parse_ok"),
            *[F.lit(None).cast("string").alias(c)
              for c in ("SucursalName", "EAN", "CantidadVendida", "Importe")],
        )
    )


def json_documents(records: DataFrame) -> DataFrame:
    """Per-url pretty JSON document (JSON.stringify(…, null, 2) format).

    Record order matches the reference's chunk-sequential accumulation
    (src/main.ts:170,233). Only the final indent step is a pandas UDF —
    one call per url, not per record.
    """
    recs = records.select(
        "url",
        F.struct("chunk_id", "block_pos", "record_pos").alias("ord"),
        F.struct("SucursalName", "EAN", "CantidadVendida", "Importe").alias("rec"),
    )
    assembled = recs.groupBy("url").agg(
        F.to_json(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ord", "rec"))),
                lambda s: s["rec"],
            )
        ).alias("compact_json")
    )
    return assembled.select("url", pretty_json_udf(F.col("compact_json")).alias("json"))
