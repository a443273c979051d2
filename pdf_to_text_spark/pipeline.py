"""End-to-end reference-equivalent pipeline + CLI.

A reference user's whole workflow (upload PDF → extracted txt + records
JSON + CSV, src/main.ts:133-263) over a pages table in one call:

    from pdf_to_text_spark.pipeline import run_reference_pipeline
    out = run_reference_pipeline(pages)   # {extracted, blocks, records, csv, json}

CLI (spark-submit entry point):

    python -m pdf_to_text_spark.run --input pages_dir --output out_dir \
        [--resume] [--master local[32]]

Outputs land as parquet tables: extracted/, records/, csv_docs/,
json_docs/, metrics/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .operators.extraction import metrics_rollup, run_extraction
from .operators.records import (
    blocks_df,
    csv_documents,
    json_documents,
    records_df,
    with_chunk_id,
)


def run_reference_pipeline(
    pages: DataFrame, *, dedup: bool = True, dedup_strategy: str = "auto",
    enricher=None,
) -> dict[str, DataFrame]:
    """pages → every artifact the reference produces per document.

    `enricher=None` uses the deterministic regex field parser on blocks
    (records_df); pass an operators.enrichment.HTTPEnricher to run the
    reference's LLM stage instead (then records come from enrich_chunks).
    `dedup_strategy` passes through to run_extraction (auto | prefilter
    | window)."""
    extracted = run_extraction(pages, dedup=dedup, dedup_strategy=dedup_strategy)
    blocks = with_chunk_id(blocks_df(extracted))
    if enricher is None:
        records = records_df(blocks)
    else:
        from .operators.enrichment import enrich_chunks
        from .operators.records import chunks_df

        enriched = enrich_chunks(chunks_df(blocks), enricher)
        records = enriched.where(enriched.record_pos.isNotNull()).withColumn(
            "block_pos", enriched.record_pos * 0
        )
    return {
        "extracted": extracted,
        "blocks": blocks,
        "records": records,
        # pass the extracted url universe: uploads with zero parsed records
        # still emit a header-only CSV (reference main.ts:55)
        "csv_docs": csv_documents(records, urls=extracted.select("url")),
        "json_docs": json_documents(records),
        "metrics": metrics_rollup(extracted),
    }
