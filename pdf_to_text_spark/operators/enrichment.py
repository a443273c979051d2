"""Pluggable chunk-enrichment stage (SURVEY.md §2 #9).

The reference's only non-deterministic stage is a sequential per-chunk
OpenAI call (src/main.ts:169-234: gpt-4-turbo, temperature 0, max_tokens
2000, system prompt schema at :183-198, user template at :202, fail-stop
on error at :222-226). The rebuild makes the stage a strategy object:

  * RegexEnricher (default) — deterministic field parser, same output
    schema; the golden-contract path.
  * HTTPEnricher — the reference's request shape (same prompt text,
    model, temperature) executed BATCHED AND PARTITION-PARALLEL inside
    mapInPandas, with a transport callable injected so tests run a mock
    and production plugs an HTTP client. The reference's request-aborting
    error becomes a per-chunk enrich_status row.

The reference's sequential for-loop (src/main.ts:174) is the throughput
ceiling this stage removes: chunks enrich concurrently across partitions
and, inside a partition, as one batched transport call.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..config import CHUNK_BLOCK_DELIM
from ..kernels.blocks import extract_json_fenced, parse_records

# reference prompt, reproduced so an HTTP deployment is request-identical
# (src/main.ts:183-198, 202)
SYSTEM_PROMPT = (
    "You are a data extraction assistant. Return a valid JSON array with the structure:\n\n"
    "```json\n[\n  {\n    \"SucursalName\": \"string\",\n    \"EAN\": \"string\",\n"
    "    \"CantidadVendida\": \"integer\",\n    \"Importe\": \"float\",\n  }\n]\n```\n\n"
    "- The response must be valid JSON inside triple backticks.\n"
    "- No additional text or explanations.\n"
    "- Each item is a single sale record from these blocks.\n"
    "- If some block has no sales, skip it or return an empty array.\n"
    "- Floating‐point numbers always have decimal digits (e.g. 49.90)."
)
MODEL = "gpt-4-turbo"
TEMPERATURE = 0
MAX_TOKENS = 2000


def build_request(chunk_text: str) -> dict:
    """The exact chat-completions body the reference sends per chunk."""
    return {
        "model": MODEL,
        "messages": [
            {"role": "system", "content": SYSTEM_PROMPT},
            {
                "role": "user",
                "content": (
                    f"Here are some Sucursal blocks:\n\n{chunk_text}\n\n"
                    "Please parse them and return only a valid JSON array "
                    "with all the records."
                ),
            },
        ],
        "temperature": TEMPERATURE,
        "max_tokens": MAX_TOKENS,
    }


Transport = Callable[[list[dict]], list[str]]
"""Batch transport: list of request bodies → list of raw response texts.
Production: async HTTP fan-out to the completions endpoint. Tests: mock."""


class RegexEnricher:
    """Deterministic default — kernels.blocks.parse_records per block."""

    def extract(self, chunk_texts: list[str]) -> list[tuple[list[dict], str]]:
        out = []
        for chunk in chunk_texts:
            recs = []
            # split on the SAME delimiter the chunker joined blocks with
            # (a literal "\n\n" here silently desynced from the config
            # constant); a NULL chunk_text must become a status row, not
            # an AttributeError that kills the Spark task (r6 review)
            for block in (chunk or "").split(CHUNK_BLOCK_DELIM):
                recs.extend(parse_records(block))
            out.append((recs, "ok"))
        return out


class HTTPEnricher:
    """Reference-shaped LLM enrichment with injectable batch transport."""

    def __init__(self, transport: Transport | None = None):
        if transport is None:
            raise NotImplementedError(
                "no HTTP client in this sandbox — inject a Transport "
                "(production: batched async POSTs to /v1/chat/completions)"
            )
        self.transport = transport

    def extract(self, chunk_texts: list[str]) -> list[tuple[list[dict], str]]:
        requests = [build_request(c or "") for c in chunk_texts]
        responses = self.transport(requests)
        if len(responses) < len(requests):
            # a transport short-read must not SILENTLY drop trailing
            # chunks (enrich_chunks zips rows to results) — pad so each
            # missing response surfaces as an enrich_failed row
            responses = list(responses) + [None] * (len(requests) - len(responses))
        out = []
        for resp in responses:
            try:
                recs = json.loads(extract_json_fenced(resp))
                # any valid JSON parses; only a list of objects is the
                # contract shape — a dict/str/list-of-str response would
                # otherwise crash enumerate/r.get inside the Spark task
                if not (isinstance(recs, list)
                        and all(isinstance(r, dict) for r in recs)):
                    raise ValueError("response is not a list of records")
                out.append((recs, "ok"))
            except Exception:
                # reference fail-stops the whole request (main.ts:222-226);
                # at scale a bad chunk must not kill the job
                out.append(([], "enrich_failed"))
        return out


ENRICHED_SCHEMA = (
    "url string, chunk_id int, record_pos int, enrich_status string, "
    "SucursalName string, EAN string, CantidadVendida string, Importe string"
)


def enrich_chunks(chunks: DataFrame, enricher=None) -> DataFrame:
    """(url, chunk_id, chunk_text) → exploded records, partition-parallel.

    One enricher.extract() call per Arrow batch — with HTTPEnricher that
    is one batched transport fan-out per batch instead of the reference's
    one serial request per chunk."""
    enricher = enricher or RegexEnricher()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            results = enricher.extract(list(b["chunk_text"]))
            rows = []
            for url, chunk_id, (recs, status) in zip(b["url"], b["chunk_id"], results):
                if not recs:
                    rows.append((url, chunk_id, None, status, None, None, None, None))
                for pos, r in enumerate(recs):
                    # a PRESENT-but-null JSON field must not stringify
                    # to the Python repr 'None' — indistinguishable from
                    # a store actually named "None" (r5 review); treat
                    # explicit null like the absent-key default
                    def _s(key: str) -> str:
                        v = r.get(key)
                        return "" if v is None else str(v)

                    rows.append(
                        (
                            url,
                            chunk_id,
                            pos,
                            status,
                            _s("SucursalName"),
                            _s("EAN"),
                            _s("CantidadVendida"),
                            _s("Importe"),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "chunk_id", "record_pos", "enrich_status",
                    "SucursalName", "EAN", "CantidadVendida", "Importe",
                ],
            )

    return chunks.select("url", "chunk_id", "chunk_text").mapInPandas(
        gen, schema=ENRICHED_SCHEMA
    )
