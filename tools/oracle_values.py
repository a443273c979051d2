"""Precomputed VALUES oracles for the non-SQL-expressible driver queries.

The MinHash/SimHash/LSH/IVF/extraction operators are deterministic —
fixed hash seeds, fixed hyperplanes, fixed k-means seed and iteration
count, order-independent (decimal) distributed sums — so their exact
expected output on the driver's fixed sf0.01 tables can be recomputed
in-process with the SAME kernels and pinned as a DuckDB
``SELECT ... FROM (VALUES ...)`` oracle (VERDICT r1 next-round #3).

Replication rules that make this sound (each mirrors a Spark behavior):
  * floats are compared after Spark's ``round(x, n)``, replicated as
    BigDecimal.valueOf-style HALF_UP on the shortest-repr decimal
    (Python ``repr`` produces the same shortest round-trip digits as
    Java ``Double.toString``);
  * cosine / dot products replicate ``cosine_sim_col``'s sequential
    left-fold, term by term, in the same IEEE order;
  * LSH signatures reuse operators.similarity._planes and the same
    ``np.einsum`` call (einsum's per-element reduction is independent of
    batch height — verified — so Arrow batching can't change a bit);
  * IVF replays ivf_train's Lloyd iterations; the distributed per-cell
    sums are decimal in Spark (exact, shuffle-order-independent) and are
    replicated with decimal.Decimal quantized like Spark's
    double→decimal(38,18) cast.

The sf dir defaults to the driver's gate scale (sf0.01) and can be
re-pointed with PTS_ORACLE_SF_DIR (tools.check_oracle does, so the same
oracles are verified at sf0.1 too).
"""

from __future__ import annotations

import functools
import hashlib
import math
import os
import struct
from decimal import ROUND_HALF_UP, Decimal

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def oracle_sf_dir() -> str:
    return os.environ.get("PTS_ORACLE_SF_DIR", DEFAULT_SF_DIR)


# ── shared replication helpers ───────────────────────────────────────────────


def spark_round(x: float, n: int) -> float:
    """F.round(double, n): BigDecimal.valueOf(x).setScale(n, HALF_UP)."""
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP)
    )


_DEC18 = Decimal(1).scaleb(-18)


def spark_dec18(x: float) -> Decimal:
    """Spark cast(double AS decimal(38,18)): shortest-repr, HALF_UP."""
    return Decimal(repr(x)).quantize(_DEC18, rounding=ROUND_HALF_UP)


def fold_cosine(a: list[float], b: list[float]) -> float:
    """Replicates dedup.cosine_sim_col: sequential left folds, same IEEE
    op order (F.aggregate folds the array front to back)."""
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    na = 0.0
    for x in a:
        na = na + x * x
    nb = 0.0
    for y in b:
        nb = nb + y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    # zero-norm guard mirrors the operator (cosine vs a zero vector is
    # DEFINED as 0.0 there; a bare divide would ZeroDivisionError here)
    est = dot / denom if denom != 0 else 0.0
    # NaN/Inf pinning mirrors the operator too (cosine_sim_col, r5 fix):
    # without it one non-finite embedding component makes spark_round
    # quantize Decimal('nan') → InvalidOperation, crashing the oracle
    # build for a query whose Spark side correctly emits 0.0 (r6 review)
    return est if math.isfinite(est) else 0.0


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def values_sql(cols: list[tuple[str, str]], rows: list[tuple]) -> str:
    """DuckDB SELECT over a VALUES table with explicitly cast columns."""
    names = ", ".join(n for n, _ in cols)
    sel = ", ".join(f"{n}::{t} AS {n}" for n, t in cols)
    if not rows:
        nulls = ", ".join(f"NULL::{t} AS {n}" for n, t in cols)
        return f"SELECT {nulls} WHERE false"
    vals = ",\n".join("(" + ", ".join(_lit(v) for v in r) + ")" for r in rows)
    return f"SELECT {sel} FROM (VALUES\n{vals}\n) AS t({names})"


@functools.lru_cache(maxsize=4)
def _read_docs(sf: str) -> tuple[tuple[int, str], ...]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return tuple(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


@functools.lru_cache(maxsize=4)
def _read_emb(sf: str) -> tuple[tuple[int, tuple[float, ...]], ...]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    # parquet float32 → Python float is an exact widening, same as Spark's
    # cast(embedding AS array<double>)
    vecs = [tuple(v) for v in t.column("embedding").to_pylist()]
    return tuple(zip(ids, vecs))


# ── winnow_fingerprints ──────────────────────────────────────────────────────


@functools.lru_cache(maxsize=4)
def winnow_oracle(sf: str) -> str:
    from pdf_to_text_spark.kernels.textstats import winnow_fingerprint

    rows = []
    for doc_id, text in _read_docs(sf):
        w = winnow_fingerprint(text or "")
        js = "[" + ",".join(str(x) for x in w) + "]"  # == F.to_json(array<long>)
        rows.append((doc_id, len(w), hashlib.md5(js.encode()).hexdigest()))
    return values_sql(
        [("doc_id", "BIGINT"), ("n_grams", "INTEGER"), ("winnow_md5", "VARCHAR")],
        rows,
    )


# ── media_features ───────────────────────────────────────────────────────────


@functools.lru_cache(maxsize=1)
def media_oracle(n: int = 60) -> str:
    from pdf_to_text_spark.operators.multimodal import _decode_real, synth_media_rows

    rows = []
    for media_id, kind, payload, _meta in synth_media_rows(n):
        if payload is None:
            rows.append((media_id, kind, 0, None, None, "null_payload"))
            continue
        try:
            feat, status = _decode_real(bytes(payload), kind)
        except Exception:
            rows.append(
                (media_id, kind, len(payload), None, None, "decode_failed")
            )
            continue
        # same integer recovery as the Spark projection: features sit on
        # the 1e-6 lattice with |x|<=2 (kernels/media.py contract), so
        # round((f+1)*1e6) is exact on both sides of the float32 cast
        ks = [round((float(f) + 1.0) * 1e6) for f in feat]
        js = "[" + ",".join(str(k) for k in ks) + "]"
        digest = hashlib.blake2b(payload, digest_size=16).hexdigest()
        rows.append((media_id, kind, len(payload), digest, js, status))
    return values_sql(
        [
            ("media_id", "BIGINT"),
            ("kind", "VARCHAR"),
            ("payload_bytes", "BIGINT"),
            ("content_hash", "VARCHAR"),
            ("feature_k", "VARCHAR"),
            ("decode_status", "VARCHAR"),
        ],
        rows,
    )


@functools.lru_cache(maxsize=1)
def image_resize_oracle(n: int = 60, tw: int = 224, th: int = 224) -> str:
    from pdf_to_text_spark.operators.multimodal import _resize_real, synth_media_rows

    rows = []
    for media_id, kind, payload, meta in synth_media_rows(n):
        if kind != "image":
            continue
        if payload is None:
            rows.append((media_id, None, None, 0, None, "null_payload"))
            continue
        w, h = meta[0], meta[1]
        if not w or not h or w <= 0 or h <= 0:
            rows.append((media_id, None, None, 0, None, "no_dims"))
            continue
        scale = min(tw / w, th / h)
        ow = max(1, int(w * scale))
        oh = max(1, int(h * scale))
        try:
            out, status = _resize_real(bytes(payload), w, h, ow, oh)
        except Exception:
            rows.append((media_id, None, None, 0, None, "decode_failed"))
            continue
        rows.append(
            (media_id, ow, oh, len(out),
             hashlib.blake2b(out, digest_size=16).hexdigest(), status)
        )
    return values_sql(
        [
            ("media_id", "BIGINT"),
            ("out_width", "INTEGER"),
            ("out_height", "INTEGER"),
            ("out_bytes", "BIGINT"),
            ("out_hash", "VARCHAR"),
            ("resize_status", "VARCHAR"),
        ],
        rows,
    )


@functools.lru_cache(maxsize=1)
def audio_resample_exec_oracle(n: int = 60, target: int = 16000) -> str:
    """The EXECUTING resample stage (r6): replay _resample_real over the
    same synth rows — real fixed-point linear DSP for WAV-PCM; the
    non-replay check is test_multimodal_independent's differently-coded
    resampler recompute."""
    from pdf_to_text_spark.operators.multimodal import (
        _resample_real,
        synth_media_rows,
    )

    rows = []
    for media_id, kind, payload, _meta in synth_media_rows(n):
        if kind != "audio":
            continue
        if payload is None:
            rows.append((media_id, None, target, None, 0, None, "null_payload"))
            continue
        try:
            out, src_rate, n_samples, status = _resample_real(
                bytes(payload), target
            )
        except Exception:
            rows.append((media_id, None, target, None, 0, None, "decode_failed"))
            continue
        rows.append(
            (media_id, src_rate, target, n_samples, len(out),
             hashlib.blake2b(out, digest_size=16).hexdigest(), status)
        )
    return values_sql(
        [
            ("media_id", "BIGINT"),
            ("src_rate", "INTEGER"),
            ("dst_rate", "INTEGER"),
            ("out_samples", "BIGINT"),
            ("out_bytes", "BIGINT"),
            ("out_hash", "VARCHAR"),
            ("resample_status", "VARCHAR"),
        ],
        rows,
    )


# ── extraction_pdf_e2e ───────────────────────────────────────────────────────


@functools.lru_cache(maxsize=1)
def _replay_extraction(n: int = 120) -> tuple[tuple, ...]:
    """ONE shared replay of the driver's 120-row extraction (latest-row
    dedup + is_pdf dispatch + kernel), consumed by both extraction
    oracles so the dispatch/tiebreak rules cannot silently diverge
    between them. Rows: (url, ctype, out_text, n_pages, status, failed)."""
    from pdf_to_text_spark.functions.udfs import _extract_one
    from pdf_to_text_spark.sources.pages import build_pages_pdf

    pdf = build_pages_pdf(list(range(n)))
    latest: dict[str, tuple] = {}
    for url, ts, html, text, _lang in pdf.itertuples(index=False, name=None):
        if url in latest and ts == latest[url][0]:
            # an exact-ts same-url tie has NO pinned winner in the
            # engine (the window fallback picks partition-order) — a
            # replay that silently kept first-seen would make the gate
            # flaky the day the generator emits one (r5 review)
            raise AssertionError(
                f"gate corpus has an exact-ts duplicate for {url!r} — "
                "pin a tiebreak in BOTH engine and oracle first"
            )
        if url not in latest or ts > latest[url][0]:
            latest[url] = (ts, html, text)
    rows = []
    for url, (_ts, html, text) in latest.items():
        is_pdf = bool(
            url.endswith(".pdf") and html is not None and bytes(html[:5]) == b"%PDF-"
        )
        ctype = None if html is None else ("application/pdf" if is_pdf else "text/html")
        out, n_pages, status, failed = _extract_one(html, text, is_pdf)
        rows.append((url, ctype, out, n_pages, status, failed))
    return tuple(rows)


@functools.lru_cache(maxsize=1)
def extraction_e2e_oracle(n: int = 120) -> str:
    rows = [
        (url, ctype, n_pages, len(out), status)
        for url, ctype, out, n_pages, status, _failed in _replay_extraction(n)
    ]
    return values_sql(
        [
            ("url", "VARCHAR"),
            ("content_type", "VARCHAR"),
            ("n_pages", "INTEGER"),
            ("n_chars", "BIGINT"),
            ("parse_status", "VARCHAR"),
        ],
        rows,
    )


@functools.lru_cache(maxsize=1)
def extraction_status_metrics_oracle(n: int = 120) -> str:
    """Status-level metrics rollup over the same replayed extraction as
    extraction_e2e_oracle — the driver-checkable face of metrics_rollup
    (north_rule: per-partition lineage + metrics; the bucket/task axes
    are runtime-shaped, the status axis is oracle-stable). Shares
    _replay_extraction with extraction_e2e_oracle so the dispatch/
    tiebreak replay exists exactly once."""
    agg: dict[str, list[int]] = {}
    for _url, _ctype, out, n_pages, status, failed in _replay_extraction(n):
        a = agg.setdefault(status, [0, 0, 0, 0])
        a[0] += 1
        a[1] += n_pages
        a[2] += len(out)
        a[3] += failed
    rows = [
        (status, a[0], a[1], a[2], a[3]) for status, a in sorted(agg.items())
    ]
    return values_sql(
        [
            ("parse_status", "VARCHAR"),
            ("docs", "BIGINT"),
            ("pages", "BIGINT"),
            ("chars", "BIGINT"),
            ("parse_failures", "BIGINT"),
        ],
        rows,
    )


# ── streaming queries (same kernels, replayed over the synthetic feed) ──────


@functools.lru_cache(maxsize=1)
def streaming_minute_oracle(n: int = 200) -> str:
    """crawl_minute_metrics over the full (un-deduped) synthetic feed:
    per (UTC epoch minute, lang) docs / chars / parse failures. Tumbling
    1-minute windows align to the epoch, so minute_epoch is tz-free."""
    from pdf_to_text_spark.functions.udfs import _extract_one
    from pdf_to_text_spark.sources.pages import build_pages_pdf

    agg: dict[tuple[int, str], list[int]] = {}
    pdf = build_pages_pdf(list(range(n)))
    for url, ts, html, text, lang in pdf.itertuples(index=False, name=None):
        is_pdf = bool(
            url.endswith(".pdf") and html is not None and bytes(html[:5]) == b"%PDF-"
        )
        out, _n_pages, _status, failed = _extract_one(html, text, is_pdf)
        epoch = int(ts.timestamp())
        key = (epoch - epoch % 60, lang)
        a = agg.setdefault(key, [0, 0, 0])
        a[0] += 1
        a[1] += len(out)
        a[2] += failed
    rows = [(m, lang, a[0], a[1], a[2]) for (m, lang), a in sorted(agg.items())]
    return values_sql(
        [
            ("minute_epoch", "BIGINT"),
            ("lang", "VARCHAR"),
            ("docs", "BIGINT"),
            ("chars", "BIGINT"),
            ("parse_failures", "BIGINT"),
        ],
        rows,
    )


@functools.lru_cache(maxsize=1)
def streaming_dedup_oracle(n: int = 200) -> str:
    """dedup_stream_by_url over the synthetic feed: per url, every
    strictly-newer crawl in event-time order (the stateful fn sorts each
    invocation by event time), is_first_crawl on the earliest."""
    from pdf_to_text_spark.sources.pages import build_pages_pdf

    by_url: dict[str, list] = {}
    pdf = build_pages_pdf(list(range(n)))
    for url, ts, _html, _text, lang in pdf.itertuples(index=False, name=None):
        by_url.setdefault(url, []).append((int(ts.timestamp()), lang))
    rows = []
    for url, items in sorted(by_url.items()):
        # (ts, lang) — the SAME exact-ts tiebreak the stateful operator
        # pins (streaming/stateful.py _dedup_fn, r5 review); a ts-only
        # sort here was stable on feed order and would silently drift
        # the moment the corpus gains same-url equal-ts rows
        items.sort(key=lambda t: (t[0], t[1] or ""))
        max_ts = None
        first = 1
        for epoch, lang in items:
            if max_ts is None or epoch > max_ts:
                max_ts = epoch
                rows.append((url, epoch, lang, first))
                first = 0
    return values_sql(
        [
            ("url", "VARCHAR"),
            ("ts_epoch", "BIGINT"),
            ("lang", "VARCHAR"),
            ("is_first_crawl", "INTEGER"),
        ],
        rows,
    )


# ── minhash_dedup_pairs ──────────────────────────────────────────────────────


def _minhash_pairs_for(
    docs, threshold: float, n_perm: int = 64, n_bands: int = 16
) -> list[tuple[int, int, float]]:
    """(doc_a, doc_b, est_jaccard) for a (doc_id, text) sequence via the
    same kernels + banding — the ONE pair-enumeration used by every
    minhash-derived oracle (pairs / corpus keep-list / clusters)."""
    from pdf_to_text_spark.kernels.textstats import minhash_bands, minhash_signature

    sigs = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in docs:
        s = minhash_signature(text or "", n_perm=n_perm)
        sigs[doc_id] = s
        for bi, bh in enumerate(minhash_bands(s, n_bands=n_bands)):
            buckets.setdefault((bi, bh), []).append(doc_id)
    pairs = _bucket_pairs(buckets)
    rows = []
    for a, b in sorted(pairs):
        eq = int((sigs[a] == sigs[b]).sum())
        est = spark_round(eq / n_perm, 4)  # int/int division is double in Spark
        if est >= threshold:
            rows.append((a, b, est))
    return rows


def _bucket_pairs(buckets: dict) -> set:
    """Hot-bucket-capped i<j pair enumeration — ONE definition for the
    minhash/simhash/embedding oracles (r5 review: three verbatim copies
    could drift from dedup._cap_buckets's semantics independently)."""
    from pdf_to_text_spark.operators.dedup import DEFAULT_MAX_BUCKET

    pairs: set = set()
    for ids in buckets.values():
        if len(ids) > DEFAULT_MAX_BUCKET:
            continue  # replicate the operator's hot-bucket cap exactly
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs


@functools.lru_cache(maxsize=8)
def _minhash_pair_rows(
    sf: str, threshold: float, n_perm: int = 64, n_bands: int = 16
) -> tuple[tuple[int, int, float], ...]:
    return tuple(_minhash_pairs_for(_read_docs(sf), threshold, n_perm, n_bands))


@functools.lru_cache(maxsize=4)
def minhash_oracle(
    sf: str, threshold: float = 0.2, n_perm: int = 64, n_bands: int = 16
) -> str:
    rows = list(_minhash_pair_rows(sf, threshold, n_perm, n_bands))
    return values_sql(
        [("doc_a", "BIGINT"), ("doc_b", "BIGINT"), ("est_jaccard", "DOUBLE")], rows
    )


@functools.lru_cache(maxsize=4)
def near_dup_clusters_oracle(sf: str, threshold: float = 0.5) -> str:
    """Connected components of the minhash-pair graph as a recursive CTE:
    cluster_rep = min doc_id reachable over symmetric near-dup edges."""
    pairs = [(a, b) for a, b, _e in _minhash_pair_rows(sf, threshold)]
    pairs_sql = values_sql([("doc_a", "BIGINT"), ("doc_b", "BIGINT")], pairs)
    return f"""
        WITH RECURSIVE
        pairs AS ({pairs_sql}),
        edges AS (
          SELECT doc_a AS s, doc_b AS t FROM pairs
          UNION ALL
          SELECT doc_b, doc_a FROM pairs),
        reach(src, node) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT r.src, e.t FROM reach r JOIN edges e ON e.s = r.node)
        SELECT src AS doc_id, min(node)::bigint AS cluster_rep
        FROM reach GROUP BY src
    """


# ── dedup_corpus keep-list ───────────────────────────────────────────────────


@functools.lru_cache(maxsize=4)
def dedup_corpus_oracle(
    sf: str, near_threshold: float = 0.5, n_perm: int = 64, n_bands: int = 16
) -> str:
    """Replays dedup.dedup_corpus: exact-fingerprint groups keep min
    doc_id, then minhash-LSH near-dup pair drop among survivors."""
    from pdf_to_text_spark.kernels.textstats import normalize_text

    docs = _read_docs(sf)
    fp_min: dict[str, int] = {}
    fps = {}
    for doc_id, text in docs:
        fp = hashlib.md5(normalize_text(text or "").encode()).hexdigest()
        fps[doc_id] = fp
        if fp not in fp_min or doc_id < fp_min[fp]:
            fp_min[fp] = doc_id
    survivors = tuple((d, t) for d, t in docs if fp_min[fps[d]] == d)
    near_drop = {
        b for _a, b, _e in _minhash_pairs_for(survivors, near_threshold, n_perm, n_bands)
    }
    rows = []
    for doc_id, _text in docs:
        if fp_min[fps[doc_id]] != doc_id:
            rows.append((doc_id, 0, "exact_dup"))
        elif doc_id in near_drop:
            rows.append((doc_id, 0, "near_dup"))
        else:
            rows.append((doc_id, 1, "kept"))
    return values_sql(
        [("doc_id", "BIGINT"), ("keep", "INTEGER"), ("reason", "VARCHAR")], rows
    )


# ── simhash_near_pairs ───────────────────────────────────────────────────────


@functools.lru_cache(maxsize=4)
def simhash_oracle(sf: str, max_hamming: int = 3) -> str:
    from pdf_to_text_spark.kernels.textstats import simhash64

    # Spark stores simhash as (h - 2^63); band equality and XOR popcount
    # are invariant under that constant top-bit flip, so raw unsigned h
    # replicates the banded join exactly.
    sh = {doc_id: simhash64(text or "") for doc_id, text in _read_docs(sf)}
    buckets: dict[tuple[int, int], list[int]] = {}
    for d, h in sh.items():
        for bi in range(4):
            buckets.setdefault((bi, (h >> (16 * bi)) & 0xFFFF), []).append(d)
    pairs = _bucket_pairs(buckets)
    rows = []
    for a, b in sorted(pairs):
        ham = bin(sh[a] ^ sh[b]).count("1")
        if ham <= max_hamming:
            rows.append((a, b, ham))
    return values_sql(
        [("doc_a", "BIGINT"), ("doc_b", "BIGINT"), ("hamming", "INTEGER")], rows
    )


# ── LSH signatures (shared by knn_lsh and embedding_near_pairs) ─────────────


@functools.lru_cache(maxsize=8)
def _lsh_buckets(
    sf: str, dim: int, n_planes: int, n_tables: int
) -> tuple[tuple[int, tuple[int, ...]], ...]:
    """vec_id → per-table bucket ids, same math as similarity.lsh_signatures."""
    import numpy as np

    from pdf_to_text_spark.operators.similarity import _planes

    emb = _read_emb(sf)
    M = np.asarray([np.asarray(v, dtype=np.float64) for _, v in emb])
    all_planes = np.stack([_planes(dim, n_planes, t) for t in range(n_tables)])
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    bits = np.einsum("nd,tpd->ntp", M, all_planes) > 0
    buckets = (bits * weights).sum(axis=2)  # (n, tables)
    return tuple(
        (vec_id, tuple(int(x) for x in buckets[i]))
        for i, (vec_id, _v) in enumerate(emb)
    )


def _topk_rows(
    qids: list[int],
    emb_by_id: dict[int, tuple[float, ...]],
    cand_by_q: dict[int, set[int]],
    k: int,
) -> list[tuple]:
    rows = []
    for q in qids:
        qv = emb_by_id[q]
        scored = sorted(
            ((spark_round(fold_cosine(qv, emb_by_id[c]), 4), c) for c in cand_by_q[q]),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (cos, vec_id) in enumerate(scored[:k], start=1):
            rows.append((q, rank, vec_id, cos))
    return rows


@functools.lru_cache(maxsize=4)
def knn_lsh_oracle(
    sf: str,
    n_queries: int = 8,
    dim: int = 64,
    k: int = 5,
    n_planes: int | None = None,
    n_tables: int | None = None,
) -> str:
    from pdf_to_text_spark.operators.similarity import N_PLANES, N_TABLES

    n_planes = n_planes or N_PLANES
    n_tables = n_tables or N_TABLES
    emb_by_id = dict(_read_emb(sf))
    sigs = _lsh_buckets(sf, dim, n_planes, n_tables)
    qids = sorted(emb_by_id)[:n_queries]  # queries_from_corpus: lowest vec_ids
    by_bucket: dict[tuple[int, int], list[int]] = {}
    for vec_id, bks in sigs:
        for t, bk in enumerate(bks):
            by_bucket.setdefault((t, bk), []).append(vec_id)
    sig_by_id = dict(sigs)
    cand_by_q = {
        q: {
            c
            for t, bk in enumerate(sig_by_id[q])
            for c in by_bucket.get((t, bk), ())
        }
        for q in qids
    }
    rows = _topk_rows(qids, emb_by_id, cand_by_q, k)
    return values_sql(
        [
            ("query_id", "BIGINT"),
            ("rank", "INTEGER"),
            ("vec_id", "BIGINT"),
            ("cosine", "DOUBLE"),
        ],
        rows,
    )


@functools.lru_cache(maxsize=4)
def embedding_near_pairs_oracle(
    sf: str,
    threshold: float = 0.3,
    dim: int = 64,
    n_planes: int | None = None,
    n_tables: int | None = None,
) -> str:
    from pdf_to_text_spark.operators.similarity import N_PLANES, N_TABLES

    n_planes = n_planes or N_PLANES
    n_tables = n_tables or N_TABLES
    emb_by_id = dict(_read_emb(sf))
    by_bucket: dict[tuple[int, int], list[int]] = {}
    for vec_id, bks in _lsh_buckets(sf, dim, n_planes, n_tables):
        for t, bk in enumerate(bks):
            by_bucket.setdefault((t, bk), []).append(vec_id)
    pairs = _bucket_pairs(by_bucket)
    rows = []
    for a, b in sorted(pairs):
        cos = spark_round(fold_cosine(emb_by_id[a], emb_by_id[b]), 4)
        if cos >= threshold:
            rows.append((a, b, cos))
    return values_sql(
        [("vec_a", "BIGINT"), ("vec_b", "BIGINT"), ("cosine", "DOUBLE")], rows
    )


# ── knn_ivf ──────────────────────────────────────────────────────────────────


def _assign_one(v: tuple[float, ...], centroids) -> int:
    """Replicates similarity._assign_cells: per-centroid sequential-fold
    dot products against float64 literals, strict-greater argmax."""
    best, best_sim = 0, None
    for i, c in enumerate(centroids):
        s = 0.0
        for a, b in zip(v, c):
            s = s + a * float(b)
        if best_sim is None or s > best_sim:
            best, best_sim = i, s
    return best


def _md5_bucket(key, buckets: int = 100) -> int:
    """Replicates text_analysis.md5_bucket: first 4 md5 hex digits of
    str(key), mod buckets; NULL keys hash as '' (r6 review)."""
    s = "" if key is None else str(key)
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % buckets


@functools.lru_cache(maxsize=4)
def _ivf_centroids_and_cells(
    sf: str, dim: int, n_cells: int, n_iters: int = 5,
    sample_pct: int | None = None,
):
    """Replays similarity.ivf_train's Lloyd recursion exactly: same seed,
    same float64 assignment math, decimal (exact) per-cell sums; with
    sample_pct, training sees only the md5-bucket sample (the final
    assignment stays full-corpus), mirroring the sampled train path."""
    import numpy as np

    emb = _read_emb(sf)
    vecs = [
        v for _id, v in emb
        if sample_pct is None or _md5_bucket(_id) < sample_pct
    ]
    rng = np.random.RandomState(0xCE11)
    centroids = rng.standard_normal((n_cells, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    for _ in range(n_iters):
        cells = [_assign_one(v, centroids) for v in vecs]
        acc: dict[tuple[int, int], Decimal] = {}
        counts: dict[int, int] = {}
        for v, c in zip(vecs, cells):
            counts[c] = counts.get(c, 0) + 1
            for i, x in enumerate(v):
                if x != x or x in (float("inf"), float("-inf")):
                    continue  # mirrors Spark's try_cast: non-finite → null → skipped
                acc[(c, i)] = acc.get((c, i), Decimal(0)) + spark_dec18(x)
        new = centroids.copy()
        for c in range(n_cells):
            if counts.get(c):
                vec = np.array(
                    [float(acc.get((c, i), 0.0)) for i in range(dim)]
                ) / counts[c]
                norm = np.linalg.norm(vec)
                if norm > 0:
                    new[c] = vec / norm
        centroids = new

    # final assignment is always full-corpus, regardless of the train sample
    return centroids, {_id: _assign_one(v, centroids) for _id, v in emb}


@functools.lru_cache(maxsize=4)
def knn_ivf_oracle(
    sf: str,
    n_queries: int = 8,
    dim: int = 64,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 3,
    sample_pct: int | None = None,
) -> str:
    import numpy as np

    emb_by_id = dict(_read_emb(sf))
    C, cell_by_id = _ivf_centroids_and_cells(sf, dim, n_cells, sample_pct=sample_pct)
    qids = sorted(emb_by_id)[:n_queries]
    # probe selection replicates ivf_topk.probes: one (n_queries, dim)
    # matrix against C.T, argsort descending — queries_from_corpus is a
    # limit(8), so Spark sees the same single batch
    M = np.asarray([np.asarray(emb_by_id[q], dtype=np.float64) for q in qids])
    sims = M @ C.T
    top = np.argsort(-sims, axis=1)[:, :n_probe]
    members: dict[int, list[int]] = {}
    for vec_id, cell in cell_by_id.items():
        members.setdefault(cell, []).append(vec_id)
    cand_by_q = {
        q: {c for cell in top[qi] for c in members.get(int(cell), ())}
        for qi, q in enumerate(qids)
    }
    rows = _topk_rows(qids, emb_by_id, cand_by_q, k)
    return values_sql(
        [
            ("query_id", "BIGINT"),
            ("rank", "INTEGER"),
            ("vec_id", "BIGINT"),
            ("cosine", "DOUBLE"),
        ],
        rows,
    )
