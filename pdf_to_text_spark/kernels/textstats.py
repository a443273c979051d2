"""Text-analysis / dedup primitives for the training-data pipeline operators.

Pure Python + numpy, deterministic (fixed hash seeds), used inside
Arrow-batched pandas UDFs. The Spark-side operators live in
pdf_to_text_spark.operators.{dedup,text_analysis}; where the math is
SQL-expressible it is ALSO written with built-in functions so the hot path
stays JVM-side — these kernels back only the genuinely non-SQL parts
(MinHash/SimHash signatures, winnowing fingerprints, n-gram language ID).
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np

__all__ = [
    "normalize_text",
    "word_shingles",
    "minhash_signature",
    "minhash_bands",
    "simhash64",
    "winnow_fingerprint",
    "detect_lang",
    "jaccard",
    "TOKEN_RE",
]

_NORM_RE = re.compile(r"[^0-9a-z]+")
# BPE-ish token regex: letter runs, digit runs, or single non-space symbols
# (a simplification of the GPT-2 pattern, stdlib-re-compatible).
TOKEN_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

_MERSENNE = (1 << 61) - 1
_N_PERM_DEFAULT = 64


def normalize_text(text: str) -> str:
    """lower + strip non-alphanumerics to single spaces + trim.

    Mirrors the SQL form used by the exact-dedup operator so the Python
    and JVM paths agree: lower → regexp_replace('[^0-9a-z]+', ' ') → trim.
    """
    return _NORM_RE.sub(" ", text.lower()).strip()


def word_shingles(text: str, k: int = 5) -> set[bytes]:
    """Set of k-word shingles (utf-8 bytes) over the normalized text."""
    words = normalize_text(text).split()
    if len(words) < k:
        return {(" ".join(words)).encode()} if words else set()
    return {" ".join(words[i : i + k]).encode() for i in range(len(words) - k + 1)}


def _stable_u64(data: bytes, seed: int = 0) -> int:
    h = hashlib.blake2b(data, digest_size=8, person=struct.pack("<q", seed))
    return struct.unpack("<Q", h.digest())[0]


def _perm_params(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    # deterministic a/b from a fixed-seed generator (no global RNG state)
    rng = np.random.RandomState(0x5EED)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_PERM_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(text: str, n_perm: int = _N_PERM_DEFAULT, k: int = 5) -> np.ndarray:
    """MinHash signature (uint64[n_perm]) over k-word shingles.

    Hash family: h_i(x) = ((a_i*x mod 2^64) + b_i mod 2^64) mod p,
    p = 2^61-1 — i.e. Broder-'97-SHAPED universal hashing whose product
    deliberately runs in wrapping uint64 numpy arithmetic rather than
    exact bigints (r5 review pinned the honest formula: with a,x ~ 2^61
    the product wraps mod 2^64 BEFORE the mod-p, so the textbook
    pairwise-independence proof does not apply verbatim). The wrap is a
    fixed measure-preserving permutation of the product space, the
    estimator's Jaccard tracking is pinned empirically by
    test_minhash_sql_estimates_track_exact_jaccard and the
    recall-vs-brute-force gates, and exact-bigint hashing here would
    forfeit the vectorized numpy path this kernel exists for.
    Empty text → all-ones sentinel (never collides with real content).
    """
    if n_perm not in _PERM_CACHE:
        _PERM_CACHE[n_perm] = _perm_params(n_perm)
    a, b = _PERM_CACHE[n_perm]
    shingles = word_shingles(text, k)
    if not shingles:
        return np.full(n_perm, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    base = np.fromiter(
        (_stable_u64(s) % _MERSENNE for s in shingles), dtype=np.uint64, count=len(shingles)
    )
    # (n_shingles, n_perm) would be large; do it perm-major with broadcasting
    vals = (base[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0)


def minhash_bands(sig: np.ndarray, n_bands: int = 16) -> list[int]:
    """LSH banding: hash each band of the signature → bucket keys.

    n_perm=64, n_bands=16 → rows-per-band r=4; detection threshold
    s ≈ (1/b)^(1/r) ≈ 0.5 Jaccard. n_perm must divide evenly into the
    bands — a remainder would silently drop the trailing permutations
    from every bucket key, degrading recall below the threshold math
    above with no signal (r6 review).
    """
    n_perm = len(sig)
    if n_perm % n_bands:
        raise ValueError(
            f"minhash_bands: n_perm={n_perm} is not a multiple of "
            f"n_bands={n_bands}; {n_perm % n_bands} trailing permutations "
            f"would never influence any bucket"
        )
    r = n_perm // n_bands
    out = []
    for bi in range(n_bands):
        band = sig[bi * r : (bi + 1) * r].tobytes()
        out.append(_stable_u64(band, seed=bi + 1) & 0x7FFFFFFFFFFFFFFF)
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash (Charikar '02) over word unigrams+bigrams.

    Vectorized: all feature hashes land in one uint64 array, bits are
    unpacked with a single broadcasted shift — no per-feature Python work
    beyond the stable hash itself.
    """
    words = normalize_text(text).split()
    if not words:
        return 0
    feats = words + [" ".join(p) for p in zip(words, words[1:])]
    hs = np.fromiter(
        (_stable_u64(f.encode(), seed=7) for f in feats),
        dtype=np.uint64,
        count=len(feats),
    )
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = 2 * bits.astype(np.int64).sum(axis=0) - len(feats)  # (+1/-1 votes)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def winnow_fingerprint(text: str, k: int = 7, window: int = 8) -> list[int]:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD 2003).

    Rolling k-gram hashes over the normalized char stream; keep the min of
    each sliding window (rightmost tie-break) → sorted unique fingerprint.
    """
    s = normalize_text(text)
    if len(s) < k:
        return [_stable_u64(s.encode(), seed=11) & 0x7FFFFFFFFFFFFFFF] if s else []
    hashes = [
        _stable_u64(s[i : i + k].encode(), seed=11) & 0x7FFFFFFFFFFFFFFF
        for i in range(len(s) - k + 1)
    ]
    picked: set[int] = set()
    last_idx = -1
    for w in range(max(1, len(hashes) - window + 1)):
        win = hashes[w : w + window]
        mi = max(range(len(win)), key=lambda j: (-win[j], j))  # min value, rightmost
        idx = w + mi
        if idx != last_idx:
            picked.add(win[mi])
            last_idx = idx
    return sorted(picked)


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


# ── n-gram / stopword language ID ────────────────────────────────────────────
# Small pinned stopword profiles (public common-word lists) — heuristic
# language ID for the five langs in the corpus mix (FIXTURES.md §1).
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in a is that it for on with as are was be this have "
        "from or by not at but we they you all can her his".split()
    ),
    "es": frozenset(
        "de la que el en y a los del se las por un para con no una su al es "
        "lo como más pero sus le ya o este sí".split()
    ),
    "de": frozenset(
        "der die und in den von zu das mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er".split()
    ),
    "fr": frozenset(
        "de la le et les des en un du une que est pour qui dans a par plus "
        "pas au sur ne se ce il sont avec son".split()
    ),
    "zh": frozenset("的 了 和 是 在 我 有 他 这 中 大 来 上 国 个 到 说 们 为 子".split()),
}


def detect_lang(text: str) -> str:
    """Stopword-profile language ID; 'und' when no profile scores > 0."""
    words = text.lower().split()
    if not words:
        return "und"
    # CJK check: any han characters → zh
    if any("一" <= ch <= "鿿" for ch in text[:2000]):
        return "zh"
    best_lang, best_score = "und", 0
    for lang, sw in _LANG_STOPWORDS.items():
        score = sum(1 for w in words if w in sw)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang
