"""Independent (non-replay) checks for the multimodal family.

The driver's VALUES oracles for media_features / image_resize replay the
SAME stub kernels (tools/oracle_values.py documents this honestly), so a
shared kernel/oracle bug would pass the gate silently — the one family
with no cross-family check (VERDICT r4 #4). These tests recompute the
full expected outputs for the 60-row synth table in straight-line
Python written FROM THE SPEC in the operator docstrings: no import of
_decode_stub/_resize_stub/decode_stub_ks/_byte_capped_frames, no
pandas, different byte-twiddling (int.from_bytes instead of
struct.unpack), independent status routing and aspect math. What both
sides share is hashlib.blake2b itself — a stdlib primitive, trusted the
same way the AES kernel trusts FIPS-197 vectors.

A bug in the Arrow batching (dropped/duplicated rows at cap
boundaries), column ordering, status routing, meta plumbing, float32
casting, or the aspect-fit math shows up here; it cannot hide in a
replayed oracle.
"""

from __future__ import annotations

import hashlib
import struct

import pytest

from pdf_to_text_spark.operators.multimodal import (
    audio_resample_plan,
    frame_sample_plan,
    image_resize,
    media_features,
    synth_media_df,
)

N = 60


def _payload(i: int) -> bytes | None:
    # re-stated from the synth_media_rows spec, not imported
    if i % 17 == 5:
        return None
    return bytes([(i * 7 + j) % 251 for j in range(64 + i)])


def _kind(i: int) -> str:
    return ["image", "audio", "video"][i % 3]


def _expected_features() -> set[tuple]:
    out = set()
    for i in range(N):
        p = _payload(i)
        if p is None:
            out.add((i, _kind(i), 0, None, None, "null_payload"))
            continue
        feat = []
        for d in range(16):
            dig = hashlib.blake2b(
                p, digest_size=8, person=d.to_bytes(8, "little")
            ).digest()
            k = int.from_bytes(dig, "little", signed=True) % 2_000_000
            # the operator stores float32; round-trip through one
            f32 = struct.unpack("<f", struct.pack("<f", k / 1e6 - 1.0))[0]
            feat.append(f32)
        out.add((
            i, _kind(i), len(p),
            hashlib.blake2b(p, digest_size=16).hexdigest(),
            tuple(feat), "ok",
        ))
    return out


def test_media_features_matches_independent_recompute(spark):
    got = {
        (
            r.media_id, r.kind, r.payload_bytes, r.content_hash,
            tuple(r.feature) if r.feature is not None else None,
            r.decode_status,
        )
        for r in media_features(synth_media_df(spark, N)).collect()
    }
    assert got == _expected_features()


def _expected_resize(tw: int = 224, th: int = 224) -> set[tuple]:
    out = set()
    for i in range(N):
        if _kind(i) != "image":
            continue
        p = _payload(i)
        if p is None:
            out.add((i, None, None, 0, None, "null_payload"))
            continue
        w, h = 64 + i % 512, 48 + i % 256  # synth spec; always valid dims
        scale = min(tw / w, th / h)
        ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
        seed = hashlib.blake2b(
            p, digest_size=32,
            person=struct.pack("<i", ow) + struct.pack("<i", oh),
        ).digest()
        size = max(16, ow * oh // 8)
        body = (seed * (size // 32 + 1))[:size]
        out.add((
            i, ow, oh, len(body),
            hashlib.blake2b(body, digest_size=16).hexdigest(), "ok",
        ))
    return out


def test_image_resize_matches_independent_recompute(spark):
    got = {
        tuple(r) for r in image_resize(synth_media_df(spark, N)).collect()
    }
    assert got == _expected_resize()


def test_audio_resample_plan_matches_independent_recompute(spark):
    got = {tuple(r) for r in audio_resample_plan(synth_media_df(spark, N)).collect()}
    expect = set()
    for i in range(N):
        if _kind(i) != "audio":
            continue
        # synth spec: every audio row carries sample_rate 16000 == target
        expect.add((i, 16000, 16000, "copy"))
    assert got == expect
    # a non-trivial rate exercises the mode branches through the same
    # operator on a hand-built table
    import pyspark.sql.types as T  # noqa: N812

    schema = synth_media_df(spark, 1).schema
    rows = [
        (0, "audio", None, (None, None, 44100, None)),
        (1, "audio", None, (None, None, 8000, None)),
        (2, "audio", None, (None, None, None, None)),
    ]
    got2 = {
        tuple(r)
        for r in audio_resample_plan(
            spark.createDataFrame(rows, schema=schema)
        ).collect()
    }
    assert got2 == {
        (0, 44100, 16000, "downsample"),
        (1, 8000, 16000, "upsample"),
        (2, None, 16000, "no_rate"),
    }
    assert isinstance(schema, T.StructType)


def test_frame_sample_plan_matches_independent_recompute(spark):
    got = {tuple(r) for r in frame_sample_plan(synth_media_df(spark, N)).collect()}
    expect = set()
    for i in range(N):
        if _kind(i) != "video":
            continue
        n_frames = 30 * (1 + i % 10)  # synth spec
        expect.update((i, idx) for idx in range(0, n_frames, 10))
    assert got == expect


def test_feature_batching_survives_tiny_byte_cap(spark):
    """Force the Arrow byte cap below a single row's weight so every
    yield boundary is exercised — batching must neither drop nor
    duplicate rows (the exact failure class a replayed oracle shares).

    The cap is THREADED through the operator (batch_bytes param captured
    in the mapInPandas closure) — a driver-side monkeypatch of
    ARROW_MAX_BATCH_BYTES never reaches executor workers, which
    re-import the module fresh (r5 review caught exactly that vacuous
    variant of this test)."""
    from pdf_to_text_spark.operators import multimodal as mm

    got = [
        (r.media_id, r.decode_status)
        for r in mm.media_features(
            synth_media_df(spark, N), batch_bytes=1
        ).collect()
    ]
    assert len(got) == N  # list, not set: duplicates must fail too
    assert set(got) == {
        (i, "null_payload" if i % 17 == 5 else "ok") for i in range(N)
    }


@pytest.mark.parametrize("w,h,tw,th,ow,oh", [
    (640, 480, 224, 224, 224, 168),   # landscape fits width
    (480, 640, 224, 224, 168, 224),   # portrait fits height
    (10, 2000, 224, 224, 1, 224),     # extreme ratio floors to 1
])
def test_resize_aspect_fit_math(spark, w, h, tw, th, ow, oh):
    schema = synth_media_df(spark, 1).schema
    df = spark.createDataFrame(
        [(0, "image", b"xy" * 40, (w, h, None, None))], schema=schema
    )
    row = image_resize(df, tw, th).collect()[0]
    assert (row.out_width, row.out_height, row.resize_status) == (ow, oh, "ok")
