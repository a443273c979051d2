"""Independent (non-replay) checks for the multimodal family.

The driver's VALUES oracles for media_features / image_resize replay
the SAME codec kernels (tools/oracle_values.py documents this
honestly), so a shared kernel/oracle bug would pass the gate silently.
These tests recompute the full expected outputs for the 60-row synth
table in straight-line Python written FROM THE SPECS:

* expected IMAGE features come from the pixel FORMULA
  (pixels_for/palette lattice, re-stated here — not imported), so the
  engine must correctly unfilter real PNGs written with filter types
  0-4 to reach them; the decoder itself is never invoked by the test;
* expected AUDIO features come from the sample formula the same way;
* the bilinear resize is re-implemented here from the fixed-point
  spec with a different code shape (per-pixel sample helper instead of
  the kernel's fused loops) — all-integer math, so a match is exact;
* stub rows re-state the blake2b lattice with int.from_bytes instead
  of struct.unpack; status routing is re-derived from the slice spec.

What both sides share is zlib/hashlib themselves — stdlib primitives,
trusted the way the AES kernel trusts FIPS-197 vectors. A bug in PNG
unfiltering, WAV parsing, feature math, Arrow batching, status
routing, meta plumbing, or float32 casting shows up here; it cannot
hide in a replayed oracle.
"""

from __future__ import annotations

import hashlib
import math
import struct
import zlib

import pytest

from pdf_to_text_spark.operators.multimodal import (
    audio_resample,
    audio_resample_plan,
    frame_sample,
    frame_sample_plan,
    image_resize,
    media_features,
    synth_media_df,
)

N = 90  # the gate's media-table size (r6: grown from 60 for the TIFF slice)


def _kind(i: int) -> str:
    return ["image", "audio", "video"][i % 3]


def _f32(x: float) -> float:
    return struct.unpack("<f", struct.pack("<f", x))[0]


def _r6(x: float) -> float:
    return round(x, 6)


# ── synth slice spec, re-stated ──────────────────────────────────────────────


def _image_sel(i: int) -> int:
    """media_image's j%12 partition selector, re-stated."""
    return (i // 3) % 12


def _image_geom(i: int) -> tuple[int, int]:
    j = i // 3
    if _image_sel(i) in (4, 8):  # TIFF slice has its own geometry
        return 9 + j % 11, 7 + j % 7
    return 8 + i % 17, 6 + i % 11


def _image_pixels(i: int) -> tuple[int, bytes]:
    """(channels, pixels) from the content formula — decoder-free.
    TIFF rows re-state media_tiff's k-keyed channel choice; WhiteIsZero
    rows need NO special-casing here because the decoder must invert
    back to the original formula bytes."""
    w, h = _image_geom(i)
    sel = _image_sel(i)
    if sel == 10:  # palette slice expands to RGB through PLTE
        palette = bytes((k * 5 + i) % 256 for k in range(48))
        out = bytearray()
        for y in range(h):
            for x in range(w):
                idx = (x * 3 + y * 5 + i) % 16
                out += palette[3 * idx : 3 * idx + 3]
        return 3, bytes(out)
    if sel in (4, 8):
        ch = [1, 3, 4, 1][(i // 3 // 6) % 4]
    elif (sel == 6 and (i // 3 // 12) % 2 == 0) or (
        sel == 2 and (i // 3 // 12) % 2 == 1
    ):
        ch = 3  # BMP rows are 24 bpp
    elif sel == 0:
        # depth-16 rows: j//12-keyed (i%4 is frozen to 0 on this slice)
        ch = [1, 3, 4, 2][(i // 3 // 12) % 4]
    else:
        ch = [1, 3, 4, 2][i % 4]
    return ch, bytes(
        (x * 7 + y * 13 + c * 41 + i * 29) % 256
        for y in range(h) for x in range(w) for c in range(ch)
    )


def _gif_pixels(i: int) -> tuple[int, int, bytes]:
    """(w, h, RGB pixels) for the i%12==9 GIF slice, from the palette
    and index FORMULAS (re-stated, not imported) — the engine must
    LZW-decode, de-interlace and palette-expand real GIFs to match."""
    w, h = 7 + i % 13, 5 + i % 9
    npal = [4, 16, 8][(i // 12) % 3]  # variation keyed by i//12 (the
    # corpus slice i%12==9 freezes every i-keyed modulus ≤ 12)
    pal = [(k * 11 + c * 59 + i * 37) % 256 for k in range(npal) for c in range(3)]
    out = bytearray()
    for y in range(h):
        for x in range(w):
            k = (x * 3 + y * 5 + i) % npal
            out += bytes(pal[3 * k : 3 * k + 3])
    return w, h, bytes(out)


def _g711_expand(code: int, law: str) -> int:
    """ITU-T G.711 expansion, re-stated straight from the segment
    arithmetic (the kernel builds 256-entry tables; this recomputes
    each code from the piecewise formula — different code shape)."""
    if law == "ulaw":
        u = 255 - code  # one's complement
        seg, mant, neg = (u >> 4) & 7, u & 15, bool(u & 0x80)
        val = ((2 * mant + 33) << seg) * 4 - 132
        return -val if neg else val
    a = code ^ 0x55
    seg, mant, pos = (a >> 4) & 7, a & 15, bool(a & 0x80)
    if seg == 0:
        val = 16 * mant + 8
    else:
        val = (16 * mant + 264) * (1 << (seg - 1))
    return val if pos else -val


def _audio_spec(i: int) -> tuple[int, list[int]]:
    j = i // 3
    n = 40 + (i * 13) % 160
    if j % 7 == 6:  # G.711 slice: codes from the formula, expanded here
        law = ["ulaw", "alaw"][j % 2]
        return 8000, [
            _g711_expand((j * 13 + k * 7) % 256, law) for k in range(n)
        ]
    rate = [8000, 16000, 44100][j % 3]  # j-keyed: see media_audio
    samples = [
        (((k * 997 + i * 6151) % 4001) - 2000) * (8 if k % 2 else -8)
        for k in range(n)
    ]
    return rate, samples


def _lattice(i: int) -> bytes:
    return bytes((i * 7 + j) % 251 for j in range(64 + i))


def _stub_feature(p: bytes) -> list[float]:
    feat = []
    for d in range(16):
        dig = hashlib.blake2b(
            p, digest_size=8, person=d.to_bytes(8, "little")
        ).digest()
        k = int.from_bytes(dig, "little", signed=True) % 2_000_000
        feat.append(k / 1e6 - 1.0)
    return feat


# ── independent feature math (different coding, same integer sums) ───────────


def _image_feat(w: int, h: int, ch: int, px: bytes) -> list[float]:
    tot = len(px)
    mean = sum(px) / tot
    var = max(0.0, sum(v * v for v in px) / tot - mean * mean)
    cm = [sum(px[c::ch]) / (w * h) / 255.0 if c < ch else 0.0 for c in range(4)]
    hist = [sum(1 for v in px if v >> 6 == b) / tot for b in range(4)]
    return [
        _r6(math.log1p(w) / 16), _r6(math.log1p(h) / 16), ch / 4,
        _r6(min(w / h, 16.0) / 8), _r6(mean / 255.0),
        _r6(math.sqrt(var) / 255.0), *map(_r6, cm), *map(_r6, hist),
        _r6(min(px) / 255.0), _r6(max(px) / 255.0),
    ]


def _audio_feat(rate: int, samples: list[int]) -> list[float]:
    n = len(samples)
    seg = []
    k = (n + 7) // 8
    for j in range(8):
        part = samples[j * k : (j + 1) * k]
        seg.append(
            math.sqrt(sum(x * x for x in part) / len(part)) / 32768.0
            if part else 0.0
        )
    zc = sum(
        1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0)
    )
    return [
        _r6(math.log1p(rate) / 16), 1 / 4, _r6(math.log1p(n) / 16),
        _r6(sum(samples) / n / 32768.0),
        _r6(math.sqrt(sum(x * x for x in samples) / n) / 32768.0),
        _r6(min(samples) / 32768.0), _r6(max(samples) / 32768.0),
        _r6(zc / (n - 1)), *map(_r6, seg),
    ]


def _video_spec(i: int) -> tuple[int, int, list[bytes]]:
    """Clip geometry + luma FORMULA for video row i, re-stated from the
    synth spec (make_y4m/y4m_luma_for are never imported for the 'ok'
    planes — the engine must correctly walk real Y4M frame framing,
    chroma-plane sizes included, to reach these bytes)."""
    j = i // 3
    w, h = 4 + 2 * (j % 5), 2 + 2 * (j % 4)
    nf = 1 + j % 5
    lumas = [
        bytes(
            (x * 7 + y * 11 + i * 3 + k * 17) % 256
            for y in range(h)
            for x in range(w)
        )
        for k in range(nf)
    ]
    return w, h, lumas


def _video_feat(w: int, h: int, lumas: list[bytes]) -> list[float]:
    nf = len(lumas)
    allb = b"".join(lumas)
    tot = len(allb)
    mean = sum(allb) / tot
    var = max(0.0, sum(v * v for v in allb) / tot - mean * mean)
    n = w * h
    fsums = [sum(f) for f in lumas]
    motion = 0.0
    if nf > 1:
        motion = sum(
            abs(a - b)
            for k in range(nf - 1)
            for a, b in zip(lumas[k], lumas[k + 1])
        ) / ((nf - 1) * n)
    hist = [sum(1 for v in allb if v >> 6 == b) / tot for b in range(4)]
    tvar = max(
        0.0, sum(fs * fs for fs in fsums) / nf / (n * n)
        - (sum(fsums) / nf / n) ** 2
    )
    return [
        _r6(math.log1p(w) / 16), _r6(math.log1p(h) / 16),
        _r6(math.log1p(nf) / 16), _r6(min(w / h, 16.0) / 8),
        _r6(mean / 255.0), _r6(math.sqrt(var) / 255.0),
        _r6(fsums[0] / n / 255.0), _r6(fsums[-1] / n / 255.0),
        _r6(motion / 255.0), *map(_r6, hist),
        _r6(min(allb) / 255.0), _r6(max(allb) / 255.0),
        _r6(math.sqrt(tvar) / 255.0),
    ]


def _expected_features() -> set[tuple]:
    out = set()
    for i in range(N):
        kind = _kind(i)
        if i % 17 == 5:
            out.add((i, kind, 0, None, None, "null_payload"))
            continue
        if kind == "image":
            if i % 15 == 12:
                p, feat, status = _lattice(i), _stub_feature(_lattice(i)), "stub"
            elif i % 12 == 3:  # JPEG slice (r6): LOSSY — the ok rows are
                # checked with tolerance in the test body; only the
                # deterministic decode_failed row belongs to the exact set
                if i % 72 == 51:
                    from tools.make_media import corrupt_jpeg, media_jpeg

                    p = corrupt_jpeg(media_jpeg(i)[0])
                    out.add((i, kind, len(p), None, None, "decode_failed"))
                continue
            elif i % 12 == 9:  # GIF slice (r6)
                from tools.make_media import media_gif

                p = media_gif(i)[0]
                w, h, px = _gif_pixels(i)
                feat, status = _image_feat(w, h, 3, px), "ok"
            elif i % 18 == 6:
                from tools.make_media import corrupt_image, media_image

                p = corrupt_image(media_image(i)[0])
                out.add((i, kind, len(p), None, None, "decode_failed"))
                continue
            else:
                from tools.make_media import media_image

                p = media_image(i)[0]
                w, h = _image_geom(i)
                ch, px = _image_pixels(i)
                feat, status = _image_feat(w, h, ch, px), "ok"
        elif kind == "audio":
            if i % 45 == 13:
                p, feat, status = _lattice(i), _stub_feature(_lattice(i)), "stub"
            else:
                from tools.make_media import media_audio

                p = media_audio(i)[0]
                rate, samples = _audio_spec(i)
                feat, status = _audio_feat(rate, samples), "ok"
        else:
            if i % 21 == 8:  # opaque container → sanctioned stub
                p, feat, status = _lattice(i), _stub_feature(_lattice(i)), "stub"
            elif (i // 3) % 4 == 1:  # MJPEG AVI slice (lossy)
                if (i // 3) % 16 == 5:  # truncated movi
                    from tools.make_media import corrupt_avi, media_avi

                    p = corrupt_avi(media_avi(i)[0])
                    out.add((i, kind, len(p), None, None, "decode_failed"))
                continue  # ok AVI rows: envelope-checked in the body
            elif i % 33 == 14:  # truncated clip (r6)
                from tools.make_media import corrupt_y4m, media_y4m

                p = corrupt_y4m(media_y4m(i)[0])
                out.add((i, kind, len(p), None, None, "decode_failed"))
                continue
            else:
                from tools.make_media import media_y4m

                p = media_y4m(i)[0]
                w, h, lumas = _video_spec(i)
                feat, status = _video_feat(w, h, lumas), "ok"
        out.add((
            i, kind, len(p),
            hashlib.blake2b(p, digest_size=16).hexdigest(),
            tuple(_f32(f) for f in feat), status,
        ))
    return out


def _jpeg_ok_ids() -> set[int]:
    return {
        i for i in range(N)
        if _kind(i) == "image" and i % 17 != 5 and i % 15 != 12
        and i % 12 == 3 and i % 72 != 51
    }


def _avi_ok_ids() -> set[int]:
    """Video rows carrying a decodable MJPEG AVI (lossy — envelope-
    checked in test bodies instead of the exact sets)."""
    return {
        i for i in range(N)
        if _kind(i) == "video" and i % 17 != 5 and i % 21 != 8
        and (i // 3) % 4 == 1 and (i // 3) % 16 != 5
    }


def _avi_spec(i: int) -> tuple[int, int, list[bytes]]:
    """SOURCE-side luma planes for AVI row i: the BT.601 reduction of
    the pixel formula each JPEG frame was encoded from — re-stated, so
    envelope checks compare against pre-compression truth. Keyed by
    k=j//4 like media_avi (the slice freezes j%4)."""
    k = i // 3 // 4
    w, h = 8 + 8 * (k % 2), 8
    nf = 2 + k % 4
    gray = k % 2 == 0
    lumas = []
    for k in range(nf):
        ch = 1 if gray else 3
        px = bytes(
            (x * 7 + y * 13 + c * 41 + (i + 31 * k) * 29) % 256
            for y in range(h) for x in range(w) for c in range(ch)
        )
        if gray:
            lumas.append(px)
        else:
            lumas.append(bytes(
                (77 * px[3 * t] + 150 * px[3 * t + 1]
                 + 29 * px[3 * t + 2] + 128) >> 8
                for t in range(w * h)
            ))
    return w, h, lumas


def test_media_features_matches_independent_recompute(spark):
    got = {
        (
            r.media_id, r.kind, r.payload_bytes, r.content_hash,
            tuple(r.feature) if r.feature is not None else None,
            r.decode_status,
        )
        for r in media_features(synth_media_df(spark, N)).collect()
    }
    jpeg_ids = _jpeg_ok_ids()
    got_jpeg = {t for t in got if t[0] in jpeg_ids}
    avi_ids = _avi_ok_ids()
    got_avi = {t for t in got if t[0] in avi_ids}
    assert (got - got_jpeg - got_avi) == _expected_features()
    # MJPEG AVI rows (lossy, like the JPEG slice): geometry dims exact,
    # content dims within the quantization envelope of the SOURCE
    # lumas' independently-computed video features
    assert len(got_avi) == len(avi_ids)
    from tools.make_media import media_avi

    for mid, kind, nbytes, chash, feat, status in sorted(got_avi):
        assert status == "ok" and kind == "video"
        p = media_avi(mid)[0]
        assert nbytes == len(p)
        assert chash == hashlib.blake2b(p, digest_size=16).hexdigest()
        w, h, lumas = _avi_spec(mid)
        expect = _video_feat(w, h, lumas)
        assert feat[:4] == tuple(_f32(v) for v in expect[:4])
        assert all(abs(a - b) < 0.25 for a, b in zip(feat[4:], expect[4:]))
    # JPEG is lossy: geometry feature dims are lossless facts of a real
    # decode (exact), content dims must sit within the quantization
    # error envelope of the SOURCE pixels' independently-computed
    # features — a stub or misdecoded payload lands far outside it
    assert len(got_jpeg) == len(jpeg_ids)
    from tools.make_media import media_jpeg, pixels_for

    for mid, kind, nbytes, chash, feat, status in sorted(got_jpeg):
        assert status == "ok" and kind == "image"
        p, w, h = media_jpeg(mid)
        assert nbytes == len(p)
        assert chash == hashlib.blake2b(p, digest_size=16).hexdigest()
        ch = 1 if (mid // 12) % 4 == 1 else 3
        expect = _image_feat(w, h, ch, pixels_for(mid, w, h, ch))
        assert feat[:4] == tuple(_f32(v) for v in expect[:4])
        assert all(abs(a - b) < 0.25 for a, b in zip(feat[4:], expect[4:]))


# ── independent resize (fixed-point spec, different code shape) ──────────────


def _sample_bilinear(px, w, h, ch, x_fixed, y_fixed, c):
    x0, wx = min(x_fixed >> 16, w - 1), x_fixed & 0xFFFF
    y0, wy = min(y_fixed >> 16, h - 1), y_fixed & 0xFFFF
    x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)

    def at(xx, yy):
        return px[(yy * w + xx) * ch + c]

    top = at(x0, y0) * (0x10000 - wx) + at(x1, y0) * wx
    bot = at(x0, y1) * (0x10000 - wx) + at(x1, y1) * wx
    return min(255, (top * (0x10000 - wy) + bot * wy + (1 << 31)) >> 32)


def _indep_resize(px, w, h, ch, tw, th) -> bytes:
    fx, fy = (w << 16) // tw, (h << 16) // th
    out = bytearray()
    for ty in range(th):
        sy = max(0, ((ty * 2 + 1) * fy - (1 << 16)) >> 1)
        for tx in range(tw):
            sx = max(0, ((tx * 2 + 1) * fx - (1 << 16)) >> 1)
            for c in range(ch):
                out.append(_sample_bilinear(px, w, h, ch, sx, sy, c))
    return bytes(out)


def _indep_png(w, h, ch, px) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[ch], 0, 0, 0)
    raw = b"".join(
        b"\x00" + px[y * w * ch : (y + 1) * w * ch] for y in range(h)
    )

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def _expected_resize(tw: int = 224, th: int = 224) -> set[tuple]:
    out = set()
    for i in range(N):
        if _kind(i) != "image":
            continue
        if i % 17 == 5:
            out.add((i, None, None, 0, None, "null_payload"))
            continue
        if i % 15 == 12:  # stub slice: meta dims + blake2b body
            w, h = 64 + i % 512, 48 + i % 256
            scale = min(tw / w, th / h)
            ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
            p = _lattice(i)
            seed = hashlib.blake2b(
                p, digest_size=32,
                person=struct.pack("<i", ow) + struct.pack("<i", oh),
            ).digest()
            size = max(16, ow * oh // 8)
            body = (seed * (size // 32 + 1))[:size]
            out.add((
                i, ow, oh, len(body),
                hashlib.blake2b(body, digest_size=16).hexdigest(), "stub",
            ))
            continue
        if i % 12 == 3:  # JPEG slice (r6): lossy — ok rows checked in
            # the test body; only the deterministic failure row is exact
            if i % 72 == 51:
                out.add((i, None, None, 0, None, "decode_failed"))
            continue
        if i % 12 == 9:  # GIF slice (r6): own geometry, RGB expansion
            w, h, px = _gif_pixels(i)
            scale = min(tw / w, th / h)
            ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
            body = _indep_png(ow, oh, 3, _indep_resize(px, w, h, 3, ow, oh))
            out.add((
                i, ow, oh, len(body),
                hashlib.blake2b(body, digest_size=16).hexdigest(), "ok",
            ))
            continue
        w, h = _image_geom(i)
        scale = min(tw / w, th / h)
        ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
        if i % 18 == 6:
            out.add((i, None, None, 0, None, "decode_failed"))
            continue
        ch, px = _image_pixels(i)
        body = _indep_png(ow, oh, ch, _indep_resize(px, w, h, ch, ow, oh))
        out.add((
            i, ow, oh, len(body),
            hashlib.blake2b(body, digest_size=16).hexdigest(), "ok",
        ))
    return out


def test_image_resize_matches_independent_recompute(spark):
    got = {
        tuple(r) for r in image_resize(synth_media_df(spark, N)).collect()
    }
    jpeg_ids = _jpeg_ok_ids()
    got_jpeg = {t for t in got if t[0] in jpeg_ids}
    assert (got - got_jpeg) == _expected_resize()
    assert len(got_jpeg) == len(jpeg_ids)
    # JPEG rows: decoded pixels come from the kernel (lossy source — no
    # formula can predict them), but the RESIZE and PNG RE-ENCODE stages
    # are recomputed with this file's independent implementations and
    # the output hash must match exactly — a transposed resize or wrong
    # re-encode bytes fail here (r6 review: the first version only
    # checked hash LENGTH)
    from pdf_to_text_spark.kernels.media import decode_jpeg
    from tools.make_media import media_jpeg

    for mid, ow, oh, nbytes, ohash, status in sorted(got_jpeg):
        p, w, h = media_jpeg(mid)
        scale = min(224 / w, 224 / h)
        assert (ow, oh) == (max(1, int(w * scale)), max(1, int(h * scale)))
        assert status == "ok"
        dw, dh, ch, px = decode_jpeg(p)
        assert (dw, dh) == (w, h)
        body = _indep_png(ow, oh, ch, _indep_resize(px, w, h, ch, ow, oh))
        assert nbytes == len(body)
        assert ohash == hashlib.blake2b(body, digest_size=16).hexdigest()


def test_audio_resample_plan_matches_independent_recompute(spark):
    got = {tuple(r) for r in audio_resample_plan(synth_media_df(spark, N)).collect()}
    expect = set()
    for i in range(N):
        if _kind(i) != "audio":
            continue
        rate = (
            16000 if i % 17 == 5 or i % 45 == 13
            else _audio_spec(i)[0]
        )
        mode = (
            "copy" if rate == 16000
            else "downsample" if rate > 16000 else "upsample"
        )
        expect.add((i, rate, 16000, mode))
    assert got == expect
    # no_rate branch through the same operator on a hand-built table
    schema = synth_media_df(spark, 1).schema
    rows = [(0, "audio", None, (None, None, None, None))]
    got2 = {
        tuple(r)
        for r in audio_resample_plan(
            spark.createDataFrame(rows, schema=schema)
        ).collect()
    }
    assert got2 == {(0, None, 16000, "no_rate")}


def _indep_resample(samples: list[int], src: int, dst: int) -> list[int]:
    """Mono fixed-point linear resample, re-stated from the 16.16 spec
    with a different code shape (list comprehension over precomputed
    phase positions instead of the kernel's accumulator loop)."""
    if src == dst:
        return list(samples)
    n = len(samples)
    out_n = (n * dst + src - 1) // src
    step = (src << 16) // dst
    def at(i):
        return samples[min(i, n - 1)]
    return [
        at(p >> 16) + (((at((p >> 16) + 1) - at(p >> 16)) * (p & 0xFFFF)) >> 16)
        for p in (j * step for j in range(out_n))
    ]


def _indep_wav(rate: int, samples: list[int]) -> bytes:
    frames = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(frames)) + frames)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_audio_resample_matches_independent_recompute(spark):
    """The EXECUTING resample stage (r6): expected output bytes derive
    from the sample FORMULA + an independently-coded resampler + WAV
    writer — the engine must parse real WAVs, resample with the exact
    integer phase math, and re-encode to match the hash."""
    got = {tuple(r) for r in audio_resample(synth_media_df(spark, N)).collect()}
    expect = set()
    for i in range(N):
        if _kind(i) != "audio":
            continue
        if i % 17 == 5:
            expect.add((i, None, 16000, None, 0, None, "null_payload"))
            continue
        if i % 45 == 13:
            p = _lattice(i)
            seed = hashlib.blake2b(
                p, digest_size=32, person=struct.pack("<i", 16000)
            ).digest()
            size = max(16, len(p) // 4)
            body = (seed * (size // 32 + 1))[:size]
            expect.add((
                i, None, 16000, None, len(body),
                hashlib.blake2b(body, digest_size=16).hexdigest(), "stub",
            ))
            continue
        rate, samples = _audio_spec(i)
        res = _indep_resample(samples, rate, 16000)
        body = _indep_wav(16000, res)
        expect.add((
            i, rate, 16000, len(res), len(body),
            hashlib.blake2b(body, digest_size=16).hexdigest(), "ok",
        ))
    assert got == expect


def _video_meta_frames(i: int) -> int:
    """meta.n_frames for video row i per the synth spec: opaque/null
    rows keep the fake 30*(1+i%10); real/corrupt Y4M and AVI rows carry
    the writer's true frame count."""
    if i % 17 == 5 or i % 21 == 8:
        return 30 * (1 + i % 10)
    if (i // 3) % 4 == 1:  # MJPEG AVI slice (k=j//4-keyed)
        return 2 + (i // 3 // 4) % 4
    return 1 + (i // 3) % 5


def test_frame_sample_plan_matches_independent_recompute(spark):
    got = {tuple(r) for r in frame_sample_plan(synth_media_df(spark, N)).collect()}
    expect = set()
    for i in range(N):
        if _kind(i) != "video":
            continue
        expect.update((i, idx) for idx in range(0, _video_meta_frames(i), 10))
    assert got == expect


def test_frame_sample_matches_independent_recompute(spark):
    """The EXECUTING sampler (r6): 'ok' rows carry each sampled frame's
    REAL luma plane (size/hash/mean recomputed here from the luma
    formula — the engine must walk real frame framing to match), stub
    rows re-state the (payload, idx)-keyed blake2b, and the two
    terminal classes surface per-row."""
    rows = frame_sample(synth_media_df(spark, N), every_n=2).collect()
    avi_ids = _avi_ok_ids()
    got = {tuple(r) for r in rows if r.media_id not in avi_ids}
    # MJPEG AVI rows (lossy): indices/geometry exact, per-frame mean
    # luma within the quantization envelope of the source formula
    got_avi: dict = {}
    for r in rows:
        if r.media_id in avi_ids:
            got_avi.setdefault(r.media_id, []).append(r)
    assert set(got_avi) == avi_ids
    for mid, frs in got_avi.items():
        w, h, lumas = _avi_spec(mid)
        assert {r.frame_idx for r in frs} == set(range(0, len(lumas), 2))
        for r in frs:
            src = lumas[r.frame_idx]
            assert (r.width, r.height, r.frame_bytes) == (w, h, w * h)
            assert r.frame_status == "ok" and len(r.frame_hash) == 32
            assert abs(r.mean_luma - sum(src) / len(src)) < 8.0
    expect = set()
    for i in range(N):
        if _kind(i) != "video" or i in avi_ids:
            continue
        # branch order mirrors synth_media_rows: null, stub, AVI, Y4M
        # (the stub slice shadows the AVI slice at e.g. i=29)
        if i % 17 == 5:
            expect.add((i, None, None, None, 0, None, None, "null_payload"))
        elif i % 21 == 8:
            pdig = hashlib.blake2b(_lattice(i), digest_size=16).digest()
            for idx in range(0, _video_meta_frames(i), 2):
                dig = hashlib.blake2b(
                    pdig, digest_size=16, person=idx.to_bytes(8, "little")
                ).hexdigest()
                expect.add((i, idx, None, None, 0, dig, None, "stub"))
        elif (i // 3) % 4 == 1:  # corrupt-AVI rows (ok ones handled above)
            expect.add((i, None, None, None, 0, None, None, "decode_failed"))
        elif i % 33 == 14:
            expect.add((i, None, None, None, 0, None, None, "decode_failed"))
        else:
            w, h, lumas = _video_spec(i)
            for idx in range(0, len(lumas), 2):
                luma = lumas[idx]
                expect.add((
                    i, idx, w, h, len(luma),
                    hashlib.blake2b(luma, digest_size=16).hexdigest(),
                    sum(luma) / len(luma), "ok",
                ))
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
    statuses = {k: v for k, v in _expected_statuses().items()}
    assert set(got) == set(statuses.items())


def _expected_statuses() -> dict[int, str]:
    out = {}
    for i in range(N):
        kind = _kind(i)
        if i % 17 == 5:
            out[i] = "null_payload"
        elif kind == "image":
            out[i] = (
                "stub" if i % 15 == 12
                else ("decode_failed" if i % 72 == 51 else "ok")
                if i % 12 == 3
                else "decode_failed" if i % 18 == 6 else "ok"
            )
        elif kind == "audio":
            out[i] = "stub" if i % 45 == 13 else "ok"
        else:
            j = i // 3
            out[i] = (
                "stub" if i % 21 == 8
                else ("decode_failed" if j % 16 == 5 else "ok")
                if j % 4 == 1
                else "decode_failed" if i % 33 == 14 else "ok"
            )
    return out


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
    assert (row.out_width, row.out_height, row.resize_status) == (ow, oh, "stub")


def test_resize_and_resample_thread_tiny_byte_cap(spark):
    """r6 review: image_resize and audio_resample hard-passed the default
    cap, so the only documented override mechanism (threading — a
    driver-side monkeypatch never reaches executors) did not exist for
    two of the three stages. Same contract as media_features: a
    below-one-row cap must neither drop nor duplicate rows."""
    media = synth_media_df(spark, N)
    base_rz = [tuple(r) for r in image_resize(media).collect()]
    tiny_rz = [tuple(r) for r in image_resize(media, batch_bytes=1).collect()]
    assert sorted(base_rz) == sorted(tiny_rz) and len(tiny_rz) > 0
    base_rs = [tuple(r) for r in audio_resample(media).collect()]
    tiny_rs = [tuple(r) for r in audio_resample(media, batch_bytes=1).collect()]
    assert sorted(base_rs) == sorted(tiny_rs) and len(tiny_rs) > 0


def test_audio_codec_returning_non_bytes_degrades_per_row(spark):
    """r6 review: a custom resample callable returning a non-bytes
    payload crashed the TASK at the blake2b call outside the try —
    the seam contract says it must cost a decode_failed row."""
    def bad_codec(payload, dst_rate):
        return None, 44100, 10, "ok"   # non-bytes payload

    media = synth_media_df(spark, N).where("kind = 'audio'")
    rows = audio_resample(media, resample=bad_codec).collect()
    assert len(rows) > 0
    # the synth corpus includes null-payload audio rows, which keep
    # their own status; every row that REACHED the codec must degrade
    statuses = {r.resample_status for r in rows}
    assert statuses == {"decode_failed", "null_payload"}


def test_frame_sample_stub_fanout_is_capped(spark):
    """meta.n_frames is untrusted row data: a crafted 2e9 frame count on
    a non-decodable container must clamp to the decode path's frame cap
    instead of driving an effectively unbounded per-row loop (r6
    review)."""
    from pdf_to_text_spark.kernels.media import MAX_FRAMES

    schema = synth_media_df(spark, 1).schema
    df = spark.createDataFrame(
        [(0, "video", b"not-a-container", (None, None, None, 2_000_000_000))],
        schema=schema,
    )
    rows = frame_sample(df, every_n=1000).collect()
    assert len(rows) == (MAX_FRAMES + 999) // 1000
    assert {r.frame_status for r in rows} == {"stub"}


def test_frame_sample_rejects_nonpositive_step(spark):
    """every_n < 1 must fail at PLAN BUILD: inside the executor
    generator a zero range step is a task failure on the stub path and
    a misleading per-row 'decode_failed' on the Y4M path."""
    media = synth_media_df(spark, 6)
    for bad in (0, -3):
        with pytest.raises(ValueError, match="every_n"):
            frame_sample(media, every_n=bad)
