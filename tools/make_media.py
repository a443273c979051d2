"""Writer-side media fixture generators (round 6).

Independent ENCODER implementations for the decode kernels in
pdf_to_text_spark/kernels/media.py — same division of labor as
tools/make_pdf.py vs kernels/pdf.py: the writer is implemented from
the spec separately so the tests are not the parser checking itself.
The PNG writer deliberately cycles through ALL FIVE scanline filter
types (the engine's filter-0-only encoder would never exercise the
reader's Sub/Up/Average/Paeth paths).

Pixel and sample content are PURE FUNCTIONS of (index, geometry), so
tests and VALUES oracles can compute expected features from the
formula alone — without ever invoking the decoder under test.
"""

from __future__ import annotations

import struct
import zlib


def pixels_for(i: int, w: int, h: int, ch: int) -> bytes:
    """Deterministic pixel lattice — gradients + index-keyed phase, so
    every image differs and every channel has distinct stats."""
    out = bytearray(w * h * ch)
    p = 0
    for y in range(h):
        for x in range(w):
            for c in range(ch):
                out[p] = (x * 7 + y * 13 + c * 41 + i * 29) % 256
                p += 1
    return bytes(out)


def samples_for(i: int, n: int) -> list[int]:
    """Deterministic 16-bit sample train: a ramp × alternating envelope
    with an index-keyed offset (sign changes exercise zero-crossings)."""
    return [
        (((j * 997 + i * 6151) % 4001) - 2000) * (8 if j % 2 else -8)
        for j in range(n)
    ]


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth_predict(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def make_png(
    w: int, h: int, ch: int, pixels: bytes, *, filter_cycle: bool = True,
    palette: bytes | None = None,
) -> bytes:
    """Encode 8-bit pixels as a PNG whose scanlines cycle filter types
    0-4 (y % 5), forcing a reader to implement every unfilter branch.
    With `palette`, pixels are 1-channel indices and a PLTE is written
    (color type 3)."""
    if palette is not None:
        color_type, bpp = 3, 1
    else:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        bpp = ch
    stride = w * bpp
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = pixels[y * stride : (y + 1) * stride]
        f = (y % 5) if filter_cycle else 0
        raw.append(f)
        if f == 0:
            raw += line
        elif f == 1:
            raw += bytes(
                (line[x] - (line[x - bpp] if x >= bpp else 0)) & 0xFF
                for x in range(stride)
            )
        elif f == 2:
            raw += bytes((line[x] - prev[x]) & 0xFF for x in range(stride))
        elif f == 3:
            raw += bytes(
                (line[x] - (((line[x - bpp] if x >= bpp else 0) + prev[x]) >> 1))
                & 0xFF
                for x in range(stride)
            )
        else:
            raw += bytes(
                (
                    line[x]
                    - _paeth_predict(
                        line[x - bpp] if x >= bpp else 0,
                        prev[x],
                        prev[x - bpp] if x >= bpp else 0,
                    )
                )
                & 0xFF
                for x in range(stride)
            )
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette)
    return (
        out
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def make_wav(rate: int, nch: int, samples: list[int], *, bits: int = 16) -> bytes:
    if bits == 16:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    elif bits == 8:
        frames = bytes((s + 128) & 0xFF for s in samples)
    else:
        raise ValueError("bits must be 8 or 16")
    block = nch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames
    if len(frames) & 1:
        body += b"\x00"  # RIFF word alignment
    return b"RIFF" + struct.pack("<I", len(body)) + body


def media_image(i: int) -> tuple[bytes, int, int]:
    """(png_bytes, w, h) for synthetic image row i — geometry varies
    with i; a slice of rows is palette-coded."""
    w, h = 8 + i % 17, 6 + i % 11
    if i % 9 == 3:  # palette slice
        palette = bytes((k * 5 + i) % 256 for k in range(48))
        idx = bytes(
            ((x * 3 + y * 5 + i) % 16) for y in range(h) for x in range(w)
        )
        return make_png(w, h, 1, idx, palette=palette), w, h
    ch = [1, 3, 4, 2][i % 4]
    return make_png(w, h, ch, pixels_for(i, w, h, ch)), w, h


def media_audio(i: int) -> tuple[bytes, int]:
    """(wav_bytes, rate) for synthetic audio row i."""
    rate = [8000, 16000, 44100][i % 3]
    n = 40 + (i * 13) % 160
    return make_wav(rate, 1, samples_for(i, n)), rate


def corrupt_png(data: bytes) -> bytes:
    """Flip one byte inside the IDAT payload — magic and chunk walk stay
    intact, the inflate fails: the recognized-but-malformed class that
    must surface decode_status='decode_failed' (never 'stub')."""
    at = data.find(b"IDAT") + 8
    return data[:at] + bytes([data[at] ^ 0xFF]) + data[at + 1 :]
