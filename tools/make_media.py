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
        # fail loudly like the 16-bit struct.pack path: silent &0xFF
        # wrapping would pin garbage expected data in a fixture (r6
        # review)
        bad = [s for s in samples if not -128 <= s <= 127]
        if bad:
            raise ValueError(f"8-bit samples out of range: {bad[:3]}…")
        frames = bytes(s + 128 for s in samples)
    else:
        raise ValueError("bits must be 8 or 16")
    block = nch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames
    if len(frames) & 1:
        body += b"\x00"  # RIFF word alignment
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _gif_lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Greedy longest-match GIF LZW (the writer is a COMPRESSOR, so it
    shares no code shape with the kernel's decompressor). LSB-first bit
    packing; width grows with the table exactly as the spec's decoder
    mirror requires; CLEAR re-emitted near the 12-bit ceiling."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    prev = b""
    for k in indices:
        cur = prev + bytes([k])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        # STRICTLY greater (giflib convention): the decoder's table runs
        # one entry behind the encoder's (it can't learn a pair's entry
        # until the next code arrives), so the width bump must lag one
        # insertion too or the streams desynchronize
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            emit(clear)
            table = {bytes([j]): j for j in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([k])
    if prev:
        emit(table[prev])
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(
    w: int, h: int, indices: bytes, palette: bytes, *,
    interlace: bool = False, local_palette: bool = False,
    comment: bytes | None = None,
) -> bytes:
    """GIF89a with one image. `palette` is 3*2^n bytes (n in 1..8);
    `indices` are w*h palette indices in row-major (pre-interlace)
    order. `interlace` reorders rows into the 4-pass layout;
    `local_palette` moves the table onto the image descriptor;
    `comment` adds an extension block (readers must skip it)."""
    n_entries = len(palette) // 3
    size_bits = max(1, (n_entries - 1).bit_length())
    if len(palette) != 3 * (1 << size_bits):
        raise ValueError("palette length must be 3 * a power of two")
    min_code = max(2, size_bits)
    out = bytearray(b"GIF89a")
    gpacked = 0 if local_palette else (0x80 | (size_bits - 1))
    out += struct.pack("<HHBBB", w, h, gpacked, 0, 0)
    if not local_palette:
        out += palette
    if comment is not None:
        out += b"\x21\xfe" + bytes([len(comment)]) + comment + b"\x00"
    ipacked = (0x80 | (size_bits - 1)) if local_palette else 0
    if interlace:
        ipacked |= 0x40
        rows = [indices[y * w : (y + 1) * w] for y in range(h)]
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        indices = b"".join(rows[y] for y in order)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local_palette:
        out += palette
    out += bytes([min_code])
    lzw = _gif_lzw_encode(min_code, indices)
    for off in range(0, len(lzw), 255):
        part = lzw[off : off + 255]
        out += bytes([len(part)]) + part
    out += b"\x00\x3b"
    return bytes(out)


def gif_palette_for(i: int, n: int = 16) -> bytes:
    """Deterministic 3n-byte palette (n a power of two)."""
    return bytes(((k * 11 + c * 59 + i * 37) % 256)
                 for k in range(n) for c in range(3))


def gif_indices_for(i: int, w: int, h: int, n: int = 16) -> bytes:
    """Deterministic palette indices — same lattice idea as pixels_for."""
    return bytes(
        ((x * 3 + y * 5 + i) % n) for y in range(h) for x in range(w)
    )


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


def media_gif(i: int) -> tuple[bytes, int, int]:
    """(gif_bytes, w, h) for synthetic GIF row i — palette size,
    interlace, local-vs-global table and comment blocks all vary.
    Variation is keyed by i//12, NOT i: the corpus slice is i%12==9,
    under which every i-keyed modulus ≤12 is CONSTANT (i%2==1, i%4==1,
    i%3==0 — r6 review #4: the gate would only ever see one GIF
    shape)."""
    w, h = 7 + i % 13, 5 + i % 9
    j = i // 12
    npal = [4, 16, 8][j % 3]
    pal = gif_palette_for(i, npal)
    idx = gif_indices_for(i, w, h, npal)
    return (
        make_gif(
            w, h, idx, pal,
            interlace=j % 2 == 1, local_palette=j % 4 < 2,
            comment=b"c%d" % i if j % 5 == 0 else None,
        ),
        w, h,
    )


def media_audio(i: int) -> tuple[bytes, int]:
    """(wav_bytes, rate) for synthetic audio row i."""
    rate = [8000, 16000, 44100][i % 3]
    n = 40 + (i * 13) % 160
    return make_wav(rate, 1, samples_for(i, n)), rate


def corrupt_png(data: bytes) -> bytes:
    """Flip one byte inside the IDAT payload — magic and chunk walk stay
    intact, the inflate fails: the recognized-but-malformed class that
    must surface decode_status='decode_failed' (never 'stub')."""
    idat = data.find(b"IDAT")
    if idat < 0:
        # find()==-1 would flip signature byte 7 and silently invert the
        # fixture into the 'stub' class this helper promises never to
        # produce (r6 review)
        raise ValueError("corrupt_png: input has no IDAT chunk")
    at = idat + 8
    return data[:at] + bytes([data[at] ^ 0xFF]) + data[at + 1 :]
