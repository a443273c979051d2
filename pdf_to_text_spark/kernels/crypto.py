"""Pure-stdlib crypto primitives for the PDF standard security handler.

Implements exactly what empty-user-password PDF decryption needs
(ISO 32000-1 §7.6.2-7.6.3; the reference gets this free from pdfjs-dist,
reference package.json:8-9, which transparently decrypts RC4/AES-CBC
standard-security documents with an empty user password — a large share
of crawled "encrypted" PDFs):

  * RC4 (V1/V2 revisions 2-3) — symmetric, same function both ways
  * AES-128 (V4 /AESV2) — forward cipher (fixture writer) and inverse
    cipher (kernel), CBC mode with the 16-byte prepended IV and
    PKCS#5/#7 padding
  * the Algorithm-2 file-key derivation, Algorithm-3 /O computation,
    Algorithm-4/5 /U computation+verification, and the Algorithm-1
    per-object key

Both directions are pinned against published test vectors
(FIPS-197 appendix C.1 for AES; the well-known RC4 "Key"/"Plaintext"
vectors) in tests/test_pdf_kernel.py, so the kernel and the fixture
writer cannot share a hidden bug in the block cipher itself.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = [
    "rc4",
    "aes128_cbc_decrypt",
    "aes128_cbc_encrypt",
    "aes128_decrypt_block",
    "aes128_encrypt_block",
    "PASSWORD_PAD",
    "file_key",
    "compute_o",
    "compute_u",
    "verify_user_password",
    "object_key",
]

# §7.6.3.3 Algorithm 2 padding string
PASSWORD_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ── AES-128 (FIPS-197), table-driven ─────────────────────────────────────────


def _gf_tables():
    """exp/log tables over GF(2^8) with generator 3 → S-box + inverse."""
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
        x &= 0xFF
    for i in range(255, 512):
        exp[i] = exp[i - 255]
    sbox = [0] * 256
    for i in range(256):
        inv = 0 if i == 0 else exp[255 - log[i]]
        b = inv
        s = inv
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            s ^= b
        sbox[i] = s ^ 0x63
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i

    def mul(a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        return exp[log[a] + log[b]]

    return sbox, inv_sbox, mul


_SBOX, _INV_SBOX, _GMUL = _gf_tables()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> list[list[int]]:
    """AES-128 key schedule → 11 round keys as 16-byte int lists."""
    if len(key) != 16:
        raise ValueError("AES-128 key must be 16 bytes")
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(11)]


def _mix_single(col: list[int], m: tuple[int, int, int, int]) -> list[int]:
    a, b, c, d = col
    m0, m1, m2, m3 = m
    return [
        _GMUL(a, m0) ^ _GMUL(b, m1) ^ _GMUL(c, m2) ^ _GMUL(d, m3),
        _GMUL(a, m3) ^ _GMUL(b, m0) ^ _GMUL(c, m1) ^ _GMUL(d, m2),
        _GMUL(a, m2) ^ _GMUL(b, m3) ^ _GMUL(c, m0) ^ _GMUL(d, m1),
        _GMUL(a, m1) ^ _GMUL(b, m2) ^ _GMUL(c, m3) ^ _GMUL(d, m0),
    ]


def _crypt_block(block: bytes, rks: list[list[int]], inverse: bool) -> bytes:
    # state is column-major: byte i of the block is state[i]
    s = [b ^ k for b, k in zip(block, rks[0] if not inverse else rks[10])]
    box = _INV_SBOX if inverse else _SBOX
    mix = (0x0E, 0x0B, 0x0D, 0x09) if inverse else (0x02, 0x03, 0x01, 0x01)
    rounds = range(1, 10)
    for rnd in rounds:
        if inverse:
            # InvShiftRows then InvSubBytes
            t = [0] * 16
            for c in range(4):
                for r in range(4):
                    t[((c + r) % 4) * 4 + r] = s[c * 4 + r]
            s = [box[b] for b in t]
            s = [b ^ k for b, k in zip(s, rks[10 - rnd])]
            out = []
            for c in range(4):
                out += _mix_single(s[4 * c : 4 * c + 4], mix)
            s = out
        else:
            s = [box[b] for b in s]
            t = [0] * 16
            for c in range(4):
                for r in range(4):
                    t[c * 4 + r] = s[((c + r) % 4) * 4 + r]
            out = []
            for c in range(4):
                out += _mix_single(t[4 * c : 4 * c + 4], mix)
            s = [b ^ k for b, k in zip(out, rks[rnd])]
    if inverse:
        t = [0] * 16
        for c in range(4):
            for r in range(4):
                t[((c + r) % 4) * 4 + r] = s[c * 4 + r]
        s = [box[b] for b in t]
        s = [b ^ k for b, k in zip(s, rks[0])]
    else:
        s = [box[b] for b in s]
        t = [0] * 16
        for c in range(4):
            for r in range(4):
                t[c * 4 + r] = s[((c + r) % 4) * 4 + r]
        s = [b ^ k for b, k in zip(t, rks[10])]
    return bytes(s)


def aes128_encrypt_block(key: bytes, block: bytes) -> bytes:
    return _crypt_block(block, _expand_key(key), inverse=False)


def aes128_decrypt_block(key: bytes, block: bytes) -> bytes:
    return _crypt_block(block, _expand_key(key), inverse=True)


def aes128_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """PKCS#7-pad, CBC-encrypt, and PREPEND the IV (the PDF layout)."""
    rks = _expand_key(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _crypt_block(blk, rks, inverse=False)
        out += prev
    return bytes(out)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 stream layout: first 16 bytes are the IV; strip PKCS#7
    padding. Malformed input raises ValueError (callers map to
    PDFParseError)."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("AES-CBC: ciphertext not a whole number of blocks")
    rks = _expand_key(key)
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        blk = data[i : i + 16]
        dec = _crypt_block(blk, rks, inverse=True)
        out += bytes(a ^ b for a, b in zip(dec, prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("AES-CBC: bad padding")
    return bytes(out[:-pad])


# ── standard security handler algorithms (§7.6.3) ───────────────────────────


def _padded(password: bytes) -> bytes:
    return (password + PASSWORD_PAD)[:32]


def file_key(
    password: bytes,
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    length_bits: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key."""
    md = hashlib.md5()
    md.update(_padded(password))
    md.update(o[:32])
    md.update(struct.pack("<I", p & 0xFFFFFFFF))
    md.update(id0)
    if r >= 4 and not encrypt_metadata:
        md.update(b"\xff\xff\xff\xff")
    key = md.digest()
    n = 5 if r == 2 else length_bits // 8
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int, length_bits: int) -> bytes:
    """Algorithm 3: the /O (owner password) entry."""
    h = hashlib.md5(_padded(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    n = 5 if r == 2 else length_bits // 8
    rc4key = h[:n]
    o = rc4(rc4key, _padded(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rc4key), o)
    return o


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / Algorithm 5 (R≥3): the /U entry."""
    if r == 2:
        return rc4(key, PASSWORD_PAD)
    h = hashlib.md5(PASSWORD_PAD + id0).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16  # arbitrary 16-byte pad per spec


def verify_user_password(key: bytes, u: bytes, id0: bytes, r: int) -> bool:
    expect = compute_u(key, id0, r)
    return u[:16] == expect[:16] if r >= 3 else u[:32] == expect[:32]


def object_key(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: the per-object RC4/AES key.

    ISO 32000-1 appends the LOW-ORDER 3 bytes of the object number and 2
    of the generation — mask rather than to_bytes so a >2^24 object
    number (or lenient-parsed generation) derives the spec key instead of
    raising OverflowError (r3 review)."""
    ext = (num & 0xFFFFFF).to_bytes(3, "little") + (gen & 0xFFFF).to_bytes(2, "little")
    if aes:
        ext += b"sAlT"
    return hashlib.md5(key + ext).digest()[: min(len(key) + 5, 16)]
