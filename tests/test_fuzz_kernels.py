"""Adversarial-input fuzzing: kernels must never hang or crash a task —
any garbage either parses or raises the typed parse error (SURVEY §2 #18:
'a bad document must never kill a task')."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_to_text_spark.kernels.html import extract_html_text
from pdf_to_text_spark.kernels.pdf import PDFParseError, extract_pdf_text
from tools.make_pdf import simple_pdf


@settings(max_examples=300, deadline=2000)
@given(st.binary(max_size=2048))
def test_pdf_random_bytes_never_crash(data):
    try:
        text, n = extract_pdf_text(data)
        assert isinstance(text, str) and n >= 1
    except PDFParseError:
        pass


@settings(max_examples=150, deadline=2000)
@given(st.binary(max_size=512), st.integers(0, 3))
def test_pdf_mutated_valid_doc(junk, where):
    """Splice junk into a valid PDF at structural boundaries."""
    good = simple_pdf([["hello fuzz world", "line two"]])
    cut = [len(good) // 4, len(good) // 2, 3 * len(good) // 4, len(good) - 20][where]
    mutated = good[:cut] + junk + good[cut:]
    try:
        text, _ = extract_pdf_text(mutated)
        assert isinstance(text, str)
    except PDFParseError:
        pass


@settings(max_examples=300, deadline=2000)
@given(st.text(max_size=2048))
def test_html_any_text_never_crashes(html):
    out = extract_html_text(html)
    assert isinstance(out, str)
    assert not out.endswith("\n")


@settings(max_examples=200, deadline=2000)
@given(st.binary(max_size=2048))
def test_html_random_bytes_never_crash(data):
    assert isinstance(extract_html_text(data), str)


@settings(max_examples=100, deadline=2000)
@given(
    st.lists(
        st.sampled_from(
            ["<div>", "</div>", "<p>", "</p>", "<a href='x'>", "</a>",
             "<script>", "</script>", "<br>", "some words here ", "&amp;", "<",
             ">", "<!---->", "<template>", "</template>"]
        ),
        max_size=60,
    )
)
def test_html_tag_soup(parts):
    out = extract_html_text("".join(parts))
    assert isinstance(out, str)
    assert "SHOULD" not in out  # nothing hallucinated


@given(
    st.binary(min_size=0, max_size=400),
    st.binary(min_size=16, max_size=16),
    st.binary(min_size=16, max_size=16),
)
def test_aes_cbc_roundtrip_and_tamper(data, key, iv):
    """CBC encrypt→decrypt is identity for any payload/key/iv; flipping
    any ciphertext byte must raise or change the plaintext, never return
    the original silently."""
    from pdf_to_text_spark.kernels.crypto import (
        aes128_cbc_decrypt,
        aes128_cbc_encrypt,
    )

    wire = aes128_cbc_encrypt(key, iv, data)
    assert aes128_cbc_decrypt(key, wire) == data
    bad = bytearray(wire)
    bad[len(bad) // 2] ^= 0x01
    try:
        out = aes128_cbc_decrypt(key, bytes(bad))
        assert out != data or len(data) == 0
    except ValueError:
        pass


@given(st.binary(min_size=1, max_size=64), st.binary(min_size=0, max_size=400))
def test_rc4_is_an_involution(key, data):
    from pdf_to_text_spark.kernels.crypto import rc4

    assert rc4(key, rc4(key, data)) == data


@settings(max_examples=120, deadline=3000)
@given(
    st.sampled_from(
        ["GBK-EUC-H", "90ms-RKSJ-H", "ETen-B5-H", "KSC-EUC-H",
         "UniGB-UCS2-H", "UniJIS-UTF16-H"]
    ),
    st.binary(max_size=64),
    st.booleans(),
)
def test_predefined_cmap_show_bytes_never_crash_or_emit_nul(enc, raw, tu):
    """r6 decode paths (legacy codec wins over ToUnicode; Uni* merges a
    partial ToUnicode over the code-is-Unicode fallback): arbitrary show
    bytes must never crash the page, never emit a raw NUL, and never
    leak a lone surrogate into extracted text."""
    from tools.make_pdf import predefined_cmap_pdf

    hx = raw.hex().encode()
    text, n = extract_pdf_text(
        predefined_cmap_pdf(encoding=enc, show_hex=hx, tounicode=tu)
    )
    assert n == 1
    assert "\x00" not in text
    assert not any(0xD800 <= ord(c) <= 0xDFFF for c in text)
