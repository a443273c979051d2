"""Regression tests for the round-3 full-kernel review findings
(pdf.py: surrogate glyphs, inherited resources, form budget, indirect
/Length EOL strip, #xx operand names, V4 legacy CF length, preamble
rebase, font-decoder caching)."""

import zlib

import pytest

from pdf_to_text_spark.kernels.pdf import PDFDocument, extract_pdf_text
from tools.make_pdf import (
    assemble_classic_xref,
    build_encrypted_pdf,
    build_pdf,
    content_stream_for_lines,
    differences_pdf,
)

GAMMA_FONT = (
    b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
    b"/Encoding << /Differences [ 65 /Gamma ] >> >>"
)


def test_surrogate_glyph_name_clamped_to_replacement():
    """/uniD835 names a lone UTF-16 surrogate — it must extract as U+FFFD,
    not as an unencodable '\\ud835' that kills the task at Arrow time."""
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding << /Differences [ 65 /uniD835 66 /uD800 ] >> >>"
    )
    text, _ = extract_pdf_text(
        build_pdf([b"BT /F1 12 Tf 72 720 Td (AB) Tj ET"], font_obj=font)
    )
    assert text == "��"
    text.encode("utf-8")  # must be encodable — the actual task-kill vector


def test_inherited_pages_resources_decode_fonts():
    """/Resources on the parent Pages node (ISO 32000-1 §7.7.3.4) must be
    consulted for a Page without its own — 'A' decodes to Gamma."""
    body = b"BT /F1 12 Tf 72 720 Td (A) Tj ET"
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 "
        b"/Resources << /Font << /F1 3 0 R >> >> >>",
        GAMMA_FONT,
        # Page WITHOUT /Resources — inherits from 2 0 R
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 5 0 R >>",
        b"<< /Length %d >>\nstream\n" % len(body) + body + b"\nendstream",
    ]
    text, n = extract_pdf_text(assemble_classic_xref(objects))
    assert (text, n) == ("Γ", 1)


def test_shared_inheriting_form_scales_past_256_pages():
    """300 pages, each with a direct /Resources referencing ONE shared
    resources-less form: decodes legitimately scale with page count and
    must not trip the adversarial form budget."""
    n_pages = 300
    form_num = 4 + 2 * n_pages  # first object after the page/content pairs
    form_body = b"BT /F1 10 Tf 10 10 Td (tail) Tj ET"
    form = (
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 100 100] "
        b"/Length %d >>\nstream\n" % len(form_body) + form_body + b"\nendstream"
    )
    pdf = build_pdf(
        [b"BT /F1 12 Tf 72 720 Td (p) Tj ET q /X1 Do Q"] * n_pages,
        resources_extra=b"/XObject << /X1 %d 0 R >> " % form_num,
        extra_objects=(form,),
    )
    text, n = extract_pdf_text(pdf)
    assert n == n_pages and text.count("tail") == n_pages


def test_indirect_length_stream_payload_ending_in_newline():
    """A compressed stream whose payload ends in 0x0A with an indirect
    /Length: rstrip used to eat the payload byte → 'truncated stream'."""
    content = b"BT /F1 12 Tf 72 720 Td (newline tail payload) Tj ET"
    data = zlib.compress(content)
    # zlib output is deterministic — force a trailing \n via level sweep
    for level in range(9, -1, -1):
        data = zlib.compress(content, level)
        if data.endswith((b"\n", b"\r")):
            break
    else:
        # append a harmless zlib-skippable? No — instead wrap: use an
        # uncompressed stream ending in \n and assert the byte survives
        data = None
    if data is not None:
        objects = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>",
            b"<< /Filter /FlateDecode /Length 6 0 R >>\nstream\n"
            + data + b"\nendstream",
            b"%d" % len(data),
        ]
        text, _ = extract_pdf_text(assemble_classic_xref(objects))
        assert text == "newline tail payload"
    # uncompressed variant: literal content ending in a data \n
    content2 = b"BT /F1 12 Tf 72 720 Td (x) Tj ET\n"
    objects2 = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>",
        b"<< /Length 6 0 R >>\nstream\n" + content2 + b"\nendstream",
        b"%d" % len(content2),
    ]
    text2, _ = extract_pdf_text(assemble_classic_xref(objects2))
    assert text2 == "x"


def test_hash_escaped_operand_names_resolve():
    """#xx escapes are legal in operand names: '/F#31 Tf' must hit the
    resource key 'F1' (here carrying a /Differences font)."""
    pdf = build_pdf(
        [b"BT /F#31 12 Tf 72 720 Td (A) Tj ET"], font_obj=GAMMA_FONT
    )
    text, _ = extract_pdf_text(pdf)
    assert text == "Γ"


def test_v4_legacy_bits_cf_length_decrypts():
    """A V4 crypt filter whose CF /Length holds the legacy BITS value 40
    must read as 40-bit RC4 (bytes can only be 5-16), not 320 bits."""
    pdf = build_encrypted_pdf(
        [content_stream_for_lines(["legacy forty bit rc4"])],
        method="rc4_v4_len40",
    )
    text, n = extract_pdf_text(pdf)
    assert (text, n) == ("legacy forty bit rc4", 1)


def test_preamble_prefixed_pdf_rebased():
    """Junk bytes before %PDF- (saved HTTP headers): xref offsets are
    header-relative, so the kernel must rebase instead of parse_failing
    every such document."""
    clean = differences_pdf()
    want, _ = extract_pdf_text(clean)
    wrapped = b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n" + clean
    text, n = extract_pdf_text(wrapped)
    assert (text, n) == (want, 1)


def test_font_decoder_cached_per_object():
    """The per-object font-decoder cache: repeated pages sharing a font
    ref parse its ToUnicode/Differences once."""
    pdf = build_pdf(
        [b"BT /F1 12 Tf 72 720 Td (A) Tj ET"] * 5, font_obj=GAMMA_FONT
    )
    doc = PDFDocument(pdf)
    for page in doc.pages():
        doc.page_extraction_context(page)
    assert list(doc._font_dec_cache) == [3]  # font object parsed once
    text, n = extract_pdf_text(pdf)
    assert n == 5 and text == "\n".join(["Γ"] * 5)
