"""Deterministic minimal-PDF writer for fixtures and the synthetic pages table.

Emits classic PDFs (xref table, literal/hex strings, optional /FlateDecode)
restricted to the operator surface the kernel pins (SURVEY.md §2.2):
Tj / TJ-with-kerning / ' / " show ops, Td/TD/T* positioning, BT/ET, one
built-in Helvetica font. No randomness — callers pass content explicitly
or derive it from a seeded RNG of their own.

Fixture matrix: FIXTURES.md §3.
"""

from __future__ import annotations

import zlib


def _esc(s: str) -> bytes:
    b = s.encode("latin-1", errors="replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def content_stream_for_lines(lines: list[str], *, style: str = "td") -> bytes:
    """Build one page's content stream showing `lines` top-to-bottom.

    style:
      'td'    — each line break via `0 -14 Td`, show with Tj
      'tstar' — line breaks via `T*` (after a TL leading set)
      'quote' — first line Tj, subsequent lines via the `'` op
      'tj'    — each line shown as a TJ array split mid-word with kerning
                numbers (which the kernel must ignore)
      'dquote'— lines via the `"` op (word/char spacing operands)
    """
    out = [b"BT", b"/F1 12 Tf"]
    if style == "tstar":
        out.append(b"14 TL")
    out.append(b"72 720 Td")
    for i, line in enumerate(lines):
        if style == "td":
            if i > 0:
                out.append(b"0 -14 Td")
            out.append(b"(" + _esc(line) + b") Tj")
        elif style == "tstar":
            if i > 0:
                out.append(b"T*")
            out.append(b"(" + _esc(line) + b") Tj")
        elif style == "quote":
            if i == 0:
                out.append(b"(" + _esc(line) + b") Tj")
            else:
                out.append(b"(" + _esc(line) + b") '")
        elif style == "dquote":
            if i == 0:
                out.append(b"(" + _esc(line) + b") Tj")
            else:
                out.append(b"0.5 0.1 (" + _esc(line) + b') "')
        elif style == "tj":
            if i > 0:
                out.append(b"0 -14 TD")
            mid = max(1, len(line) // 2)
            a, b = line[:mid], line[mid:]
            out.append(b"[(" + _esc(a) + b") -120 (" + _esc(b) + b")] TJ")
        else:
            raise ValueError(f"unknown style {style!r}")
    out.append(b"ET")
    return b"\n".join(out)


def build_pdf(page_streams: list[bytes], *, compress: bool = False) -> bytes:
    """Assemble a complete PDF from per-page content streams."""
    objects: list[bytes] = []  # 1-indexed body objects

    n_pages = len(page_streams)
    # object numbering: 1=Catalog, 2=Pages, 3=Font, then per page: Page, Contents
    page_obj_nums = [4 + 2 * i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % n for n in page_obj_nums)

    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )  # 2
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
    )  # 3
    for i, stream in enumerate(page_streams):
        contents_num = page_obj_nums[i] + 1
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>" % contents_num
        )
        data = zlib.compress(stream) if compress else stream
        filt = b"/Filter /FlateDecode " if compress else b""
        objects.append(
            b"<< " + filt + b"/Length %d >>\nstream\n" % len(data) + data + b"\nendstream"
        )

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]  # object 0 is the free head
    for num, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_pos = len(buf)
    n_objs = len(objects) + 1
    buf += b"xref\n0 %d\n" % n_objs
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n_objs, xref_pos)
    )
    return bytes(buf)


def simple_pdf(pages: list[list[str]], *, style: str = "td", compress: bool = False) -> bytes:
    """pages = list of pages, each a list of text lines."""
    return build_pdf(
        [content_stream_for_lines(p, style=style) for p in pages], compress=compress
    )


def sucursal_report_pdf(n_blocks: int = 25, *, trailing_unterminated: bool = True,
                        compress: bool = True) -> bytes:
    """The full-dataflow fixture (FIXTURES.md §3 `sucursal_report.pdf`).

    Preamble lines (dropped by segmentation), then n_blocks 'Sucursal …'
    blocks each terminated by the total line (src/main.ts:79,94), then
    optionally one trailing unterminated block (kept, src/main.ts:104-106).
    Deterministic content derived from the block index.
    """
    lines: list[str] = ["Reporte de ventas", "Generado: 2024-01-01", ""]
    for i in range(n_blocks):
        lines.append(f"Sucursal {i:03d} - Centro {i % 7}")
        for j in range(1 + i % 3):
            ean = f"{7790000000000 + i * 131 + j:013d}"
            qty = 1 + (i * 7 + j) % 40
            amt = (qty * (100 + i % 50 * 3 + j)) / 10
            lines.append(f"  EAN {ean} cantidad {qty} importe {amt:.2f}")
        total = sum(
            (1 + (i * 7 + j) % 40) * (100 + i % 50 * 3 + j) / 10 for j in range(1 + i % 3)
        )
        lines.append(f"* Total importe en la sucursal: {total:.2f}")
    if trailing_unterminated:
        lines.append("Sucursal 999 - Pendiente")
        lines.append("  EAN 7799999999999 cantidad 5 importe 12.50")
    # paginate ~40 lines per page to exercise the page join too
    pages = [lines[i : i + 40] for i in range(0, len(lines), 40)]
    return simple_pdf(pages, compress=compress)


def corrupt_pdf() -> bytes:
    """Valid header, truncated before the xref — must parse_fail, not crash."""
    good = simple_pdf([["hello", "world"]])
    return good[: len(good) // 2]


FIXTURES = {
    "single_page_tj": lambda: simple_pdf([["Hello PDF world", "second line here"]]),
    "multi_page": lambda: simple_pdf(
        [["page one line a", "page one line b"], ["page two"], ["page three end"]]
    ),
    "kerning_tj_array": lambda: simple_pdf(
        [["Kerned headline text", "another kerned line"]], style="tj"
    ),
    "linebreaks_td": lambda: simple_pdf(
        [["alpha", "bravo", "charlie", "delta"]], style="tstar"
    ),
    "quote_ops": lambda: simple_pdf([["first", "second", "third"]], style="quote"),
    "dquote_ops": lambda: simple_pdf([["uno", "dos", "tres"]], style="dquote"),
    "flate_stream": lambda: simple_pdf(
        [["compressed content line", "flate " * 30]], compress=True
    ),
    "escapes": lambda: simple_pdf(
        [["paren (nested) and \\ backslash", "tab\tand newline literal"]]
    ),
    "sucursal_report": lambda: sucursal_report_pdf(25),
    "mega_50p": lambda: simple_pdf(
        [[f"page {p} line {i} " + "x" * 60 for i in range(45)] for p in range(50)],
        compress=True,
    ),
    "corrupt": corrupt_pdf,
}


def main(out_dir: str) -> None:
    import pathlib

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for name, fn in FIXTURES.items():
        (out / f"{name}.pdf").write_bytes(fn())
        print(f"wrote {name}.pdf")


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "tests/golden")
