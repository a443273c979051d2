"""Frozen golden-file oracle (SURVEY.md §5.1).

Drives the pure-Python kernels over the committed fixture inputs in
tests/golden/ and writes `<name>.txt` golden outputs. Generated ONCE and
committed; the pytest suite asserts the Spark pipeline's extracted_text is
byte-identical per url (BASELINE.json:14). Re-running must be a no-op
unless the kernels' pinned semantics deliberately change (which is a
contract change and must be called out in the commit).

Usage: python -m tools.oracle_extract [--check] [golden_dir]
"""

from __future__ import annotations

import pathlib
import sys

from pdf_to_text_spark.kernels.html import HTMLParseFailed, extract_html_text
from pdf_to_text_spark.kernels.pdf import PDFParseError, extract_pdf_text


def extract_any(data: bytes, content_type: str) -> tuple[str, int, int]:
    """(text, n_pages, parse_failed) — the kernel dispatch the Spark UDF mirrors."""
    try:
        if content_type == "application/pdf":
            text, n_pages = extract_pdf_text(data)
            return text, n_pages, 0
        text = extract_html_text(data)
        return text, 1, 0
    except (PDFParseError, HTMLParseFailed):
        return "", 0, 1


def main(argv: list[str]) -> int:
    # an unrecognized flag must NOT fall through to write mode — a typo'd
    # `--chek` would silently regenerate every golden and bake current
    # kernel drift into the contract (r6 review)
    unknown = [a for a in argv if a.startswith("--") and a != "--check"]
    if unknown:
        raise SystemExit(
            f"unknown flag(s) {unknown}; usage: "
            "python -m tools.oracle_extract [--check] [golden_dir]"
        )
    check = "--check" in argv
    args = [a for a in argv if not a.startswith("--")]
    golden = pathlib.Path(args[0] if args else "tests/golden")
    rc = 0
    fixtures = [
        s for s in sorted(golden.iterdir()) if s.suffix in (".pdf", ".html")
    ]
    # x.pdf and x.html would both map to x.txt and one golden would
    # silently overwrite the other — a stem collision is a loud error in
    # a tool whose contract is frozen goldens (r6 review)
    stems: dict[str, pathlib.Path] = {}
    for s in fixtures:
        if s.stem in stems:
            raise SystemExit(
                f"golden stem collision: {stems[s.stem].name} and {s.name} "
                f"both produce {s.stem}.txt — rename one fixture"
            )
        stems[s.stem] = s
    for src in fixtures:
        ctype = "application/pdf" if src.suffix == ".pdf" else "text/html"
        text, n_pages, failed = extract_any(src.read_bytes(), ctype)
        out = src.with_suffix(".txt")
        payload = text.encode("utf-8")
        if check:
            if not out.exists() or out.read_bytes() != payload:
                print(f"MISMATCH {out.name}")
                rc = 1
            else:
                print(f"ok {out.name} (pages={n_pages} failed={failed})")
        else:
            out.write_bytes(payload)
            print(f"wrote {out.name} (pages={n_pages} chars={len(text)} failed={failed})")
    if check:
        # a golden whose fixture was deleted/renamed is stale contract
        # text that glob-consuming tests still read — the drift gate must
        # flag it, not just per-fixture mismatches (r6 review)
        expected = {s.stem + ".txt" for s in fixtures}
        for txt in sorted(golden.glob("*.txt")):
            if txt.name not in expected:
                print(f"ORPHAN {txt.name} (no .pdf/.html fixture)")
                rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
