"""Deterministic HTML fixture / synthetic-page writer (FIXTURES.md §4).

Templates cover the boilerplate-stripper decision surface: nav/footer
link farms, script/style subtrees, entities + whitespace soup, the
short-block rescue rule, and degenerate structure. `article_page` is the
parametric generator used by the synthetic pages table.
"""

from __future__ import annotations

_WORDS = (
    "data spark engine parse extract table column batch arrow vector text "
    "page block record stream shuffle partition bucket skew salt golden "
    "byte pipeline commit snapshot resume metric lineage corpus crawl web"
).split()


def _sentence(seed: int, n: int) -> str:
    # deterministic pseudo-text: LCG over the word list, no RNG state shared
    x = (seed * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
    words = []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
        words.append(_WORDS[x % len(_WORDS)])
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."


def article_page(doc_id: int, n_paras: int = 5, para_words: int = 40) -> str:
    """A realistic page: header/nav boilerplate + an article + footer."""
    paras = "\n".join(
        f"    <p>{_sentence(doc_id * 97 + i, para_words)}</p>" for i in range(n_paras)
    )
    nav = " | ".join(f'<a href="/s/{i}">section {i}</a>' for i in range(8))
    return f"""<!DOCTYPE html>
<html><head><title>Doc {doc_id}</title>
<style>body {{ margin: 0 }}</style>
<script>var t = {doc_id}; console.log(t);</script>
</head><body>
<nav><div>{nav}</div></nav>
<header><h1>Document {doc_id}</h1></header>
<article>
{paras}
</article>
<footer><div><a href="/about">about</a> <a href="/tos">terms</a> &copy; 2024</div></footer>
</body></html>"""


FIXTURES = {
    "article_simple": lambda: article_page(1, n_paras=3),
    "link_farm": lambda: (
        "<html><body>"
        + "".join(
            f'<div><a href="/x{i}">link text number {i} with many words here</a></div>'
            for i in range(10)
        )
        + f"<p>{_sentence(7, 30)}</p></body></html>"
    ),
    "script_style": lambda: (
        "<html><head><style>.x{color:red}</style></head><body>"
        "<script>document.write('SHOULD NOT APPEAR');</script>"
        "<noscript>also hidden from output entirely</noscript>"
        f"<p>{_sentence(11, 25)}</p>"
        "<template><p>hidden template paragraph body text</p></template>"
        "</body></html>"
    ),
    "entities_ws": lambda: (
        "<html><body><p>caf&eacute;   con\t\tleche &amp; pan  &mdash; "
        f"{_sentence(13, 15)}</p>\n\n\n<p>{_sentence(17, 12)}</p></body></html>"
    ),
    "short_block_rescue": lambda: (
        "<html><body>"
        f"<p>{_sentence(19, 30)}</p>"
        "<p>Short interlude.</p>"
        f"<p>{_sentence(23, 30)}</p>"
        "</body></html>"
    ),
    "empty": lambda: "<html><body></body></html>",
    "table_content": lambda: (
        "<html><body><table>"
        + "".join(
            f"<tr><td>{_sentence(31 + i, 12)}</td><td>{_sentence(37 + i, 14)}</td></tr>"
            for i in range(4)
        )
        + f"</table><p>{_sentence(41, 25)}</p></body></html>"
    ),
    "definition_list": lambda: (
        "<html><body><dl>"
        f"<dt>term one</dt><dd>{_sentence(43, 18)}</dd>"
        f"<dt>term two</dt><dd>{_sentence(47, 22)}</dd>"
        "</dl></body></html>"
    ),
    "nested_article": lambda: (
        "<html><body><article><section>"
        f"<h2>{_sentence(53, 12)}</h2><p>{_sentence(59, 35)}</p>"
        f"<blockquote>{_sentence(61, 20)}</blockquote>"
        f"</section><aside><a href='/r1'>related one</a> <a href='/r2'>related two</a>"
        f"</aside><pre>code_line(1)\ncode_line(2)</pre>"
        f"<figure><figcaption>{_sentence(67, 15)}</figcaption></figure>"
        "</article></body></html>"
    ),
    "unicode_text": lambda: (
        f"<html><body><p>café naïve façade — {_sentence(71, 20)}</p>"
        f"<p>日本語のテキスト 中文文本 한국어 — {_sentence(73, 15)}</p></body></html>"
    ),
    "br_split_paragraph": lambda: (
        f"<html><body><p>{_sentence(79, 15)}<br><br>{_sentence(83, 15)}</p></body></html>"
    ),
    "nested_soup": lambda: (
        "<div><div><div><span>tiny</span></div>"
        f"<div><div><p>{_sentence(29, 20)}</p></div></div></div></div>"
    ),
    # round 5: unclosed/nested anchors (ubiquitous on real crawls; HTML5
    # auto-closes a previous <a> on a new one) — the nav links are still
    # boilerplate, but the CONTENT paragraphs after the unclosed anchor
    # must survive (an ever-growing anchor depth classified them all as
    # link text)
    "unclosed_anchor": lambda: (
        "<html><body>"
        '<div><a href="/a">Home<a href="/b">About<a href="/c">Contact</div>'
        f"<p>{_sentence(89, 30)}</p>"
        f"<p>{_sentence(97, 28)}</p>"
        "</body></html>"
    ),
}


def main(out_dir: str) -> None:
    import pathlib

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for name, fn in FIXTURES.items():
        (out / f"{name}.html").write_text(fn(), encoding="utf-8")
        print(f"wrote {name}.html")


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "tests/golden")
