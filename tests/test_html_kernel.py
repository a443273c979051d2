"""HTML boilerplate-stripper kernel tests — golden parity + pinned spec rules."""

import pathlib

import pytest

from pdf_to_text_spark.kernels.html import classify_blocks, extract_html_text, segment_blocks
from tools.make_html import FIXTURES

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_golden_parity(name):
    html = (GOLDEN / f"{name}.html").read_bytes()
    want = (GOLDEN / f"{name}.txt").read_bytes()
    assert extract_html_text(html).encode("utf-8") == want


def test_link_farm_dropped():
    out = extract_html_text(FIXTURES["link_farm"]())
    assert "link text number" not in out
    assert len(out) > 0  # the real paragraph survives


def test_script_style_noscript_template_removed():
    out = extract_html_text(FIXTURES["script_style"]())
    assert "SHOULD NOT APPEAR" not in out
    assert "hidden" not in out


def test_entity_decode_and_ws_normalization():
    out = extract_html_text(FIXTURES["entities_ws"]())
    assert "café" in out and "&" in out and "—" in out
    assert "  " not in out  # collapsed horizontal whitespace
    assert not out.endswith("\n")  # no trailing newline


def test_short_block_rescue():
    out = extract_html_text(FIXTURES["short_block_rescue"]())
    assert "Short interlude." in out


def test_short_block_not_rescued_without_content_neighbors():
    out = extract_html_text("<html><body><p>tiny one</p><p>tiny two</p></body></html>")
    assert out == ""


def test_empty_and_degenerate():
    assert extract_html_text(b"") == ""
    assert extract_html_text("<html><body></body></html>") == ""
    assert extract_html_text("just bare text " * 5).startswith("just bare text")


def test_blocks_join_with_double_newline():
    html = FIXTURES["article_simple"]()
    out = extract_html_text(html)
    assert "\n\n" in out
    assert "\n\n\n" not in out


def test_link_ratio_math():
    html = '<p><a href="x">half link</a> and half plain text here okay fine</p>'
    blocks = segment_blocks(html)
    assert len(blocks) == 1
    b = blocks[0]
    assert 0 < b.link_ratio < 0.33
    assert classify_blocks(blocks) == [b.words >= 10]


def test_unclosed_anchors_do_not_poison_later_blocks():
    """r5 review: real crawl pages leave anchors unclosed constantly;
    link accounting must end at block boundaries so the content after a
    sloppy nav strip still extracts (an ever-growing anchor depth used
    to classify the whole page boilerplate)."""
    from pdf_to_text_spark.kernels.html import extract_html_text

    html = (
        "<html><body>"
        '<div><a href="/a">Home<a href="/b">About<a href="/c">Contact</div>'
        "<p>This long content paragraph carries the actual article body "
        "text with plenty of words to pass the block heuristics.</p>"
        "</body></html>"
    )
    out = extract_html_text(html.encode())
    assert "actual article body" in out
    assert "Home" not in out  # the nav block stays boilerplate


def test_inline_tags_inside_anchor_count_fully():
    """r6 review: per-chunk strip() undercounted anchors whose text is
    split by inline tags — '<a>read <b>more</b></a>' counted 8 of 9
    chars, so an all-link block scored ratio < 1.0."""
    blocks = segment_blocks("<li><a>read <b>more</b></a></li>")
    assert len(blocks) == 1
    assert blocks[0].text == "read more"
    assert blocks[0].link_chars == len("read more")
    assert blocks[0].link_ratio == 1.0

    # <br> inside an anchor separates words in the block text AND in the
    # link count
    blocks = segment_blocks("<p><a>read<br>more</a></p>")
    assert blocks[0].text == "read more"
    assert blocks[0].link_ratio == 1.0
