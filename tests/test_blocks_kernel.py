"""Segmentation / chunking / CSV kernel tests incl. hypothesis properties.

Targets the edge semantics of SURVEY.md §2.3 (a)-(g) and the CSV quirks of
src/main.ts:39-56.
"""

import json
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_to_text_spark.kernels.blocks import (
    chunk_blocks,
    extract_json_fenced,
    parse_records,
    records_to_csv,
    records_to_pretty_json,
    segment_blocks,
)

# ── segmentation (a)-(g) ─────────────────────────────────────────────────────

END = "* Total importe en la sucursal: 12.50"


def test_a_prefix_match_not_word_boundary():
    assert segment_blocks("sucursales abc\n" + END) == ["sucursales abc\n" + END]
    assert segment_blocks("SUCURSAL X\n" + END) == ["SUCURSAL X\n" + END]
    assert segment_blocks(" sucursal leading-space\n" + END) == []  # prefix, not contains


def test_b_new_start_flushes_unterminated():
    text = "Sucursal A\nline1\nSucursal B\n" + END
    assert segment_blocks(text) == ["Sucursal A\nline1", "Sucursal B\n" + END]


def test_c_end_line_included():
    blocks = segment_blocks("Sucursal A\n" + END)
    assert blocks == ["Sucursal A\n" + END]


def test_d_end_requires_number():
    text = "Sucursal A\n* Total importe en la sucursal: \nmore\n" + END
    assert segment_blocks(text) == ["Sucursal A\n* Total importe en la sucursal: \nmore\n" + END]
    # integer (no decimals) also terminates
    t2 = "Sucursal A\n* Total importe en la sucursal: 7"
    assert segment_blocks(t2) == [t2]


def test_e_preamble_dropped():
    assert segment_blocks("preamble\nmore preamble\nSucursal A\n" + END) == [
        "Sucursal A\n" + END
    ]


def test_f_trailing_unterminated_kept():
    assert segment_blocks("Sucursal A\nno end here") == ["Sucursal A\nno end here"]


def test_g_empty():
    assert segment_blocks("") == []


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.just("Sucursal X"),
            st.just(END),
            st.text(
                alphabet=st.characters(blacklist_characters="\n", blacklist_categories=("Cs",)),
                max_size=20,
            ),
        ),
        max_size=40,
    )
)
def test_segmentation_invariants(lines):
    blocks = segment_blocks("\n".join(lines))
    joined = []
    for b in blocks:
        assert b.lower().startswith("sucursal")
        # a terminator may only appear as the last line of a block
        for inner in b.split("\n")[:-1]:
            assert not re.search(
                r"\* total importe en la sucursal:\s*\d+(\.\d+)?", inner, re.IGNORECASE
            )
        joined.extend(b.split("\n"))
    # every block line exists in the input, in order (subsequence)
    it = iter(lines)
    assert all(any(line == cand for cand in it) for line in joined)


# ── chunking (src/main.ts:116-124, size boundaries) ─────────────────────────


def test_chunk_boundaries():
    for n, want in [(0, []), (1, [1]), (9, [9]), (10, [10]), (11, [10, 1]), (25, [10, 10, 5])]:
        blocks = [f"b{i}" for i in range(n)]
        chunks = chunk_blocks(blocks)
        assert [len(c) for c in chunks] == want
        assert [b for c in chunks for b in c] == blocks  # order preserved


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=5), max_size=60), st.integers(min_value=1, max_value=12))
def test_chunk_property(blocks, k):
    chunks = chunk_blocks(blocks, k)
    assert [b for c in chunks for b in c] == blocks
    assert all(len(c) <= k for c in chunks)
    assert all(len(c) == k for c in chunks[:-1])


# ── record parsing + CSV quirks ──────────────────────────────────────────────


def test_parse_records():
    block = (
        "Sucursal 001 - Centro 1\n"
        "  EAN 7790000000131 cantidad 8 importe 82.40\n"
        "  EAN 7790000000132 cantidad 9 importe 93.60\n"
        "* Total importe en la sucursal: 176.00"
    )
    recs = parse_records(block)
    assert len(recs) == 2
    assert recs[0] == {
        "SucursalName": "Sucursal 001 - Centro 1",
        "EAN": "7790000000131",
        "CantidadVendida": "8",
        "Importe": "82.40",
    }


def test_csv_header_and_coercions():
    recs = [
        {"SucursalName": "A", "EAN": "123", "CantidadVendida": "7", "Importe": "49.9"},
        {"SucursalName": "B", "EAN": "456", "CantidadVendida": "xx", "Importe": "junk"},
        {"SucursalName": "C", "EAN": "789", "CantidadVendida": "3.9", "Importe": "1.005"},
    ]
    csv = records_to_csv(recs)
    lines = csv.split("\n")
    assert lines[0] == "SucursalName,EAN,CantidadVendida,Importe"
    assert lines[1] == '"A","123",7,49.90'
    assert lines[2] == '"B","456",0,0.00'  # ||0 fallbacks
    # r2 contract change (ADVICE r1): toFixed is pinned to HALF_UP on the
    # shortest-repr decimal digits — bit-identical to the JVM path's Java
    # format_string('%.2f') ("1.005" → 1.01), deviating from exact-binary
    # JS toFixed only at repr-boundary inputs (documented out-of-contract)
    assert lines[3] == '"C","789",3,1.01'  # parseInt truncates
    assert not csv.endswith("\n")  # no trailing newline (src/main.ts:55)


def test_csv_quotes_not_escaped():
    recs = [{"SucursalName": 'He said "hi"', "EAN": "1", "CantidadVendida": "1", "Importe": "1"}]
    assert '"He said "hi""' in records_to_csv(recs)  # reference quirk: NO escaping


def test_to_fixed_half_away_from_zero():
    recs = [{"SucursalName": "x", "EAN": "1", "CantidadVendida": "1", "Importe": "2.675"}]
    # pinned: HALF_UP on the shortest-repr digits ("2.675" → 2.68),
    # matching Java format_string('%.2f') exactly (probed: 2.68)
    assert records_to_csv(recs).split("\n")[1].endswith("2.68")


def test_js_infinity_literals():
    """parseFloat('Infinity')||0 → Infinity; toFixed renders 'Infinity'
    (ADVICE r1) — and ties at .xx5 round half-up sign-separated (±1.125
    → ±1.13, same as Java '%.2f')."""
    from pdf_to_text_spark.kernels.blocks import _js_parse_float, _to_fixed_2

    assert _js_parse_float("Infinity") == float("inf")
    assert _js_parse_float("-Infinity") == float("-inf")
    assert _js_parse_float("+Infinity rest") == float("inf")
    assert _js_parse_float("Infinit") == 0.0
    assert _to_fixed_2(float("inf")) == "Infinity"
    assert _to_fixed_2(float("-inf")) == "-Infinity"
    assert _to_fixed_2(float("nan")) == "NaN"
    assert _to_fixed_2(1.125) == "1.13" and _to_fixed_2(-1.125) == "-1.13"
    recs = [{"SucursalName": "x", "EAN": "1", "CantidadVendida": "2", "Importe": "Infinity"}]
    assert records_to_csv(recs).split("\n")[1] == '"x","1",2,Infinity'


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "SucursalName": st.text(max_size=10),
                "EAN": st.text(max_size=8),
                "CantidadVendida": st.text(max_size=6),
                "Importe": st.text(max_size=6),
            }
        ),
        max_size=20,
    )
)
def test_csv_row_count_property(recs):
    csv = records_to_csv(recs)
    # row count == record count + header; string fields pass through verbatim
    # (reference does no escaping) so embedded newlines add extra lines
    n_newlines_in_data = sum(
        r["SucursalName"].count("\n") + r["EAN"].count("\n") for r in recs
    )
    # zero records: reference yields 'HEADER\n' + '' (one trailing empty line)
    expected = 2 if not recs else 1 + len(recs) + n_newlines_in_data
    assert len(csv.split("\n")) == expected


def test_json_fence_extraction():
    assert extract_json_fenced('```json [1, 2] ```') == "[1, 2]"
    assert extract_json_fenced('  {"a": 1}  ') == '{"a": 1}'
    import pytest

    with pytest.raises(ValueError):
        extract_json_fenced("not json at all")


def test_pretty_json_matches_js_stringify():
    recs = [{"SucursalName": "A", "EAN": "1", "CantidadVendida": 2, "Importe": 3.5}]
    out = records_to_pretty_json(recs)
    assert out == json.dumps(recs, indent=2, ensure_ascii=False, separators=(",", ": "))
    assert out.startswith("[\n  {\n    ")


def test_csv_null_field_renders_empty_not_none():
    """r6 review: a present-but-null field must render "" like the JVM
    path's coalesce (records.py csv_line_col), not the Python repr
    'None' (r.get's default only covers ABSENT keys)."""
    from pdf_to_text_spark.kernels.blocks import records_to_csv

    csv = records_to_csv(
        [{"SucursalName": None, "EAN": "E1", "CantidadVendida": "1", "Importe": "2"}]
    )
    assert csv.splitlines()[1] == '"","E1",1,2.00'
