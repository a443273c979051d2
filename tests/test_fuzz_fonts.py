"""Adversarial fuzzing of the embedded-font program parsers (round 6).

`embedded_font_code_to_unicode` sits directly on crawl bytes (the
decompressed /FontFile[23]? stream of any PDF a WARC carries), so its
contract is stricter than "no exception" — the top-level broad except
already guarantees that. What fuzzing must pin:

* no HANG and no memory bomb: every parse finishes fast even when a
  mutated length/count field claims 2^32 entries (deadline enforced);
* the output shape: None, or a {int: single-char str} map with no
  replacement chars — anything else would corrupt extracted text
  downstream rather than fail soft.

Random bytes almost never pass the sfnt/CFF/Type1 magic checks, so the
valuable cases are MUTATIONS of valid programs of every kind the
corpus rotation ships (truetype, truetype-symbol, truetype-f12, CFF,
Type1 PFA/PFB) — junk spliced or overwritten at arbitrary offsets
exercises the deep table parsers behind the magic gates.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_to_text_spark.kernels.fonts import embedded_font_code_to_unicode
from pdf_to_text_spark.kernels.pdf import _glyph_to_char
from tools.make_pdf import (
    _EMBEDDED_NAMES,
    _STD_EMBEDDED_NAMES,
    _STD_EMBEDDED_SIDS,
    build_cff_font_program,
    build_truetype_font_program,
    build_type1_font_program,
)


def _programs() -> dict[str, bytes]:
    cff_names = {c: (n if n else "uni0394") for c, n in _EMBEDDED_NAMES.items()}
    return {
        "truetype": build_truetype_font_program(
            _EMBEDDED_NAMES, uni_map={0x0394: 6}
        ),
        "truetype_symbol": build_truetype_font_program(
            _EMBEDDED_NAMES, uni_map={0x0394: 6}, symbol=True
        ),
        "truetype_f12": build_truetype_font_program(
            {c: None for c in _EMBEDDED_NAMES},
            uni_map={0x48: 1, 0x65: 2, 0x6C: 3, 0x6F: 4, 0x20: 5,
                     0x0394: 6, 0x57: 7},
            uni_fmt12=True,
        ),
        "cff": build_cff_font_program(cff_names, standard_sids={"space": 1}),
        "type1": build_type1_font_program(cff_names),
        "type1_pfb": build_type1_font_program(cff_names, pfb=True),
        # r6: predefined-StandardEncoding programs (CFF op-16-absent /
        # Type1 "StandardEncoding def") join the mutation rotation
        "cff_std": build_cff_font_program(
            _STD_EMBEDDED_NAMES, predefined_standard=True,
            standard_sids=_STD_EMBEDDED_SIDS,
        ),
        "type1_std": build_type1_font_program({}, standard=True),
    }


_PROGRAMS = _programs()
_KINDS = sorted(_PROGRAMS)


def _check_shape(result):
    assert result is None or (
        isinstance(result, dict)
        and len(result) <= 0x10000
        and all(
            isinstance(k, int) and 0 <= k <= 0x10FFFF
            and isinstance(v, str) and v and v != "�"
            for k, v in result.items()
        )
    )


@settings(max_examples=300, deadline=2000)
@given(
    st.sampled_from(_KINDS),
    st.binary(min_size=1, max_size=256),
    st.floats(0, 1),
    st.booleans(),
)
def test_mutated_font_program_fails_soft(kind, junk, where, overwrite):
    """Splice or overwrite junk at any offset of a valid program of
    every corpus kind: finish fast, return None or a clean map."""
    good = _PROGRAMS[kind]
    cut = int(where * len(good))
    if overwrite:
        mutated = good[:cut] + junk + good[cut + len(junk):]
    else:
        mutated = good[:cut] + junk + good[cut:]
    _check_shape(embedded_font_code_to_unicode(mutated, _glyph_to_char))


@settings(max_examples=200, deadline=2000)
@given(st.binary(max_size=2048))
def test_random_bytes_behind_each_magic_fail_soft(data):
    """Force every format dispatcher open: random bytes behind the sfnt
    versions, the CFF header probe, and the Type1 PFA/PFB magics."""
    for magic in (
        b"\x00\x01\x00\x00", b"true", b"OTTO",            # sfnt
        b"\x01\x00\x04\x04",                               # CFF header
        b"%!PS-AdobeFont-1.0\n",                           # Type1 PFA
        b"\x80\x01\x10\x00\x00\x00",                       # Type1 PFB seg
    ):
        _check_shape(
            embedded_font_code_to_unicode(magic + data, _glyph_to_char)
        )


@settings(max_examples=150, deadline=2000)
@given(st.binary(max_size=4096))
def test_pure_random_bytes_fail_soft(data):
    _check_shape(embedded_font_code_to_unicode(data, _glyph_to_char))
