"""From-scratch PDF text extraction kernel.

Re-implements, in pure Python (stdlib only), the extraction semantics the
reference delegates to unpdf/pdfjs (`/root/reference/src/main.ts:149-154`,
deps `package.json:8-9`): xref/object-table walk, page-tree traversal,
/FlateDecode content-stream decompression, and Tj/TJ/'/" show-text
extraction with layout-order reflow. The pinned reflow rules are
SURVEY.md §2.2:

  * text items are emitted in content-stream order;
  * a positioning op that moves down (``Td``/``TD`` with negative ty, or
    ``T*``), a ``'``/``"`` show op, or a new ``BT`` block starts a new line;
  * items on one line are concatenated in stream order (kerning numbers in
    ``TJ`` arrays are ignored);
  * lines within a page are joined with ``"\n"``; pages are joined with
    ``"\n"`` (directly visible in the reference at src/main.ts:152-154).

Strings are decoded latin-1 (fixtures restrict themselves to single-byte
WinAnsi/ASCII fonts — SURVEY.md §2.2.2). Any structural error raises
:class:`PDFParseError`; callers map that to a ``parse_failed`` metric row,
never a task failure (reference behavior #18, src/main.ts:259-262,
deliberately softened from fail-stop to per-row status).
"""

from __future__ import annotations

import re
import zlib

__all__ = ["PDFParseError", "extract_pdf_text", "PDFDocument"]

_WHITESPACE = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"


class PDFParseError(Exception):
    """Raised on any structural problem in the PDF byte stream."""


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self):  # pragma: no cover
        return f"{self.num} {self.gen} R"


class _Name(str):
    """A PDF name token (/Foo) — distinct from a string value."""


class _Stream:
    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw


class _Lexer:
    """Cursor-based tokenizer over the raw PDF bytes."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WHITESPACE:
                self.pos += 1
            elif c == 0x25:  # '%' comment — skip to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek_bytes(self, k: int) -> bytes:
        return self.data[self.pos : self.pos + k]

    def expect_keyword(self, kw: bytes) -> None:
        self._skip_ws()
        if not self.data.startswith(kw, self.pos):
            raise PDFParseError(f"expected {kw!r} at offset {self.pos}")
        self.pos += len(kw)

    def read_int(self) -> int:
        tok = self.read_token()
        try:
            return int(tok)
        except ValueError:
            raise PDFParseError(f"expected integer, got {tok[:20]!r}") from None

    def read_token(self) -> bytes:
        """Read a bare regular token (keyword or number)."""
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            raise PDFParseError("unexpected EOF")
        start = self.pos
        while self.pos < n and d[self.pos] not in _WHITESPACE and d[self.pos] not in _DELIMS:
            self.pos += 1
        if self.pos == start:
            raise PDFParseError(f"unexpected delimiter at {self.pos}: {d[self.pos:self.pos+1]!r}")
        return d[start : self.pos]

    # ── object parsing ──────────────────────────────────────────────────

    def parse_object(self):
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            raise PDFParseError("unexpected EOF while parsing object")
        c = d[self.pos]
        if d.startswith(b"<<", self.pos):
            return self._parse_dict()
        if c == 0x3C:  # '<' hex string
            return self._parse_hex_string()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x2F:  # '/'
            return self._parse_name()
        if c == 0x5B:  # '['
            return self._parse_array()
        tok = self.read_token()
        if tok == b"true":
            return True
        if tok == b"false":
            return False
        if tok == b"null":
            return None
        # number — possibly the start of an indirect reference "N G R"
        try:
            if b"." in tok:
                return float(tok)
            num = int(tok)
        except ValueError:
            raise PDFParseError(f"bad token {tok!r} at {self.pos}") from None
        save = self.pos
        try:
            self._skip_ws()
            gen_tok = self.read_token()
            gen = int(gen_tok)
            self._skip_ws()
            if d.startswith(b"R", self.pos) and (
                self.pos + 1 >= n or d[self.pos + 1] in _WHITESPACE or d[self.pos + 1] in _DELIMS
            ):
                self.pos += 1
                return _Ref(num, gen)
        except (ValueError, PDFParseError):
            pass
        self.pos = save
        return num

    def _parse_name(self) -> _Name:
        self.pos += 1  # '/'
        d, n = self.data, len(self.data)
        out = bytearray()
        while self.pos < n and d[self.pos] not in _WHITESPACE and d[self.pos] not in _DELIMS:
            if d[self.pos] == 0x23 and self.pos + 2 < n:  # '#xx' escape
                try:
                    out.append(int(d[self.pos + 1 : self.pos + 3], 16))
                    self.pos += 3
                    continue
                except ValueError:
                    pass
            out.append(d[self.pos])
            self.pos += 1
        return _Name(out.decode("latin-1"))

    def _parse_array(self) -> list:
        self.pos += 1  # '['
        out = []
        while True:
            self._skip_ws()
            if self.pos >= len(self.data):
                raise PDFParseError("unterminated array")
            if self.data[self.pos] == 0x5D:  # ']'
                self.pos += 1
                return out
            out.append(self.parse_object())

    def _parse_dict(self):
        self.pos += 2  # '<<'
        out: dict = {}
        while True:
            self._skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                break
            if self.pos >= len(self.data):
                raise PDFParseError("unterminated dict")
            key = self.parse_object()
            if not isinstance(key, _Name):
                raise PDFParseError(f"dict key is not a name at {self.pos}")
            out[str(key)] = self.parse_object()
        # stream?
        save = self.pos
        self._skip_ws()
        if self.data.startswith(b"stream", self.pos):
            self.pos += 6
            if self.data.startswith(b"\r\n", self.pos):
                self.pos += 2
            elif self.data.startswith(b"\n", self.pos):
                self.pos += 1
            length = out.get("Length")
            if isinstance(length, _Ref):
                # resolved later by the document; locate endstream textually
                end = self.data.find(b"endstream", self.pos)
                if end < 0:
                    raise PDFParseError("unterminated stream")
                raw = self.data[self.pos : end]
                self.pos = end + len(b"endstream")
                return _Stream(out, raw.rstrip(b"\r\n"))
            if not isinstance(length, int):
                raise PDFParseError("stream without integer /Length")
            raw = self.data[self.pos : self.pos + length]
            if len(raw) != length:
                raise PDFParseError("stream truncated")
            self.pos += length
            self.expect_keyword(b"endstream")
            return _Stream(out, raw)
        self.pos = save
        return out

    def _parse_literal_string(self) -> bytes:
        d, n = self.data, len(self.data)
        self.pos += 1  # '('
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                    oct_digits = bytearray()
                    while len(oct_digits) < 3 and self.pos < n and 0x30 <= d[self.pos] <= 0x37:
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:  # '('
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:  # ')'
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
                out.append(c)
                self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        raise PDFParseError("unterminated literal string")

    def _parse_hex_string(self) -> bytes:
        d, n = self.data, len(self.data)
        self.pos += 1  # '<'
        digits = bytearray()
        while self.pos < n:
            c = d[self.pos]
            if c == 0x3E:  # '>'
                self.pos += 1
                if len(digits) % 2:
                    digits.append(0x30)
                try:
                    return bytes.fromhex(digits.decode("ascii"))
                except ValueError:
                    raise PDFParseError("bad hex string") from None
            if c not in _WHITESPACE:
                digits.append(c)
            self.pos += 1
        raise PDFParseError("unterminated hex string")


class PDFDocument:
    """Minimal PDF document model: xref walk + object resolution + page tree."""

    def __init__(self, data: bytes):
        if b"%PDF-" not in data[:1024]:
            raise PDFParseError("missing %PDF- header")
        self.data = data
        self.xref: dict[int, int] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._load_xref()

    # ── xref / trailer ──────────────────────────────────────────────────

    def _load_xref(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise PDFParseError("startxref not found")
        offset = int(m.group(1))
        seen = set()
        while True:
            if offset in seen or offset >= len(self.data):
                break
            seen.add(offset)
            trailer = self._load_xref_section(offset)
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            prev = trailer.get("Prev")
            if not isinstance(prev, int):
                break
            offset = prev
        if "Root" not in self.trailer:
            raise PDFParseError("trailer has no /Root")

    def _load_xref_section(self, offset: int) -> dict:
        lx = _Lexer(self.data, offset)
        lx.expect_keyword(b"xref")
        while True:
            lx._skip_ws()
            if lx.data.startswith(b"trailer", lx.pos):
                lx.pos += len(b"trailer")
                trailer = lx.parse_object()
                if not isinstance(trailer, dict):
                    raise PDFParseError("trailer is not a dict")
                return trailer
            first = lx.read_int()
            count = lx.read_int()
            if count < 0 or count > 10_000_000:
                raise PDFParseError(f"implausible xref section count {count}")
            for i in range(count):
                off = lx.read_int()
                _gen = lx.read_int()
                kind = lx.read_token()
                if kind == b"n":
                    # earlier sections in the Prev chain must not override
                    self.xref.setdefault(first + i, off)
                elif kind != b"f":
                    raise PDFParseError(f"bad xref entry kind {kind!r}")

    # ── object resolution ───────────────────────────────────────────────

    def resolve(self, obj):
        while isinstance(obj, _Ref):
            obj = self._load_object(obj.num)
        return obj

    def _load_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self.xref.get(num)
        if off is None:
            raise PDFParseError(f"object {num} not in xref")
        if off < 0 or off >= len(self.data):
            raise PDFParseError(f"xref offset {off} out of range")
        lx = _Lexer(self.data, off)
        got_num = lx.read_int()
        _gen = lx.read_int()
        lx.expect_keyword(b"obj")
        if got_num != num:
            raise PDFParseError(f"xref points to object {got_num}, wanted {num}")
        obj = lx.parse_object()
        self._cache[num] = obj
        return obj

    # ── page tree ───────────────────────────────────────────────────────

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer["Root"])
        if not isinstance(root, dict):
            raise PDFParseError("/Root is not a dict")
        pages_node = self.resolve(root.get("Pages"))
        out: list[dict] = []
        self._walk_pages(pages_node, out, depth=0)
        if not out:
            raise PDFParseError("document has no pages")
        return out

    def _walk_pages(self, node, out: list, depth: int) -> None:
        if depth > 64:
            raise PDFParseError("page tree too deep")
        node = self.resolve(node)
        if not isinstance(node, dict):
            raise PDFParseError("bad page-tree node")
        t = str(node.get("Type", ""))
        if t == "Page":
            out.append(node)
        elif t == "Pages" or "Kids" in node:
            for kid in self.resolve(node.get("Kids", [])):
                self._walk_pages(kid, out, depth + 1)
        else:
            raise PDFParseError(f"unknown page-tree node type {t!r}")

    # ── content streams ─────────────────────────────────────────────────

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        parts = contents if isinstance(contents, list) else [contents]
        chunks: list[bytes] = []
        for part in parts:
            part = self.resolve(part)
            if not isinstance(part, _Stream):
                raise PDFParseError("page /Contents is not a stream")
            chunks.append(self._decode_stream(part))
        return b"\n".join(chunks)

    def _decode_stream(self, st: _Stream) -> bytes:
        filt = self.resolve(st.dict.get("Filter"))
        raw = st.raw
        length = self.resolve(st.dict.get("Length"))
        if isinstance(length, int) and len(raw) > length:
            raw = raw[:length]
        if filt is None:
            return raw
        filters = filt if isinstance(filt, list) else [filt]
        for f in filters:
            f = str(self.resolve(f))
            if f == "FlateDecode":
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as e:
                    raise PDFParseError(f"FlateDecode failed: {e}") from None
            else:
                raise PDFParseError(f"unsupported stream filter /{f}")
        return raw


# ── content-stream text extraction ───────────────────────────────────────────

# Regex-driven tokenizer for content streams: one C-level match per token
# instead of per-byte Python stepping (~4× on megabyte streams). Literal
# strings take the regex fast path when they contain no nested parens;
# the slow path falls back to the exact _Lexer parser, so semantics are
# byte-identical to the reference rules either way.
_CTOK_RE = re.compile(
    rb"""[\x00\t\n\x0c\r ]+            # whitespace
      | %[^\r\n]*                      # comment
      | (?P<str>\((?:[^()\\]|\\.)*\))  # literal string, no nested parens
      | (?P<strop>\()                  # literal string needing full parse
      | <<                             # dict open (operand soup; skipped)
      | >>
      | (?P<hex><[^>]*>)               # hex string
      | (?P<arro>\[) | (?P<arrc>\])
      | /[^\x00\t\n\x0c\r ()<>\[\]{}/%]*      # name
      | (?P<num>[+-]?(?:\d+\.?\d*|\.\d+))
      | (?P<op>[^\x00\t\n\x0c\r ()<>\[\]{}/%]+)
    """,
    re.VERBOSE,
)

_STR_ESCAPE_RE = re.compile(rb"\\(?:[nrtbf()\\]|[0-7]{1,3}|\r\n|\r|\n|.)")
_ESC_MAP = {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\x08", 0x66: b"\x0c"}


def _unescape_literal(body: bytes) -> bytes:
    """Unescape a (...)-literal body (no unescaped nested parens inside)."""
    if b"\\" not in body:
        return body

    def sub(m: re.Match) -> bytes:
        e = m.group(0)[1:]
        c = e[0]
        if c in _ESC_MAP:
            return _ESC_MAP[c]
        if 0x30 <= c <= 0x37:  # octal
            return bytes([int(e, 8) & 0xFF])
        if e in (b"\r\n", b"\r", b"\n"):  # line continuation
            return b""
        return e

    return _STR_ESCAPE_RE.sub(sub, body)


def _extract_page_text(content: bytes) -> str:
    """Apply the pinned reflow rules (module docstring) to one content stream."""
    lines: list[str] = []
    cur: list[str] = []
    last_str: bytes | None = None   # most recent string operand
    last_num: float | None = None   # most recent numeric operand
    arr: list | None = None         # open TJ-style array, or None
    arr_strs: list[bytes] = []

    def flush() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    n = len(content)
    pos = 0
    while pos < n:
        m = _CTOK_RE.match(content, pos)
        if m is None:  # stray delimiter ({, }) — skip one byte
            pos += 1
            continue
        pos = m.end()
        lastgroup = m.lastgroup
        if lastgroup is None:
            continue
        if lastgroup == "str":
            s = _unescape_literal(m.group("str")[1:-1])
            if arr is not None:
                arr_strs.append(s)
            last_str = s
        elif lastgroup == "strop":
            lx = _Lexer(content, m.start())
            s = lx._parse_literal_string()
            pos = lx.pos
            if arr is not None:
                arr_strs.append(s)
            last_str = s
        elif lastgroup == "hex":
            digits = re.sub(rb"[\x00\t\n\x0c\r ]", b"", m.group("hex")[1:-1])
            if len(digits) % 2:
                digits += b"0"
            try:
                s = bytes.fromhex(digits.decode("ascii"))
            except ValueError:
                continue
            if arr is not None:
                arr_strs.append(s)
            last_str = s
        elif lastgroup == "num":
            tok = m.group("num")
            last_num = float(tok) if (b"." in tok) else int(tok)
        elif lastgroup == "arro":
            arr = []
            arr_strs = []
        elif lastgroup == "arrc":
            arr = None
        elif lastgroup == "op":
            op = m.group("op")
            if op == b"BT" or op == b"T*":
                flush()
            elif op in (b"Td", b"TD"):
                if isinstance(last_num, (int, float)) and last_num < 0:
                    flush()
            elif op == b"Tj":
                if last_str is not None:
                    cur.append(last_str.decode("latin-1"))
            elif op == b"TJ":
                for s in arr_strs:
                    cur.append(s.decode("latin-1"))
                arr_strs = []
            elif op == b"'" or op == b'"':
                flush()
                if last_str is not None:
                    cur.append(last_str.decode("latin-1"))
            last_str = None
            last_num = None
            arr = None
            arr_strs = []
    flush()
    return "\n".join(lines)


def extract_pdf_text(data: bytes) -> tuple[str, int]:
    """bytes → (extracted_text, n_pages).

    Pages are joined with "\\n" — the reference's mergePages + join
    (src/main.ts:150-154). Raises PDFParseError on any structural fault.
    """
    if not isinstance(data, (bytes, bytearray)):
        raise PDFParseError("input is not bytes")
    doc = PDFDocument(bytes(data))
    page_texts = [_extract_page_text(doc.page_content(p)) for p in doc.pages()]
    return "\n".join(page_texts), len(page_texts)
