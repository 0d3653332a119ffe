"""Minimal pure-Python PDF text extractor (S2 in SURVEY.md §2).

The reference decodes ``data/mqtt_specification.pdf`` with pdfplumber
(``src/prepare_pretrain_data.py:115-119``: ``pdf.pages[10:118]`` then
``page.extract_text(layout=False)``). pdfplumber is not installable in
this environment, so this module implements the subset of ISO 32000-1
(PDF 1.7) needed to reproduce that call's output for Word/Office-style
documents, from the public spec only:

- object resolution by brute-force ``N G obj`` scan (robust to broken
  xref tables; last occurrence wins, matching incremental updates) plus
  /ObjStm (compressed object stream) expansion,
- FlateDecode via zlib (+ PNG predictors for stream-in-stream cases),
- page-tree walk with Resources inheritance,
- a content-stream interpreter tracking the text matrix (BT/ET, Tf,
  Td/TD/Tm/T*/TL, Tj/TJ/'/") and the CTM (q/Q/cm),
- WinAnsi (cp1252) simple fonts, /Differences overrides, and
  Type0/Identity-H composite fonts via their /ToUnicode CMaps
  (UTF-16BE, bfchar + bfrange),
- pdfplumber's line model for ``extract_text(layout=False)``: chars are
  clustered on their *top* coordinate (baseline + /Ascent x size) with
  tolerance 3, sorted top-down then left-to-right, and concatenated.

Char-level word re-segmentation is unnecessary for Office-generated PDFs
because space glyphs are explicit in the content stream; the sentence
cleanup downstream (``text_extract.clean_spec_sentences``) collapses any
duplicate spaces exactly as the reference does.

Verified: the full MQTT path reproduces the reference's frozen
``data/pretrain_sentences.txt`` block 4 sentence-for-sentence
(tests/test_pdf_text.py).
"""

from __future__ import annotations

import re
import zlib

_WHITESPACE = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"
_ESCAPES = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}


class Name(str):
    """A /Name token (distinct from a string literal)."""


class Keyword(str):
    """A bare keyword token (content-stream operator)."""


class Ref:
    """An indirect object reference ``N G R`` (generation ignored)."""

    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Ref({self.num})"


class Lexer:
    """Tokenizer for PDF object syntax and content streams."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self):
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WHITESPACE:
                self.pos += 1
            elif c == 0x25:  # % comment
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                break

    def next_token(self):
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            return None
        c = d[self.pos]
        start = self.pos
        if c == 0x2F:  # /name
            self.pos += 1
            while self.pos < n and d[self.pos] not in _WHITESPACE and d[self.pos] not in _DELIMS:
                self.pos += 1
            raw = re.sub(
                rb"#([0-9A-Fa-f]{2})",
                lambda m: bytes([int(m.group(1), 16)]),
                d[start + 1:self.pos],
            )
            return ("name", raw.decode("latin-1"))
        if c == 0x28:  # ( literal string
            self.pos += 1
            depth = 1
            out = bytearray()
            while self.pos < n and depth:
                ch = d[self.pos]
                if ch == 0x5C:  # backslash escapes
                    self.pos += 1
                    if self.pos >= n:
                        break
                    e = d[self.pos]
                    if e in _ESCAPES:
                        out.append(_ESCAPES[e])
                        self.pos += 1
                    elif e in b"()\\":
                        out.append(e)
                        self.pos += 1
                    elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                        digits = bytearray()
                        while self.pos < n and len(digits) < 3 and 0x30 <= d[self.pos] <= 0x37:
                            digits.append(d[self.pos])
                            self.pos += 1
                        out.append(int(digits, 8) & 0xFF)
                    elif e in b"\r\n":  # line continuation
                        self.pos += 1
                        if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                            self.pos += 1
                    else:
                        out.append(e)
                        self.pos += 1
                elif ch == 0x28:
                    depth += 1
                    out.append(ch)
                    self.pos += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth:
                        out.append(ch)
                    self.pos += 1
                else:
                    out.append(ch)
                    self.pos += 1
            return ("string", bytes(out))
        if c == 0x3C:  # << or <hex>
            if self.pos + 1 < n and d[self.pos + 1] == 0x3C:
                self.pos += 2
                return ("dict_open", None)
            self.pos += 1
            hx = bytearray()
            while self.pos < n and d[self.pos] != 0x3E:
                if d[self.pos] not in _WHITESPACE:
                    hx.append(d[self.pos])
                self.pos += 1
            self.pos += 1
            if len(hx) % 2:
                hx.append(0x30)
            try:
                return ("string", bytes.fromhex(hx.decode("latin-1")))
            except ValueError:
                return ("string", b"")
        if c == 0x3E:  # >>
            if self.pos + 1 < n and d[self.pos + 1] == 0x3E:
                self.pos += 2
                return ("dict_close", None)
            self.pos += 1
            return ("junk", None)
        if c == 0x5B:
            self.pos += 1
            return ("arr_open", None)
        if c == 0x5D:
            self.pos += 1
            return ("arr_close", None)
        if c in b"{}":
            self.pos += 1
            return ("junk", chr(c))
        if c in b"+-.0123456789":
            self.pos += 1
            while self.pos < n and d[self.pos] in b"+-.0123456789":
                self.pos += 1
            raw = d[start:self.pos]
            try:
                return ("num", float(raw) if b"." in raw else int(raw))
            except ValueError:
                return ("num", 0)
        while self.pos < n and d[self.pos] not in _WHITESPACE and d[self.pos] not in _DELIMS:
            self.pos += 1
        return ("kw", d[start:self.pos].decode("latin-1"))


def parse_object(lex: Lexer):
    """Parse one PDF object (dict/array/name/string/number/ref/bool)."""
    return _parse_from(lex, lex.next_token())


def _parse_from(lex: Lexer, tok):
    if tok is None:
        return None
    kind, val = tok
    if kind == "string":
        return val
    if kind == "name":
        return Name(val)
    if kind == "num":
        save = lex.pos
        t2 = lex.next_token()
        if t2 and t2[0] == "num":
            t3 = lex.next_token()
            if t3 == ("kw", "R"):
                return Ref(int(val))
        lex.pos = save
        return val
    if kind == "dict_open":
        d = {}
        while True:
            k = lex.next_token()
            if k is None or k[0] == "dict_close":
                break
            if k[0] != "name":
                continue  # malformed key: skip
            d[k[1]] = parse_object(lex)
        return d
    if kind == "arr_open":
        arr = []
        while True:
            save = lex.pos
            t = lex.next_token()
            if t is None or t[0] == "arr_close":
                break
            lex.pos = save
            arr.append(parse_object(lex))
        return arr
    if kind == "kw":
        return {"true": True, "false": False, "null": None}.get(val, Keyword(val))
    return None


def _png_predictor(data: bytes, columns: int) -> bytes:
    """All five PNG row filters (bpp=1, the shape xref/ObjStm streams
    use). An unknown filter byte raises — silently passing the row
    through would corrupt object offsets downstream."""
    rowlen = columns + 1
    out = bytearray()
    prev = bytearray(columns)
    for i in range(0, len(data) - rowlen + 1, rowlen):
        ft = data[i]
        row = bytearray(data[i + 1:i + rowlen])
        if ft == 0:  # None
            pass
        elif ft == 1:  # Sub
            for j in range(1, columns):
                row[j] = (row[j] + row[j - 1]) & 0xFF
        elif ft == 2:  # Up
            for j in range(columns):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(columns):
                left = row[j - 1] if j else 0
                row[j] = (row[j] + (left + prev[j]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(columns):
                a = row[j - 1] if j else 0
                b = prev[j]
                c = prev[j - 1] if j else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG predictor filter {ft}")
        out += row
        prev = row
    return bytes(out)


class PDFDocument:
    """Random-access view of the objects in a PDF byte string."""

    def __init__(self, data: bytes):
        self.data = data
        self._offsets: dict[int, int] = {}
        self._cache: dict[int, object] = {}
        self.root_num: int | None = None
        self._scan()

    # -- object table ------------------------------------------------------

    def _scan(self):
        for m in re.finditer(rb"(?m)(\d+)\s+\d+\s+obj\b", self.data):
            self._offsets[int(m.group(1))] = m.end()
        for m in re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", self.data):
            self.root_num = int(m.group(1))
        # expand compressed object streams
        for num, pos in list(self._offsets.items()):
            if b"/ObjStm" not in self.data[pos:pos + 300]:
                continue
            try:
                obj, stream = self._load_at(pos)
                if not isinstance(obj, dict) or obj.get("Type") != "ObjStm" or stream is None:
                    continue
                n = int(self.resolve(obj.get("N")) or 0)
                first = int(self.resolve(obj.get("First")) or 0)
                body = self._decode_stream(obj, stream)
                hdr = Lexer(body[:first])
                for _ in range(n):
                    a, b = hdr.next_token(), hdr.next_token()
                    if a is None or b is None:
                        break
                    objnum, off = int(a[1]), int(b[1])
                    if objnum not in self._offsets:  # file-level objects win
                        self._cache[objnum] = parse_object(Lexer(body, first + off))
            except Exception:
                continue  # a broken ObjStm shouldn't kill the document

    def _load_at(self, pos: int):
        lex = Lexer(self.data, pos)
        obj = parse_object(lex)
        stream = None
        save = lex.pos
        if lex.next_token() == ("kw", "stream"):
            p = lex.pos
            if self.data[p:p + 2] == b"\r\n":
                p += 2
            elif self.data[p:p + 1] in (b"\n", b"\r"):
                p += 1
            length = self.resolve(obj.get("Length")) if isinstance(obj, dict) else None
            if isinstance(length, (int, float)):
                end = p + int(length)
                if self.data[end:end + 11].lstrip(b"\r\n \t").startswith(b"endstream"):
                    stream = self.data[p:end]
            if stream is None:  # /Length wrong or indirect-and-missing
                e = self.data.find(b"endstream", p)
                stream = self.data[p:e if e >= 0 else len(self.data)].rstrip(b"\r\n")
        else:
            lex.pos = save
        return obj, stream

    def _decode_stream(self, obj: dict, stream: bytes) -> bytes:
        filt = self.resolve(obj.get("Filter"))
        if filt is None:
            return stream
        data = stream
        for f in filt if isinstance(filt, list) else [filt]:
            f = self.resolve(f)
            if f == "FlateDecode":
                data = zlib.decompress(data)
                parms = self.resolve(obj.get("DecodeParms")) or self.resolve(obj.get("DP"))
                if isinstance(parms, dict):
                    pred = self.resolve(parms.get("Predictor")) or 1
                    if isinstance(pred, (int, float)) and pred >= 10:
                        data = _png_predictor(data, int(self.resolve(parms.get("Columns")) or 1))
            elif f == "ASCIIHexDecode":
                data = bytes.fromhex(data.replace(b">", b"").decode("latin-1"))
            # image filters (DCT etc.) never reach the text path
        return data

    def resolve(self, obj, depth: int = 0):
        while isinstance(obj, Ref) and depth < 32:
            obj = self.get(obj.num)
            depth += 1
        return obj

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        pos = self._offsets.get(num)
        if pos is None:
            return None
        obj, _ = self._load_at(pos)
        self._cache[num] = obj
        return obj

    def get_stream(self, num: int) -> bytes | None:
        pos = self._offsets.get(num)
        if pos is None:
            return None
        obj, stream = self._load_at(pos)
        if stream is None or not isinstance(obj, dict):
            return None
        try:
            return self._decode_stream(obj, stream)
        except Exception:
            return None

    # -- page tree ---------------------------------------------------------

    def pages(self) -> list[dict]:
        if b"/Encrypt" in self.data and re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", self.data):
            # encrypted documents need the RC4/AES security handler;
            # refuse loudly instead of emitting decode garbage
            raise ValueError("encrypted PDF not supported")
        root = self.resolve(self.get(self.root_num)) if self.root_num else None
        if not isinstance(root, dict):
            raise ValueError("PDF catalog not found")
        out: list[dict] = []
        seen: set[int] = set()

        def walk(node_ref, inherited):
            if isinstance(node_ref, Ref):
                if node_ref.num in seen:
                    return
                seen.add(node_ref.num)
            node = self.resolve(node_ref)
            if not isinstance(node, dict):
                return
            merged = dict(inherited)
            for k in ("Resources", "MediaBox"):
                if k in node:
                    merged[k] = node[k]
            if self.resolve(node.get("Type")) == "Pages" or "Kids" in node:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, merged)
            else:
                page = dict(node)
                for k, v in merged.items():
                    page.setdefault(k, v)
                out.append(page)

        walk(root.get("Pages"), {})
        return out


def _utf16be(hexstr: str) -> str:
    if len(hexstr) % 4:
        hexstr = hexstr[:len(hexstr) // 4 * 4]
    try:
        return bytes.fromhex(hexstr).decode("utf-16-be", "replace")
    except ValueError:
        return ""


def parse_tounicode(cmap_bytes: bytes) -> dict[int, str]:
    """ToUnicode CMap -> {char code: unicode} (bfchar + bfrange forms)."""
    text = cmap_bytes.decode("latin-1", "replace")
    out: dict[int, str] = {}
    for m in re.finditer(r"beginbfchar(.*?)endbfchar", text, re.S):
        for mm in re.finditer(r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]*)>", m.group(1)):
            if mm.group(2):
                out[int(mm.group(1), 16)] = _utf16be(mm.group(2))
    for m in re.finditer(r"beginbfrange(.*?)endbfrange", text, re.S):
        for mm in re.finditer(
            r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<[0-9A-Fa-f]+>|\[[^\]]*\])", m.group(1)
        ):
            lo, hi, dst = int(mm.group(1), 16), int(mm.group(2), 16), mm.group(3)
            if dst.startswith("<"):
                base_hex = dst.strip("<>")
                base = [int(base_hex[i:i + 4], 16) for i in range(0, len(base_hex), 4)]
                for c in range(lo, hi + 1):
                    chars = list(base)
                    chars[-1] += c - lo
                    out[c] = _utf16be("".join("%04x" % x for x in chars))
            else:
                items = re.findall(r"<([0-9A-Fa-f]+)>", dst)
                for i, c in enumerate(range(lo, hi + 1)):
                    if i < len(items):
                        out[c] = _utf16be(items[i])
    return out


class Font:
    """Per-font byte->unicode decoder + ascent (for line clustering)."""

    # minimal glyph-name table for /Differences overrides
    GLYPH_MAP = {
        "space": " ", "bullet": "•", "quotedblleft": "“", "quotedblright": "”",
        "quoteleft": "‘", "quoteright": "’", "endash": "–", "emdash": "—",
        "hyphen": "-", "period": ".", "comma": ",", "colon": ":", "semicolon": ";",
    }

    def __init__(self, doc: PDFDocument, fdict: dict):
        self.two_byte = doc.resolve(fdict.get("Subtype")) == "Type0"
        self.cmap: dict[int, str] | None = None
        self.ascent = 0.905  # Arial-family default when no descriptor
        fd = doc.resolve(fdict.get("FontDescriptor"))
        if fd is None:
            desc = doc.resolve(fdict.get("DescendantFonts"))
            if isinstance(desc, list) and desc:
                d0 = doc.resolve(desc[0])
                if isinstance(d0, dict):
                    fd = doc.resolve(d0.get("FontDescriptor"))
        if isinstance(fd, dict):
            a = doc.resolve(fd.get("Ascent"))
            if isinstance(a, (int, float)) and a > 0:
                self.ascent = a / 1000.0
        tu = fdict.get("ToUnicode")
        if isinstance(tu, Ref):
            raw = doc.get_stream(tu.num)
            if raw:
                self.cmap = parse_tounicode(raw)
        self.diffs: dict[int, str] = {}
        enc = doc.resolve(fdict.get("Encoding"))
        if isinstance(enc, dict):
            arr = doc.resolve(enc.get("Differences"))
            if arr:
                code = 0
                for item in arr:
                    if isinstance(item, (int, float)):
                        code = int(item)
                    else:
                        self.diffs[code] = str(item)
                        code += 1

    def decode(self, raw: bytes) -> str:
        if self.two_byte:
            cm = self.cmap or {}
            return "".join(
                cm.get((raw[i] << 8) | raw[i + 1], "")
                for i in range(0, len(raw) - 1, 2)
            )
        if self.cmap:
            # codes missing from a partial ToUnicode map fall back to the
            # same cp1252 decode as the cmap-less branch (chr() would
            # leak C1 control characters for 0x80-0x9F)
            out = []
            for b in raw:
                if b in self.cmap:
                    out.append(self.cmap[b])
                else:
                    try:
                        out.append(bytes([b]).decode("cp1252"))
                    except UnicodeDecodeError:
                        out.append("")
            return "".join(out)
        out = []
        for b in raw:
            if b in self.diffs:
                out.append(self.GLYPH_MAP.get(self.diffs[b], ""))
            else:
                try:
                    out.append(bytes([b]).decode("cp1252"))
                except UnicodeDecodeError:
                    out.append("")
        return "".join(out)


def _mat_mul(m1, m2):
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2, a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2, c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2, e1 * b2 + f1 * d2 + f2,
    )


_IDENT = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def page_chunks(doc: PDFDocument, page: dict) -> list[tuple[float, float, str]]:
    """Interpret the page's content stream(s) -> [(x, top, text)] runs."""
    contents = page.get("Contents")
    if isinstance(contents, Ref):
        maybe_arr = doc.resolve(contents)
        refs = maybe_arr if isinstance(maybe_arr, list) else [contents]
    elif isinstance(contents, list):
        refs = contents
    else:
        refs = []
    body = b"\n".join(doc.get_stream(r.num) or b"" for r in refs if isinstance(r, Ref))

    resources = doc.resolve(page.get("Resources")) or {}
    fonts = {
        fname: Font(doc, fd)
        for fname, fref in (doc.resolve(resources.get("Font")) or {}).items()
        if isinstance((fd := doc.resolve(fref)), dict)
    }

    lex = Lexer(body)
    stack: list[tuple] = []
    font: Font | None = None
    size = 0.0
    leading = 0.0
    tm = tlm = ctm = _IDENT
    gstack: list[tuple] = []
    chunks: list[tuple[float, float, str]] = []

    def emit(raw: bytes):
        if font is None or not raw:
            return
        txt = font.decode(raw)
        if txt:
            dev = _mat_mul(tm, ctm)
            chunks.append((dev[4], dev[5] + font.ascent * size, txt))

    while True:
        tok = lex.next_token()
        if tok is None:
            break
        kind, val = tok
        if kind in ("num", "string", "name"):
            stack.append((kind, val))
            continue
        if kind == "dict_open":  # inline dict operand (BDC); parse & discard
            while True:
                k = lex.next_token()
                if k is None or k[0] == "dict_close":
                    break
                if k[0] == "name":
                    parse_object(lex)
            stack.append(("dict", None))
            continue
        if kind == "arr_open":
            arr = []
            while True:
                t = lex.next_token()
                if t is None or t[0] == "arr_close":
                    break
                arr.append(t)
            stack.append(("arr", arr))
            continue
        if kind != "kw":
            continue
        try:
            if val == "BT":
                tm = tlm = _IDENT
            elif val == "Tf" and len(stack) >= 2:
                size = float(stack[-1][1])
                font = fonts.get(stack[-2][1], font)
            elif val == "Td":
                tlm = _mat_mul((1, 0, 0, 1, float(stack[-2][1]), float(stack[-1][1])), tlm)
                tm = tlm
            elif val == "TD":
                ty = float(stack[-1][1])
                leading = -ty
                tlm = _mat_mul((1, 0, 0, 1, float(stack[-2][1]), ty), tlm)
                tm = tlm
            elif val == "Tm":
                tlm = tuple(float(s[1]) for s in stack[-6:])
                tm = tlm
            elif val == "T*":
                tlm = _mat_mul((1, 0, 0, 1, 0, -leading), tlm)
                tm = tlm
            elif val == "TL":
                leading = float(stack[-1][1])
            elif val == "Tj":
                emit(stack[-1][1])
            elif val in ("'", '"'):
                tlm = _mat_mul((1, 0, 0, 1, 0, -leading), tlm)
                tm = tlm
                emit(stack[-1][1])
            elif val == "TJ" and stack and stack[-1][0] == "arr":
                parts = []
                for t in stack[-1][1]:
                    if t[0] == "string":
                        parts.append(t[1])
                    elif t[0] == "num" and t[1] < -180:
                        parts.append(b" ")  # large negative kern == space
                emit(b"".join(parts))
            elif val == "q":
                gstack.append(ctm)
            elif val == "Q" and gstack:
                ctm = gstack.pop()
            elif val == "cm":
                ctm = _mat_mul(tuple(float(s[1]) for s in stack[-6:]), ctm)
        except (IndexError, ValueError, TypeError):
            pass  # tolerate malformed operator sequences
        stack.clear()
    return chunks


def chunks_to_lines(chunks: list[tuple[float, float, str]], y_tol: float = 3.0) -> list[str]:
    """pdfplumber ``extract_text(layout=False)`` line model: chain-cluster
    runs on their top coordinate (tolerance 3), top-down, then
    left-to-right concatenation within each line."""
    if not chunks:
        return []
    chunks = sorted(chunks, key=lambda c: -c[1])
    lines: list[list[tuple[float, float, str]]] = [[chunks[0]]]
    for ch in chunks[1:]:
        if lines[-1][-1][1] - ch[1] <= y_tol:
            lines[-1].append(ch)
        else:
            lines.append([ch])
    return ["".join(t for _, _, t in sorted(line, key=lambda p: p[0])) for line in lines]


def pdf_page_lines(data: bytes, first: int = 0, last: int | None = None) -> list[str]:
    """Decode PDF bytes -> text lines of ``pages[first:last]``, matching
    the reference's per-page ``extract_text(layout=False).split("\\n")``
    (``src/prepare_pretrain_data.py:116-120``)."""
    doc = PDFDocument(data)
    lines: list[str] = []
    for page in doc.pages()[first:last]:
        lines.extend(chunks_to_lines(page_chunks(doc, page)))
    return lines
