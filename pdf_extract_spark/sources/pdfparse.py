"""From-scratch PDF byte-stream parser (no PyMuPDF/pypdf anywhere).

Implements the north star's parse stage: ``%PDF-`` magic validation
(reference analog /root/reference/main.py:1716-1719), ``startxref`` →
xref-table walk, indirect-object parsing (dicts, arrays, names, refs,
literal/hex strings, streams), page-tree traversal, and content-stream
tokenization (``Tf``/``Tm``/``rg``/``Tj``/``TJ``/``cm``+``Do``) with
font→bold-flag mapping and PDF-y-up → layout-y-down conversion — emitting
the same line structs the reference reads from PyMuPDF
(euaa_사례/pdf_to_json/layout_analyzer.py:73-114).

Pure Python over ``bytes``; called batched from an Arrow UDF
(operators/layout.py) so the per-byte work is amortized per Arrow batch,
never per Spark row round-trip.
"""

from __future__ import annotations

import re

from pdf_extract_spark.rules import FLAG_BOLD

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


class PdfError(ValueError):
    pass


# --------------------------------------------------------------------------
# object-level tokenizer / parser
# --------------------------------------------------------------------------

class _Lexer:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d = self.data
        while self.pos < len(d):
            c = d[self.pos : self.pos + 1]
            if c in b"%":
                nl = d.find(b"\n", self.pos)
                self.pos = len(d) if nl < 0 else nl + 1
            elif c in _WS:
                self.pos += 1
            else:
                return

    def peek_token(self) -> bytes:
        p = self.pos
        t = self.next_token()
        self.pos = p
        return t

    def next_token(self) -> bytes:
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise PdfError("unexpected EOF")
        c = d[self.pos : self.pos + 1]
        if c == b"<":
            if d[self.pos + 1 : self.pos + 2] == b"<":
                self.pos += 2
                return b"<<"
            # hex string
            end = d.find(b">", self.pos)
            tok = d[self.pos : end + 1]
            self.pos = end + 1
            return tok
        if c == b">":
            if d[self.pos + 1 : self.pos + 2] == b">":
                self.pos += 2
                return b">>"
            raise PdfError("stray >")
        if c in b"[]":
            self.pos += 1
            return c
        if c == b"(":
            return self._lex_string()
        if c == b"/":
            start = self.pos
            self.pos += 1
            while self.pos < len(d) and d[self.pos : self.pos + 1] not in _WS + _DELIM:
                self.pos += 1
            return d[start : self.pos]
        # number / keyword
        start = self.pos
        while self.pos < len(d) and d[self.pos : self.pos + 1] not in _WS + _DELIM:
            self.pos += 1
        if self.pos == start:
            raise PdfError(f"cannot lex at {start}")
        return d[start : self.pos]

    def _lex_string(self) -> bytes:
        d = self.data
        assert d[self.pos : self.pos + 1] == b"("
        out = bytearray(b"(")
        depth = 1
        i = self.pos + 1
        while i < len(d) and depth:
            c = d[i : i + 1]
            if c == b"\\":
                out += d[i : i + 2]
                i += 2
                continue
            if c == b"(":
                depth += 1
            elif c == b")":
                depth -= 1
                if depth == 0:
                    out += b")"
                    i += 1
                    break
            out += c
            i += 1
        self.pos = i
        return bytes(out)


def _unescape(raw: bytes) -> str:
    """PDF literal string body (inside parens) -> str."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            n = raw[i + 1 : i + 2]
            mapped = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                      b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\"}.get(n)
            if mapped is not None:
                out += mapped
                i += 2
                continue
            if n in b"01234567":  # octal escape \ddd (8/9 are NOT octal)
                j = i + 1
                oct_s = b""
                while j < len(raw) and len(oct_s) < 3 and raw[j : j + 1] in b"01234567":
                    oct_s += raw[j : j + 1]
                    j += 1
                out.append(int(oct_s, 8) & 0xFF)
                i = j
                continue
            if n in b"\r\n":  # backslash-EOL: line continuation, both dropped
                i += 2
                if n == b"\r" and raw[i : i + 1] == b"\n":
                    i += 1
                continue
            # spec: an unrecognized escape drops the backslash, keeps the char
            out += n
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def parse_object(lex: _Lexer):
    """Parse one PDF object (dict/array/name/number/string/ref/bool/null)."""
    tok = lex.next_token()
    if tok == b"<<":
        d = {}
        while True:
            k = lex.next_token()
            if k == b">>":
                return d
            if not k.startswith(b"/"):
                raise PdfError(f"dict key {k!r}")
            d[k[1:].decode("latin-1")] = parse_object(lex)
    if tok == b"[":
        arr = []
        while lex.peek_token() != b"]":
            arr.append(parse_object(lex))
        lex.next_token()
        return arr
    if tok.startswith(b"/"):
        return ("name", tok[1:].decode("latin-1"))
    if tok.startswith(b"("):
        return ("str", _unescape(tok[1:-1]))
    if tok.startswith(b"<"):
        h = tok[1:-1].replace(b" ", b"")
        if len(h) % 2:
            h += b"0"
        return ("str", bytes.fromhex(h.decode("latin-1")).decode("latin-1"))
    if tok in (b"true", b"false"):
        return tok == b"true"
    if tok == b"null":
        return None
    if _NUM_RE.fullmatch(tok):
        # possible indirect reference: <int> <int> R
        save = lex.pos
        try:
            t2 = lex.next_token()
            t3 = lex.next_token()
            if t3 == b"R" and t2.isdigit() and tok.isdigit():
                return ("ref", int(tok))
        except PdfError:
            pass
        lex.pos = save
        s = tok.decode("latin-1")
        return float(s) if ("." in s or "e" in s) else int(s)
    raise PdfError(f"unexpected token {tok!r}")


# --------------------------------------------------------------------------
# file structure: header, xref, objects, streams
# --------------------------------------------------------------------------

def _parse_classic_section(data: bytes, xref_at: int, offsets: dict) -> dict:
    """One classic xref table (possibly several subsections) + trailer.
    Existing entries in ``offsets`` win (newer generations are parsed
    first when following /Prev)."""
    lex = _Lexer(data, xref_at + 4)
    while True:
        tok = lex.peek_token()
        if tok == b"trailer":
            break
        first = int(lex.next_token())
        count = int(lex.next_token())
        lex._skip_ws()
        for k in range(count):
            entry = data[lex.pos : lex.pos + 20]
            off, _gen, kind = entry.split()[:3]
            if kind == b"n" and (first + k) not in offsets:
                offsets[first + k] = ("d", int(off))
            lex.pos += 20
    lex.next_token()  # 'trailer'
    return parse_object(lex)


def _inflate(payload: bytes, d: dict) -> bytes:
    filt = d.get("Filter")
    name = filt[1] if isinstance(filt, tuple) else None
    if name == "FlateDecode":
        import zlib

        return zlib.decompress(payload)
    if name is None:
        return payload
    raise PdfError(f"unsupported filter {name}")


class PdfDocument:
    """Parsed object store with lazy indirect-ref resolution.

    Understands both file layouts: classic xref tables (with /Prev
    incremental-update chains) AND PDF 1.5+ cross-reference streams with
    type-2 entries pointing into FlateDecode /ObjStm object streams —
    the north star's 'xref/object-stream walk'.
    """

    def __init__(self, data: bytes) -> None:
        if data[:5] != b"%PDF-":
            raise PdfError("missing %PDF- header")  # S2, main.py:1716-1719
        self.data = data
        self._cache: dict[int, object] = {}
        # offsets: oid -> ("d", byte_offset) | ("s", objstm_id, index)
        self.offsets: dict[int, tuple] = {}
        self.trailer: dict | None = None

        sx = data.rfind(b"startxref")
        if sx < 0:
            raise PdfError("no startxref")
        m = _NUM_RE.search(data, sx + len(b"startxref"))
        at = int(m.group())
        seen: set[int] = set()
        while at is not None and at not in seen:
            seen.add(at)
            if data[at : at + 4] == b"xref":
                # hybrid-reference file (PDF 1.5 §7.5.8.4): a classic
                # table whose trailer carries /XRefStm. The STREAM's
                # entries take precedence over the accompanying table's,
                # so parse the table into a side dict, merge the stream
                # first, then backfill the table's entries.
                classic: dict[int, tuple] = {}
                trailer = _parse_classic_section(data, at, classic)
                xs = trailer.get("XRefStm")
                if xs is not None and int(xs) not in seen:
                    seen.add(int(xs))
                    self._parse_xref_stream(int(xs))
                for oid, e in classic.items():
                    self.offsets.setdefault(oid, e)
            else:
                trailer = self._parse_xref_stream(at)
            if self.trailer is None:
                self.trailer = trailer
            prev = trailer.get("Prev")
            at = int(prev) if prev is not None else None
        if self.trailer is None or "Root" not in self.trailer:
            raise PdfError("no trailer/Root found")
        if "Encrypt" in self.trailer:
            # PDF 32000-1 §7.6: an /Encrypt entry in the governing
            # (newest) trailer means strings and content streams are
            # RC4/AES-encrypted. The STRUCTURE still parses, so without
            # this guard an encrypted file would "extract" ciphertext
            # noise as sentence text instead of failing. Quarantine
            # loudly (the F5 error-class contract: PdfError becomes a
            # parse_error row, never silent garbage).
            raise PdfError("encrypted pdf (/Encrypt in trailer)")

    def _parse_xref_stream(self, at: int) -> dict:
        """A /Type /XRef cross-reference STREAM object: W-field-width
        binary entries over the /Index ranges, FlateDecode payload."""
        body = self._parse_object_at(at, expect_id=None)
        if not (isinstance(body, dict) and "__stream__" in body):
            raise PdfError("startxref does not point at xref table or stream")
        d = body["__dict__"]
        t = d.get("Type")
        if not (isinstance(t, tuple) and t[1] == "XRef"):
            raise PdfError("object at startxref is not /Type /XRef")
        entries = body["__stream__"]  # already inflated
        w = [int(x) for x in d["W"]]
        size = int(d["Size"])
        index = d.get("Index") or [0, size]
        rowlen = sum(w)
        pos = 0

        def field(row: bytes, start: int, width: int, default: int) -> int:
            if width == 0:
                return default
            return int.from_bytes(row[start : start + width], "big")

        for r in range(0, len(index), 2):
            first, count = int(index[r]), int(index[r + 1])
            for k in range(count):
                row = entries[pos : pos + rowlen]
                pos += rowlen
                oid = first + k
                if oid in self.offsets:
                    continue
                typ = field(row, 0, w[0], 1)
                f2 = field(row, w[0], w[1], 0)
                f3 = field(row, w[0] + w[1], w[2], 0)
                if typ == 1:
                    self.offsets[oid] = ("d", f2)
                elif typ == 2:
                    self.offsets[oid] = ("s", f2, f3)
        return d

    def _parse_object_at(self, off: int, expect_id: int | None):
        lex = _Lexer(self.data, off)
        got_id = int(lex.next_token())
        if expect_id is not None and got_id != expect_id:
            raise PdfError(f"xref offset mismatch for obj {expect_id}")
        lex.next_token()  # gen
        if lex.next_token() != b"obj":
            raise PdfError("obj keyword missing")
        body = parse_object(lex)
        lex._skip_ws()
        if self.data[lex.pos : lex.pos + 6] == b"stream":
            p = lex.pos + 6
            if self.data[p : p + 2] == b"\r\n":
                p += 2
            elif self.data[p : p + 1] == b"\n":
                p += 1
            length = self.resolve(body.get("Length", 0)) if isinstance(body, dict) else 0
            payload = _inflate(self.data[p : p + int(length)], body)
            body = {"__dict__": body, "__stream__": payload}
        return body

    def _load_from_objstm(self, stm_id: int, idx: int):
        """Type-2 entry: object #idx inside object stream ``stm_id``
        (header = N pairs of (oid, offset), bodies start at /First)."""
        stm = self.obj(stm_id)
        d = stm["__dict__"]
        t = d.get("Type")
        if not (isinstance(t, tuple) and t[1] == "ObjStm"):
            raise PdfError(f"object {stm_id} is not /Type /ObjStm")
        payload = stm["__stream__"]
        first = int(self.resolve(d["First"]))
        n = int(self.resolve(d["N"]))
        hlex = _Lexer(payload[:first])
        pairs = [(int(hlex.next_token()), int(hlex.next_token())) for _ in range(n)]
        if idx >= len(pairs):
            raise PdfError(f"objstm index {idx} out of range")
        _oid, off = pairs[idx]
        return parse_object(_Lexer(payload, first + off))

    def obj(self, oid: int):
        if oid in self._cache:
            return self._cache[oid]
        entry = self.offsets.get(oid)
        if entry is None:
            raise PdfError(f"object {oid} not in xref")
        if entry[0] == "d":
            body = self._parse_object_at(entry[1], expect_id=oid)
        else:
            body = self._load_from_objstm(entry[1], entry[2])
        self._cache[oid] = body
        return body

    def resolve(self, v):
        while isinstance(v, tuple) and v[0] == "ref":
            v = self.obj(v[1])
        return v


# --------------------------------------------------------------------------
# content-stream tokenization -> line structs
# --------------------------------------------------------------------------

def _tokenize_content(stream: bytes) -> list[tuple]:
    """Content stream -> [(operator, [operands])] preserving order."""
    lex = _Lexer(stream)
    ops: list[tuple] = []
    stack: list = []
    while True:
        lex._skip_ws()
        if lex.pos >= len(stream):
            break
        c = stream[lex.pos : lex.pos + 1]
        if c in b"/(<[" or c.isdigit() or c in b"+-.":
            stack.append(parse_object(lex))
            continue
        tok = lex.next_token().decode("latin-1")
        ops.append((tok, stack))
        stack = []
    return ops


def _content_stream(doc: PdfDocument, page: dict) -> bytes:
    """A page's content bytes. /Contents is OPTIONAL (a blank page is
    legal) and may be either one stream or an ARRAY of streams whose
    concatenation forms the content (very common in real writers) —
    both previously fell through to b'' or a KeyError quarantine."""
    contents = doc.resolve(page.get("Contents"))
    if contents is None:
        return b""
    parts = contents if isinstance(contents, list) else [contents]
    streams = []
    for part in parts:
        part = doc.resolve(part)
        if isinstance(part, dict) and "__stream__" in part:
            streams.append(part["__stream__"])
    # the spec concatenation point is a token boundary: join with \n
    return b"\n".join(streams)


def _page_lines(doc: PdfDocument, page: dict, mb: list[float]) -> list[dict]:
    res = doc.resolve(page.get("Resources", {})) or {}
    fonts = {
        name: doc.resolve(ref)
        for name, ref in (doc.resolve(res.get("Font", {})) or {}).items()
    }
    xobjects = {
        name: doc.resolve(ref)
        for name, ref in (doc.resolve(res.get("XObject", {})) or {}).items()
    }
    stream = _content_stream(doc, page)

    # bbox space is PAGE-relative top-left: flip against the MediaBox TOP
    # (mb[3]) and shift x by the MediaBox origin (mb[0]) — a nonzero
    # origin otherwise shifts every line and misclassifies the
    # header/footer margins downstream (rules.in_body)
    x_org, y_top_org = mb[0], mb[3]

    lines: list[dict] = []
    color = 0
    font_name, size = "", 0.0
    x = y_pdf = 0.0
    leading = 0.0  # TL / TD state, consumed by T* and '
    ctm: list[float] | None = None

    def show(text: str) -> None:
        _emit_text(lines, text, x - x_org, y_pdf, size, font_name, color, y_top_org)

    for op, args in _tokenize_content(stream):
        if op == "rg" and len(args) == 3:
            r, g, b = (round(float(a) * 255) for a in args)
            color = (r << 16) | (g << 8) | b
        elif op == "Tf" and len(args) == 2:
            fobj = fonts.get(args[0][1] if isinstance(args[0], tuple) else args[0], {})
            # BaseFont may be an indirect reference — resolve before
            # reading the name tuple (an unresolved ('ref', n) indexed
            # [1] yields an int and a downstream TypeError quarantine)
            base = doc.resolve(fobj.get("BaseFont")) if isinstance(fobj, dict) else None
            font_name = base[1] if isinstance(base, tuple) and base[0] == "name" else ""
            size = float(args[1])
        elif op == "Tm" and len(args) == 6:
            x, y_pdf = float(args[4]), float(args[5])
        elif op == "Td" and len(args) == 2:
            x += float(args[0])
            y_pdf += float(args[1])
        elif op == "TD" and len(args) == 2:  # Td that also sets leading = -ty
            leading = -float(args[1])
            x += float(args[0])
            y_pdf += float(args[1])
        elif op == "TL" and len(args) == 1:
            leading = float(args[0])
        elif op == "T*" and not args:
            y_pdf -= leading
        elif op == "cm" and len(args) == 6:
            ctm = [float(a) for a in args]
        elif op == "Do" and len(args) == 1:
            name = args[0][1] if isinstance(args[0], tuple) else str(args[0])
            xo = xobjects.get(name, {})
            payload = xo.get("__stream__", b"") if isinstance(xo, dict) else b""
            w = ctm[0] if ctm else 0.0
            h = ctm[3] if ctm else 0.0
            ix = ctm[4] if ctm else 0.0
            iy = ctm[5] if ctm else 0.0
            y_top = y_top_org - iy - h
            lines.append({
                "text": "", "size": 0.0, "flags": 0, "font": "", "color": 0,
                "block_type": 1, "media_ref": payload.decode("latin-1"),
                "bbox": {"x0": ix - x_org, "y0": y_top,
                         "x1": ix - x_org + w, "y1": y_top + h},
            })
            ctm = None
        elif op == "Tj" and len(args) == 1:
            show(args[0][1] if isinstance(args[0], tuple) else str(args[0]))
        elif op == "'" and len(args) == 1:
            # ' = move to next line (T*) THEN show — without the advance
            # every '-emitted line stacks at one stale position
            y_pdf -= leading
            show(args[0][1] if isinstance(args[0], tuple) else str(args[0]))
        elif op == '"' and len(args) == 3:
            # " = set word/char spacing, next line, show
            y_pdf -= leading
            show(args[2][1] if isinstance(args[2], tuple) else str(args[2]))
        elif op == "TJ" and len(args) == 1 and isinstance(args[0], list):
            show("".join(a[1] for a in args[0] if isinstance(a, tuple) and a[0] == "str"))
    return lines


def _emit_text(lines, text, x, y_pdf, size, font_name, color, y_top_org) -> None:
    y_top = y_top_org - y_pdf
    flags = FLAG_BOLD if "Bold" in font_name else 0
    lines.append({
        "text": text, "size": size, "flags": flags, "font": font_name,
        "color": color, "block_type": 0, "media_ref": "",
        "bbox": {"x0": x, "y0": y_top,
                 "x1": x + 0.5 * size * max(len(text), 1),
                 "y1": y_top + size * 1.2},
    })


def parse_pdf(data: bytes) -> list[dict]:
    """bytes -> [PARSED_PAGE dict] (page, page_w, page_h, lines).

    Contract: ANY corrupt input raises :class:`PdfError` — internal
    failures from mangled bytes (int() on a damaged xref token, a
    missing dict key, zlib.error from a broken FlateDecode stream, ...)
    are wrapped, so callers quarantining corrupt documents need exactly
    one except clause and a task can never die on a byte flip."""
    try:
        return _parse_pdf_unwrapped(data)
    except PdfError:
        raise
    except Exception as e:  # corrupt bytes surface as arbitrary types
        raise PdfError(f"corrupt pdf: {type(e).__name__}: {e}") from e


_MAX_PAGE_TREE_DEPTH = 64  # malformed cyclic trees must quarantine, not recurse forever

# attributes a /Pages node passes down to its kids (PDF 32000-1 7.7.3.4)
_INHERITABLE = ("MediaBox", "Resources", "CropBox", "Rotate")


def _walk_pages(doc: "PdfDocument", node, inherited: dict, depth: int = 0) -> list[dict]:
    """Flatten the page tree in document order: real writers emit
    BALANCED trees (intermediate /Pages nodes) for larger documents, and
    leaf pages legally inherit MediaBox/Resources from their ancestors —
    a flat-Kids-only walk quarantines whole classes of valid PDFs."""
    if depth > _MAX_PAGE_TREE_DEPTH:
        raise PdfError(f"page tree deeper than {_MAX_PAGE_TREE_DEPTH} (cycle?)")
    node = doc.resolve(node)
    attrs = dict(inherited)
    for k in _INHERITABLE:
        if k in node:
            attrs[k] = node[k]
    kids = doc.resolve(node.get("Kids"))
    node_type = node.get("Type")
    is_pages = (
        isinstance(node_type, tuple) and node_type[1] == "Pages"
    ) or (kids is not None and "Contents" not in node)
    if is_pages and kids is not None:
        out: list[dict] = []
        for kid in kids:
            out.extend(_walk_pages(doc, kid, attrs, depth + 1))
        return out
    return [{**attrs, **node}]


def _parse_pdf_unwrapped(data: bytes) -> list[dict]:
    doc = PdfDocument(data)
    root = doc.resolve(doc.trailer["Root"])
    out = []
    for i, page in enumerate(_walk_pages(doc, root["Pages"], {}), 1):
        mb = [float(doc.resolve(v)) for v in doc.resolve(page["MediaBox"])]
        page_w, page_h = mb[2] - mb[0], mb[3] - mb[1]
        out.append({
            "page": i, "page_w": page_w, "page_h": page_h,
            "lines": _page_lines(doc, page, mb),
        })
    return out
