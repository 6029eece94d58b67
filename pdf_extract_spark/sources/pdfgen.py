"""Deterministic miniature-PDF writer (SURVEY.md §7.1 'synthetic PDF-like
fixture format').

Emits REAL PDF 1.4 syntax — header, numbered objects, page tree,
uncompressed content streams with text-positioning/text-showing operators,
image XObjects, a byte-exact xref table and trailer — so the parser in
``pdfparse.py`` exercises genuine byte-level work (offset walk, object
parse, content-stream tokenization) without any external corpus, and the
expected line structure is computable exactly (``doc_lines`` below).

The content model mirrors what the reference reads out of PyMuPDF
(/root/reference/euaa_사례/pdf_to_json/layout_analyzer.py:73-114): lines
with text, font size, bold flag, color, and bbox. Boldness is encoded the
way real PDFs do it — a separate bold font resource (/F2) — and mapped
back to the reference's flag bit 16 by the parser.
"""

from __future__ import annotations

import random
import re

from pdf_extract_spark.generator import HEADING_WORDS, _sentence
from pdf_extract_spark.rules import FLAG_BOLD

PAGE_W, PAGE_H = 595.0, 842.0
BODY_SIZE = 10.0
H3_COLOR = 3101846  # one of the reference's H3 colors (config.py:41-44)


def _esc(t: str) -> str:
    return t.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


# --------------------------------------------------------------------------
# document model -> PDF bytes
# --------------------------------------------------------------------------

def _grid_page_lines(doc_index: int) -> list[dict]:
    """A deterministic 3x3 table grid (plus the standard margin
    boilerplate): three x0-aligned columns at 60/140/220 over three y0
    rows at 100/130/160 — the shape rules.detect_table_lines must
    classify as kind='table' (the reference's 'table' source_type,
    main.py:316-338). All columns sit left of page_w/2 so the two-column
    reading-order sweep keeps the grid row-major."""
    lines: list[dict] = [
        {"text": "CONFIDENTIAL DRAFT", "size": 8.0, "bold": False,
         "color": 0, "x": 200.0, "y_top": 15.0, "media_ref": ""},
    ]
    for r in range(3):
        for c in range(3):
            lines.append({
                "text": f"cell r{r} c{c} d{doc_index}", "size": BODY_SIZE,
                "bold": False, "color": 0,
                "x": 60.0 + 80.0 * c, "y_top": 100.0 + 30.0 * r,
                "media_ref": "",
            })
    return lines


def doc_lines(doc_index: int, seed: int = 42,
              with_table: bool = False) -> list[list[dict]]:
    """The structural truth for one synthetic document: per page, a list of
    {text, size, bold, color, x, y_top, media_ref} in EMISSION order
    (which is not reading order — two-column pages interleave columns, so
    the parser+layout stage must re-sort, exercising W3).

    ``with_table`` appends one extra grid-only page (after the rng-driven
    pages, so the random sequence — and every existing golden — is
    untouched)."""
    rng = random.Random((seed << 23) ^ doc_index)
    n_pages = rng.randint(1, 3)
    pages: list[list[dict]] = []
    for page in range(1, n_pages + 1):
        two_col = rng.random() < 0.5
        lines: list[dict] = []
        # margin boilerplate that F1 must strip
        lines.append({"text": "CONFIDENTIAL DRAFT", "size": 8.0, "bold": False,
                      "color": 0, "x": 200.0, "y_top": 15.0, "media_ref": ""})
        lines.append({"text": f"- {page} -", "size": 8.0, "bold": False,
                      "color": 0, "x": 280.0, "y_top": 825.0, "media_ref": ""})
        cols = [60.0, 320.0] if two_col else [60.0]
        y_at = {c: 60.0 for c in cols}
        for _ in range(rng.randint(5, 14)):
            c = rng.choice(cols)
            y = y_at[c]
            y_at[c] += rng.uniform(16.0, 24.0)
            if y > 770.0:
                continue
            r = rng.random()
            if r < 0.10:
                lines.append({"text": " ".join(rng.choice(HEADING_WORDS)
                                               for _ in range(2)).title(),
                              "size": BODY_SIZE * 1.6, "bold": True, "color": 0,
                              "x": c, "y_top": y, "media_ref": ""})
            elif r < 0.18:
                lines.append({"text": rng.choice(HEADING_WORDS).title(),
                              "size": BODY_SIZE, "bold": True, "color": 0,
                              "x": c, "y_top": y, "media_ref": ""})
            elif r < 0.24:
                lines.append({"text": rng.choice(HEADING_WORDS).title(),
                              "size": BODY_SIZE, "bold": True, "color": H3_COLOR,
                              "x": c, "y_top": y, "media_ref": ""})
            elif r < 0.32:
                lines.append({"text": "", "size": 0.0, "bold": False, "color": 0,
                              "x": c, "y_top": y,
                              "media_ref": f"img:p{page}:{int(y)}"})
            else:
                lines.append({"text": _sentence(rng, 3, 9), "size": BODY_SIZE,
                              "bold": False, "color": 0,
                              "x": c, "y_top": y, "media_ref": ""})
        pages.append(lines)
    if with_table:
        pages.append(_grid_page_lines(doc_index))
    return pages


def _content_stream(lines: list[dict]) -> bytes:
    """One page's content stream: rg color, Tf font select (F1 regular /
    F2 bold), Tm positioning (PDF y-up coordinates), Tj text; images as
    q/cm/Do/Q on named XObjects."""
    ops: list[str] = []
    img_i = 0
    for ln in lines:
        if ln["media_ref"]:
            img_i += 1
            y_pdf = PAGE_H - ln["y_top"] - 40.0
            ops.append(f"q 80 0 0 40 {ln['x']:.1f} {y_pdf:.1f} cm /Im{img_i} Do Q")
            continue
        y_pdf = PAGE_H - ln["y_top"]
        c = ln["color"]
        r, g, b = (c >> 16) & 255, (c >> 8) & 255, c & 255
        font = "/F2" if ln["bold"] else "/F1"
        ops.append(
            f"BT {r / 255:.4f} {g / 255:.4f} {b / 255:.4f} rg "
            f"{font} {ln['size']:.1f} Tf "
            f"1 0 0 1 {ln['x']:.1f} {y_pdf:.1f} Tm "
            f"({_esc(ln['text'])}) Tj ET"
        )
    return ("\n".join(ops)).encode("latin-1", "replace")


def build_pdf(doc_index: int, seed: int = 42, variant: str = "classic",
              with_table: bool = False) -> bytes:
    """Assemble the full PDF file: catalog(1) pages(2) fonts(3,4) then per
    page [page obj, content obj, image XObjects...], xref, trailer.

    Variants (all carrying identical content — ``expected_pages`` is the
    single truth):
      * ``classic``     — uncompressed objects, classic xref table;
      * ``objstm``      — dictionary objects packed into a FlateDecode
        /ObjStm object stream, content streams FlateDecode-compressed,
        cross-reference STREAM (/Type /XRef, W-encoded binary entries,
        type-2 pointers into the object stream) instead of a table —
        the modern PDF 1.5+ layout the north star's 'object-stream walk'
        refers to;
      * ``objstm2``     — objstm with objects split ACROSS TWO object
        streams;
      * ``incremental`` — classic objects split across TWO xref sections
        chained by /Prev (an incrementally-updated file);
      * ``multigen``    — incremental with FOUR /Prev generations;
      * ``hybrid``      — classic xref table PLUS an /XRefStm hop
        (hybrid-reference file). Unknown variants raise.
    """
    pages = doc_lines(doc_index, seed, with_table=with_table)
    objects: dict[int, bytes] = {}
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    objects[4] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>"

    next_id = 5
    page_ids: list[int] = []
    for lines in pages:
        imgs = [ln for ln in lines if ln["media_ref"]]
        xobj_ids: list[int] = []
        for k, ln in enumerate(imgs, 1):
            xid = next_id
            next_id += 1
            payload = ln["media_ref"].encode()
            objects[xid] = (
                b"<< /Type /XObject /Subtype /Image /Width 80 /Height 40"
                b" /ColorSpace /DeviceRGB /BitsPerComponent 8 /Name /"
                + f"Im{k}".encode()
                + b" /Length " + str(len(payload)).encode()
                + b" >>\nstream\n" + payload + b"\nendstream"
            )
            xobj_ids.append(xid)
        content = _content_stream(lines)
        cid = next_id
        next_id += 1
        objects[cid] = (
            b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content + b"\nendstream"
        )
        pid = next_id
        next_id += 1
        xdict = b""
        if xobj_ids:
            xdict = (
                b" /XObject << "
                + b" ".join(
                    f"/Im{k}".encode() + b" " + str(x).encode() + b" 0 R"
                    for k, x in enumerate(xobj_ids, 1)
                )
                + b" >>"
            )
        objects[pid] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 "
            + f"{PAGE_W:.0f} {PAGE_H:.0f}".encode()
            + b"] /Resources << /Font << /F1 3 0 R /F2 4 0 R >>"
            + xdict
            + b" >> /Contents " + str(cid).encode() + b" 0 R >>"
        )
        page_ids.append(pid)

    objects[2] = (
        b"<< /Type /Pages /Kids ["
        + b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
        + b"] /Count " + str(len(page_ids)).encode() + b" >>"
    )

    if variant == "objstm":
        return _serialize_objstm(objects)
    if variant == "objstm2":
        return _serialize_objstm(objects, n_streams=2)
    if variant == "incremental":
        return _serialize_incremental(objects)
    if variant == "multigen":
        return _serialize_incremental(objects, n_gens=4)
    if variant == "hybrid":
        return _serialize_hybrid(objects)
    if variant != "classic":
        # a typo'd variant silently serializing as classic would let a
        # test pass while exercising NONE of the layout it names
        raise ValueError(f"unknown pdf variant: {variant!r}")
    return _serialize_classic(objects)


def _serialize_classic(objects: dict[int, bytes]) -> bytes:
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for oid in sorted(objects):
        offsets[oid] = len(out)
        out += str(oid).encode() + b" 0 obj\n" + objects[oid] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objects) + 1
    out += b"xref\n0 " + str(n).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for oid in range(1, n):
        out += f"{offsets[oid]:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(n).encode() + b" /Root 1 0 R >>\n"
        b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def _serialize_incremental(objects: dict[int, bytes], n_gens: int = 2) -> bytes:
    """``n_gens`` generations: objects split across chained incremental
    updates, each appending its own classic xref section with /Prev
    pointing at the previous generation (newer section wins lookup) —
    the shape of a PDF edited and re-saved ``n_gens - 1`` times."""
    oids = sorted(objects)
    n_gens = max(1, min(n_gens, len(oids)))
    step = -(-len(oids) // n_gens)  # ceil division
    gens = [oids[i : i + step] for i in range(0, len(oids), step)]
    n = max(objects) + 1

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    prev_at: int | None = None
    for gi, gen in enumerate(gens):
        for oid in gen:
            offsets[oid] = len(out)
            out += str(oid).encode() + b" 0 obj\n" + objects[oid] + b"\nendobj\n"
        xref_at = len(out)
        out += b"xref\n"
        if gi == 0:
            out += b"0 1\n0000000000 65535 f \n"
        # per-object subsections (a generation's ids need not be contiguous)
        for oid in gen:
            out += str(oid).encode() + b" 1\n" + f"{offsets[oid]:010d} 00000 n \n".encode()
        trailer = b"trailer\n<< /Size " + str(n).encode() + b" /Root 1 0 R"
        if prev_at is not None:
            trailer += b" /Prev " + str(prev_at).encode()
        out += trailer + b" >>\nstartxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
        prev_at = xref_at
    return bytes(out)


def _is_stream_body(body: bytes) -> bool:
    return b"\nstream\n" in body


def _build_objstm(dict_ids: list[int], objects: dict[int, bytes]) -> bytes:
    """One /ObjStm body: header 'oid off oid off ...' then the packed
    object bodies, FlateDecode-compressed."""
    import zlib

    bodies = [objects[o] for o in dict_ids]
    offs = []
    pos = 0
    for b in bodies:
        offs.append(pos)
        pos += len(b) + 1
    header = " ".join(f"{o} {off}" for o, off in zip(dict_ids, offs)).encode() + b"\n"
    payload = header + b"\n".join(bodies) + b"\n"
    compressed = zlib.compress(payload)
    return (
        b"<< /Type /ObjStm /N " + str(len(dict_ids)).encode()
        + b" /First " + str(len(header)).encode()
        + b" /Filter /FlateDecode /Length " + str(len(compressed)).encode()
        + b" >>\nstream\n" + compressed + b"\nendstream"
    )


def _write_flate_streams(out: bytearray, stream_ids: list[int],
                         objects: dict[int, bytes], offsets: dict[int, int]) -> None:
    """Append the regular stream objects, FlateDecode-recompressed."""
    import zlib

    for oid in stream_ids:
        body = objects[oid]
        head, rest = body.split(b"\nstream\n", 1)
        raw = rest.rsplit(b"\nendstream", 1)[0]
        comp = zlib.compress(raw)
        # rewrite /Length and add /Filter
        head = re.sub(rb"/Length \d+", b"/Length " + str(len(comp)).encode(), head)
        head = head[:-3] + b" /Filter /FlateDecode >>"
        offsets[oid] = len(out)
        out += (
            str(oid).encode() + b" 0 obj\n" + head + b"\nstream\n" + comp
            + b"\nendstream\nendobj\n"
        )


def _xref_stream_entries(n: int, offsets: dict[int, int],
                         in_stream: dict[int, tuple[int, int]],
                         xref_id: int, xref_at: int) -> bytes:
    """W [1 4 2] binary rows for ids 0..n-1: type 1 = direct offset,
    type 2 = (objstm id, index)."""
    entries = bytearray()
    for oid in range(n):
        if oid == 0:
            t, f2, f3 = 0, 0, 65535
        elif oid == xref_id:
            t, f2, f3 = 1, xref_at, 0
        elif oid in offsets:
            t, f2, f3 = 1, offsets[oid], 0
        elif oid in in_stream:
            t, f2, f3 = 2, in_stream[oid][0], in_stream[oid][1]
        else:
            t, f2, f3 = 0, 0, 0
        entries += bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
    return bytes(entries)


def _serialize_objstm(objects: dict[int, bytes], n_streams: int = 1) -> bytes:
    """PDF 1.5+ layout: non-stream objects packed into ``n_streams``
    FlateDecode /ObjStm streams (round-robin — with 2+ streams, objects
    referenced from one page resolve ACROSS object streams); stream
    objects FlateDecode-compressed; cross-reference STREAM with W [1 4 2]
    binary entries (type 1 = direct offset, type 2 = (objstm, index))."""
    import zlib

    dict_ids = [o for o in sorted(objects) if not _is_stream_body(objects[o])]
    stream_ids = [o for o in sorted(objects) if _is_stream_body(objects[o])]
    n_streams = max(1, min(n_streams, len(dict_ids)))
    groups = [dict_ids[s::n_streams] for s in range(n_streams)]
    objstm_ids = [max(objects) + 1 + s for s in range(n_streams)]
    xref_id = max(objects) + n_streams + 1

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    _write_flate_streams(out, stream_ids, objects, offsets)
    in_stream: dict[int, tuple[int, int]] = {}
    for sid, group in zip(objstm_ids, groups):
        offsets[sid] = len(out)
        out += str(sid).encode() + b" 0 obj\n" + _build_objstm(group, objects) + b"\nendobj\n"
        for idx, oid in enumerate(group):
            in_stream[oid] = (sid, idx)

    n = xref_id + 1
    xref_at = len(out)
    entries = _xref_stream_entries(n, offsets, in_stream, xref_id, xref_at)
    xcomp = zlib.compress(entries)
    out += (
        str(xref_id).encode() + b" 0 obj\n<< /Type /XRef /Size " + str(n).encode()
        + b" /W [1 4 2] /Root 1 0 R /Filter /FlateDecode /Length "
        + str(len(xcomp)).encode() + b" >>\nstream\n" + xcomp + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    return bytes(out)


def _serialize_hybrid(objects: dict[int, bytes]) -> bytes:
    """A HYBRID-reference file (PDF 1.5 §7.5.8.4): startxref points at a
    CLASSIC table listing only the direct stream objects, whose trailer
    carries /XRefStm pointing at a cross-reference STREAM that indexes
    the /ObjStm-packed dictionary objects — readers ignorant of xref
    streams see the table, modern readers merge the stream's entries
    with precedence. Exercises the parser's /XRefStm hop."""
    import zlib

    dict_ids = [o for o in sorted(objects) if not _is_stream_body(objects[o])]
    stream_ids = [o for o in sorted(objects) if _is_stream_body(objects[o])]
    objstm_id = max(objects) + 1
    xref_id = objstm_id + 1

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    _write_flate_streams(out, stream_ids, objects, offsets)
    offsets[objstm_id] = len(out)
    out += (
        str(objstm_id).encode() + b" 0 obj\n"
        + _build_objstm(dict_ids, objects) + b"\nendobj\n"
    )
    in_stream = {oid: (objstm_id, idx) for idx, oid in enumerate(dict_ids)}

    # the xref STREAM covers ONLY the packed objects + the objstm +
    # itself, restricted via /Index subsection ranges (PDF 32000
    # §7.5.8.4) — real hybrid files do NOT declare the table-covered
    # objects free in the stream, so neither does this fixture
    n = xref_id + 1
    xrefstm_at = len(out)
    covered = sorted([*dict_ids, objstm_id, xref_id])
    ranges: list[tuple[int, int]] = []
    for oid in covered:
        if ranges and oid == ranges[-1][0] + ranges[-1][1]:
            ranges[-1] = (ranges[-1][0], ranges[-1][1] + 1)
        else:
            ranges.append((oid, 1))
    rows = bytearray()
    for oid in covered:
        if oid == xref_id:
            t, f2, f3 = 1, xrefstm_at, 0
        elif oid == objstm_id:
            t, f2, f3 = 1, offsets[objstm_id], 0
        else:
            t, f2, f3 = 2, in_stream[oid][0], in_stream[oid][1]
        rows += bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
    xcomp = zlib.compress(bytes(rows))
    index = b" ".join(
        str(x).encode() for pair in ranges for x in pair
    )
    out += (
        str(xref_id).encode() + b" 0 obj\n<< /Type /XRef /Size " + str(n).encode()
        + b" /Index [" + index + b"]"
        + b" /W [1 4 2] /Root 1 0 R /Filter /FlateDecode /Length "
        + str(len(xcomp)).encode() + b" >>\nstream\n" + xcomp + b"\nendstream\nendobj\n"
    )

    # the classic table: direct objects only, trailer hops via /XRefStm
    xref_at = len(out)
    out += b"xref\n0 1\n0000000000 65535 f \n"
    for oid in stream_ids:
        out += str(oid).encode() + b" 1\n" + f"{offsets[oid]:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(n).encode() + b" /Root 1 0 R /XRefStm "
        + str(xrefstm_at).encode() + b" >>\nstartxref\n"
        + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


# --------------------------------------------------------------------------
# the structural truth in parser-output shape (for parity tests)
# --------------------------------------------------------------------------

def expected_pages(doc_index: int, seed: int = 42,
                   with_table: bool = False) -> list[dict]:
    """What pdfparse.parse_pdf must return for build_pdf(doc_index):
    the doc_lines model re-expressed as PARSED_PAGE dicts."""
    pages = []
    for p, lines in enumerate(doc_lines(doc_index, seed, with_table=with_table), 1):
        out_lines = []
        for ln in lines:
            # coordinates round-trip through the writer's %.1f formatting —
            # the expectation must see the same quantization the bytes carry
            x = float(f"{ln['x']:.1f}")
            if ln["media_ref"]:
                y_pdf = float(f"{PAGE_H - ln['y_top'] - 40.0:.1f}")
                y_top = PAGE_H - y_pdf - 40.0
                out_lines.append({
                    "text": "", "size": 0.0, "flags": 0, "font": "",
                    "color": 0, "block_type": 1, "media_ref": ln["media_ref"],
                    "bbox": {"x0": x, "y0": y_top,
                             "x1": x + 80.0, "y1": y_top + 40.0},
                })
                continue
            y_pdf = float(f"{PAGE_H - ln['y_top']:.1f}")
            y_top = PAGE_H - y_pdf
            size = float(f"{ln['size']:.1f}")
            c = ln["color"]
            rgb = ((((c >> 16) & 255) << 16) | (((c >> 8) & 255) << 8) | (c & 255))
            out_lines.append({
                "text": ln["text"], "size": size,
                "flags": FLAG_BOLD if ln["bold"] else 0,
                "font": "Helvetica-Bold" if ln["bold"] else "Helvetica",
                "color": rgb, "block_type": 0, "media_ref": "",
                "bbox": {"x0": x, "y0": y_top,
                         "x1": x + 0.5 * size * max(len(ln["text"]), 1),
                         "y1": y_top + size * 1.2},
            })
        pages.append({"page": p, "page_w": PAGE_W, "page_h": PAGE_H,
                      "lines": out_lines})
    return pages
