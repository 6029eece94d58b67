"""Seeded synthetic corpus generator (FIXTURES.md §1-§3, §6).

Generates, deterministically (no external data, no wall clock):
  * ``documents`` rows in the BASELINE.json ``input_hint`` shape —
    interleaved text+media spans that simulate PDF line fragments:
    mid-sentence fragment breaks, brackets opened in one fragment and
    closed in a later one, dot-leader TOC lines, leading bullets,
    repeated header/footer lines at page boundaries, numbered / ALL-CAPS
    headings, and media spans at reading-order positions;
  * ``raw_blocks`` rows (styled layout fixtures) for the layout stage;
  * paired ``fragments_kr`` / ``fragments_en`` alignment fixtures.

~5% of documents are "giant" (×50 spans) to exercise skew salting.
Everything keys off ``random.Random((seed << k) ^ doc_index)`` (a
distinct shift per fixture family) so any document is
reproducible in isolation (needed for distributed generation).
"""

from __future__ import annotations

import random

WORDS = (
    "the quick brown fox jumps over a lazy dog while carefully measured "
    "systems process large volumes of layered data across distributed "
    "partitions using vectorized kernels and columnar storage with "
    "predictable latency under heavy concurrent analytical load"
).split()

HEADING_WORDS = (
    "introduction overview methods analysis results discussion appendix "
    "background evaluation architecture implementation conclusion summary "
    "scope definitions requirements procedures safety operations"
).split()

BULLETS = ["- ", "• ", "· ", "– "]


def _sentence(rng: random.Random, min_w: int = 4, max_w: int = 14) -> str:
    n = rng.randint(min_w, max_w)
    ws = [rng.choice(WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    # occasional parenthetical clause (may straddle fragment boundaries)
    if n >= 7 and rng.random() < 0.25:
        i = rng.randint(1, n - 3)
        j = rng.randint(i + 1, n - 1)
        ws[i] = "(" + ws[i]
        ws[j] = ws[j] + ")"
    return " ".join(ws) + rng.choice(".....??!")


def _heading(rng: random.Random, level: int, sec: list[int]) -> str:
    title = " ".join(rng.choice(HEADING_WORDS) for _ in range(rng.randint(1, 3))).title()
    if level == 1:
        if rng.random() < 0.3:
            return title.upper()
        return f"{sec[0]}. {title}"
    if level == 2:
        return f"{sec[0]}.{sec[1]} {title}"
    return title.split()[0] + ":"


def make_document(doc_index: int, seed: int = 42) -> dict:
    """One synthetic document in input_hint shape."""
    rng = random.Random((seed << 20) ^ doc_index)
    doc_id = f"doc{doc_index:08d}"
    giant = rng.random() < 0.05
    n_spans = rng.randint(2, 200) * (50 if giant else 1)

    header_line = f"Corpus Technical Report {1000 + doc_index % 97}"
    footer_tmpl = "Page {p} of many"
    page_len = rng.randint(10, 16)

    spans: list[dict] = []
    sec = [0, 0]
    media_k = 0
    page = 1
    pos_in_page = 0

    def emit(kind: str, text: str, media_ref: str = "") -> None:
        spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                      "offset": len(spans)})

    # leading running header
    emit("text", header_line)
    while len(spans) < n_spans:
        pos_in_page += 1
        if pos_in_page >= page_len:
            # page boundary: footer + next header (boilerplate to strip)
            emit("text", footer_tmpl.format(p=page))
            page += 1
            pos_in_page = 0
            emit("text", header_line)
            continue
        r = rng.random()
        if r < 0.06:
            sec[0] += 1
            sec[1] = 0
            emit("text", _heading(rng, 1, sec))
        elif r < 0.12:
            sec[1] += 1
            emit("text", _heading(rng, 2, sec))
        elif r < 0.16:
            emit("text", _heading(rng, 3, sec))
        elif r < 0.22:
            media_k += 1
            emit("media", "", f"m:{doc_id}:{media_k}")
        elif r < 0.27:
            # dot-leader TOC line
            emit("text", f"{rng.choice(HEADING_WORDS).title()} {'.' * rng.randint(5, 30)} {rng.randint(1, 99)}.")
        else:
            # body sentence, fragmented into 1-4 pieces at word boundaries
            s = _sentence(rng)
            if rng.random() < 0.2:
                s = rng.choice(BULLETS) + s
            words = s.split(" ")
            pieces = []
            k = rng.randint(1, min(4, len(words)))
            cuts = sorted(rng.sample(range(1, len(words)), k - 1)) if k > 1 else []
            prev = 0
            for c in cuts + [len(words)]:
                pieces.append(" ".join(words[prev:c]))
                prev = c
            for p in pieces:
                # simulate ragged PDF whitespace
                if rng.random() < 0.15:
                    p = "  " + p + " "
                emit("text", p)
    return {"doc_id": doc_id, "spans": spans}


def make_corpus(n_docs: int, seed: int = 42) -> list[dict]:
    return [make_document(i, seed) for i in range(n_docs)]


# --------------------------------------------------------------------------
# styled layout fixtures (FIXTURES.md §2)
# --------------------------------------------------------------------------

BODY_SIZE = 10.0
H3_COLOR_CHOICES = (3101846, 3036053, 352961, 353217)


def make_raw_blocks_doc(doc_index: int, seed: int = 42) -> list[dict]:
    """Styled pages for one doc: rows (doc_id,page,page_w,page_h,lines)."""
    rng = random.Random((seed << 21) ^ doc_index)
    doc_id = f"ldoc{doc_index:06d}"
    n_pages = rng.randint(1, 4)
    page_w, page_h = 595.0, 842.0
    rows = []
    for page in range(1, n_pages + 1):
        two_col = rng.random() < 0.5
        lines = []

        def add(text, size, flags, color, x0, y0, block_type=0, media_ref=""):
            lines.append({
                "text": text, "size": size, "flags": flags, "font": "F1",
                "color": color, "block_type": block_type, "media_ref": media_ref,
                "bbox": {"x0": x0, "y0": y0, "x1": x0 + 200.0, "y1": y0 + size * 1.2},
            })

        # margin boilerplate (must be stripped by F1)
        add("RUNNING HEAD", 8.0, 0, 0, 50.0, 10.0)
        add(f"page {page}", 8.0, 0, 0, 50.0, 830.0)

        cols = ([60.0, 320.0] if two_col else [60.0])
        y_starts = {c: 60.0 for c in cols}
        n_lines = rng.randint(6, 18)
        for _ in range(n_lines):
            c = rng.choice(cols)
            y = y_starts[c]
            y_starts[c] += rng.uniform(14.0, 22.0)
            if y > 780.0:
                continue
            r = rng.random()
            if r < 0.08:
                add(" ".join(rng.choice(HEADING_WORDS) for _ in range(2)).title(),
                    BODY_SIZE * 1.6, 16, 0, c, y)  # H1: big + bold
            elif r < 0.16:
                add(rng.choice(HEADING_WORDS).title(), BODY_SIZE, 16, 0, c, y)  # H2: bold
            elif r < 0.22:
                add(rng.choice(HEADING_WORDS).title(), BODY_SIZE, 16,
                    rng.choice(H3_COLOR_CHOICES), c, y)  # H3: bold + color
            elif r < 0.3:
                add("", 0.0, 0, 0, c, y, block_type=1,
                    media_ref=f"m:{doc_id}:{page}:{int(y)}")  # image block
            else:
                add(_sentence(rng, 3, 9), BODY_SIZE, 0, 0, c, y)
        rows.append({"doc_id": doc_id, "page": page, "page_w": page_w,
                     "page_h": page_h, "lines": lines})
    return rows


# --------------------------------------------------------------------------
# alignment fixtures (FIXTURES.md §6)
# --------------------------------------------------------------------------

def make_alignment_doc(doc_index: int, seed: int = 42) -> tuple[list[dict], list[dict]]:
    """Paired pseudo-translation fragment lists (kr, en) for one doc.

    'kr' text is the en text with a standalone 'kr ' marker token
    prepended — a deterministic stand-in for translation (align.py's
    hash embedding special-cases the bare 'kr' token, so both sides of
    a true pair land near each other).
    Some en items are dropped (exercises left/anti/full-outer joins); P
    items within a section are locally permuted (exercises greedy match).
    """
    rng = random.Random((seed << 22) ^ doc_index)
    doc_id = f"adoc{doc_index:06d}"
    kr, en = [], []
    n_sections = rng.randint(2, 5)
    idx_kr = idx_en = 0
    for s in range(1, n_sections + 1):
        title = f"{s}. " + " ".join(rng.choice(HEADING_WORDS) for _ in range(2)).title()
        kr.append({"doc_id": doc_id, "idx": idx_kr, "id": idx_kr + 1,
                   "text": "kr " + title, "source_type": "H1"})
        en.append({"doc_id": doc_id, "idx": idx_en, "id": idx_en + 1,
                   "text": title, "source_type": "H1"})
        idx_kr += 1
        idx_en += 1
        n_p = rng.randint(2, 6)
        sents = [_sentence(rng, 4, 10) for _ in range(n_p)]
        perm = list(range(n_p))
        if n_p > 2 and rng.random() < 0.5:
            i = rng.randrange(n_p - 1)
            perm[i], perm[i + 1] = perm[i + 1], perm[i]
        for j in perm:
            kr.append({"doc_id": doc_id, "idx": idx_kr, "id": idx_kr + 1,
                       "text": "kr " + sents[j], "source_type": "P"})
            idx_kr += 1
        for j in range(n_p):
            if rng.random() < 0.15:
                continue  # dropped on the en side
            en.append({"doc_id": doc_id, "idx": idx_en, "id": idx_en + 1,
                       "text": sents[j], "source_type": "P"})
            idx_en += 1
    return kr, en
