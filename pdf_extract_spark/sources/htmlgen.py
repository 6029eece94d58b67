"""Deterministic HTML page writer (the HTML twin of pdfgen.py).

Wraps a synthetic corpus document (generator.make_document — the
BASELINE.json input_hint span list) in realistic page chrome so
``htmlparse.html_to_spans`` has genuine boilerplate-stripping work to do:
site header, nav menu, breadcrumbs, sidebar, cookie banner, share bar,
footer, script/style blocks, and an UNMARKED link-dense "related
stories" container that only the link-density heuristic can catch.

Three file layouts (mirroring pdfgen's classic/incremental/objstm split):

  * ``semantic``  — HTML5 landmarks: chrome in <nav>/<header>/<aside>/
    <footer>, content inside <main><article>;
  * ``divsoup``   — no landmarks: chrome in <div class="site-nav">-style
    containers (class/id token heuristics) plus the unmarked link-dense
    div (density heuristic); content in a plain <div class="post-body">;
  * ``soup``      — tag soup: uppercase tags, unclosed <p>/<li>,
    unquoted attributes, stray end tags, comments — the tolerant tree
    builder's recovery rules do the work.

The structural truth is exact: ``expected_spans(d, seed)`` is the
generator document's span list, and the round-trip
``html_to_spans(build_html(d, seed, v)) == expected_spans(d, seed)``
holds for every variant (tests/test_html.py).
"""

from __future__ import annotations

import html as _html
import random

from pdf_extract_spark.generator import HEADING_WORDS, make_document

VARIANTS = ("semantic", "divsoup", "soup")


def expected_spans(doc_index: int, seed: int = 42) -> list[dict]:
    """The structural truth: the corpus document's interleaved spans."""
    return make_document(doc_index, seed=seed)["spans"]


def _esc(t: str) -> str:
    return _html.escape(t, quote=True)


def _link_items(rng: random.Random, n: int, fmt: str = '<li><a href="/{w}">{t}</a></li>') -> str:
    words = [rng.choice(HEADING_WORDS) for _ in range(n)]
    return "".join(fmt.format(w=w, t=w.title()) for w in words)


def _related_div(rng: random.Random) -> str:
    """Unmarked link-dense block: no landmark tag, no telltale class —
    only the >0.5 anchor-density rule can drop it."""
    items = "".join(
        '<li><a href="/story/{i}">{t}</a></li>'.format(
            i=i,
            t=" ".join(rng.choice(HEADING_WORDS) for _ in range(4)).title(),
        )
        for i in range(rng.randint(5, 9))
    )
    return f"<div><p>More</p><ul>{items}</ul></div>"


def _content_blocks(spans: list[dict], closed: bool = True) -> str:
    parts = []
    for s in spans:
        if s["kind"] == "media":
            parts.append(f'<img src="{_esc(s["media_ref"])}" alt="">')
        elif closed:
            parts.append(f"<p>{_esc(s['text'])}</p>")
        else:  # tag-soup: unclosed, uppercase — implied </p> rules close them
            parts.append(f"<P>{_esc(s['text'])}")
    # no separators: span text must round-trip byte-exact, and in the
    # unclosed-<P> layout a separator would leak into the open element
    return "".join(parts)


_HEAD = (
    "<head><title>{title}</title>"
    "<style>body{{margin:0;font:16px/1.5 serif}}.x{{color:#333}}</style>"
    '<script>window.__t={{"page":"{title}"}};</script>'
    "</head>"
)


def build_html(doc_index: int, seed: int = 42, variant: str = "semantic") -> bytes:
    """One deterministic HTML page wrapping document ``doc_index``."""
    if variant not in VARIANTS:
        raise ValueError(f"unknown variant {variant!r} (want one of {VARIANTS})")
    doc = make_document(doc_index, seed=seed)
    rng = random.Random((seed << 21) ^ (doc_index * 2654435761) ^ 0x51AB)
    title = f"Archive item {doc['doc_id']}"
    head = _HEAD.format(title=_esc(title))

    if variant == "semantic":
        page = f"""<!DOCTYPE html>
<html lang="en">{head}
<body>
<header><h1>Example Corpus Portal</h1><p>A trusted document archive</p></header>
<nav><ul>{_link_items(rng, 6)}</ul></nav>
<div class="breadcrumbs"><a href="/">Home</a> / <a href="/docs">Docs</a> / {_esc(doc["doc_id"])}</div>
<main>
<article>
{_content_blocks(doc["spans"])}
</article>
</main>
<aside><h3>Popular</h3><ul>{_link_items(rng, 5)}</ul></aside>
<footer><p>&copy; Example Corpus Portal &middot; <a href="/terms">Terms</a> <a href="/privacy">Privacy</a></p></footer>
</body>
</html>
"""
    elif variant == "divsoup":
        page = f"""<!DOCTYPE html>
<html>{head}
<body>
<div class="top-banner" id="cookie-notice"><p>We use cookies. <a href="/consent">Manage</a></p></div>
<div id="site-nav"><ul>{_link_items(rng, 7)}</ul></div>
<div class="post-body">
{_content_blocks(doc["spans"])}
</div>
{_related_div(rng)}
<div class="share-tools"><a href="#s1">Share</a> <a href="#s2">Post</a> <a href="#s3">Send</a></div>
<div id="page-footer"><p>&copy; Example Corpus Portal &mdash; <a href="/terms">Terms</a></p></div>
</body>
</html>
"""
    else:  # soup
        page = f"""<HTML>{head}
<BODY>
</div>
<!-- legacy template, do not edit -->
<DIV CLASS=site-nav><UL>{_link_items(rng, 5, '<LI><A HREF=/{w}>{t}')}</UL></DIV>
<DIV class=article-text>{_content_blocks(doc["spans"], closed=False)}</DIV>
<DIV id=page-footer><P>Copyright Example Corpus Portal<BR><A HREF=/terms>Terms</A></DIV>
</BODY>
</HTML>
"""
    return page.encode("utf-8")
