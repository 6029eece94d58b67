"""From-scratch main-content HTML extraction (the north rule's "HTML
boilerplate strip ... DOM heuristics" leg; the reference repo has no HTML
side, so the heuristics are the published readability/boilerpipe family —
tag classes + link density — re-expressed deterministically).

stdlib-only tolerant DOM: ``html.parser`` tokenizes; a light tree builder
applies HTML5-ish recovery rules (void elements, implied ``</p>``/
``</li>``/``</td>`` closes, stray end tags ignored) so real-world tag
soup parses instead of raising. Main-content selection is then a fixed
rule order:

  1. drop non-content subtrees by TAG (script/style/noscript/template/
     svg/iframe/form/...);
  2. drop boilerplate chrome by SEMANTIC tag (nav/header/footer/aside),
     ARIA role (navigation/banner/contentinfo/complementary), or
     class/id TOKEN (nav, menu, sidebar, footer, cookie, ...) — tokens
     are matched on ``[-_ ]``-split words, never substrings, so
     ``class="post-body"`` can never trip the ``nav`` token;
  3. drop LINK-DENSE containers (anchor-text chars / text chars > 0.5)
     — the density heuristic that catches unmarked "related links"
     blocks no tag or class rule can see;
  4. root at the first surviving ``<main>``/``<article>``, else
     ``<body>``;
  5. walk the remainder in document order emitting interleaved spans in
     the BASELINE.json input_hint shape: leaf BLOCK elements (h1-h6, p,
     li, td, pre, blockquote, ...) yield ``kind='text'`` spans — or
     ``kind='table'`` when under a ``<table>`` ancestor (the HTML twin
     of the layout path's grid cells; passes the rule-core FSM 1:1) —
     bare text directly inside containers (``<div>prose<br>more</div>``)
     flushes as one span per run between block boundaries, and ``<img>``
     yields ``kind='media'`` with ``media_ref = src`` at its
     reading-order position; offsets are sequential.

Malformed payloads raise :class:`HtmlError` — never anything else (a
DOM depth cap in the builder plus a RecursionError net in
``html_to_spans`` keep that true for adversarially nested soup) — so
the Spark wrapper (operators/html.py) can quarantine per document instead
of failing a 10^12-document job on one bad row.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = ["HtmlError", "parse_html", "html_to_spans"]


class HtmlError(ValueError):
    """Raised for payloads that cannot be treated as an HTML document."""


VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
DROP_TAGS = frozenset(
    "script style noscript template svg iframe form button select object canvas".split()
)
BOILER_TAGS = frozenset("nav header footer aside".split())
BOILER_ROLES = frozenset(
    "navigation banner contentinfo complementary search".split()
)
BOILER_TOKENS = frozenset(
    "nav navbar menu sidebar footer header banner masthead cookie consent "
    "breadcrumb breadcrumbs related share social comment comments ad ads "
    "advert advertisement promo widget pagination".split()
)
BLOCK_TAGS = frozenset(
    "h1 h2 h3 h4 h5 h6 p li td th pre blockquote figcaption dt dd".split()
)
# containers eligible for the link-density drop; never main/article/body
DENSITY_TAGS = frozenset("div section ul ol table dl p".split())
# an open <p> is implicitly closed by any of these start tags (HTML5
# "closes a p element" list, trimmed to tags this parser can meet)
_P_CLOSERS = frozenset(
    "address article aside blockquote div dl fieldset figure footer form "
    "h1 h2 h3 h4 h5 h6 header hr li main nav ol p pre section table ul".split()
)

_TOKEN_SPLIT = re.compile(r"[\s_\-]+")


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node | str


# DOM depth cap: browsers stop around 512; pruning/emission walk the
# tree with one Python frame per level, so unbounded crawl-soup nesting
# (<div><div><div>... from unclosed tags) would otherwise escape the
# HtmlError-only contract as a RecursionError and kill the task instead
# of quarantining the page. 180 keeps every walk far inside the default
# interpreter limit; real content never nests remotely that deep.
_MAX_DEPTH = 180


class _TreeBuilder(HTMLParser):
    """Tolerant DOM builder: recovers from unclosed/stray tags the way
    browsers do, because a web-scale corpus is mostly tag soup."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack = [self.root]
        self.saw_tag = False

    def _implied_close(self, tag: str) -> None:
        while len(self.stack) > 1:
            open_tag = self.stack[-1].tag
            if open_tag == "p" and tag in _P_CLOSERS:
                self.stack.pop()
                continue
            if open_tag == "li" and tag == "li":
                self.stack.pop()
                continue
            if open_tag in ("td", "th") and tag in ("td", "th", "tr"):
                self.stack.pop()
                continue
            if open_tag == "tr" and tag == "tr":
                self.stack.pop()
                continue
            break

    def handle_starttag(self, tag, attrs):
        self.saw_tag = True
        self._implied_close(tag)
        if len(self.stack) > _MAX_DEPTH:
            raise HtmlError(f"markup nests deeper than {_MAX_DEPTH}")
        node = _Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):  # <img .../>
        self.saw_tag = True
        self._implied_close(tag)
        self.stack[-1].children.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        # close up to the nearest matching ancestor; stray end tags with
        # no open counterpart are ignored (browser behavior)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


# WHATWG-ish encoding sniff: a web-scale corpus is NOT all UTF-8.
# Order: BOM -> clean UTF-8 -> <meta charset=...> in the head prefix ->
# latin-1 (total: every byte maps, so legacy pages yield mojibake-at-worst
# instead of a quarantine row — the trade every real crawler makes).
_CHARSET_RE = re.compile(rb"""charset\s*=\s*["']?([A-Za-z0-9_\-]+)""", re.I)


def _decode(data: bytes) -> str:
    if data.startswith(b"\xef\xbb\xbf"):
        return data[3:].decode("utf-8", errors="replace")
    if data.startswith(b"\xff\xfe") or data.startswith(b"\xfe\xff"):
        try:
            return data.decode("utf-16")
        except UnicodeDecodeError:
            pass
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        pass
    m = _CHARSET_RE.search(data[:2048])
    if m:
        try:
            return data.decode(m.group(1).decode("ascii").lower())
        except (LookupError, UnicodeDecodeError):
            pass
    return data.decode("latin-1")


def parse_html(data: bytes) -> _Node:
    """bytes -> tolerant DOM root. Raises HtmlError (only) on payloads
    that are not an HTML document at all: null or markup-free. Encoding
    never quarantines (see _decode)."""
    if data is None:
        raise HtmlError("null content")
    try:
        text = _decode(bytes(data))
    except TypeError as e:
        raise HtmlError(f"unreadable payload: {e}") from e
    builder = _TreeBuilder()
    try:
        builder.feed(text)
        builder.close()
    except Exception as e:  # html.parser rarely raises; quarantine if it does
        raise HtmlError(f"parse failure: {e}") from e
    if not builder.saw_tag:
        raise HtmlError("no markup found")
    return builder.root


def _attr_tokens(node: _Node) -> set[str]:
    toks: set[str] = set()
    for key in ("class", "id"):
        v = node.attrs.get(key)
        if v:
            toks.update(t for t in _TOKEN_SPLIT.split(v.lower()) if t)
    return toks


def _is_boilerplate(node: _Node) -> bool:
    if node.tag in BOILER_TAGS:
        return True
    if (node.attrs.get("role") or "").lower() in BOILER_ROLES:
        return True
    return bool(_attr_tokens(node) & BOILER_TOKENS)


def _char_counts(node: _Node, in_anchor: bool) -> tuple[int, int]:
    """(total, inside-anchor) non-whitespace character counts over the
    RENDERED text: dropped-tag and boilerplate subtrees don't count
    (script text must not dilute a container's link density)."""
    total = anchor = 0
    for ch in node.children:
        if isinstance(ch, str):
            n = sum(len(w) for w in ch.split())
            total += n
            if in_anchor:
                anchor += n
        elif ch.tag in DROP_TAGS or _is_boilerplate(ch):
            continue
        else:
            t, a = _char_counts(ch, in_anchor or ch.tag == "a")
            total += t
            anchor += a
    return total, anchor


def strip_boilerplate(root: _Node) -> _Node:
    """Prune DROP_TAGS, chrome (tag/role/class-token), and link-dense
    containers, in that order, depth-first in place."""

    def prune(node: _Node) -> None:
        kept: list = []
        for ch in node.children:
            if isinstance(ch, str):
                kept.append(ch)
                continue
            if ch.tag in DROP_TAGS or _is_boilerplate(ch):
                continue
            # density BEFORE recursing: a "related links" container must
            # be judged whole — pruning its link-dense <ul> first would
            # leave an innocent-looking husk (just the "More" label)
            if ch.tag in DENSITY_TAGS:
                total, anchor = _char_counts(ch, False)
                if anchor > 0 and total > 0 and anchor / total > 0.5:
                    continue
            prune(ch)
            kept.append(ch)
        node.children = kept

    prune(root)
    return root


def _find_first(node: _Node, tags: frozenset | set) -> _Node | None:
    for ch in node.children:
        if isinstance(ch, str):
            continue
        if ch.tag in tags:
            return ch
        found = _find_first(ch, tags)
        if found is not None:
            return found
    return None


def content_root(root: _Node) -> _Node:
    """<main>/<article> when present (semantic pages), else <body>, else
    the whole tree (fragment inputs)."""
    main = _find_first(root, {"main", "article"})
    if main is not None:
        return main
    body = _find_first(root, {"body"})
    return body if body is not None else root


def _inline_text(node: _Node) -> str:
    """Subtree text, flattened through inline elements but stopping at
    nested block elements and images (they emit their own spans)."""
    parts: list[str] = []
    for ch in node.children:
        if isinstance(ch, str):
            parts.append(ch)
        elif ch.tag in BLOCK_TAGS or ch.tag == "img":
            continue
        else:
            parts.append(_inline_text(ch))
    return "".join(parts)


# tags that break a container's text into separate spans; an element
# holding any of these must be WALKED (not flattened as inline)
_STRUCTURE_TAGS = frozenset({"img", "br"})


def _has_structure(node: _Node) -> bool:
    for ch in node.children:
        if isinstance(ch, str):
            continue
        if ch.tag in BLOCK_TAGS or ch.tag in _STRUCTURE_TAGS or _has_structure(ch):
            return True
    return False


def emit_spans(content: _Node) -> list[dict]:
    """Document-order interleaved spans from a pruned content tree.

    ONE buffered walk serves blocks and containers alike: maximal runs
    of text + pure-inline elements between structural boundaries (a
    nested block, <br>, <img>, a structure-bearing container, or the
    element's end) flush as one span each, IN PLACE — so
    ``<li><h3>Title</h3> summary</li>`` emits Title before summary (a
    flatten-the-leaf-first emitter inverted that order). Whitespace-only
    runs (pretty-printing between tags) never become spans. Blocks under
    a <table> ancestor carry the structural 'table' kind — the HTML twin
    of the layout path's grid cells (source_type contract,
    main.py:316-338): they pass the rule-core FSM 1:1 and stay eligible
    for remove_numbering's 'table' context."""
    out: list[dict] = []

    def emit(txt: str, in_table: bool) -> None:
        # keep the RAW text (fragment spans carry significant
        # leading/trailing spaces); strip() only decides emptiness
        if txt.strip():
            out.append({"kind": "table" if in_table else "text",
                        "text": txt, "media_ref": "", "offset": 0})

    def walk(node: _Node, in_table: bool) -> None:
        buf: list[str] = []

        def flush() -> None:
            if buf:
                emit("".join(buf), in_table)
                buf.clear()

        for ch in node.children:
            if isinstance(ch, str):
                buf.append(ch)
                continue
            if ch.tag == "img":
                flush()
                out.append({"kind": "media", "text": "",
                            # lazy-loaded crawl images carry the real URL
                            # in data-src and a placeholder (or nothing)
                            # in src — prefer src, fall back to data-src
                            "media_ref": ch.attrs.get("src")
                            or ch.attrs.get("data-src") or "", "offset": 0})
                continue
            if ch.tag == "br":
                flush()
                continue
            if ch.tag in BLOCK_TAGS or _has_structure(ch):
                flush()
                walk(ch, in_table or ch.tag == "table")
            else:
                # pure inline subtree: part of the surrounding text run
                buf.append(_inline_text(ch))
        flush()

    walk(content, False)
    for i, sp in enumerate(out):
        sp["offset"] = i
    return out


def html_to_spans(data: bytes) -> list[dict]:
    """bytes -> main-content interleaved spans (input_hint shape)."""
    try:
        root = parse_html(data)
        strip_boilerplate(root)
        return emit_spans(content_root(root))
    except RecursionError as e:
        # belt for the _MAX_DEPTH suspenders: the HtmlError-only
        # contract must hold even if a pathological tree slips past the
        # builder cap — a RecursionError escaping here would kill the
        # task instead of quarantining the page
        raise HtmlError("markup nests too deeply to walk") from e
