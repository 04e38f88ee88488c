"""Main-content extraction from full HTML pages — the north rule's
first clause ('HTML boilerplate strip … DOM heuristics').

The reference engine is PDF-native, so there is no reference analogue
to cite; the heuristics are the published block-classification
signals: boilerpipe's link-density/text-density features
(Kohlschuetter et al., WSDM 2011) and jusText's short-block +
link-density gates (Pomikalek 2011). Everything is stdlib
``html.parser`` — deterministic, dependency-free, and it runs inside
the same Arrow batch as the other span decoders.

Pipeline per page:

  1. hard boilerplate strip — subtrees under script / style / nav /
     header / footer / aside / form / head / iframe / svg / template /
     noscript / button are dropped entirely (tag-counter stack, so
     nesting and unclosed tags degrade safely);
  2. table extraction — ``<table>`` regions (depth-aware scan, so
     nested tables stay whole) outside boilerplate are canonicalized
     through the SAME parse→serialize path every other decoder uses
     (``core.html.canonicalize_table_html``), preserving document
     order relative to the text blocks; a malformed table becomes an
     'error' fragment, never a page failure;
  3. block segmentation — text accumulates between block-level tags
     (p, div, h1-h6, li, tr, br, …);
  4. soft boilerplate classification — a block is dropped when its
     link density (chars emitted inside <a> / all chars) exceeds
     ``max_link_density`` or it has fewer than ``min_words`` words;
  5. images — ``<img src>`` outside boilerplate emit image fragments
     carrying src as media_ref, in document order.

Output: ``(kind, text, media_ref, accuracy, whitespace)`` fragments
(kinds 'paragraph' | 'table_html' | 'image' | 'error'), the same
contract as ``core.page.extract_span``.
"""

from __future__ import annotations

from html.parser import HTMLParser

from . import html as H

BOILERPLATE_TAGS = frozenset((
    "script", "style", "noscript", "nav", "header", "footer", "aside",
    "form", "head", "iframe", "svg", "template", "button",
))

BLOCK_TAGS = frozenset((
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "br", "tr", "td", "th", "section", "article", "main", "blockquote",
    "pre", "title", "body", "hr",
))

# void elements never get a matching end tag — must not grow the
# boilerplate counters (none are boilerplate today, kept for safety)
_VOID = frozenset(("br", "img", "hr", "meta", "link", "input", "area",
                   "base", "col", "embed", "source", "track", "wbr"))

MAX_LINK_DENSITY = 0.5
MIN_WORDS = 3


class _BlockParser(HTMLParser):
    """Streaming block segmenter with boilerplate tag counters and
    per-block link-char accounting. Fragments accumulate in
    ``self.frags``; ``feed()`` may be called per text segment so table
    regions can be spliced between blocks in document order."""

    def __init__(self, max_link_density: float, min_words: int):
        super().__init__(convert_charrefs=True)
        self.max_link_density = max_link_density
        self.min_words = min_words
        self.frags: list[tuple] = []
        self._drop: dict[str, int] = {}   # boilerplate tag → open count
        self._a_depth = 0
        self._parts: list[str] = []
        self._chars = 0
        self._link_chars = 0

    # -- boilerplate state ------------------------------------------
    def in_boilerplate(self) -> bool:
        return any(v > 0 for v in self._drop.values())

    def handle_starttag(self, tag, attrs):
        if tag in BOILERPLATE_TAGS and tag not in _VOID:
            self._drop[tag] = self._drop.get(tag, 0) + 1
            self.flush()
            return
        if self.in_boilerplate():
            return
        if tag == "a":
            self._a_depth += 1
        elif tag == "img":
            self.flush()
            src = dict(attrs).get("src") or ""
            self.frags.append(("image", "", src, None, None))
        if tag in BLOCK_TAGS:
            self.flush()

    def handle_endtag(self, tag):
        if tag in BOILERPLATE_TAGS:
            if self._drop.get(tag, 0) > 0:
                self._drop[tag] -= 1
            return
        if self.in_boilerplate():
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in BLOCK_TAGS:
            self.flush()

    def handle_data(self, data):
        if self.in_boilerplate() or not data:
            return
        self._parts.append(data)
        self._chars += len(data)
        if self._a_depth > 0:
            self._link_chars += len(data)

    # -- block classification ---------------------------------------
    def flush(self):
        text = " ".join("".join(self._parts).split())
        chars, link_chars = self._chars, self._link_chars
        self._parts, self._chars, self._link_chars = [], 0, 0
        if not text:
            return
        if link_chars / max(chars, 1) > self.max_link_density:
            return                       # nav/related-links block
        if len(text.split()) < self.min_words:
            return                       # separator / crumb fragment
        self.frags.append(("paragraph", text, "", None, None))


def _split_tables(s: str) -> list[tuple[bool, str]]:
    """Split a page into ordered (is_table, segment) pieces with a
    depth-aware ``<table``/``</table`` scan (nested tables stay one
    segment; an unterminated table runs to end-of-page)."""
    low = s.lower()
    parts: list[tuple[bool, str]] = []
    i = 0
    while True:
        j = low.find("<table", i)
        if j == -1:
            if i < len(s):
                parts.append((False, s[i:]))
            return parts
        if j > i:
            parts.append((False, s[i:j]))
        depth, pos = 1, j + 6
        while depth:
            nj = low.find("<table", pos)
            ne = low.find("</table", pos)
            if ne == -1:                 # unterminated: rest is table
                parts.append((True, s[j:]))
                return parts
            if nj != -1 and nj < ne:
                depth, pos = depth + 1, nj + 6
            else:
                depth, pos = depth - 1, ne + 8
        end = low.find(">", pos - 1)
        end = len(s) if end == -1 else end + 1
        parts.append((True, s[j:end]))
        i = end


def extract_html_page(text: str,
                      max_link_density: float = MAX_LINK_DENSITY,
                      min_words: int = MIN_WORDS) -> list[tuple]:
    """Full-page HTML → main-content fragments in document order."""
    parser = _BlockParser(max_link_density, min_words)
    for is_table, seg in _split_tables(text):
        if not is_table:
            parser.feed(seg)
            continue
        parser.flush()
        if parser.in_boilerplate():
            continue                     # layout table in nav/footer
        try:
            html = H.canonicalize_table_html(seg)
        except Exception as exc:  # noqa: BLE001 — quarantine the table
            parser.frags.append(
                ("error", f"table:{exc.__class__.__name__}", "",
                 None, None))
            continue
        parser.frags.append(("table_html", html, "", None, None))
    parser.close()
    parser.flush()
    return parser.frags
