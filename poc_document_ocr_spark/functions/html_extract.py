"""HTML main-content extractor with character-span provenance.

Boilerpipe/Readability-style block scoring over a stdlib ``html.parser`` parse
(lxml is not available in this environment; the parser sits behind this module
boundary so a faster backend can be swapped in). This is the rebuild's analog
of the reference's per-page OCR field extraction
(``DocumentIntelligenceService.cs:72-201``): per unit of work, produce the
"payload that matters" plus provenance.

Span semantics (the per-turn invariant surface):

* Spans are **Python-str codepoint offsets into the original input text**.
* Each span ``(start, end)`` is a source range whose (entity-decoded) text
  contributed, in order, to ``extracted_text``.
* Block texts are joined with ``"\\n\\n"``; those separators are synthetic and
  are not covered by any span.

Deterministic by construction — no wall clock, no randomness, no I/O.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser

__all__ = ["extract_html", "HtmlExtraction"]

#: Subtrees that never contribute content.
_DROP_TAGS = frozenset(
    {
        "script", "style", "noscript", "template", "head", "title", "meta",
        "link", "nav", "footer", "aside", "header", "form", "iframe", "svg",
        "button", "select", "option", "label", "figcaption",
    }
)

#: Tags that open a new text block.
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "article", "section", "main", "li", "ul", "ol", "table",
        "tr", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote",
        "pre", "br", "hr", "body", "figure", "dd", "dt", "dl",
    }
)

#: Containers that mark the main-content subtree.
_MAIN_TAGS = frozenset({"article", "main"})

#: class/id substrings that mark boilerplate containers (Readability-style).
_BOILER_RE = re.compile(
    r"comment|sidebar|side-bar|footer|footnote|nav|menu|advert|promo|banner"
    r"|cookie|share|social|related|breadcrumb|widget|masthead|copyright",
    re.IGNORECASE,
)

#: Void elements — never pushed on the open-tag stack.
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

#: Maximum link-text density for a block to survive outside <article>/<main>.
_MAX_LINK_DENSITY = 0.4

#: Minimum block length (codepoints, entity-decoded, whitespace-collapsed)
#: for a block to survive density scoring outside <article>/<main>.
_MIN_BLOCK_LEN = 1


@dataclass
class _Segment:
    start: int
    end: int
    text: str          # entity-decoded text for this source range
    in_link: bool


@dataclass
class _Block:
    segments: list[_Segment] = field(default_factory=list)
    in_main: bool = False
    boiler: bool = False

    def raw_len(self) -> int:
        return sum(len(s.text) for s in self.segments)

    def link_len(self) -> int:
        return sum(len(s.text) for s in self.segments if s.in_link)


@dataclass
class HtmlExtraction:
    extracted_text: str
    spans: list[tuple[int, int]]
    rule: str  # 'article' | 'density' | 'empty'


class _OffsetParser(HTMLParser):
    """Collects text segments with absolute codepoint offsets.

    ``convert_charrefs=False`` so that every ``handle_data`` chunk is exactly a
    source substring and entity/char refs arrive as separate events with their
    own source positions — this is what makes span offsets exact.
    """

    def __init__(self, text: str) -> None:
        super().__init__(convert_charrefs=False)
        self._text = text
        # absolute offset of the start of each line (getpos() is line/col)
        self._line_starts = [0]
        for m in re.finditer("\n", text):
            self._line_starts.append(m.end())
        self.blocks: list[_Block] = []
        # open tags: (tag, is_drop, is_main, is_boiler, is_link)
        self._stack: list[tuple[str, bool, bool, bool, bool]] = []
        self._drop_depth = 0                 # inside a _DROP_TAGS subtree
        self._main_depth = 0                 # inside an <article>/<main> subtree
        self._boiler_depth = 0               # inside a boilerplate-classed subtree
        self._link_depth = 0                 # inside <a>
        self.saw_main = False
        self._current: _Block | None = None

    # -- offset helpers ----------------------------------------------------

    def _abs(self) -> int:
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    # -- block helpers -----------------------------------------------------

    def _break_block(self) -> None:
        self._current = None

    def _block(self) -> _Block:
        if self._current is None:
            self._current = _Block(
                in_main=self._main_depth > 0, boiler=self._boiler_depth > 0
            )
            self.blocks.append(self._current)
        return self._current

    # -- parser events -----------------------------------------------------

    def handle_starttag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._break_block()
        if tag in _VOID_TAGS:
            return
        is_drop = tag in _DROP_TAGS
        is_main = tag in _MAIN_TAGS or any(
            k == "role" and v == "main" for k, v in attrs
        )
        is_boiler = any(
            k in ("class", "id") and v and _BOILER_RE.search(v) for k, v in attrs
        )
        is_link = tag == "a"
        self._stack.append((tag, is_drop, is_main, is_boiler, is_link))
        if is_drop:
            self._drop_depth += 1
        if is_main:
            self._main_depth += 1
            self.saw_main = True
        if is_boiler:
            self._boiler_depth += 1
        if is_link:
            self._link_depth += 1

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._break_block()

    def handle_endtag(self, tag):
        if tag in _BLOCK_TAGS:
            self._break_block()
        if tag in _VOID_TAGS:
            return
        # pop to the matching open tag (tolerate unbalanced markup)
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                for _t, drop, main, boiler, link in self._stack[i:]:
                    if drop:
                        self._drop_depth -= 1
                    if main:
                        self._main_depth -= 1
                    if boiler:
                        self._boiler_depth -= 1
                    if link:
                        self._link_depth -= 1
                del self._stack[i:]
                break

    def _emit(self, src_len: int, decoded: str) -> None:
        if self._drop_depth or not decoded:
            return
        if decoded.isspace():
            # inter-block whitespace (indentation between tags) is noise, but
            # whitespace inside an open block separates words — keep it there
            if self._current is None or not self._current.segments:
                return
        start = self._abs()
        self._block().segments.append(
            _Segment(start, start + src_len, decoded, self._link_depth > 0)
        )

    def handle_data(self, data):
        self._emit(len(data), data)

    def handle_entityref(self, name):
        src = f"&{name};"
        self._emit(len(src), unescape(src))

    def handle_charref(self, name):
        src = f"&#{name};"
        self._emit(len(src), unescape(src))


def _trim_block(block: _Block) -> tuple[str, list[tuple[int, int]]]:
    """Render a block: concat segments, strip outer whitespace, adjust spans."""
    segs = list(block.segments)
    # drop whitespace-only segments at either edge, then trim the edges of
    # what remains (HTML outer whitespace is presentation, not content)
    while segs and segs[0].text.isspace():
        segs.pop(0)
    while segs and segs[-1].text.isspace():
        segs.pop()
    out_parts: list[str] = []
    out_spans: list[tuple[int, int]] = []
    n = len(segs)
    for i, seg in enumerate(segs):
        txt, s, e = seg.text, seg.start, seg.end
        # source and decoded text align 1:1 only for plain data segments
        # (entity refs decode to a different length) — only then may span
        # edges be trimmed along with the text
        aligned = (e - s) == len(txt)
        if i == 0:
            stripped = txt.lstrip()
            if aligned:
                s += len(txt) - len(stripped)
            txt = stripped
        if i == n - 1:
            stripped = txt.rstrip()
            if aligned:
                e -= len(txt) - len(stripped)
            txt = stripped
        if not txt:
            continue
        out_parts.append(txt)
        out_spans.append((s, e))
    return "".join(out_parts), out_spans


def extract_html(text: str) -> HtmlExtraction:
    """Extract main content + spans from an HTML payload."""
    if not text or not text.strip():
        return HtmlExtraction("", [], "empty")
    parser = _OffsetParser(text)
    parser.feed(text)
    parser.close()

    blocks = [b for b in parser.blocks if b.segments and not b.boiler]
    if parser.saw_main:
        kept = [b for b in blocks if b.in_main]
        rule = "article"
        # inside the main container, still drop pure link farms
        kept = [
            b
            for b in kept
            if b.raw_len() > 0
            and (b.link_len() / b.raw_len()) <= _MAX_LINK_DENSITY
        ]
    else:
        rule = "density"
        kept = []
        for b in blocks:
            rl = b.raw_len()
            if rl < _MIN_BLOCK_LEN:
                continue
            if rl and (b.link_len() / rl) > _MAX_LINK_DENSITY:
                continue
            kept.append(b)

    parts: list[str] = []
    spans: list[tuple[int, int]] = []
    for b in kept:
        btxt, bspans = _trim_block(b)
        if not btxt:
            continue
        parts.append(btxt)
        spans.extend(bspans)
    if not parts:
        return HtmlExtraction("", [], "empty")
    return HtmlExtraction("\n\n".join(parts), spans, rule)
