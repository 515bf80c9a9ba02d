"""PDF-layout-style text extractor: column detection + header/footer strip.

The payload is *layout text*: what a pdfminer-style tool emits per page —
fixed-position lines where multiple columns appear side by side separated by
runs of spaces, pages separated by form-feed (``\\x0c``), and repeated
header/footer lines. This module re-linearizes it into reading order
(pdfminer-style text-box ordering with column detection, implemented from
scratch — pdfminer is not available in this environment; see the per-format
dispatcher contract in ``dispatch.py``).

Reference analog: the per-page OCR step (``DocumentIntelligenceService.cs``)
— turn one unit's raw payload into ordered content text.

Span semantics: codepoint offsets into the original input; each emitted line
fragment carries the source range it was read from. Synthetic ``\\n`` joins
are not covered by spans.

Deterministic; no I/O, no randomness.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = ["extract_layout", "LayoutExtraction"]

#: Minimum run of spaces that can act as a column gutter.
_MIN_GUTTER = 3

#: Fraction of non-blank lines on a page that must share a gutter column
#: for the page to be treated as two-column.
_GUTTER_SUPPORT = 0.8

#: Standalone page-number / header-footer line patterns.
_PAGENO_RE = re.compile(r"^\s*(?:page\s+\d+(?:\s+of\s+\d+)?|-?\s*\d+\s*-?)\s*$", re.I)

#: A candidate gutter: a run of >= _MIN_GUTTER spaces (precompiled — this
#: runs per line in the extraction hot loop).
_GUTTER_RUN_RE = re.compile(r" {%d,}" % _MIN_GUTTER)


@dataclass
class LayoutExtraction:
    extracted_text: str
    spans: list[tuple[int, int]]
    rule: str  # 'layout-2col' | 'layout-1col' | 'empty'


@dataclass
class _Line:
    start: int  # absolute offset of line start
    text: str   # line content, no newline


def _split_pages(text: str) -> list[list[_Line]]:
    pages: list[list[_Line]] = []
    page: list[_Line] = []
    pos = 0
    for raw in re.split(r"(\n|\x0c)", text):
        if raw == "\n":
            pos += 1
            continue
        if raw == "\x0c":
            pages.append(page)
            page = []
            pos += 1
            continue
        page.append(_Line(pos, raw))
        pos += len(raw)
    pages.append(page)
    return pages


def _repeated_edge_lines(pages: list[list[_Line]]) -> set[str]:
    """Texts of first/last non-blank lines repeated on >=2 pages (headers/footers)."""
    if len(pages) < 2:
        return set()
    from collections import Counter

    edge_counts: Counter[str] = Counter()
    for page in pages:
        nonblank = [ln.text.strip() for ln in page if ln.text.strip()]
        if not nonblank:
            continue
        edges = {nonblank[0]}
        if len(nonblank) > 1:
            edges.add(nonblank[-1])
        for e in edges:
            edge_counts[e] += 1
    return {t for t, c in edge_counts.items() if c >= 2}


def _find_gutter(lines: list[_Line]) -> tuple[int, int] | None:
    """Find a column gutter: a space-run x-range shared by most non-blank lines.

    Returns (gutter_start, gutter_end) in column coordinates, or None.
    """
    nonblank = [ln for ln in lines if ln.text.strip()]
    # need at least 2 multi-segment lines to believe in columns
    if len(nonblank) < 2:
        return None
    width = max(len(ln.text) for ln in nonblank)
    if width < 2 * _MIN_GUTTER:
        return None
    # column c is "gutter-able" for a line if it is a space and part of a
    # >=_MIN_GUTTER space run that is interior (text on both sides)
    support = [0] * width
    for ln in nonblank:
        t = ln.text
        for m in _GUTTER_RUN_RE.finditer(t):
            a, b = m.span()
            # interior gutters only: text on both sides of the space run
            if not t[:a].strip() or not t[b:].strip():
                continue
            for c in range(a, min(b, width)):
                support[c] += 1
    need = max(2, int(len(nonblank) * _GUTTER_SUPPORT))
    best_run: tuple[int, int] | None = None
    run_start = None
    for c in range(width + 1):
        ok = c < width and support[c] >= need
        if ok and run_start is None:
            run_start = c
        elif not ok and run_start is not None:
            if c - run_start >= _MIN_GUTTER and (
                best_run is None or c - run_start > best_run[1] - best_run[0]
            ):
                best_run = (run_start, c)
            run_start = None
    return best_run


def extract_layout(text: str) -> LayoutExtraction:
    """Linearize layout text into reading order with source spans."""
    if not text or not text.strip():
        return LayoutExtraction("", [], "empty")
    pages = _split_pages(text)
    skip_texts = _repeated_edge_lines(pages)

    parts: list[str] = []
    spans: list[tuple[int, int]] = []
    any_two_col = False

    def emit(ln: _Line, lo: int, hi: int) -> None:
        frag = ln.text[lo:hi]
        stripped = frag.strip()
        if not stripped:
            return
        left_pad = len(frag) - len(frag.lstrip())
        s = ln.start + lo + left_pad
        parts.append(stripped)
        spans.append((s, s + len(stripped)))

    for page in pages:
        body = []
        for ln in page:
            st = ln.text.strip()
            if st and (st in skip_texts or _PAGENO_RE.match(ln.text)):
                continue
            body.append(ln)
        gutter = _find_gutter(body)
        if gutter is not None:
            any_two_col = True
            gs, ge = gutter
            # Split each line at ITS OWN space-run overlapping the shared
            # gutter core (lines' gaps are rarely perfectly aligned); a line
            # with no overlapping gap belongs wholly to the left column.
            splits: list[tuple[_Line, int, int]] = []
            for ln in body:
                cut = (gs, ge)
                for m in _GUTTER_RUN_RE.finditer(ln.text):
                    if m.start() < ge and m.end() > gs:
                        cut = m.span()
                        break
                else:
                    cut = (len(ln.text), len(ln.text))
                splits.append((ln, cut[0], cut[1]))
            # left column first (reading order), then right column
            for ln, lo, _hi in splits:
                emit(ln, 0, lo)
            for ln, _lo, hi in splits:
                emit(ln, hi, len(ln.text))
        else:
            for ln in body:
                emit(ln, 0, len(ln.text))

    if not parts:
        return LayoutExtraction("", [], "empty")
    rule = "layout-2col" if any_two_col else "layout-1col"
    return LayoutExtraction("\n".join(parts), spans, rule)
