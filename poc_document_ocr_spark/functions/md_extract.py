"""Markdown main-content extractor with character-span provenance.

Agent/conversation transcripts are full of markdown (tool output, model
answers); a training-content pass wants the PROSE with the syntax noise
stripped and the provenance kept. This is the markdown sibling of
``html_extract`` / ``pdf_layout`` behind the same dispatcher boundary —
the rebuild's third "per-unit payload → typed record" engine (reference
analog: the per-page OCR call, ``DocumentIntelligenceService.cs:72-201``).

Rules (line-oriented, deterministic):

* fenced code blocks (``` or ~~~) are dropped whole, fences included;
* ATX headings keep their TEXT, the ``#`` marker is stripped;
* blockquote ``>`` and list-bullet ``- * +`` / ``1.`` markers are stripped;
* horizontal rules (``---`` / ``***`` / ``___`` lines) are dropped;
* images ``![alt](url)`` are dropped; links ``[text](url)`` keep ``text``;
* inline code backticks and ``**`` bold markers are stripped (content kept);
* blank and emptied lines vanish; kept line texts join with ``"\n"``.

Span semantics (same invariant surface as the HTML engine):

* spans are Python-str codepoint offsets into the ORIGINAL input;
* each span's source substring contributed verbatim, in order, to
  ``extracted_text`` (markdown needs no entity decoding, so
  ``original[start:end]`` equality holds exactly);
* the ``"\n"`` joiners are synthetic and covered by no span.

Deterministic by construction — no wall clock, no randomness, no I/O.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = ["extract_markdown", "MarkdownExtraction"]

#: fence opener/closer (indented up to 3 spaces, per CommonMark)
_FENCE_RE = re.compile(r"^ {0,3}(```|~~~)")

#: horizontal rule: a line of only -, * or _ (3+), optional spaces
_HR_RE = re.compile(r"^ {0,3}([-*_])( *\1){2,} *$")

#: strippable block prefix: ATX heading, blockquote, bullet, ordered item
_PREFIX_RE = re.compile(r"^ {0,3}(#{1,6} +|> ?|[-*+] +|\d{1,9}\. +)")

#: inline events: image (drop), link (keep text), bold marker, backtick
_INLINE_RE = re.compile(
    r"!\[[^\]]*\]\([^)]*\)"       # image — dropped whole
    r"|\[([^\]]+)\]\([^)]*\)"     # link — group(1) text kept
    r"|\*\*"                      # bold marker — stripped
    r"|`"                         # inline-code fence — stripped
)


@dataclass
class MarkdownExtraction:
    extracted_text: str
    spans: list  # list[(start, end)] into the original text
    rule: str


def _line_segments(line: str, base: int, start: int) -> list:
    """Kept (abs_start, abs_end) source segments of ``line[start:]``;
    ``base`` is the line's offset in the original document."""
    out = []
    cur = start
    for m in _INLINE_RE.finditer(line, start):
        if m.start() > cur:
            out.append((base + cur, base + m.start()))
        if m.group(1) is not None:  # link: keep the bracketed text
            out.append((base + m.start(1), base + m.end(1)))
        cur = m.end()
    if cur < len(line):
        out.append((base + cur, base + len(line)))
    return out


def extract_markdown(text: str) -> MarkdownExtraction:
    """Strip markdown syntax, keep prose + spans. See module docstring."""
    spans: list = []
    parts: list = []
    offset = 0
    in_fence = False
    fence_mark = ""
    for raw in text.split("\n"):
        base, offset = offset, offset + len(raw) + 1
        # CRLF input: parse without the trailing \r so rule/prefix regexes
        # anchored at end-of-line still fire, and spans (bounded by
        # len(raw)) never cover the stray carriage return
        if raw.endswith("\r"):
            raw = raw[:-1]
        fm = _FENCE_RE.match(raw)
        if in_fence:
            if fm and fm.group(1) == fence_mark:
                in_fence = False
            continue
        if fm:
            in_fence, fence_mark = True, fm.group(1)
            continue
        if not raw.strip() or _HR_RE.match(raw):
            continue
        pm = _PREFIX_RE.match(raw)
        content_start = pm.end() if pm else 0
        segs = _line_segments(raw, base, content_start)
        segs = [(s, e) for (s, e) in segs if s < e]
        line_text = "".join(text[s:e] for (s, e) in segs)
        if not line_text.strip():
            continue
        parts.append(line_text)
        spans.extend(segs)
    return MarkdownExtraction("\n".join(parts), spans, "md_prose")
