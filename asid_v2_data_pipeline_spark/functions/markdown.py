"""Markdown-to-text stripper (pure Python, CommonMark-shaped): the
GitHub/docs-corpus extraction stage of a training-data pipeline —
keep the prose, drop the markup.

Block level: ATX headings (leading ``#``s and optional closing run),
setext underlines and thematic breaks dropped, blockquote ``> ``
prefixes peeled (nested), list markers (``-``/``*``/``+`` and
``N.``/``N)``) removed, fenced code blocks (``` / ~~~) kept VERBATIM
with the fence lines and info string dropped.  Inline: code spans,
images (→ alt), inline/reference links (→ label), autolinks (→ URL),
``**``/``__``/``*``/``_`` emphasis and ``~~`` strikethrough unwrapped
(innermost-first, repeated to a fixed point).  Blank lines are
dropped and every kept line is right-trimmed (hard-break spaces);
lines join with \\n — the same normalization contract as
``html_to_text``.

Never raises on any input (Markdown has no invalid documents); runs
in one bounded pass per line with a bounded unwrap loop.

Reference comparison: the reference pipeline ingests only netCDF
scenes (``asip_v2/archive.py``); §2.11 training-data surface.
"""

from __future__ import annotations

import re

_SETEXT_OR_BREAK = re.compile(r"=+\s*$|-{3,}\s*$|\*{3,}\s*$|_{3,}\s*$")
_ATX = re.compile(r"(#{1,6})\s+(.*?)\s*#*\s*$")
_LIST = re.compile(r"\s*(?:[-*+]|\d{1,9}[.)])\s+(.*)$")
_INLINE = (
    (re.compile(r"`([^`]*)`"), r"\1"),
    (re.compile(r"!\[([^\]]*)\]\([^)]*\)"), r"\1"),
    (re.compile(r"\[([^\]]*)\]\([^)]*\)"), r"\1"),
    (re.compile(r"\[([^\]]*)\]\[[^\]]*\]"), r"\1"),
    (re.compile(r"<(https?://[^>\s]+)>"), r"\1"),
    # strong emphasis first, non-greedy so inner single-char markers
    # survive for the later passes ("**bold *inner* done**")
    (re.compile(r"\*\*(.+?)\*\*"), r"\1"),
    (re.compile(r"(?<![\w])__(.+?)__(?![\w])"), r"\1"),
    (re.compile(r"\*([^*\s][^*]*)\*"), r"\1"),
    (re.compile(r"(?<![\w])_([^_]+)_(?![\w])"), r"\1"),
    (re.compile(r"~~([^~]+)~~"), r"\1"),
)
_MAX_UNWRAP = 8  # nesting depth bound for the inline fixed point


def md_to_text(src: str) -> str:
    """Strip Markdown to content text; see module docstring for the
    exact contract."""
    if not isinstance(src, str):
        raise ValueError("markdown: input must be str")
    out: list[str] = []
    fence: str | None = None
    for line in src.split("\n"):
        stripped = line.strip()
        if fence is not None:
            if stripped.startswith(fence):
                fence = None
            elif line.rstrip():  # blank lines drop everywhere
                out.append(line.rstrip())
            continue
        if stripped.startswith("```") or stripped.startswith("~~~"):
            fence = stripped[:3]
            continue
        if stripped == "":
            continue
        if _SETEXT_OR_BREAK.fullmatch(stripped):
            continue
        s = line
        while s.startswith("> "):
            s = s[2:]
        if s.strip() == ">":
            continue
        m = _ATX.match(s)
        if m:
            s = m.group(2)
        else:
            m = _LIST.match(s)
            if m:
                s = m.group(1)
        for _ in range(_MAX_UNWRAP):
            prev = s
            for pat, rep in _INLINE:
                s = pat.sub(rep, s)
            if s == prev:
                break
        s = s.rstrip()
        if s:
            out.append(s)
    return "\n".join(out)
