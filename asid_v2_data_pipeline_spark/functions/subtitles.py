"""SubRip (SRT) and WebVTT subtitle codecs (pure Python, from the
public formats: the de-facto SRT layout and the W3C WebVTT spec).

Subtitle files are a major speech/video training-text source; the
funnel entry point ``subtitle_cues`` sniffs the format (WEBVTT magic
vs. SRT numeric index) and returns a uniform cue list.

SRT::

    1
    00:01:02,345 --> 00:01:04,000
    line 1
    line 2
    <blank>

WebVTT::

    WEBVTT
    <blank>
    [optional cue id]
    00:01:02.345 --> 00:01:04.000 [settings...]
    lines...

Parsing is strict where corruption could silently drop data: bad
timestamps, end <= start handled as-is (kept — players tolerate it)
but malformed arrows/indices raise ValueError; cue text lines are
preserved VERBATIM (no whitespace normalization — subtitles carry
significant spacing).  WebVTT ``NOTE``/``STYLE``/``REGION`` blocks
are skipped; cue settings after the end timestamp are ignored.
Hours are optional in WebVTT timestamps on read, always written.

Reference comparison: the reference pipeline ingests only netCDF
scenes (``asip_v2/archive.py``); §2.11 training-data surface.
"""

from __future__ import annotations


def _fmt_ts(ms: int, sep: str) -> str:
    if ms < 0:
        raise ValueError("subtitles: negative timestamp")
    h, rem = divmod(ms, 3600_000)
    m, rem = divmod(rem, 60_000)
    s, frac = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{frac:03d}"


def _parse_ts(s: str, sep: str) -> int:
    parts = s.strip().split(":")
    if len(parts) == 2:  # WebVTT MM:SS.mmm short form
        parts = ["0", *parts]
    if len(parts) != 3:
        raise ValueError(f"subtitles: bad timestamp {s!r}")
    hh, mm, rest = parts
    if sep not in rest:
        raise ValueError(f"subtitles: bad timestamp {s!r}")
    ss, frac = rest.split(sep, 1)
    if not (hh.isdigit() and mm.isdigit() and ss.isdigit() and frac.isdigit()):
        raise ValueError(f"subtitles: bad timestamp {s!r}")
    if len(frac) != 3:
        raise ValueError(f"subtitles: fraction must be 3 digits in {s!r}")
    mm_i, ss_i = int(mm), int(ss)
    if mm_i > 59 or ss_i > 59:
        raise ValueError(f"subtitles: minutes/seconds out of range in {s!r}")
    return ((int(hh) * 60 + mm_i) * 60 + ss_i) * 1000 + int(frac)


def write_srt(cues: list[tuple[int, int, str]]) -> bytes:
    """Serialize ``(start_ms, end_ms, text)`` cues as SRT (1-based
    indices, CRLF-free LF endings, blank-line terminated)."""
    out = []
    for i, (start, end, text) in enumerate(cues, 1):
        out.append(
            f"{i}\n{_fmt_ts(start, ',')} --> {_fmt_ts(end, ',')}\n{text}\n"
        )
    return "\n".join(out).encode("utf-8")


def write_webvtt(
    cues: list[tuple[int, int, str]], ids: list[str] | None = None
) -> bytes:
    """Serialize cues as WebVTT, with optional cue identifiers."""
    blocks = ["WEBVTT"]
    for i, (start, end, text) in enumerate(cues):
        head = f"{ids[i]}\n" if ids is not None else ""
        blocks.append(
            f"{head}{_fmt_ts(start, '.')} --> {_fmt_ts(end, '.')}\n{text}"
        )
    return ("\n\n".join(blocks) + "\n").encode("utf-8")


def _lines(data: bytes) -> list[str]:
    try:
        s = data.decode("utf-8")
    except UnicodeDecodeError as e:
        raise ValueError(f"subtitles: invalid UTF-8: {e}") from None
    if s.startswith("﻿"):
        s = s[1:]
    return s.replace("\r\n", "\n").replace("\r", "\n").split("\n")


def parse_srt(data: bytes) -> list[tuple[int, int, int, str]]:
    """Parse SRT into ``(index, start_ms, end_ms, text)`` cues; text
    lines joined with \\n, preserved verbatim."""
    lines = _lines(data)
    cues = []
    i = 0
    n = len(lines)
    while i < n:
        if lines[i].strip() == "":
            i += 1
            continue
        idx_line = lines[i].strip()
        if not idx_line.isdigit():
            raise ValueError(f"SRT: expected cue index, got {idx_line!r}")
        i += 1
        if i >= n or " --> " not in lines[i]:
            raise ValueError("SRT: missing timing line")
        a, b = lines[i].split(" --> ", 1)
        start, end = _parse_ts(a, ","), _parse_ts(b, ",")
        i += 1
        text_lines = []
        while i < n and lines[i] != "":
            text_lines.append(lines[i])
            i += 1
        cues.append((int(idx_line), start, end, "\n".join(text_lines)))
    return cues


def parse_webvtt(data: bytes) -> list[tuple[str | None, int, int, str]]:
    """Parse WebVTT into ``(cue_id, start_ms, end_ms, text)`` cues."""
    lines = _lines(data)
    if not lines or not lines[0].startswith("WEBVTT"):
        raise ValueError("WebVTT: missing WEBVTT header")
    cues = []
    i = 1
    n = len(lines)
    while i < n:
        if lines[i].strip() == "":
            i += 1
            continue
        # block: NOTE/STYLE/REGION get skipped wholesale
        first = lines[i]
        if (
            first.startswith("NOTE")
            or first.startswith("STYLE")
            or first.startswith("REGION")
        ):
            while i < n and lines[i] != "":
                i += 1
            continue
        cue_id: str | None = None
        if " --> " not in first:
            cue_id = first
            i += 1
            if i >= n or " --> " not in lines[i]:
                raise ValueError("WebVTT: cue id without timing line")
            first = lines[i]
        a, rest = first.split(" --> ", 1)
        # settings after the end timestamp are whitespace-separated
        b = rest.split(" ", 1)[0] if " " in rest else rest
        start, end = _parse_ts(a, "."), _parse_ts(b, ".")
        i += 1
        text_lines = []
        while i < n and lines[i] != "":
            text_lines.append(lines[i])
            i += 1
        cues.append((cue_id, start, end, "\n".join(text_lines)))
    return cues


def subtitle_cues(data: bytes) -> tuple[str, list[tuple[int, int, str]]]:
    """Format funnel: sniff WEBVTT magic vs. SRT; returns
    ``(fmt, [(start_ms, end_ms, text), ...])`` with fmt 'vtt'|'srt'."""
    head = bytes(data[:16])
    if head.startswith(b"\xef\xbb\xbf"):
        head = head[3:]
    if head.startswith(b"WEBVTT"):
        return "vtt", [(s, e, t) for _, s, e, t in parse_webvtt(data)]
    return "srt", [(s, e, t) for _, s, e, t in parse_srt(data)]
