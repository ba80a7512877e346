"""Marked-section maintenance for SCALING.md.

SCALING.md is produced by several independent measurement scripts
(scaling_report.py for the fact-scan set; scaling_heavy.py,
scaling_graph.py, scaling_stream.py, skew_stress.py for the round-3
studies).  Each script owns one HTML-comment-marked block and
replaces ONLY its own block, so re-running any one study never
clobbers another's findings.
"""

from __future__ import annotations

MARKERS = ("HEAVY", "GRAPH", "STREAM", "SKEW", "SHUFFLE", "HOSTILE")


def _bounds(marker: str) -> tuple[str, str]:
    return f"<!-- {marker}-BEGIN -->", f"<!-- {marker}-END -->"


def extract_section(text: str, marker: str) -> str | None:
    """The full marked block (markers included), or None."""
    begin, end = _bounds(marker)
    if begin in text and end in text:
        return begin + text.split(begin, 1)[1].split(end, 1)[0] + end
    return None


def replace_section(text: str, marker: str, body: str) -> str:
    """Idempotently install ``body`` as the marker's block (appending
    at the end if the block doesn't exist yet)."""
    begin, end = _bounds(marker)
    block = f"{begin}\n{body.strip()}\n{end}"
    if begin in text and end in text:
        pre, rest = text.split(begin, 1)
        post = rest.split(end, 1)[1]
        return pre + block + post
    return text.rstrip() + "\n\n" + block + "\n"


def carry_sections(old_text: str, new_text: str) -> str:
    """Re-install every marked block found in ``old_text`` into
    ``new_text`` — used by scaling_report.py so a full regeneration
    preserves the other scripts' studies."""
    for marker in MARKERS:
        block = extract_section(old_text, marker)
        if block is not None:
            new_text = new_text.rstrip() + "\n\n" + block + "\n"
    return new_text
