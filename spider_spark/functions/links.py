"""Outlink extraction from text spans (shared engine/oracle kernel).

The reference receives links via ContentFilter's ``foundURI`` callback
(Spider.java:653-657); in the graft, media spans carry explicit link
targets in ``media_ref`` and text spans may embed URL patterns
(FIXTURES.md §1).  This module pins the exact URL-pattern spec so the
engine and oracle cannot diverge.
"""

from __future__ import annotations

import re

import pandas as pd

_URL_RE = re.compile(r"https?://[^\s]+", re.IGNORECASE)
_TRAIL = ".,!?;:)\"'"


def extract_urls(text: str) -> list[str]:
    """All URL-pattern matches, trailing punctuation stripped, in
    order of occurrence."""
    if not text:
        return []
    out = []
    for m in _URL_RE.finditer(text):
        u = m.group(0).rstrip(_TRAIL)
        if u:
            out.append(u)
    return out


def extract_urls_series(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: extract_urls(t) if t else [])
