"""URL canonicalization — the web-scale graft of the reference's USK
normalization (Spider.java:170-179: negative suggested edition → absolute,
USK → SSK form).

Graft spec (deterministic, shared verbatim by engine and oracle):
  1. strip surrounding whitespace
  2. scheme and host lowercased; only http/https accepted (else malformed)
  3. default ports stripped (http:80, https:443)
  4. fragment dropped
  5. path: duplicate slashes collapsed, ``.``/``..`` segments resolved,
     empty path → ``/``
  6. edition: query parameter ``edition=<int>`` — negative values are
     replaced by their absolute value (the USK suggested-edition rule);
     the canonical form carries ``?edition=<abs>`` as its only retained
     query (other params are kept verbatim, in original order, after it)
  7. malformed URL (no scheme, no host, non-http scheme) → None
     (≈ MalformedURLException → Status.FAILED, Spider.java:235-238)
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import pandas as pd

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
_EDITION_RE = re.compile(r"(?:^|&)edition=(-?\d+)(?:&|$)")


def canonicalize(url: str) -> str | None:
    """Canonical form of *url*, or None if malformed."""
    if url is None:
        return None
    url = url.strip()
    if not url or not _SCHEME_RE.match(url):
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    port = parts.port
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"

    # path normalization
    segs: list[str] = []
    for seg in parts.path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if segs:
                segs.pop()
            continue
        segs.append(seg)
    path = "/" + "/".join(segs)

    # edition normalization (USK rule: negative suggested edition → abs)
    query = parts.query
    m = _EDITION_RE.search(query)
    if m:
        ed = abs(int(m.group(1)))
        rest = [
            p for p in query.split("&")
            if p and not p.startswith("edition=")
        ]
        query = "&".join([f"edition={ed}"] + rest)
    if query:
        return f"{scheme}://{host}{path}?{query}"
    return f"{scheme}://{host}{path}"


def extract_edition(url: str) -> int | None:
    """Edition number carried by a (canonical or raw) URL, or None."""
    if url is None:
        return None
    q = urlsplit(url).query
    m = _EDITION_RE.search(q)
    return abs(int(m.group(1))) if m else None


def extract_host(url: str) -> str | None:
    """Host (incl. non-default port) of a canonical URL."""
    if url is None:
        return None
    try:
        netloc = urlsplit(url).netloc
    except ValueError:
        return None
    return netloc.lower() or None


def extract_path(url: str) -> str:
    if url is None:
        return "/"
    try:
        return urlsplit(url).path or "/"
    except ValueError:
        return "/"


# ---- Arrow-batch wrappers --------------------------------------------------

def canonicalize_series(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize)


def host_series(urls: pd.Series) -> pd.Series:
    return urls.map(extract_host)


def edition_series(urls: pd.Series) -> pd.Series:
    return urls.map(extract_edition).astype("Int64")
