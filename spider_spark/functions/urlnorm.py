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


def canonicalize_parts(url: str) -> tuple[str | None, str | None, int | None]:
    """``(canonical_url, host_incl_port, edition)`` from ONE urlsplit —
    the fused form the admission hot path uses so host/edition don't
    re-split the canonical URL; ``(None, None, None)`` if malformed."""
    if url is None:
        return (None, None, None)
    url = url.strip()
    if not url or not _SCHEME_RE.match(url):
        return (None, None, None)
    try:
        parts = urlsplit(url)
        scheme = parts.scheme.lower()
        if scheme not in ("http", "https"):
            return (None, None, None)
        host = (parts.hostname or "").lower()
        if not host:
            return (None, None, None)
        # parts.port is a LAZY property: an out-of-range or non-numeric
        # port raises here, not at urlsplit — keep it inside the guard
        # so 'http://x:99999/' is malformed, not a job-killing exception
        port = parts.port
    except ValueError:
        return (None, None, None)
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
    ed: int | None = None
    m = _EDITION_RE.search(query)
    if m:
        ed = abs(int(m.group(1)))
        rest = [
            p for p in query.split("&")
            if p and not p.startswith("edition=")
        ]
        query = "&".join([f"edition={ed}"] + rest)
    if query:
        return (f"{scheme}://{host}{path}?{query}", host, ed)
    return (f"{scheme}://{host}{path}", host, ed)


def canonicalize(url: str) -> str | None:
    """Canonical form of *url*, or None if malformed."""
    return canonicalize_parts(url)[0]


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

def canonicalize_parts_frame(urls: pd.Series) -> pd.DataFrame:
    """Fused Arrow-batch form: (url, host, edition) columns from one
    urlsplit pass per input — the admission hot path's single Python
    hop (three separate UDFs = three Arrow round-trips + three splits)."""
    rows = [canonicalize_parts(u) for u in urls]
    out = pd.DataFrame(rows, columns=["url", "host", "edition"],
                       index=urls.index)
    out["edition"] = out["edition"].astype("Int64")
    return out
