"""URL canonicalization — the dedup key a web-scale pipeline actually uses.

Exact text dedup misses re-crawls whose bytes differ (ads, timestamps);
URL-level dedup needs a canonical form first: case-normalized scheme/host,
default ports stripped, fragments dropped, tracking params removed, query
params sorted, trailing slash normalized. `registered_domain` gives the
per-site aggregation key (a small embedded multi-label-suffix set stands in
for the public-suffix list — the full list is a data file, not an
algorithm change).

Both are per-row string work → vectorized pandas UDF wrappers (Arrow
batches), matching the §2.12 no-per-row-Python discipline.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
import pyspark.sql.functions as F

TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "mc_cid", "mc_eid")

# common multi-label public suffixes (stand-in for the full PSL data file)
_MULTI_SUFFIXES = frozenset(
    ("co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "net.au", "org.au",
     "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
     "co.kr", "co.za", "com.ar", "com.tr")
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def normalize_url(url: str) -> str:
    """Canonical form; returns the input unchanged if it doesn't parse."""
    if not url:
        return ""
    try:
        parts = urlsplit(url.strip())
        scheme = parts.scheme.lower()
        # hostname/port are lazy properties that can ALSO raise ValueError
        # on malformed input (e.g. "http://x:abc/") — they must stay inside
        # the try or one dirty URL kills the whole Arrow batch
        host = parts.hostname.lower() if parts.hostname else ""
        port = parts.port
    except ValueError:
        return url
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    if path != "/" and path.endswith("/"):
        path = path.rstrip("/")
    q = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not any(k.lower().startswith(p) for p in TRACKING_PREFIXES)
    ]
    query = urlencode(sorted(q))
    return urlunsplit((scheme, netloc, path, query, ""))  # fragment dropped


def registered_domain(url: str) -> str:
    """eTLD+1 heuristic: last two host labels, or three when the last two
    form a known multi-label suffix (co.uk etc.)."""
    if not url:
        return ""
    try:
        # .hostname itself can raise on malformed netlocs — keep it inside
        host = urlsplit(url.strip()).hostname or ""
    except ValueError:
        return ""
    labels = host.lower().split(".")
    if len(labels) < 2:
        return host.lower()
    if ".".join(labels[-2:]) in _MULTI_SUFFIXES and len(labels) >= 3:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def normalize_url_udf(col: F.Column) -> F.Column:
    """Column expression: canonical URL (UDF built at call time — a
    module-level pandas_udf would need an active session at import)."""

    @F.pandas_udf("string")
    def _norm(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: normalize_url(u or ""))

    return _norm(col)


def registered_domain_udf(col: F.Column) -> F.Column:
    """Column expression: eTLD+1 of the URL's host."""

    @F.pandas_udf("string")
    def _dom(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: registered_domain(u or ""))

    return _dom(col)
