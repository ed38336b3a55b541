"""URL canonicalization and domain extraction — the crawl-curation
front door (Common-Crawl-style pipelines dedupe by canonical URL and
cap per-domain page counts before any content-level screen runs).

Everything is built from ``pyspark.sql.functions`` — JVM-side regex
and array expressions, codegen-eligible, no Python UDFs, strictly
per-row (no shuffle). Each transform is specified tightly enough that
a DuckDB twin reproduces it byte-for-byte (list_filter/list_sort over
string_split mirror F.filter/F.array_sort over F.split), so the
catalog queries built on these carry full value-hash oracles.

Canonical form produced by :func:`canonicalize_url`:

- scheme and host lowercased; explicit default ports (``:80`` for
  http, ``:443`` for https) stripped;
- fragment dropped;
- query parameters whose name starts with a tracking prefix
  (``utm_``, ``fbclid``, ``gclid``, ``ref``, ``sessionid``) dropped;
  survivors SORTED (param order never distinguishes documents);
- trailing slash stripped from non-root paths; empty path becomes
  ``/``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query-parameter name prefixes that never identify content. Kept tiny
# and public-knowledge; callers can pass their own list.
TRACKING_PARAM_PREFIXES: tuple[str, ...] = (
    "utm_",
    "fbclid",
    "gclid",
    "ref",
    "sessionid",
)

# Multi-part public suffixes the registrable-domain heuristic knows
# about. A production deployment swaps in the full public-suffix list
# (publicsuffix.org) as a broadcast lookup; the heuristic keeps the
# operator self-contained and oracle-reproducible.
MULTI_PART_TLDS: tuple[str, ...] = (
    "co.uk",
    "org.uk",
    "gov.uk",
    "ac.uk",
    "com.au",
    "co.jp",
    "co.in",
    "com.br",
)


def url_scheme(url: Column) -> Column:
    """Lowercased scheme, '' when absent."""
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(url: Column) -> Column:
    """Lowercased host (no port), '' when the URL has no authority."""
    return F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1)
    )


def url_port(url: Column) -> Column:
    """Explicit port as a string, '' when absent."""
    return F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)", 1
    )


def url_path(url: Column) -> Column:
    """Path component ('' when absent; query/fragment excluded)."""
    return F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1
    )


def url_query(url: Column) -> Column:
    """Raw query string after the first '?' that precedes any '#' ('' when
    absent). Anchoring before the fragment matters: an unanchored
    ``\\?([^#]*)`` would match a '?' INSIDE the fragment
    ('https://x.com/p#sec?a=1'), leaking fragment content into the
    canonical query even though the contract drops fragments."""
    return F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)


def _kept_params(url: Column, prefixes: tuple[str, ...]) -> Column:
    """Sorted array of non-tracking 'k=v' params (empty array when the
    query is empty)."""
    from functools import reduce

    raw = F.split(url_query(url), "&")
    nonempty = F.filter(raw, lambda p: p != F.lit(""))
    kept = F.filter(
        nonempty,
        lambda p: ~reduce(
            lambda a, b: a | b, [p.startswith(pref) for pref in prefixes]
        ),
    )
    return F.array_sort(kept)


def canonicalize_url(
    url: Column, prefixes: tuple[str, ...] = TRACKING_PARAM_PREFIXES
) -> Column:
    """Canonical URL per the module contract (see module docstring).

    No-authority guard: every component regex anchors on 'scheme://',
    so a scheme-less or protocol-relative URL ('//host/x',
    'example.com/x') would canonicalize to the near-constant ':///...'
    form — and a canonical-URL dedup would then collapse ALL such rows
    onto one key, silently dropping every malformed document but one
    (and a per-domain cap would lump them under domain ''). When the
    URL has no parseable authority, the original string IS the
    canonical form: distinct inputs stay distinct."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    keep_port = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    # strip ONE trailing slash; '' and bare '/' both land on '/'
    stripped = F.regexp_replace(url_path(url), r"/$", "")
    norm_path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    params = _kept_params(url, prefixes)
    query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, keep_port, norm_path, query)
    return F.when(host == "", url).otherwise(canon)


def registrable_domain(host: Column) -> Column:
    """eTLD+1 heuristic: last two host labels, or last three when the
    trailing two form a known multi-part public suffix (MULTI_PART_TLDS).
    Lowercases its input; '' stays ''."""
    h = F.lower(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    take3 = (n >= 3) & last2.isin(*MULTI_PART_TLDS)
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return F.when(n <= 1, h).otherwise(F.when(take3, last3).otherwise(last2))
