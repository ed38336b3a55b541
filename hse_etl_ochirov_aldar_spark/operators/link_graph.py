"""Hyperlink graph construction from crawled HTML pages — anchor
extraction, href resolution, and host-level edge aggregation, the
front half of the classic crawl-quality signal (PageRank over hosts;
Page et al. 1999, and the host-graph variant every production crawl
pipeline keeps because the page graph is too big to iterate cheaply).

Reference analogue: none (the reference ingests typed CSV/JSON/XML
payloads, SURVEY §2.8); this extends the engine's crawl-ingestion
family (html_extract, url_curation) with the cross-page structure
those row-local screens ignore.

Scale shape (100 TB of crawl):

- anchor extraction and href resolution are ROW-LOCAL array lambdas
  over one page's HTML — no shuffle, no explode before the edge
  aggregate needs one;
- the only shuffle is the host-edge groupBy, and its key space is
  DISTINCT HOST PAIRS — bounded by the square of the host count, not
  by page count, and map-side combine collapses each partition's
  per-pair counts before the exchange. 100 TB of pages with 10M
  hosts shuffles at most the surviving pair list, never page text;
- PageRank then iterates on the host graph (operators/graph.
  pagerank_exact_directed), whose size is crawl-frontier-bounded.

Cross-engine exactness: every pattern here is RE2-safe (no
backreferences, no lookaround), so the DuckDB oracles re-run the
SAME extraction — anchors, hrefs, resolution, host folding — and the
integer PageRank twin is bit-for-bit (see graph.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.url import url_host, url_scheme
from .html_extract import STRIP_PATTERN, _block_text

# Full <a> elements, non-greedy across newlines. Group 0 keeps the
# opening tag (for href) AND the body (for anchor text).
ANCHOR_ELEMENT = r"(?is)<a\b[^>]*>.*?</a>"

# href value, double- or single-quoted; unquoted attribute values are
# not extracted (vanishingly rare in real markup, and ambiguous).
_HREF_DQ = r'(?is)<a\b[^>]*?\bhref[ \t]*=[ \t]*"([^"]*)"'
_HREF_SQ = r"(?is)<a\b[^>]*?\bhref[ \t]*=[ \t]*'([^']*)'"


def _href_of(anchor: Column) -> Column:
    """href attribute of one full <a> element, either quote style;
    empty string when absent (RE2 and Java regex agree: no match →
    regexp_extract returns '')."""
    dq = F.regexp_extract(anchor, _HREF_DQ, 1)
    sq = F.regexp_extract(anchor, _HREF_SQ, 1)
    return F.when(dq != "", dq).otherwise(sq)


def resolve_href(base_url: Column, href: Column) -> Column:
    """Absolute http(s) URL for one href against its page URL, or NULL
    for links a crawl graph drops:

    - ``scheme://...`` absolute: kept iff scheme is http/https
      (mailto:, javascript:, ftp: → NULL);
    - ``//host/path`` protocol-relative: page scheme prepended;
    - ``/path`` root-relative: page scheme://host prepended;
    - empty, ``#fragment``, and path-relative (``a/b``, ``../x``):
      NULL — path-relative resolution needs dot-segment
      normalization, deliberately out of scope (documented, matched
      by the oracle; real crawlers normalize these during fetch).

    Pure string expressions — row-local, codegen-friendly, and
    byte-identical in the DuckDB twin.
    """
    scheme = url_scheme(base_url)
    host = url_host(base_url)
    has_scheme = href.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    return (
        F.when(
            has_scheme,
            F.when(
                F.lower(F.regexp_extract(href, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
                        ).isin("http", "https"),
                href,
            ),
        )
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(
            href.startswith("/"),
            F.concat(scheme, F.lit("://"), host, href),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def extract_links(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """One row per resolvable out-link: the input columns minus the
    HTML, plus ``href`` (raw attribute), ``link_url`` (resolved
    absolute), and ``anchor_text`` (visible text of the <a> body,
    entity-decoded and whitespace-collapsed like html_extract block
    text).

    Non-content element bodies (script/style/noscript/comments) are
    stripped FIRST — a templated ``<a>`` inside a script string is
    not a link the page renders.

    Shape: one row-local anchor scan, a NARROW explode (no shuffle),
    then LAYERED projections — href, then link_url, then the filter —
    each stage aliasing its expensive expression so the next stage
    references an attribute. The layering is load-bearing: computing
    everything in one transform-lambda struct lets the optimizer
    beta-reduce the struct fields, re-running the href regex chain at
    EVERY downstream reference (~5 references x the full chain per
    anchor — measured 8x slower end-to-end at sf0.1). CollapseProject
    keeps non-cheap aliases referenced more than once un-inlined, so
    separate selects pin single evaluation.
    """
    anchors = F.regexp_extract_all(
        F.regexp_replace(F.col(html_col), STRIP_PATTERN, " "),
        F.lit(ANCHOR_ELEMENT),
        0,
    )
    keep = [c for c in df.columns if c != html_col]
    ex = df.select(*keep, F.explode(anchors).alias("__a"))
    with_href = ex.select(
        *keep, "__a", _href_of(F.col("__a")).alias("href")
    )
    resolved = with_href.select(
        *keep,
        "href",
        resolve_href(F.col(url_col), F.col("href")).alias("link_url"),
        _block_text(F.col("__a")).alias("anchor_text"),
    )
    return resolved.where(F.col("link_url").isNotNull())


def host_link_edges(
    links: DataFrame,
    url_col: str = "url",
    link_url_col: str = "link_url",
    keep_self: bool = False,
) -> DataFrame:
    """Host-level edge list ``(src_host, dst_host, n_links)`` from a
    page-level link table: hosts fold case (url_host lowercases),
    same-host edges drop unless ``keep_self`` (intra-site nav is
    chrome, not endorsement — the standard host-graph convention).
    One map-side-combinable groupBy whose key space is distinct host
    pairs, never page count."""
    src = url_host(F.col(url_col))
    dst = url_host(F.col(link_url_col))
    e = links.select(src.alias("src_host"), dst.alias("dst_host")).where(
        (F.col("src_host") != "") & (F.col("dst_host") != "")
    )
    if not keep_self:
        e = e.where(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def resolve_redirects(
    urls: DataFrame,
    redirects: DataFrame,
    max_hops: int = 8,
    url_col: str = "url",
) -> DataFrame:
    """Final destination of every URL after following redirect edges
    ``(src_url, dst_url)`` for up to ``max_hops`` hops — the
    crawl-ingestion step that collapses 301/302/canonical chains onto
    their terminal page before any content fetch or dedup keys off
    the URL.

    POINTER JUMPING, not hop-at-a-time: each round joins the current
    pointer table to itself (``p2(x) = p(p(x))``), doubling the
    resolved chain length, so ``max_hops`` needs only
    ceil(log2(max_hops)) rounds — 3 self-joins cover 8 hops where the
    naive loop pays 8. At 100 TB frontier scale that is the
    difference between 3 and 8 shuffles of the pointer table, and the
    pointer table never exceeds one row per known URL.

    Semantics (exact, oracle-twinnable): a URL with no outgoing
    redirect points to itself (terminal). After the final round,
    ``resolved`` is true iff the landing URL is terminal; the rounds
    follow exactly 2^ceil(log2(max_hops)) hops — at least
    ``max_hops``, rounded up to the next power of two — and a chain
    longer than that — including any cycle, which can never
    terminate — reports the partially-followed URL with
    ``resolved = false``. Duplicate src rows in the redirect table
    are invalid input (a URL redirects to ONE place); the operator
    deduplicates keeping the lexicographically-smallest dst so the
    result stays a pure function of the input.

    Output: the input columns plus ``final_url`` and ``resolved``.
    """
    import math

    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    r = (
        redirects.groupBy(F.col("src_url").alias("__s"))
        .agg(F.min("dst_url").alias("__d"))
    )
    # pointer table: every endpoint of the redirect graph, terminals
    # pointing at themselves
    pts = (
        r.select(F.col("__s").alias("u"))
        .unionByName(r.select(F.col("__d").alias("u")))
        .distinct()
    )
    p = (
        pts.join(r, pts["u"] == r["__s"], "left")
        .select("u", F.coalesce("__d", "u").alias("nxt"))
    )
    for _ in range(rounds):
        q = p.select(F.col("u").alias("__qu"), F.col("nxt").alias("__qn"))
        p = (
            p.join(q, p["nxt"] == q["__qu"], "left")
            .select("u", F.coalesce("__qn", "nxt").alias("nxt"))
            # LAZY checkpoint (r12): eager=True cost one driver job per
            # round; lazy still truncates lineage and materializes each
            # round exactly once (both references of round N inside
            # round N+1 share the checkpointed RDD), but the rounds
            # pipeline into the terminal action — A/B at sf0.1:
            # 6.3s -> 4.8s (redirect_resolution), 3.3s -> 3.0s
            # (crawl_frontier_plan), identical results.
            .localCheckpoint(eager=False)
        )
    # a landing URL is final iff it has no outgoing redirect
    term = r.select(F.col("__s").alias("__t"), F.lit(False).alias("__is_term"))
    final = (
        p.join(term, p["nxt"] == term["__t"], "left")
        .select(
            F.col("u").alias("__fu"),
            F.col("nxt").alias("final_url"),
            F.coalesce("__is_term", F.lit(True)).alias("resolved"),
        )
    )
    out = (
        urls.join(final, urls[url_col] == final["__fu"], "left")
        .select(
            *urls.columns,
            F.coalesce("final_url", F.col(url_col)).alias("final_url"),
            F.coalesce("resolved", F.lit(True)).alias("resolved"),
        )
    )
    return out
