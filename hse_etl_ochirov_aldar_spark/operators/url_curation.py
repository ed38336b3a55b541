"""URL-level crawl curation: canonical-URL dedup and per-domain caps.

The two screens every web-corpus pipeline runs BEFORE content-level
dedup (they are orders of magnitude cheaper — pure string algebra on a
short column, no shingling):

- the same page crawled twice with different tracking params /
  fragments / param order collapses onto one canonical URL
  (functions/url.canonicalize_url);
- no single registrable domain may contribute more than ``cap`` pages
  (boilerplate farms and SEO mirrors otherwise dominate the corpus —
  the per-domain cap used by C4/CCNet-style curation).

Scale shape (100 TB): canonicalization and domain extraction are
row-local JVM expressions; the dedup is one groupBy on the canonical
URL (short string key, map-side partials) and the cap is one window
over the domain key — AQE splits oversized domains' partitions, and a
genuinely adversarial hot domain (one domain = half the crawl) is
bounded by ``cap`` anyway, so the window's per-key output is tiny.
Selection inside both screens is md5-hash-order (engine-recomputable),
so results are a pure function of the data — each catalog query built
on these carries a full DuckDB value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.url import canonicalize_url, registrable_domain, url_host
from .sampling import hash_bucket


def dedup_canonical_url(
    df: DataFrame,
    url_col: str = "url",
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep ONE row per canonical URL — the deterministic keeper is the
    minimum ``key_col`` (keep-first, matching the dedup family
    contract). Adds the ``canonical_url`` column to the survivors."""
    canon = df.withColumn("canonical_url", canonicalize_url(F.col(url_col)))
    w = Window.partitionBy("canonical_url").orderBy(F.col(key_col).asc())
    return (
        canon.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def cap_per_domain(
    df: DataFrame,
    url_col: str = "url",
    cap: int = 10,
    key_col: str = "doc_id",
    seed: str = "domain-cap",
) -> DataFrame:
    """Keep at most ``cap`` rows per registrable domain, selected by
    md5-hash order of ``key_col`` (a seeded, engine-portable uniform
    draw — NOT first-crawled order, which over-represents whatever the
    frontier happened to fetch first). Adds the ``domain`` column.

    URLs with no parseable authority (domain '') bypass the cap
    entirely: they are unrelated malformed rows, not one domain, so
    capping them together would silently drop all but ``cap`` of them
    — and routing them through the window would make one giant ''
    partition the hot key. They pass through with domain '' attached
    for a downstream malformed-URL screen to handle explicitly.
    NULL urls (and anything else registrable_domain cannot parse)
    coalesce into the same '' bypass — a row must never vanish just
    because neither split predicate is true of NULL."""
    if cap <= 0:
        raise ValueError("cap must be positive")
    dom = df.withColumn(
        "domain",
        F.coalesce(registrable_domain(url_host(F.col(url_col))), F.lit("")),
    )
    no_authority = dom.where(F.col("domain") == "")
    order = F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))
    w = Window.partitionBy("domain").orderBy(
        hash_bucket(order, 1_000_000_007), F.col(key_col)
    )
    capped = (
        dom.where(F.col("domain") != "")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )
    return capped.unionByName(no_authority)


def parallel_page_candidates(
    df: DataFrame,
    url_col: str = "url",
    key_col: str = "doc_id",
    lang_col: str = "lang",
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
) -> DataFrame:
    """Translation-pair candidates by URL STRUCTURE (the web-mining
    heuristic behind WMT-style crawl alignment, used BEFORE any
    embedding comparison): two pages whose canonical URLs differ only
    in a language path segment (``/en/`` vs ``/de/``) are almost
    certainly the same page in two languages.

    The language segment is normalized out of the canonical URL to form
    an alignment key; pages whose DECLARED language agrees with their
    URL segment (pages where the two contradict are noise for bitext
    mining and are screened out) and that share a key with a DIFFERENT
    language segment pair up (lexicographically smaller segment first —
    which, given the consistency screen, is also a declared-language
    inequality). One groupBy-sized self-join on the alignment key — the
    key space is one entry per multilingual page, and a hot key means a
    page in many languages, bounded by the language count.
    """
    from functools import reduce

    from ..functions.url import canonicalize_url

    canon = canonicalize_url(F.col(url_col))
    # anchored to the FIRST path segment: Spark's regexp_replace is
    # global while DuckDB's is first-match — an anchored pattern has at
    # most one match, so both engines (and the oracle twin) agree
    seg = F.regexp_extract(canon, r"^[a-z]+://[^/]+/([a-z]{2})(/|$)", 1)
    norm = F.regexp_replace(
        canon, r"^([a-z]+://[^/]+)/[a-z]{2}(/|$)", r"$1$2"
    )
    lang_ok = reduce(
        lambda a, b: a | b, [seg == F.lit(lg) for lg in langs]
    )
    # declared-language / URL-segment consistency screen (see docstring)
    lang_ok = lang_ok & (F.col(lang_col) == seg)
    keyed = df.where(lang_ok).select(
        F.col(key_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        seg.alias("url_lang"),
        norm.alias("align_key"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.align_key") == F.col("b.align_key"))
            & (F.col("a.url_lang") < F.col("b.url_lang")),
        )
        .select(
            F.col("a.align_key").alias("align_key"),
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("a.url_lang").alias("lang_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("b.url_lang").alias("lang_b"),
        )
    )


# robots.txt parsing (r12): stateless two-step — split on User-agent
# headers, keep the '*' group(s), extract Allow/Disallow lines. No
# lookahead (RE2 lacks it) and no backreferences, so the SAME pattern
# strings run under Java regex and the DuckDB oracle. Contract is the
# prefix-match subset of REP (RFC 9309): no '*'/'$' wildcards inside
# rule paths, longest-prefix wins, Allow beats Disallow on ties, a
# domain with no robots row (or no '*' group) is fully allowed.
ROBOTS_UA_SPLIT = r"(?i)user-agent[ \t]*:"
ROBOTS_RULE_PATTERN = r"(?im)^[ \t]*(allow|disallow)[ \t]*:[ \t]*([^\s#]*)"


def robots_star_rules(robots_txt: Column) -> Column:
    """array<struct<verb,prefix>> of every Allow/Disallow rule in the
    ``User-agent: *`` group(s) of one robots.txt body; empty-prefix
    rules (``Disallow:`` = allow everything) are kept here and
    ignored by the matcher. Row-local."""
    segs = F.split(robots_txt, ROBOTS_UA_SPLIT)
    star = F.filter(segs, lambda s: F.trim(s).startswith("*"))
    per_seg = F.transform(
        star,
        lambda s: F.zip_with(
            F.regexp_extract_all(s, F.lit(ROBOTS_RULE_PATTERN), 1),
            F.regexp_extract_all(s, F.lit(ROBOTS_RULE_PATTERN), 2),
            lambda v, p: F.struct(
                F.lower(v).alias("verb"), p.alias("prefix")
            ),
        ),
    )
    return F.flatten(per_seg)


def robots_allowed(path: Column, rules: Column) -> Column:
    """True when ``path`` is crawlable under ``rules`` (the
    robots_star_rules array): the LONGEST matching prefix decides,
    Allow beats Disallow at equal length (RFC 9309 §2.2.2), no
    matching rule — or no rules at all — means allowed."""
    matching = F.filter(
        rules,
        lambda r: (r["prefix"] != "") & path.startswith(r["prefix"]),
    )
    best = F.aggregate(
        matching,
        F.struct(F.lit(-1).alias("ln"), F.lit("").alias("verb")),
        lambda acc, r: F.when(
            (F.length(r["prefix"]) > acc["ln"])
            | (
                (F.length(r["prefix"]) == acc["ln"])
                & (r["verb"] == "allow")
            ),
            F.struct(
                F.length(r["prefix"]).alias("ln"), r["verb"].alias("verb")
            ),
        ).otherwise(acc),
    )
    return rules.isNull() | (best["ln"] < 0) | (best["verb"] == "allow")


def robots_txt_screen(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    robots_col: str = "robots_txt",
    domain_col: str = "domain",
) -> DataFrame:
    """Crawl-compliance screen against per-domain robots.txt bodies:
    keep only URLs whose path the domain's ``User-agent: *`` rules
    allow. The companion of drop_robots_noindex (page-level meta):
    robots.txt governs FETCHING, the meta governs indexing — a
    published corpus honors both.

    Scale shape (100 TB of URLs): the robots table is one row per
    registrable domain (bounded by the web's domain count, not its
    page count) and its rules parse ONCE per domain on the build side;
    the URL stream takes a broadcast LEFT join on its derived domain
    and answers the longest-prefix decision row-locally — URLs never
    shuffle. Domains absent from the robots table pass through
    (fetching them found no robots.txt = allowed, the crawler
    default)."""
    rtab = robots.select(
        F.col(domain_col).alias("__rd"),
        robots_star_rules(F.col(robots_col)).alias("__rules"),
    )
    dom = F.coalesce(
        registrable_domain(url_host(F.col(url_col))), F.lit("")
    )
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(
                F.col(url_col),
                r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?",
                1,
            ),
            F.lit(""),
        ),
        F.lit("/"),
    )
    out = urls.withColumn("__dom", dom).join(
        F.broadcast(rtab), F.col("__dom") == F.col("__rd"), "left"
    )
    return out.where(robots_allowed(path, F.col("__rules"))).drop(
        "__rd", "__rules", "__dom"
    )
