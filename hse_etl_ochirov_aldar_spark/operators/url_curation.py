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
    frontier happened to fetch first). Adds the ``domain`` column."""
    if cap <= 0:
        raise ValueError("cap must be positive")
    dom = df.withColumn(
        "domain", registrable_domain(url_host(F.col(url_col)))
    )
    order = F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))
    w = Window.partitionBy("domain").orderBy(
        hash_bucket(order, 1_000_000_007), F.col(key_col)
    )
    return (
        dom.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )
