"""Main-content extraction from HTML pages — the within-page
boilerplate screen (jusText / Boilerpipe family: Kohlschütter et al.
WSDM'10, Pomikálek 2011) that runs on raw crawl HTML BEFORE any
corpus-level dedup or quality scoring.

The corpus-level screens already in the engine (segment boilerplate
removal, duplicated-span screen) drop text repeated ACROSS documents;
this operator drops the structural chrome WITHIN one page — nav bars,
link lists, footers — using the two classic block signals:

- link density: characters inside <a> anchors over total block text
  (navigation blocks are mostly links; jusText's primary feature);
- block length: very short text blocks between markup are chrome
  (button labels, breadcrumbs), not prose.

Reference analogue: none (the reference parses well-formed XML
payloads, SURVEY §2.8 F10); this extends the engine for crawl
ingestion, where the XML operators' assumptions never hold.

Scale shape (100 TB of crawl): the ENTIRE extraction is row-local —
one page's HTML splits into blocks, classifies, and reassembles inside
array expressions (split / transform / filter / aggregate /
array_join), so there is NO shuffle, NO explode-regroup round trip,
and whole-stage codegen runs end to end. An explode→classify→groupBy
formulation would shuffle every block of every page on doc id —
strictly worse at any scale.

Cross-engine exactness: Java regex and DuckDB's RE2 agree on every
pattern used here (character classes, non-greedy quantifiers, no
backreferences); Spark's regexp_replace is global like DuckDB's with
the 'g' flag, and the per-block integer link-density is computed in
basis points with BIGINT div, so the DuckDB oracle reproduces kept
blocks and extracted text byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# block-level HTML elements whose CLOSING tag ends a text block; the
# oracle twin must keep this list identical
BLOCK_SPLIT_PATTERN = r"</(?:p|div|h[1-6]|li|td|section|article)>"
_TAG = r"<[^>]*>"
_ANCHOR = r"(?s)<a\b[^>]*>(.*?)</a>"

# Non-content element BODIES removed before the block split (r11
# verdict task #2): tag-stripping alone keeps JavaScript/CSS/comment
# text, which on real crawl pages is >= 25 chars with zero links and
# would be KEPT as "main content" — wrong text on exactly the input
# class the operator targets. No backreferences (RE2 lacks them), so
# the SAME pattern string runs in Java regex and the DuckDB oracle.
STRIP_PATTERN = (
    r"(?is)<script\b[^>]*>.*?</script>|<style\b[^>]*>.*?</style>"
    r"|<noscript\b[^>]*>.*?</noscript>|<!--.*?-->"
)

# Minimal entity map, decoded AFTER tag-stripping (so a decoded '<'
# can never re-read as markup) and BEFORE whitespace collapse (so
# &nbsp; folds into runs). &amp; LAST: double-encoded '&amp;lt;'
# correctly lands as the text '&lt;', never as '<'. The oracle twin
# applies the identical chain (shared via this list) — plain literal
# replaces, so both engines agree byte-for-byte.
HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def _decode_entities(c: Column) -> Column:
    for src, dst in HTML_ENTITIES:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


def _block_text(raw: Column) -> Column:
    """Visible text of one raw HTML block: strip tags to spaces,
    decode the minimal entity set, then collapse whitespace runs and
    trim — byte-identical on both engines."""
    no_tags = F.regexp_replace(raw, _TAG, " ")
    return F.trim(F.regexp_replace(_decode_entities(no_tags), r"\s+", " "))


def _link_chars(raw: Column) -> Column:
    """Total VISIBLE characters inside <a> anchors of one block (tags
    inside the anchor stripped, whitespace collapsed, like the block
    text itself, so density compares like with like)."""
    anchors = F.regexp_extract_all(raw, F.lit(_ANCHOR), 1)
    return F.aggregate(
        F.transform(anchors, lambda a: F.length(_block_text(a))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _classified_and_kept(
    html_col: str, max_link_density_bp: int, min_text_chars: int
):
    """(classified, kept) block-array Columns — the shared core of the
    extraction family: strip non-content element bodies, split into
    blocks, classify each block ONCE into (txt, lc), filter by the two
    jusText signals. ``filter`` preserves array order, so every
    consumer sees blocks in document order."""
    raw_blocks = F.split(
        F.regexp_replace(F.col(html_col), STRIP_PATTERN, " "),
        BLOCK_SPLIT_PATTERN,
    )
    # classify each raw block once into a struct; compute text a single
    # time per block (the lambda is interpreted, not codegen'd — keep
    # it lean) and carry only what the filter and join need
    classified = F.transform(
        raw_blocks,
        lambda b: F.struct(
            _block_text(b).alias("txt"),
            _link_chars(b).alias("lc"),
        ),
    )
    kept = F.filter(
        classified,
        lambda s: (F.length(s["txt"]) >= F.lit(int(min_text_chars)))
        & (
            F.lit(10000) * s["lc"]
            <= F.lit(int(max_link_density_bp)) * F.length(s["txt"]).cast("long")
        ),
    )
    return classified, kept


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    max_link_density_bp: int = 3000,
    min_text_chars: int = 25,
) -> DataFrame:
    """Adds ``content`` (the extracted main text, blocks joined by a
    single newline), ``n_blocks`` and ``n_kept_blocks`` — keeping the
    blocks whose visible text has at least ``min_text_chars``
    characters AND link density at most ``max_link_density_bp`` basis
    points. Entirely row-local (module doc); all other columns pass
    through.

    Density is BIGINT basis points ``10000 * link_chars div
    text_chars`` (empty blocks are dropped by the length test before
    the division could see 0). Blocks keep their document order —
    ``filter`` preserves array order, so reassembly needs no index
    bookkeeping.

    Script/style/noscript bodies and HTML comments are removed BEFORE
    the block split (:data:`STRIP_PATTERN`): they are never content,
    and stripping first also stops a ``</p>`` inside a JS string from
    splitting a block."""
    classified, kept = _classified_and_kept(
        html_col, max_link_density_bp, min_text_chars
    )
    return (
        df.withColumn("__kept", kept)
        .withColumn("n_blocks", F.size(classified).cast("long"))
        .withColumn("n_kept_blocks", F.size("__kept").cast("long"))
        .withColumn(
            "content",
            F.array_join(F.transform("__kept", lambda s: s["txt"]), "\n"),
        )
        .drop("__kept")
    )


def extract_block_languages(
    df: DataFrame,
    html_col: str = "html",
    max_link_density_bp: int = 3000,
    min_text_chars: int = 25,
) -> DataFrame:
    """Per-BLOCK language identification over the kept main-content
    blocks: adds ``block_texts`` (kept blocks in document order, the
    extract_main_content classification) and ``block_langs`` (each
    block's stopword-argmax heuristic language, functions/text.
    predicted_lang) — the segmentation step feeding bitext mining and
    per-language routing when one crawled page mixes languages
    (boilerplate in the site language, quotes/abstracts in another),
    where a PAGE-level language ID mislabels every minority block.

    Scale shape: identical to extract_main_content — the block split,
    classification, and per-block stopword argmax are all row-local
    array lambdas; zero shuffle before any report aggregate a caller
    adds. Exactness: predicted_lang is integer stopword counts with a
    lexicographic tie-break, so a DuckDB oracle recomputes identical
    labels."""
    from ..functions.text import predicted_lang

    _, kept = _classified_and_kept(
        html_col, max_link_density_bp, min_text_chars
    )
    return (
        df.withColumn(
            "block_texts", F.transform(kept, lambda s: s["txt"])
        )
        .withColumn(
            "block_langs",
            F.transform("block_texts", lambda t: predicted_lang(t)),
        )
    )


def extract_language_content(
    df: DataFrame,
    target_lang: str,
    html_col: str = "html",
    max_link_density_bp: int = 3000,
    min_text_chars: int = 25,
) -> DataFrame:
    """Adds ``content`` = ONLY the ``target_lang``-labeled kept blocks
    of each page, joined by newline in document order — the routing
    form of :func:`extract_block_languages` for monolingual corpus
    prep over multilingual crawl.

    Built as ONE array expression on purpose: the two-column form
    (block_texts + block_langs) re-inlines the whole extraction chain
    per referencing column (no CSE for interpreted lambdas — the
    CollapseProject finding), which measured 2x on the composed v6
    pipeline; here the classify/filter chain appears exactly once and
    the per-block text is a bound lambda variable, evaluated once per
    block."""
    from ..functions.text import predicted_lang

    _, kept = _classified_and_kept(
        html_col, max_link_density_bp, min_text_chars
    )
    routed = F.filter(
        F.transform(
            kept,
            lambda s: F.struct(
                s["txt"].alias("txt"),
                predicted_lang(s["txt"]).alias("lang"),
            ),
        ),
        lambda p: p["lang"] == F.lit(str(target_lang)),
    )
    return df.withColumn(
        "content",
        F.array_join(F.transform(routed, lambda p: p["txt"]), "\n"),
    )


# robots meta directives: both attribute orders occur in real pages —
# name-then-content and content-then-name. No backreferences, so the
# same patterns run under Java regex and the DuckDB oracle's RE2.
_ROBOTS_NC = (
    r"(?is)<meta\b[^>]*\bname\s*=\s*[\"']?robots[\"']?[^>]*"
    r"\bcontent\s*=\s*[\"']([^\"'>]*)"
)
_ROBOTS_CN = (
    r"(?is)<meta\b[^>]*\bcontent\s*=\s*[\"']([^\"'>]*)[\"'][^>]*"
    r"\bname\s*=\s*[\"']?robots[\"']?"
)


def robots_directives(html: Column) -> Column:
    """Array of lower-cased, trimmed robots meta directives of a page
    (e.g. ['noindex', 'follow']); empty when the page carries no robots
    meta tag. Both attribute orders are recognized; the first matching
    tag wins (regexp_extract takes the leftmost match, like a crawler
    honoring the first directive set)."""
    content = F.coalesce(
        F.nullif(F.regexp_extract(html, _ROBOTS_NC, 1), F.lit("")),
        F.nullif(F.regexp_extract(html, _ROBOTS_CN, 1), F.lit("")),
        F.lit(""),
    )
    return F.filter(
        F.transform(
            F.split(content, ","), lambda d: F.lower(F.trim(d))
        ),
        lambda d: d != "",
    )


def drop_robots_noindex(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Crawl-compliance screen: drop pages whose robots meta declares
    ``noindex`` (or the ``none`` shorthand = noindex,nofollow) — run
    BEFORE content extraction, both because compliance is not optional
    for a published corpus and because it is the cheapest screen in
    the chain (one regex per page, row-local, zero shuffle). Survivors
    carry ``robots`` (the parsed directive array) for downstream
    auditing; pages without a robots meta are kept with an empty
    array (the crawler default is index,follow)."""
    out = df.withColumn("robots", robots_directives(F.col(html_col)))
    return out.where(
        ~(
            F.array_contains("robots", "noindex")
            | F.array_contains("robots", "none")
        )
    )
