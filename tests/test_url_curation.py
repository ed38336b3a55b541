"""URL canonicalization / domain curation (functions/url.py,
operators/url_curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


CASES = [
    # (raw, canonical)
    ("https://Ex.COM/a/b/?utm_source=x&z=1&a=2#frag",
     "https://ex.com/a/b?a=2&z=1"),
    ("HTTP://WWW.Site.CO.UK:80/path", "http://www.site.co.uk/path"),
    ("https://host.com:443/", "https://host.com/"),
    ("https://host.com:8080/x", "https://host.com:8080/x"),
    ("https://host.com", "https://host.com/"),
    ("https://host.com/?fbclid=abc&gclid=1&ref=tw&sessionid=9",
     "https://host.com/"),
    ("https://host.com/a?b=2&a=1", "https://host.com/a?a=1&b=2"),
    # no parseable authority -> original string IS the canonical form
    ("//host/x", "//host/x"),
    ("example.com/x?utm_source=1", "example.com/x?utm_source=1"),
    ("not a url at all", "not a url at all"),
    # '?' inside the fragment must NOT leak into the query
    ("https://x.com/p#sec?a=1", "https://x.com/p"),
]


def test_canonicalize_url_cases(spark):
    from hse_etl_ochirov_aldar_spark.functions.url import canonicalize_url

    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [c for _, c in CASES]


def test_canonicalize_idempotent(spark):
    """Canonicalizing a canonical URL must be a no-op."""
    from hse_etl_ochirov_aldar_spark.functions.url import canonicalize_url

    df = spark.createDataFrame([(c,) for _, c in CASES], ["url"])
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [c for _, c in CASES]


def test_registrable_domain_branches(spark):
    from hse_etl_ochirov_aldar_spark.functions.url import registrable_domain

    cases = [
        ("www.example.com", "example.com"),
        ("a.b.news.co.uk", "news.co.uk"),
        ("EXAMPLE.COM", "example.com"),
        ("cdn.shop.com.br", "shop.com.br"),
        ("localhost", "localhost"),
        ("co.uk", "co.uk"),       # bare suffix: only 2 labels -> itself
        ("x.org", "x.org"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], ["h"])
    got = [r[0] for r in df.select(registrable_domain(F.col("h"))).collect()]
    assert got == [d for _, d in cases]


def test_dedup_canonical_url_keeps_min_id(spark):
    from hse_etl_ochirov_aldar_spark.operators.url_curation import (
        dedup_canonical_url,
    )

    rows = [
        (1, "https://a.com/x?b=2&a=1"),
        (2, "https://A.COM:443/x/?a=1&utm_source=f&b=2#t"),  # dup of 1
        (3, "https://a.com/y"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = {r.doc_id for r in dedup_canonical_url(df).collect()}
    assert kept == {1, 3}


def test_cap_per_domain_bounds_and_determinism(spark):
    from hse_etl_ochirov_aldar_spark.operators.url_curation import (
        cap_per_domain,
    )

    rows = [(i, f"https://{'big' if i < 40 else 'small'}.com/p/{i}")
            for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = cap_per_domain(df, cap=3)
    counts = {r["domain"]: r["n"] for r in
              out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"big.com": 3, "small.com": 3}
    # deterministic: same draw twice
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in cap_per_domain(df, cap=3).collect())
    assert a == b
    with pytest.raises(ValueError, match="positive"):
        cap_per_domain(df, cap=0)


def test_cap_per_domain_passes_through_no_authority(spark):
    """Malformed/scheme-less URLs (domain '') are unrelated rows, not
    one domain — they must bypass the cap instead of being collapsed
    to ``cap`` survivors under the '' pseudo-domain."""
    from hse_etl_ochirov_aldar_spark.operators.url_curation import (
        cap_per_domain,
    )

    rows = [(i, f"https://big.com/p/{i}") for i in range(10)]
    rows += [(100 + i, f"relative/path/{i}") for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = cap_per_domain(df, cap=3)
    counts = {r["domain"]: r["n"] for r in
              out.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"big.com": 3, "": 8}


def test_dedup_canonical_url_never_merges_no_authority(spark):
    """Distinct malformed URLs must stay distinct under canonical-URL
    dedup (the ':///' collapse guard)."""
    from hse_etl_ochirov_aldar_spark.operators.url_curation import (
        dedup_canonical_url,
    )

    rows = [(1, "//host/x"), (2, "example.com/x"), (3, "not a url"),
            (4, "https://a.com/x"), (5, "https://a.com/x/")]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = sorted(r.doc_id for r in dedup_canonical_url(df).collect())
    assert kept == [1, 2, 3, 4]


def test_cap_per_domain_null_url_passes_through(spark):
    """A NULL url (or anything registrable_domain cannot parse) must
    coalesce into the '' bypass, never vanish: NULL fails both sides
    of a ''/non-'' split unless coalesced first."""
    from pyspark.sql import functions as F

    from hse_etl_ochirov_aldar_spark.operators.url_curation import (
        cap_per_domain,
    )

    rows = [(i, f"https://ex{i % 2}.com/p{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, url STRING").unionByName(
        spark.createDataFrame([(100,)], "doc_id BIGINT").withColumn(
            "url", F.lit(None).cast("string")
        )
    )
    out = cap_per_domain(df, cap=3)
    assert out.count() == 7  # 3 + 3 capped + 1 NULL pass-through
    null_row = out.where(F.col("doc_id") == 100).collect()
    assert len(null_row) == 1 and null_row[0]["domain"] == ""


def test_extract_main_content_signals_and_order(spark):
    """Within-page boilerplate screening: link-dense blocks and short
    blocks drop, prose survives IN DOCUMENT ORDER, and the whole plan
    is row-local (no exchange before any aggregate a caller adds)."""
    from pyspark.sql import functions as F

    from hse_etl_ochirov_aldar_spark.operators.html_extract import (
        extract_main_content,
    )

    prose1 = "This opening paragraph carries the actual article body text."
    prose2 = "A second substantive paragraph continues the argument here."
    html = (
        '<div class="nav"><a href="/">Home</a> <a href="/x">About page</a>'
        "</div>"
        f"<p>{prose1}</p>"
        '<div>Mixed block with plenty of ordinary prose around '
        'one tiny <a href="/l">link</a> inside it, still mostly text.</div>'
        f"<p>{prose2}</p>"
        "<p>Tiny.</p>"
        '<div class="footer"><a href="/tos">Terms of service text</a>'
        "</div>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id LONG, html STRING")
    row = extract_main_content(df).collect()[0]
    parts = row.content.split("\n")
    assert parts[0] == prose1
    assert "mostly text" in parts[1]  # mixed low-density block kept
    assert parts[2] == prose2
    assert len(parts) == 3  # nav, tiny, footer all dropped
    assert row.n_kept_blocks == 3 and row.n_blocks > 3

    # degenerate inputs: no markup at all, and pure-chrome pages
    plain = spark.createDataFrame(
        [(2, "Just a bare string long enough to count as one block.")],
        "doc_id LONG, html STRING",
    )
    r2 = extract_main_content(plain).collect()[0]
    assert r2.content.startswith("Just a bare") and r2.n_kept_blocks == 1
    chrome = spark.createDataFrame(
        [(3, '<div><a href="/">Home page link text</a></div>')],
        "doc_id LONG, html STRING",
    )
    r3 = extract_main_content(chrome).collect()[0]
    assert r3.content == "" and r3.n_kept_blocks == 0

    # nested tags inside an anchor count their VISIBLE text only
    nested = spark.createDataFrame(
        [(4, '<div>pad pad pad pad pad pad <a href="/x"><b>bold '
             "link text</b></a></div>")],
        "doc_id LONG, html STRING",
    )
    r4 = extract_main_content(nested, max_link_density_bp=4000).collect()[0]
    # visible block text ~40 chars, anchor visible ~14 -> ~3500bp kept
    assert r4.n_kept_blocks == 1

    # row-local claim: no Exchange in the executed plan of the bare op
    plan = (
        extract_main_content(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_extract_main_content_strips_noncontent_and_entities(spark):
    """r11 verdict task #2: script/style/noscript bodies and HTML
    comments are never content — a >= 25-char zero-link inline script
    used to be KEPT as 'main content'; entities decode through the
    minimal shared map (&amp; LAST so double-encoding stays text)."""
    from hse_etl_ochirov_aldar_spark.operators.html_extract import (
        extract_main_content,
    )

    prose = "The actual article body sentence that must survive intact."
    html = (
        '<script type="text/javascript">var page = track("id"); '
        "page.send(12345); /* zero links, plenty long */</script>"
        "<style>body{margin:0} .nav{display:none} p{padding:1em}</style>"
        "<!-- build 987654321 rendered by engine, long enough too -->"
        f"<p>{prose}</p>"
        "<noscript>Please enable JavaScript to view this whole page "
        "properly.</noscript>"
        '<p>A script string with a fake closer </script> inside text '
        "keeps flowing here.</p>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id LONG, html STRING")
    row = extract_main_content(df).collect()[0]
    parts = row.content.split("\n")
    assert parts[0] == prose
    # none of the JS/CSS/comment/noscript text leaked into content
    for leaked in ("page.send", "margin:0", "987654321", "JavaScript"):
        assert leaked not in row.content

    # a </p> INSIDE a script body must not split blocks: stripping
    # happens before the split
    js_split = (
        '<script>var s = "</p>"; emit(s); // long enough to matter '
        "here</script><p>Only one real paragraph block follows the "
        "script body.</p>"
    )
    d2 = spark.createDataFrame([(2, js_split)], "doc_id LONG, html STRING")
    r2 = extract_main_content(d2).collect()[0]
    assert r2.n_kept_blocks == 1 and r2.content.startswith("Only one real")

    # entity decoding: minimal map, &amp; last (double-encoding pin)
    ent = (
        "<p>Ben &amp; Jerry say 2 &lt; 3 &gt; 1 and&nbsp;that&#39;s "
        "&quot;fine&quot; &amp;lt; literally.</p>"
    )
    d3 = spark.createDataFrame([(3, ent)], "doc_id LONG, html STRING")
    r3 = extract_main_content(d3).collect()[0]
    assert r3.content == (
        'Ben & Jerry say 2 < 3 > 1 and that\'s "fine" &lt; literally.'
    )


def test_extract_block_languages_labels_in_order(spark):
    """Per-block language segmentation: each kept block gets the
    stopword-argmax label of ITS text (not the page majority), in
    document order, and the plan stays row-local."""
    from hse_etl_ochirov_aldar_spark.operators.html_extract import (
        extract_block_languages,
    )

    html = (
        '<div class="nav"><a href="/">Home</a> <a href="/x">About '
        "page</a></div>"
        "<p>The report is a long text of the kind we keep in the "
        "corpus and the tests.</p>"
        "<p>Der Bericht ist und bleibt von einem Autor und das Team "
        "ist da.</p>"
        "<p>Le rapport est un document et les auteurs sont une equipe "
        "complete.</p>"
        "<p>12345 67890 12345 67890 12345 67890 xyzzy frobnicate "
        "qwertyuiop.</p>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id LONG, html STRING")
    row = extract_block_languages(df).collect()[0]
    assert row.block_langs == ["en", "de", "fr", "und"]
    assert len(row.block_texts) == 4
    assert row.block_texts[1].startswith("Der Bericht")

    plan = (
        extract_block_languages(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_drop_robots_noindex_contract(spark):
    """Robots compliance screen: noindex and the NONE shorthand drop
    (any case, either attribute order, comma variants); index/follow,
    nofollow-only, and absent metas keep; the parsed directive array
    rides along; plan is row-local."""
    from hse_etl_ochirov_aldar_spark.operators.html_extract import (
        drop_robots_noindex,
    )

    rows = [
        (1, '<head><meta name="robots" content="noindex, follow"></head>'
            "<p>x</p>"),
        (2, '<head><meta name="robots" content="NONE"></head><p>x</p>'),
        (3, '<head><meta content="nofollow,noindex" name="robots"></head>'
            "<p>x</p>"),
        (4, '<head><meta name="robots" content="index, follow"></head>'
            "<p>x</p>"),
        (5, "<head><title>no robots meta at all</title></head><p>x</p>"),
        (6, '<head><meta name="ROBOTS" content="NoIndex"></head><p>x</p>'),
        (7, '<head><meta name="robots" content="nofollow"></head><p>x</p>'),
        (8, '<head><meta name="description" content="noindex is a word">'
            "</head><p>x</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, html STRING")
    kept = drop_robots_noindex(df)
    got = {r.doc_id: r.robots for r in kept.collect()}
    assert set(got) == {4, 5, 7, 8}
    assert got[4] == ["index", "follow"]
    assert got[5] == [] and got[8] == []
    assert got[7] == ["nofollow"]

    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_crawl_pipeline_stage_order_robots_before_url_dedup(spark):
    """The composed crawl pipeline screens robots BEFORE electing
    canonical-URL keepers: when the min-id copy of a page is noindex
    but a later tracking-variant copy is indexable, the indexable copy
    must become the keeper and SURVIVE. URL-dedup-first would elect
    the noindex copy, then lose the document entirely at the robots
    screen — silent under-coverage."""
    from hse_etl_ochirov_aldar_spark.operators.html_extract import (
        drop_robots_noindex,
        extract_main_content,
    )
    from hse_etl_ochirov_aldar_spark.operators.text_dedup import exact_dedup
    from hse_etl_ochirov_aldar_spark.operators.url_curation import (
        dedup_canonical_url,
    )

    body = "<p>The one real paragraph of content this page carries.</p>"
    rows = [
        (1, "https://ex.com/a?utm_source=x",
         f'<head><meta name="robots" content="noindex"></head>{body}'),
        (2, "https://ex.com/a", f"<head></head>{body}"),
    ]
    pages = spark.createDataFrame(rows, "doc_id long, url string, html string")
    out = exact_dedup(
        extract_main_content(dedup_canonical_url(drop_robots_noindex(pages)))
        .select("doc_id", "content")
        .where(F.length("content") > 0),
        text_col="content",
    )
    assert [r.doc_id for r in out.collect()] == [2]


def test_extract_language_content_routes_blocks(spark):
    """Language routing keeps only target-language blocks, joined in
    document order; pages with no target block yield ''; plan is
    row-local and the chain appears once (no __qsalt-style
    duplication concerns — single expression by construction)."""
    from hse_etl_ochirov_aldar_spark.operators.html_extract import (
        extract_language_content,
    )

    en1 = "The report is a text of the kind we keep in the corpus here."
    en2 = "And the second English paragraph is also part of the body."
    de = "Der Bericht ist und bleibt von einem Autor und das Team ist da."
    html = f"<p>{en1}</p><p>{de}</p><p>{en2}</p>"
    df = spark.createDataFrame(
        [(1, html), (2, f"<p>{de}</p>")], "doc_id long, html string"
    )
    got = {
        r.doc_id: r.content
        for r in extract_language_content(df, "en").collect()
    }
    assert got[1] == f"{en1}\n{en2}"
    assert got[2] == ""
    de_got = {
        r.doc_id: r.content
        for r in extract_language_content(df, "de").collect()
    }
    assert de_got[1] == de and de_got[2] == de

    plan = (
        extract_language_content(df, "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_robots_txt_screen_contract(spark):
    """robots.txt screen: longest matching prefix decides, Allow beats
    Disallow on ties (the /articles/public carve-out inside the
    /articles disallow), non-star UA groups are ignored, empty
    Disallow means allow-all, unruled paths and robots-less domains
    pass, and the plan broadcasts the rule table (URLs never
    shuffle)."""
    from hse_etl_ochirov_aldar_spark.operators.url_curation import (
        robots_txt_screen,
    )

    rt = "\n".join(
        [
            "# site robots",
            "User-agent: googlebot",
            "Disallow: /private",
            "User-agent: *",
            "Allow: /articles/public",
            "Disallow: /articles",
            "Disallow: /tmp",
            "User-agent: other",
            "Disallow: /",
        ]
    )
    robots = spark.createDataFrame(
        [("ex.com", rt), ("open.org", "User-agent: *\nDisallow:")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://ex.com/articles/1"),         # disallowed
            (2, "https://ex.com/articles/public/2"),  # longer allow wins
            (3, "https://ex.com/tmp/3"),              # disallowed
            (4, "https://ex.com/pages/4"),            # unruled -> kept
            (5, "https://ex.com"),                    # path '/' unruled
            (6, "https://open.org/anything"),         # empty disallow
            (7, "https://norobots.net/x"),            # no robots row
            (8, "https://ex.com/private/8"),          # googlebot-only rule
        ],
        "doc_id long, url string",
    )
    out = robots_txt_screen(urls, robots)
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [2, 4, 5, 6, 7, 8]

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "Exchange hashpartitioning" not in plan
