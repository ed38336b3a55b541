"""Link-graph family: anchor extraction / href resolution contracts,
host-edge folding, and the directed exact-integer PageRank kernel —
including the cross-kernel pin that the directed kernel on a
symmetrized edge list reproduces pagerank_exact bit-for-bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hse_etl_ochirov_aldar_spark.operators.graph import (
    pagerank_exact,
    pagerank_exact_directed,
)
from hse_etl_ochirov_aldar_spark.operators.link_graph import (
    extract_links,
    host_link_edges,
)

_PAGE = (
    '<html><body><a href="/nav">Nav link</a>'
    "<script>var s = \"<a href='https://spam.example/x'>spam</a>\";"
    "</script>"
    '<!-- <a href="https://ghost.example/g">gone</a> -->'
    '<a href="https://other.com/p">Abs link</a>'
    '<a href="//proto.net/q">Proto rel</a>'
    "<a href='https://single.org/r'>Single&amp;quoted</a>"
    '<a href="HTTPS://CASED.COM/s">Cased scheme</a>'
    '<a href="ftp://files.com/t">Ftp drop</a>'
    '<a href="mailto:x@y.z">Mail drop</a>'
    '<a href="#frag">Frag drop</a>'
    '<a href="rel/path">Rel drop</a>'
    "<a name=anch>No href</a></body></html>"
)


def test_extract_links_contract(spark):
    """Every resolution branch: root-relative gains scheme://host,
    protocol-relative gains the page scheme, absolute http(s) pass
    through (any scheme case), script/comment anchors are stripped,
    and ftp/mailto/fragment/path-relative/no-href all drop. Anchor
    text is entity-decoded, tag-stripped, whitespace-collapsed."""
    df = spark.createDataFrame(
        [(1, "http://ex.com/page", _PAGE)], "doc_id long, url string, html string"
    )
    out = extract_links(df).orderBy("link_url").collect()
    got = {(r.link_url, r.anchor_text) for r in out}
    assert got == {
        ("http://ex.com/nav", "Nav link"),
        ("https://other.com/p", "Abs link"),
        ("http://proto.net/q", "Proto rel"),
        ("https://single.org/r", "Single&quoted"),
        ("HTTPS://CASED.COM/s", "Cased scheme"),
    }
    assert "html" not in extract_links(df).columns
    assert [f.name for f in extract_links(df).schema.fields[-3:]] == [
        "href", "link_url", "anchor_text",
    ]


def test_extract_links_is_row_local_before_explode(spark):
    """No Exchange in the extraction plan — anchors classify and
    filter inside their row; only downstream aggregates shuffle."""
    df = spark.createDataFrame(
        [(1, "http://ex.com/page", _PAGE)], "doc_id long, url string, html string"
    )
    plan = (
        extract_links(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_host_link_edges_folds_and_drops_self(spark):
    links = spark.createDataFrame(
        [
            ("https://A.com/1", "https://b.com/x"),
            ("https://a.com/2", "https://B.com/y"),   # same pair, case-folded
            ("https://a.com/3", "https://a.com/self"),  # self loop
            ("https://c.net/4", "https://b.com/z"),
        ],
        "url string, link_url string",
    )
    out = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_link_edges(links).collect()
    }
    assert out == {("a.com", "b.com"): 2, ("c.net", "b.com"): 1}
    kept = host_link_edges(links, keep_self=True)
    assert ("a.com", "a.com") in {
        (r.src_host, r.dst_host) for r in kept.collect()
    }


def test_directed_pagerank_hand_graph(spark):
    """3-node chain a->b->c plus c->a: hand-computed round 1.
    Every node has out-degree 1, so each share is its full rank;
    r1 = 150000 + 85% * 1000000 = 1000000 for every node (a cycle
    is rank-uniform). Break the cycle (drop c->a): then a gets no
    inflow -> base only, and the chain decays downstream."""
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    r = {x.id: x.rank_micro for x in pagerank_exact_directed(cyc, iters=3).collect()}
    assert r == {"a": 1000000, "b": 1000000, "c": 1000000}

    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    # out-degree 1 everywhere, so each share is the full rank.
    # round 1: a has no inflow -> base 150000; b, c still fed 1000000.
    r1 = {x.id: x.rank_micro for x in pagerank_exact_directed(chain, iters=1).collect()}
    assert r1 == {"a": 150000, "b": 1000000, "c": 1000000}
    # round 2: b fed by a's 150000 -> 150000 + (85*150000)//100 = 277500
    r2 = {x.id: x.rank_micro for x in pagerank_exact_directed(chain, iters=2).collect()}
    assert r2 == {"a": 150000, "b": 277500, "c": 1000000}
    # round 3: c fed by b's 277500 -> 150000 + (85*277500)//100 = 385875
    r3 = {x.id: x.rank_micro for x in pagerank_exact_directed(chain, iters=3).collect()}
    assert r3 == {"a": 150000, "b": 277500, "c": 385875}


def test_directed_pagerank_drops_duplicate_edges_and_self_loops(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "a"), ("b", "a")],
        "src string, dst string",
    )
    base = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {
        r.id: r.rank_micro for r in pagerank_exact_directed(e, iters=2).collect()
    }
    want = {
        r.id: r.rank_micro
        for r in pagerank_exact_directed(base, iters=2).collect()
    }
    assert got == want


def test_directed_on_symmetrized_equals_undirected(spark, sf_dir):
    """Bit-for-bit: pagerank_exact_directed over both directions of an
    undirected pair list IS pagerank_exact — same node universe, same
    out-degrees, same half-up shares, same base term. Run on the real
    co-purchase graph the part_pagerank entry uses."""
    from hse_etl_ochirov_aldar_spark.sources.readers import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") < 60)
        .select("l_orderkey", "l_partkey")
    )
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("id_a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("id_b"))
    pairs = (
        a.join(b, "o")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sym = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    und = {
        r.id: r.rank_micro for r in pagerank_exact(pairs, iters=3).collect()
    }
    dird = {
        r.id: r.rank_micro
        for r in pagerank_exact_directed(sym, iters=3).collect()
    }
    assert und == dird and len(und) > 0


def test_pagerank_directed_rejects_bad_damping(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank_exact_directed(e, damping_pct=101)


def test_resolve_redirects_chain_cycle_and_bound(spark):
    """Chains land on their terminal, cycles stay unresolved, URLs
    outside the redirect graph resolve to themselves, duplicate src
    rows collapse to the lexicographically-smallest dst, and a chain
    longer than the doubling coverage reports partially-followed."""
    from hse_etl_ochirov_aldar_spark.operators.link_graph import (
        resolve_redirects,
    )

    urls = spark.createDataFrame(
        [(i, f"u{i}") for i in range(9)], "doc_id long, url string"
    )
    red = spark.createDataFrame(
        [
            ("u0", "u1"), ("u1", "u2"), ("u2", "u3"),   # 3-hop chain
            ("u4", "u5"), ("u5", "u4"),                 # 2-cycle
            ("u6", "u7"), ("u6", "u9"),                 # dup src: min dst wins
        ],
        "src_url string, dst_url string",
    )
    out = {
        r.url: (r.final_url, r.resolved)
        for r in resolve_redirects(urls, red, max_hops=8).collect()
    }
    assert out["u0"] == ("u3", True)
    assert out["u1"] == ("u3", True)
    assert out["u3"] == ("u3", True)
    assert out["u4"][1] is False and out["u4"][0] in ("u4", "u5")
    assert out["u5"][1] is False
    assert out["u6"] == ("u7", True)   # min("u7","u9") = "u7"
    assert out["u8"] == ("u8", True)   # not in redirect graph

    # max_hops=2 -> 1 doubling round -> exactly 2 hops followed: the
    # 3-hop chain head lands mid-chain, unresolved
    out2 = {
        r.url: (r.final_url, r.resolved)
        for r in resolve_redirects(urls, red, max_hops=2).collect()
    }
    assert out2["u0"] == ("u2", False)
    assert out2["u1"] == ("u3", True)


def test_extract_links_is_streaming_composable(spark, tmpdir):
    """extract_links is stateless row-local algebra plus a narrow
    explode — the same call works unchanged on a readStream (the
    crawl-ingest link-layer path); streamed extraction equals batch
    extraction per micro-batch with no state."""
    from pyspark.sql import types as T

    pages = spark.createDataFrame(
        [
            (
                i,
                f"http://site{i % 3}.com/p{i}",
                f'<p><a href="/self{i}">Self {i}</a> and '
                f'<a href="https://hub{i % 4}.example/x{i}">Hub {i}</a> '
                f'<a href="#skip">skip</a></p>',
            )
            for i in range(12)
        ],
        ["doc_id", "url", "html"],
    )
    src = f"{tmpdir}/links_src"
    pages.repartition(3).write.parquet(src)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("html", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        extract_links(stream)
        .writeStream.format("memory")
        .queryName("t_stream_links")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cols = ["doc_id", "href", "link_url", "anchor_text"]
    streamed = {
        tuple(r[c] for c in cols)
        for r in spark.table("t_stream_links").collect()
    }
    batch = {
        tuple(r[c] for c in cols) for r in extract_links(pages).collect()
    }
    assert streamed == batch and len(batch) == 24  # 2 resolvable per page
