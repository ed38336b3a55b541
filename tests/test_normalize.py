"""JSON/XML payload normalization (SURVEY Q10) on self-contained
fixtures shaped like the reference's payloads (optional favFoods field,
attributed XML elements)."""

from __future__ import annotations

from hse_etl_ochirov_aldar_spark.operators.normalize import (
    normalize_nutrition_xml,
    normalize_pets_json,
)

PETS_PAYLOAD = """
{"pets": [
  {"name": "Rex", "species": "dog", "favFoods": ["kibble", "cheese"],
   "birthYear": 2019, "photo": "rex.jpg"},
  {"name": "Purrseus", "species": "cat", "favFoods": ["tuna"],
   "birthYear": 2021, "photo": "cat.jpg"},
  {"name": "Goldie", "species": "fish", "birthYear": 2023, "photo": "g.jpg"}
]}
"""

NUTRITION_PAYLOAD = """
<nutrition>
  <daily_values>
    <total_fat units="g">70</total_fat>
    <sodium units="mg">2400</sodium>
  </daily_values>
  <food>
    <name>Avocado Dip</name>
    <serving units="g">29</serving>
    <calories total="110" fat="100"/>
    <vitamins><a>0</a><c>0</c></vitamins>
  </food>
  <food>
    <name>Bagels</name>
    <serving units="g">104</serving>
    <calories total="300" fat="35"/>
    <vitamins><a>0</a><c>10</c></vitamins>
  </food>
</nutrition>
"""


def test_pets_json_normalization(spark):
    payloads = spark.createDataFrame([(PETS_PAYLOAD,)], ["payload"])
    pets, favfoods = normalize_pets_json(payloads)
    prows = {r.name: r for r in pets.collect()}
    assert set(prows) == {"Rex", "Purrseus", "Goldie"}
    assert prows["Rex"].fav_foods_joined == "kibble;cheese"
    # optional favFoods absent -> empty join string, no child rows
    assert prows["Goldie"].fav_foods_joined == ""
    frows = favfoods.collect()
    assert len(frows) == 3  # kibble, cheese, tuna
    assert {r.food for r in frows} == {"kibble", "cheese", "tuna"}
    # surrogate keys dense 1..n by array position
    assert sorted(r.pet_id for r in pets.collect()) == [1, 2, 3]


def test_nutrition_xml_normalization(spark):
    payloads = spark.createDataFrame([(NUTRITION_PAYLOAD,)], ["payload"])
    foods, dv = normalize_nutrition_xml(payloads)
    frows = {r.name: r for r in foods.collect()}
    assert set(frows) == {"Avocado Dip", "Bagels"}
    assert frows["Avocado Dip"].serving_amount == 29
    assert frows["Avocado Dip"].serving_units == "g"
    assert frows["Bagels"].calories_total == 300
    assert frows["Bagels"].vitamin_c == 10
    d = dv.collect()[0]
    assert d.total_fat == 70 and d.total_fat_units == "g"
    assert d.sodium == 2400 and d.sodium_units == "mg"


def test_chunk_documents_coverage_and_overlap(spark):
    from hse_etl_ochirov_aldar_spark.operators.normalize import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y z"), (3, "")],
        ["doc_id", "text"],
    )
    rows = sorted(
        chunk_documents(docs, chunk_tokens=4, stride=3).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    got = [(r.doc_id, r.chunk_id, r.chunk_text, r.n_chunk_tokens) for r in rows]
    assert got == [
        (1, 0, "a b c d", 4),
        (1, 1, "d e f g", 4),   # overlaps previous by chunk-stride=1
        (1, 2, "g h i j", 4),
        (1, 3, "j", 1),         # short tail window
        (2, 0, "x y z", 3),     # doc shorter than one window
    ]  # empty doc 3 yields no child rows (J4 contract)
    # every token of doc 1 appears in at least one chunk
    covered = set()
    for _, _, text, _ in got[:4]:
        covered |= set(text.split())
    assert covered == set("a b c d e f g h i j".split())
    # tiling mode: stride == chunk_tokens, no overlap, exact partition
    tiled = chunk_documents(docs, chunk_tokens=5, stride=5)
    t1 = sorted(
        [r.chunk_text for r in tiled.where("doc_id = 1").collect()]
    )
    assert t1 == ["a b c d e", "f g h i j"]


def test_assemble_trajectories_order_and_determinism(spark):
    """Items assemble in order-column order with item tie-break, one
    row per group, invariant under input partitioning."""
    from hse_etl_ochirov_aldar_spark.operators.normalize import (
        assemble_trajectories,
    )

    rows = [
        ("u1", 2, "b"), ("u1", 1, "a"), ("u1", 3, "c"),
        ("u2", 1, "x"), ("u2", 1, "w"),   # tie on order col -> item order
    ]
    df = spark.createDataFrame(rows, ["u", "pos", "item"])
    out = {
        r.u: (r.n_items, r.trajectory)
        for r in assemble_trajectories(df, ["u"], ["pos"], "item").collect()
    }
    assert out == {"u1": (3, "a;b;c"), "u2": (2, "w;x")}
    out2 = {
        r.u: (r.n_items, r.trajectory)
        for r in assemble_trajectories(
            df.repartition(5), ["u"], ["pos"], "item"
        ).collect()
    }
    assert out2 == out


def test_preference_pairs_ties_margin_and_singletons(spark):
    """Ties break on id (smaller wins chosen, larger takes rejected);
    singleton groups and sub-margin groups drop; chosen==rejected
    cannot escape through ties."""
    from pyspark.sql import functions as F

    from hse_etl_ochirov_aldar_spark.operators.normalize import (
        preference_pairs,
    )

    rows = [
        ("p1", 1, 10), ("p1", 2, 3),            # clear pair
        ("p2", 3, 5), ("p2", 4, 5), ("p2", 5, 1),  # tied top: 3 wins
        ("p3", 6, 7),                            # singleton -> dropped
        ("p4", 7, 4), ("p4", 8, 4),              # all tied: margin 0 -> dropped
    ]
    df = spark.createDataFrame(rows, ["prompt", "cand_id", "score"])
    out = {r.group: r for r in preference_pairs(
        df, "prompt", "cand_id", "score", min_margin=1
    ).collect()}
    assert set(out) == {"p1", "p2"}
    assert (out["p1"].chosen_id, out["p1"].rejected_id) == (1, 2)
    assert out["p1"].margin == 7
    assert (out["p2"].chosen_id, out["p2"].rejected_id) == (3, 5)
    # margin 0 allowed when min_margin=0, but identical-score pairs with
    # distinct ids then survive (chosen=smaller id, rejected=larger)
    loose = {r.group: r for r in preference_pairs(
        df, "prompt", "cand_id", "score", min_margin=0
    ).collect()}
    assert (loose["p4"].chosen_id, loose["p4"].rejected_id) == (7, 8)
