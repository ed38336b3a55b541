"""Market-basket co-occurrence analytics: pair support, confidence,
lift.

The pair census is the classic association-mining primitive (the
2-itemset pass of Apriori). Shape: one distinct pass over (basket,
item), basket-size cap via a join of the per-basket counts, then a
self-equi-join on the basket key with ``item_a < item_b`` into
a combinable pair count — hash shuffles on basket and pair keys only,
never all-pairs across the table.

Two shapes were benchmarked and REJECTED (sf0.1, 600k rows; PERF.md):
row-local pair generation from a collected+sorted item array (nested
``transform``/``slice`` lambdas run interpreted, outside whole-stage
codegen, and copy the array per element — 5x slower than the codegen'd
equi-join) and persisting the capped projection for its multiple
consumers (InMemoryTableScan of the 200-partition cached relation was
~15x slower than simply re-scanning the parquet — column-pruned
parquet scans are nearly free; a cache is not).

Scale levers, in order of importance at 100 TB:

- **Basket-size cap.** The self-join is quadratic PER BASKET (a
  k-item basket emits k*(k-1)/2 pairs), so one pathological basket —
  a crawler account with 10^5 order lines — would emit 5e9 pairs
  alone. ``max_basket`` drops oversized baskets BEFORE the join (one
  combinable count-by-basket pass), making worst-case join output
  provably <= n_baskets * cap^2 / 2. Analytics semantics
  ("co-purchase signal from human-scale baskets") actively want this.
- **Min-support filter** prunes the pair census before lift math, so
  the per-item-support joins see only surviving pairs.
- The basket-count scalar rides in through a broadcast 1-row
  aggregate crossJoin (never a driver-side ``count()``, which would
  schedule the upstream plan as an extra synchronous job). The cap
  join and support joins carry NO forced broadcast hint: basket and
  item cardinalities both grow with the corpus (billions at 100 TB),
  so a hard broadcast would OOM the build side at scale — AQE
  upgrades them to broadcast at runtime whenever the census actually
  fits, which is strictly safer than promising it.

Lift stays exact-integer until the final division: lift(a,b) =
(n_baskets * supp_ab) / (supp_a * supp_b), all BIGINT products well
under 2^63 for any realistic census, divided once into DOUBLE — the
identical expression is reproducible in any engine (no float
accumulation order to drift).

Reference parity: extends the reference's groupBy/count analytics
(HW-3/airflow/dags/iot_temperature.py:39-100 aggregation marts) with
the co-occurrence primitive those marts stop short of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 64,
) -> DataFrame:
    """Pair census with lift over (basket, item) rows.

    Output: item_a, item_b, supp_ab, supp_a, supp_b, lift (DOUBLE,
    rounded 6dp) — one row per unordered item pair with
    ``supp_ab >= min_support``, from baskets with <= ``max_basket``
    distinct items.
    """
    items = df.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    ).distinct()  # presence, not multiplicity: support is basket count
    sizes = items.groupBy("__basket").agg(F.count(F.lit(1)).alias("__sz"))
    ok_baskets = sizes.where(F.col("__sz") <= max_basket)
    # explicit width for the pair-explosion stage (r12; the
    # cosine_dup_ids precedent): the (basket, item) rows are a few
    # bytes each so AQE coalesces the self-join input to 3-5 tasks,
    # but its per-row COST is the quadratic within-basket pair fanout
    # Catalyst cannot price. Both join sides derive from this one
    # repartition, so they share the exchange.
    target = df.sparkSession.sparkContext.defaultParallelism
    kept = items.join(ok_baskets.select("__basket"), "__basket").repartition(
        target, "__basket"
    )

    nb = F.broadcast(ok_baskets.agg(F.count(F.lit(1)).alias("__nb")))

    a = kept.select(F.col("__basket"), F.col("__item").alias("item_a"))
    b = kept.select(F.col("__basket"), F.col("__item").alias("item_b"))
    pairs = (
        a.join(b, "__basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("supp_ab"))
        .where(F.col("supp_ab") >= min_support)
    )
    item_supp = kept.groupBy("__item").agg(F.count(F.lit(1)).alias("__supp"))
    return (
        pairs.join(
            item_supp.withColumnsRenamed(
                {"__item": "item_a", "__supp": "supp_a"}
            ),
            "item_a",
        )
        .join(
            item_supp.withColumnsRenamed(
                {"__item": "item_b", "__supp": "supp_b"}
            ),
            "item_b",
        )
        .crossJoin(nb)
        .select(
            "item_a",
            "item_b",
            "supp_ab",
            "supp_a",
            "supp_b",
            F.round(
                (F.col("__nb").cast("bigint") * F.col("supp_ab"))
                / (F.col("supp_a").cast("bigint") * F.col("supp_b")),
                6,
            ).alias("lift"),
        )
    )
