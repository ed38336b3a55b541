"""Frequent-item (heavy-hitter) detection with a provable completeness
bound: per-partition weighted Misra-Gries sketches prune the key domain
to a small candidate set, then ONE exact recount over candidates only.

Why not just ``groupBy(key).count()``? At 100 TB the key domain (URLs,
tokens, user agents) can be billions of distinct values — the exact
census shuffles the whole domain to find the handful of keys anyone
asked about. The sketch path shuffles only candidates:

    scan -> mapInPandas(MG, m counters/partition)   # O(m) memory
         -> tiny candidate set (<= m x partitions)
         -> broadcast LEFT SEMI prune of the scan   # map-side filter
         -> exact groupBy count of candidates only  # tiny shuffle
         -> keep count * (m+1) > N                  # provable set

Guarantee (the reason the output is EXACT, not approximate): weighted
Misra-Gries with ``m`` counters decrements at most n_p/(m+1) from any
key's count within a partition of n_p rows, so every key with
partition count > n_p/(m+1) survives that partition's sketch. If a
key's GLOBAL count exceeds N/(m+1), then by pigeonhole its count
exceeds n_p/(m+1) in at least one partition, so it appears in the
union of candidates. The exact recount then makes the final set
{key : count(key) > N/(m+1)} — a pure function of the data,
independent of partitioning, batch boundaries, and sketch internals.
That is what makes it oracle-checkable with a plain
``HAVING count(*) * (m+1) > N`` — the sketch affects COST, never the
answer (same falsifiable-guarantee structure as the GK/HLL audits,
queries/etl.py).

Reference scope: beyond Aoladiy/HSE-ETL-Ochirov-Aldar (its censuses
are exact GROUP BYs, e.g. build_analytical_marts.py:41-49); this is
the brief's training-pipeline extension for token/URL/domain hot-key
screens.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._plan import spread_small_input

_CAND_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        # one key=NULL row per partition carries that partition's row
        # count, so the global N needs no second full scan
        T.StructField("n_part", T.LongType()),
    ]
)


def _mg_partition(m: int):
    """Arrow-batched weighted Misra-Gries: Counter the batch (C speed),
    then fold each (key, weight) into the m-counter table. Eviction
    subtracts d = min(new weight, table min) from everything — each
    decrement round destroys (m+1) x d total weight, so total
    underestimation per key is < n_p/(m+1), the classic MG bound."""

    def sketch(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        counters: dict[str, int] = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            for key, w in pdf["key"].value_counts().items():
                if key in counters:
                    counters[key] += int(w)
                    continue
                w = int(w)
                while w > 0 and len(counters) >= m:
                    d = min(w, min(counters.values()))
                    w -= d
                    for k2 in list(counters):
                        counters[k2] -= d
                        if counters[k2] == 0:
                            del counters[k2]
                if w > 0:
                    counters[key] = w
        yield pd.DataFrame(
            {
                "key": list(counters) + [None],
                "n_part": [None] * len(counters) + [n_part],
            }
        )

    return sketch


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    m: int = 49,
) -> DataFrame:
    """All keys whose exact count exceeds N/(m+1), with their EXACT
    counts — computed without ever shuffling the full key domain.
    Output: (key, cnt) — deterministic, partitioning-independent.

    ``m`` is the per-partition counter budget AND the threshold knob:
    m=49 finds every key above 2% of N, m=999 every key above 0.1%,
    at O(m) sketch memory per partition. The candidate set the exact
    pass recounts is <= m x partitions rows — broadcastable for any
    sane m.

    Crossover honesty: at test scale a plain groupBy().count() census
    beats this (the Arrow transfer of every key into the Python sketch
    costs more than shuffling a small domain). The sketch path wins
    when |distinct| is large relative to executor memory / shuffle
    budget — billions of URLs or n-grams — where the exact census
    shuffles the whole domain and this shuffles <= m x partitions
    candidates. Pick by profiling (operators/profile.skew_report gives
    the distinct-count signal)."""
    keys = spread_small_input(
        df.select(F.col(key_col).cast("string").alias("key")).where(
            F.col(key_col).isNotNull()
        )
    )
    # one sketch pass yields BOTH the candidates and the per-partition
    # row counts (the key=NULL rows), so N needs no second full scan;
    # the tiny sketch output is persisted because its two consumers
    # would otherwise each re-run the Python MG pass
    sketch = keys.mapInPandas(_mg_partition(m), _CAND_SCHEMA).persist()
    candidates = sketch.where(F.col("key").isNotNull()).select("key").distinct()
    total = F.broadcast(sketch.agg(F.sum("n_part").alias("__n")))
    return (
        keys.join(F.broadcast(candidates), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(total)
        .where(F.col("cnt") * (m + 1) > F.col("__n"))
        .select("key", "cnt")
    )
