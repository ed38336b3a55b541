"""Skew-safe join (scale toolkit; no reference analogue — the
reference's only joins are broadcast-scalar and small-dim equi-joins,
SURVEY.md §2.3).

At 100 TB a shuffled equi-join dies on hot keys: every row of the hot
key lands in one reducer. First line of defense is AQE skew-join
splitting (on in session.get_spark) — it splits oversized PARTITIONS,
which covers most cases. Manual salting remains necessary when a
SINGLE KEY is hot (AQE cannot split one key's hash bucket across
joins' both sides) or when the join runs inside a stream where AQE is
unavailable. The salt spreads each hot key over ``salt_buckets``
reducers at the cost of replicating the small side ``salt_buckets``
times — so keep the salted side the big one and the replicated side
the dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with hot-key salting.

    Each big-side row gets one pseudo-random salt in [0, salt_buckets);
    the small side is exploded once per salt value, so every (key,
    salt) pair still meets its match — the result set is exactly the
    unsalted join's, independent of salt assignment. Supports inner
    and left joins (each big row keeps exactly one salt, so
    multiplicity is preserved; right/full would need the roles
    swapped).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*on, F.monotonically_increasing_id()), F.lit(salt_buckets)),
    )
    replicated_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_big.join(replicated_small, [*on, _SALT], how).drop(_SALT)
