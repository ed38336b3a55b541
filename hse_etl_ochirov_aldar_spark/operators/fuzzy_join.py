"""Blocked fuzzy (edit-distance) join — record linkage without the
cartesian product.

The naive fuzzy join is ``left CROSS JOIN right WHERE levenshtein(a, b)
<= d`` — O(n*m) comparisons, a non-starter at any scale. This module
implements the SymSpell deletion-neighborhood blocking instead: two
strings within edit distance 1 of each other ALWAYS share at least one
member of their deletion neighborhoods (the string itself plus every
single-character-deletion variant) —

- substitution at position i: deleting position i from both sides
  yields the same string;
- insertion/deletion: the shorter string is itself a deletion variant
  of the longer one.

So generating the O(len) variants per row, equi-joining on the variant,
and verifying the survivors with a real ``levenshtein`` call gives
EXACT recall for ``max_dist=1`` at O(n * len) candidate rows — the
shuffle is an ordinary hash join on a 16-byte digest of the variant,
never an all-pairs comparison. (For larger distances the same scheme
needs deletion distance ``d`` on both sides, which grows the
neighborhood to O(len^d); this module deliberately ships the d=1 fast
path — the overwhelmingly common linkage/typo case — and documents the
general construction.)

At 100 TB: variants per row are bounded by the string length (cap
long strings before linking — names/codes/titles, not documents);
the equi-join shuffles O(n * len) digest rows of 24 bytes each;
verification is row-local levenshtein on the matched candidates only.
No stage is quadratic in the table size.

Reference parity: the reference has no fuzzy-matching operator — this
extends its exact-key dedup/replication family
(final-module-3/airflow/dags/mongo_to_postgres_replication.py:214-287,
which dedups on exact business keys) to the typo'd-key case every real
entity-resolution pipeline hits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._plan import spread_small_input


def deletion_variants(col) -> F.Column:
    """Array of the string itself plus every single-character-deletion
    variant (distinct). JVM-side only: sequence + transform + concat —
    no Python in the row path."""
    c = F.col(col) if isinstance(col, str) else col
    # sequence(1, len) ascends only when len >= 1; '' has no deletions
    dels = F.when(
        F.length(c) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda i: F.concat(
                F.substring(c, F.lit(1), i - 1),
                F.substring(c, i + 1, F.length(c)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.concat(F.array(c), dels))


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs (id_a < id_b) whose ``text_col`` values are within
    ``max_dist`` edit operations, found via deletion-neighborhood
    blocking + levenshtein verification. Exact (100% recall) for
    ``max_dist=1``; larger distances are rejected rather than silently
    under-recalled.

    Output: id_a, id_b, name_a, name_b, dist.
    """
    if max_dist != 1:
        raise ValueError(
            "deletion-neighborhood blocking ships the exact d=1 path; "
            "for d>1 generate depth-d deletion neighborhoods (O(len^d) "
            "variants/row) or use ngram_jaccard_pairs for long strings"
        )
    # variant generation + md5 is the per-row CPU stage: spread a
    # small single-file scan across cores first (no-op at real scale)
    keyed = spread_small_input(
        df.select(F.col(id_col).alias("__fid"), F.col(text_col).alias("__ftxt"))
    )
    # md5 the variant before the shuffle: candidate rows are fixed-width
    # digests, not variable-length strings
    variants = keyed.select(
        "__fid",
        "__ftxt",
        F.explode(deletion_variants(F.col("__ftxt"))).alias("__var"),
    ).select("__fid", "__ftxt", F.md5(F.col("__var")).alias("__block"))
    a = variants.select(
        F.col("__fid").alias("id_a"),
        F.col("__ftxt").alias("name_a"),
        "__block",
    )
    b = variants.select(
        F.col("__fid").alias("id_b"),
        F.col("__ftxt").alias("name_b"),
        "__block",
    )
    cand = (
        a.join(b, "__block")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()  # a pair can share several variants — emit once
    )
    return cand.select(
        "id_a",
        "id_b",
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).where(F.col("dist") <= max_dist)
