"""Z-order (Morton) interleaving for multi-column data skipping.

A scan filtered on ONE column skips files via parquet min/max footers
after a plain sort on that column — but a 100 TB table queried by
box predicates on TWO dimensions (e.g. ``l_partkey`` x ``l_suppkey``,
lat x lon, date x tenant) leaves the second dimension's min/max ranges
degenerate under any linear sort. Interleaving the dimensions' bits
into one Morton key and sorting by THAT bounds every file's extent in
ALL interleaved dimensions at once — the clustering trick behind
Delta/Iceberg ``ZORDER BY``, built here from plain bitwise column
algebra (shiftright/and/shiftleft/or — JVM-side, codegen-eligible,
engine-portable, so a DuckDB twin reproduces keys bit-for-bit).

``z_value`` clamps inputs into [0, 2^bits): values are RANK-compressed
by the caller when the natural domain is wider (percent_rank into 2^21
buckets preserves order, which is all clustering needs).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_value(cols: list[Column], bits: int = 21) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column
    (column j contributes bit i to output position i*len(cols)+j, so
    earlier columns take the less-significant lanes). Inputs are
    clamped into [0, 2^bits) — negative values clamp to 0. With n
    columns, bits*n must stay <= 63."""
    n = len(cols)
    if n < 2:
        raise ValueError("z_value needs at least two columns")
    if bits * n > 63:
        raise ValueError(f"bits*n_cols = {bits * n} exceeds a BIGINT")
    cap = (1 << bits) - 1
    clamped = [
        F.greatest(F.lit(0), F.least(c.cast("long"), F.lit(cap))) for c in cols
    ]
    terms = [
        F.shiftleft(
            F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
        )
        for i in range(bits)
        for j, c in enumerate(clamped)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def oracle_z_value(exprs: list[str], bits: int = 21) -> str:
    """The identical Morton key as a DuckDB SQL expression (bit-for-bit
    twin of :func:`z_value`), for oracle construction."""
    n = len(exprs)
    cap = (1 << bits) - 1
    clamped = [
        f"greatest(0, least(CAST({e} AS BIGINT), {cap}))" for e in exprs
    ]
    terms = [
        f"(((({c}) >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j, c in enumerate(clamped)
    ]
    return "(" + " | ".join(terms) + ")"
