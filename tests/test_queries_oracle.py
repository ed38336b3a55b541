"""Every catalog query with an oracle must match DuckDB on the same
parquet tables — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from hse_etl_ochirov_aldar_spark.queries import ORACLES, QUERIES

from .oracle_utils import assert_matches_oracle, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, con, ORACLES[name], name)


# Types whose DuckDB binary serialization the driver's value hasher agrees
# on with Spark's. DuckDB silently widens to HUGEINT (list_sum, count over
# HUGEINT) and DECIMAL (avg over DECIMAL), which hash differently from
# Spark's BIGINT/DOUBLE even when the values are equal — the round-2
# pack_sequences red row. Every oracle output column must land in this set.
# INTEGER is included because it round-trips to the same Python int as
# Spark's IntegerType (row_number etc.) — the 12 oracles that emit it were
# all green on the driver's hash in rounds 1-2.
_HASH_SAFE_TYPES = {
    "BIGINT",
    "INTEGER",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BOOLEAN",
}


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_output_types_hash_safe(name, con):
    rel = con.sql(ORACLES[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) not in _HASH_SAFE_TYPES
    ]
    assert not bad, (
        f"{name}: oracle output columns with hash-unsafe DuckDB types {bad}; "
        f"cast them (e.g. CAST(... AS BIGINT)) so the driver hash matches Spark"
    )


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_executes(name, con):
    """EXECUTE every oracle, not just bind it. Binding (``con.sql``)
    type-checks the plan but never runs it, so runtime-only failures —
    e.g. the round-5 ``ewma_anomaly_scores`` DECIMAL(2,1) overflow, where
    DuckDB typed a recursive-CTE anchor's bare ``0.0`` as DECIMAL and the
    recursive arm's DOUBLE values overflowed the cast back — sail through
    the type lint and ship red. ``fetchall`` at sf0.001 takes milliseconds
    per oracle and closes that hole for good (VERDICT r5 task #2)."""
    con.sql(ORACLES[name]).fetchall()


# Entries allowed to ship WITHOUT a DuckDB oracle twin. Each needs a
# written justification; an empty dict means the board is fully
# hash-checkable. This is the authoring-time gate that would have
# caught round 4's no_oracle rows before the driver did.
ROWS_ONLY_JUSTIFIED: dict[str, str] = {}


def test_every_catalog_entry_is_oracle_checkable_or_justified():
    missing = set(QUERIES) - set(ORACLES) - set(ROWS_ONLY_JUSTIFIED)
    assert not missing, (
        f"catalog entries with neither an ORACLES row nor a documented "
        f"rows-only justification: {sorted(missing)}"
    )
    stale = set(ROWS_ONLY_JUSTIFIED) & set(ORACLES)
    assert not stale, f"justifications for entries that HAVE oracles: {sorted(stale)}"


def test_registry_keys_are_consistent():
    from hse_etl_ochirov_aldar_spark.queries import BENCH_QUERIES

    assert set(ORACLES) <= set(QUERIES), sorted(set(ORACLES) - set(QUERIES))
    assert set(BENCH_QUERIES) <= set(QUERIES), sorted(
        set(BENCH_QUERIES) - set(QUERIES)
    )
    assert len(BENCH_QUERIES) == len(set(BENCH_QUERIES))


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_runs_nonempty(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_approx_percentile_trim_tracks_exact(spark, sf_dir):
    """The approx trim LIBRARY op (the actual 100 TB path; the catalog
    entry is now the oracle-checkable guarantee audit) must keep a row
    count within 2% of the exact trim's (the sketch moves only the band
    EDGES, so the kept set can differ slightly but its size must not
    drift)."""
    from hse_etl_ochirov_aldar_spark.operators.percentile import percentile_trim
    from hse_etl_ochirov_aldar_spark.queries import _events_base

    base = _events_base(spark, sf_dir)
    n_exact = QUERIES["clean_percentile_trim"](spark, sf_dir).count()
    n_approx = percentile_trim(base, "value", approx=True).count()
    assert n_exact > 0
    assert abs(n_approx - n_exact) <= max(5, 0.02 * n_exact)


def test_approx_ngram_diversity_tracks_exact(spark, sf_dir):
    """The pure-approx LIBRARY report (no exact census; the catalog
    entry is now the oracle-checkable sketch audit): HLL distinct
    estimates within 5% of the exact census per slice (rsd=0.01 gives
    ~1% standard error; 5% is the hard failure line), exact-path
    columns identical."""
    from hse_etl_ochirov_aldar_spark.operators.diversity import (
        ngram_diversity_stats,
    )
    from hse_etl_ochirov_aldar_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {r["source"]: r.asDict() for r in QUERIES["ngram_diversity"](spark, sf_dir).collect()}
    approx = {
        r["source"]: r.asDict()
        for r in ngram_diversity_stats(docs, "source", "text", approx=True).collect()
    }
    assert set(exact) == set(approx)
    for src, e in exact.items():
        a = approx[src]
        # exact-path columns identical
        for c in ("n_tokens", "n_bigrams", "n_trigrams",
                  "distinct_unigrams", "unigram_entropy", "ttr_bp"):
            assert a[c] == e[c], (src, c)
        for c in ("distinct_bigrams", "distinct_trigrams"):
            if e[c]:
                assert abs(a[c] - e[c]) / e[c] <= 0.05, (src, c, a[c], e[c])


def test_ngram_audit_verdicts_all_true(spark, sf_dir):
    """The audit entry's sketch verdicts must be true on real data —
    this is what guarantees the driver's literal-true oracle matches."""
    rows = QUERIES["ngram_diversity_approx"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["unigram_sketch_ok"] and r["bigram_sketch_ok"] and r["trigram_sketch_ok"], r


def test_percentile_audit_verdicts_all_true(spark, sf_dir):
    rows = QUERIES["clean_percentile_trim_approx"](spark, sf_dir).collect()
    assert [r["metric"] for r in rows] == ["kept_fraction", "p05_rank", "p95_rank"]
    assert all(r["ok"] for r in rows)


def test_registry_literals_have_no_duplicate_keys():
    """Python dict literals silently keep the LAST duplicate key, so a
    new entry registered under an already-taken name would shadow the
    old one (or be shadowed) without any error — caught in r10 when a
    new chunking entry collided with the existing chunk_documents.
    Parse the registry SOURCE and reject duplicate literal keys in
    QUERIES/ORACLES and duplicate names in BENCH_QUERIES."""
    import ast
    import collections
    from pathlib import Path

    import hse_etl_ochirov_aldar_spark.queries as q

    tree = ast.parse(Path(q.__file__).read_text())
    checked = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            name, value = node.target.id, node.value
        elif (
            isinstance(node, ast.Assign)
            and len(node.targets) == 1
            and isinstance(node.targets[0], ast.Name)
        ):
            name, value = node.targets[0].id, node.value
        else:
            continue
        if name in ("QUERIES", "ORACLES") and isinstance(value, ast.Dict):
            keys = [k.value for k in value.keys if isinstance(k, ast.Constant)]
        elif name == "BENCH_QUERIES" and isinstance(value, ast.List):
            keys = [e.value for e in value.elts if isinstance(e, ast.Constant)]
        else:
            continue
        checked.add(name)
        dupes = [k for k, n in collections.Counter(keys).items() if n > 1]
        assert not dupes, f"duplicate keys in {name}: {dupes}"
    assert checked == {"QUERIES", "ORACLES", "BENCH_QUERIES"}, checked
