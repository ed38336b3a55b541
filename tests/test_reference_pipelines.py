"""End-to-end reference-parity pipeline on reference-shaped data,
asserting the reference's own invariants (SURVEY.md §5): dedup restores
exact base counts, anomaly filters drop the injected anomalies, mode
joins preserve cardinality, validation gates fire."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hse_etl_ochirov_aldar_spark.plans.quality import (
    QualityError,
    expect_check,
    expect_nonempty,
    expect_unique_key,
)
from hse_etl_ochirov_aldar_spark.plans.reference_pipelines import (
    mart_support_efficiency,
    mart_user_activity,
    replicate_events,
    replicate_sessions,
    sessions_clean,
    tickets_clean,
)
from hse_etl_ochirov_aldar_spark.sources.datagen import (
    gen_event_logs,
    gen_support_tickets,
    gen_user_sessions,
)


@pytest.fixture(scope="module")
def data(spark):
    return {
        "sessions": gen_user_sessions(spark, n=500, n_dupes=20),
        "events": gen_event_logs(spark, n=800, n_dupes=30),
        "tickets": gen_support_tickets(spark, n=200),
    }


def test_dedup_restores_base_counts(spark, data):
    # the reference's core expected-output test: 2000/5000 exact counts
    # after dedup of deliberately seeded duplicates (README.md:21-25)
    assert data["sessions"].count() == 520
    assert replicate_sessions(data["sessions"]).count() == 500
    assert data["events"].count() == 830
    assert replicate_events(data["events"]).count() == 800


def test_event_flatten_nested_struct(spark, data):
    ev = replicate_events(data["events"])
    assert {"event_id", "timestamp", "event_type", "page", "user_id", "error_code"} == set(ev.columns)
    # extra is null ~70% of the time -> error_code mostly null, some set
    n = ev.count()
    n_err = ev.where(F.col("error_code").isNotNull()).count()
    assert 0 < n_err < n


def test_sessions_clean_drops_anomalies(spark, data):
    deduped = replicate_sessions(data["sessions"])
    clean = sessions_clean(deduped)
    # 500 rows, anomalies at _i%50==17 (end<start) and _i%50==33 (>24h):
    # 10 each -> 480 survivors
    assert clean.count() == 480
    assert clean.where(F.col("duration_min") <= 0).count() == 0
    assert clean.where(F.col("duration_min") >= 24 * 60).count() == 0


def test_tickets_clean_monotonicity(spark, data):
    clean = tickets_clean(data["tickets"])
    # anomalies at _i%50==13 -> 4 of 200 dropped
    assert clean.count() == 196
    assert clean.where(F.col("resolution_hours") < 0).count() == 0
    assert clean.where(F.col("message_count") <= 0).count() == 0


def test_mart_user_activity_cardinality(spark, data):
    clean = sessions_clean(replicate_sessions(data["sessions"]))
    mart = mart_user_activity(clean)
    groups = clean.select(
        "user_id", F.date_trunc("month", "session_date").cast("date").alias("m")
    ).distinct().count()
    # mode left-joins must never change the stats cardinality (SURVEY §5)
    assert mart.count() == groups
    # every group has a top device/page/action (clean rows always have arrays)
    assert mart.where(F.col("top_device").isNull()).count() == 0
    assert mart.where(F.col("top_page").isNull()).count() == 0


def test_mart_support_efficiency_counts(spark, data):
    clean = tickets_clean(data["tickets"])
    mart = mart_support_efficiency(clean)
    row_sum = mart.agg(F.sum("total_tickets")).collect()[0][0]
    assert row_sum == clean.count()
    parts = mart.select(
        (F.col("n_open") + F.col("n_in_progress") + F.col("n_resolved") + F.col("n_closed")).alias("s"),
        "total_tickets",
    )
    assert parts.where(F.col("s") != F.col("total_tickets")).count() == 0


def test_quality_gates(spark, data):
    clean = tickets_clean(data["tickets"])
    expect_nonempty(clean, "tickets_clean")
    expect_unique_key(clean, ["ticket_id"], "tickets_pk")
    expect_check(clean, F.col("message_count").between(1, 5), "msg_count_domain")
    with pytest.raises(QualityError):
        expect_nonempty(clean.where(F.lit(False)), "empty")
    with pytest.raises(QualityError):
        expect_check(clean, F.col("message_count") > 3, "too_strict")


def test_replicate_recommendations_and_moderation(spark):
    """The remaining two of the reference's five collections (S5):
    PK dedup, ISO+Z parse, derived counts, rating CHECK domain."""
    from hse_etl_ochirov_aldar_spark.plans.reference_pipelines import (
        replicate_moderation,
        replicate_recommendations,
    )
    from hse_etl_ochirov_aldar_spark.sources.datagen import (
        gen_moderation_queue,
        gen_user_recommendations,
    )

    recs_raw = gen_user_recommendations(spark, n_users=100)
    recs = replicate_recommendations(recs_raw)
    expect_unique_key(recs, ["user_id"])
    rows = recs.collect()
    assert len(rows) == 100
    assert all(2 <= r.num_recommendations <= 8 for r in rows)
    assert all(r.num_recommendations == len(r.recommended_products) for r in rows)
    assert all(r.last_updated is not None for r in rows)  # F13 parse ok

    mod_raw = gen_moderation_queue(spark, n=300)
    mod = replicate_moderation(mod_raw)
    expect_unique_key(mod, ["review_id"])
    expect_check(mod, F.col("rating").between(1, 5), "rating_domain")
    mrows = mod.collect()
    assert len(mrows) == 300
    assert all(0 <= len(r.flags) <= 2 for r in mrows)
    assert all(r.submitted_at is not None for r in mrows)
