"""Unit tests for bench.py's regression guard (pure functions, no
Spark): drift normalization from the primary overlap, the two-tier
reference lookup (BENCH_REFERENCE.json then BENCH_PREV.json), and the
r6-verdict acceptance check — a synthetic 2x slowdown in an entry
ABSENT from the primary baseline must flag via the secondary tier."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import (  # noqa: E402
    guard_regressions,
    machine_drift,
    merge_error_timings,
)

PRIMARY = {"q_old_a": 1.0, "q_old_b": 2.0, "q_old_c": 4.0, "q_tiny": 0.1}
SECONDARY = {"q_old_a": 1.1, "q_new": 3.0, "q_new_small": 0.3}


def test_drift_is_median_of_primary_overlap_only():
    # q_new is not in primary -> excluded; q_tiny below MIN_BASE -> excluded
    timings = {"q_old_a": 1.5, "q_old_b": 3.0, "q_old_c": 6.0,
               "q_tiny": 5.0, "q_new": 30.0}
    assert machine_drift(timings, PRIMARY) == 1.5


def test_no_flags_when_everything_tracks_drift():
    timings = {"q_old_a": 1.5, "q_old_b": 3.0, "q_old_c": 6.0, "q_new": 4.5}
    d = machine_drift(timings, PRIMARY)
    assert guard_regressions(timings, PRIMARY, SECONDARY, d) == {}


def test_synthetic_2x_slowdown_in_baseline_absent_entry_flags():
    # the r6 verdict's acceptance test: q_new exists only in the
    # secondary (previous-round) reference; a 2x move must flag
    timings = {"q_old_a": 1.0, "q_old_b": 2.0, "q_old_c": 4.0, "q_new": 6.0}
    d = machine_drift(timings, PRIMARY)
    assert d == 1.0
    flags = guard_regressions(timings, PRIMARY, SECONDARY, d)
    assert set(flags) == {"q_new"}
    assert flags["q_new"]["source"] == "prev"
    assert flags["q_new"]["ratio_vs_drift"] == 2.0


def test_primary_tier_wins_over_secondary():
    # q_old_a appears in both tiers; the flag must compare against the
    # primary value and report source="reference"
    timings = {"q_old_a": 3.0, "q_old_b": 2.0, "q_old_c": 4.0}
    flags = guard_regressions(timings, PRIMARY, SECONDARY, drift=1.0)
    assert set(flags) == {"q_old_a"}
    assert flags["q_old_a"]["source"] == "reference"
    assert flags["q_old_a"]["ref"] == 1.0


def test_drift_normalization_suppresses_uniform_host_slowdown():
    timings = {"q_old_a": 2.0, "q_old_b": 4.0, "q_old_c": 8.0, "q_new": 6.0}
    d = machine_drift(timings, PRIMARY)
    assert d == 2.0
    assert guard_regressions(timings, PRIMARY, SECONDARY, d) == {}


def test_fast_host_drift_is_clamped_no_false_flags():
    """r11 verdict task #3: a drift-0.7 host (every query ~30% faster
    than the reference) with FLAT raw timings must produce zero flags
    — drift < 1 used to shrink every base and manufacture regressions
    out of the normalization itself (finding 36;
    length_matched_sample). Raw-flat means nothing regressed."""
    timings = {"q_old_a": 0.7, "q_old_b": 1.4, "q_old_c": 2.8,
               "q_new": 2.1}
    d = machine_drift(timings, PRIMARY)
    assert d == 0.7
    assert guard_regressions(timings, PRIMARY, SECONDARY, d) == {}


def test_fast_host_real_raw_regression_still_flags():
    """Clamping must not blind the guard: on the same drift-0.7 host a
    query whose RAW timing doubled vs its reference still flags."""
    timings = {"q_old_a": 0.7, "q_old_b": 1.4, "q_old_c": 8.0}
    d = machine_drift(timings, PRIMARY)
    assert d == 0.7
    flags = guard_regressions(timings, PRIMARY, SECONDARY, d)
    assert set(flags) == {"q_old_c"}
    assert flags["q_old_c"]["ratio_vs_drift"] == 2.0  # vs clamped base


def test_slow_host_drift_still_forgives():
    """The clamp is one-sided: drift > 1 (slower host) keeps
    normalizing as before (test_drift_normalization... covers the
    suppress case); the flag math must still use the full drift."""
    timings = {"q_old_a": 2.0, "q_old_b": 4.0, "q_old_c": 16.01}
    d = machine_drift(timings, PRIMARY)
    assert d == 2.0
    flags = guard_regressions(timings, PRIMARY, SECONDARY, d)
    assert set(flags) == {"q_old_c"}


def test_absolute_bar_protects_subsecond_entries():
    # q_new_small: 0.3 -> 0.9 is 3x but only +0.6s absolute -> no flag
    timings = {"q_old_a": 1.0, "q_new_small": 0.9}
    assert guard_regressions(timings, PRIMARY, SECONDARY, drift=1.0) == {}


def test_unreferenced_entry_never_flags():
    timings = {"q_brand_new": 100.0, "q_old_a": 1.0}
    assert guard_regressions(timings, PRIMARY, SECONDARY, drift=1.0) == {}


def test_error_pass_never_undercuts_successful_timing():
    """ADVICE r8 low: a 0.05s fail-fast pass must not min() against a
    5s successful pass — the successful timing wins and the query is
    NOT reported as errored."""
    timings = {"q_flaky": 5.0, "q_ok": 1.0}
    errored = merge_error_timings(timings, {"q_flaky": 0.05})
    assert errored == []
    assert timings["q_flaky"] == 5.0


def test_never_succeeded_query_falls_back_and_flags():
    timings = {"q_ok": 1.0}
    errored = merge_error_timings(timings, {"q_broken": 0.07})
    assert errored == ["q_broken"]
    assert timings["q_broken"] == 0.07
