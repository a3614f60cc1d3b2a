"""Throttle guard for bench.py (CLAUDE.md rule 2 / round-4 verdict item 1).

The sandbox VM throttles sustained load 2-14x within a session; a throttled
bench run must never overwrite the committed clean record in
BENCH/BASELINE.md.  bench.throttle_check compares identical-code,
pure-Catalyst control queries against the last clean record
(BENCH/record.json) and stamps the run throttled when their median
regression exceeds the tolerance.  No Spark needed here — pure logic.
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


RECORD = {"queries": {"pricing_summary": 0.4, "region_revenue": 0.6,
                      "events_hourly": 0.3, "kg_doc_triples": 9.0}}


def test_clean_run_not_throttled():
    timings = {"pricing_summary": 0.42, "region_revenue": 0.55,
               "events_hourly": 0.31}
    throttled, ratio = bench.throttle_check(timings, RECORD)
    assert not throttled
    assert ratio < 1.3


def test_throttled_run_detected():
    # the r4 end-of-round driver run: controls uniformly ~1.5-2.2x
    timings = {"pricing_summary": 0.897, "region_revenue": 1.0,
               "events_hourly": 0.5}
    throttled, ratio = bench.throttle_check(timings, RECORD)
    assert throttled
    assert ratio > 1.3


def test_single_outlier_control_does_not_trip_guard():
    # median, not max: one noisy control must not stamp a clean run
    timings = {"pricing_summary": 2.0, "region_revenue": 0.6,
               "events_hourly": 0.3}
    throttled, ratio = bench.throttle_check(timings, RECORD)
    assert not throttled


def test_missing_record_is_not_throttled():
    assert bench.throttle_check({"pricing_summary": 9.9}, None) == (False, 1.0)
    assert bench.throttle_check({"pricing_summary": 9.9}, {}) == (False, 1.0)


def test_missing_controls_is_not_throttled():
    throttled, _ = bench.throttle_check({"other_query": 1.0}, RECORD)
    assert not throttled


def test_committed_record_carries_controls():
    """The checked-in record must keep the control queries the guard needs."""
    rec = json.loads((REPO / "BENCH" / "record.json").read_text())
    for q in bench.CONTROL_QUERIES:
        assert rec["queries"].get(q), f"control {q} missing from record.json"


def test_real_r4_driver_snapshot_would_have_been_flagged():
    """BENCH_r04.json (the throttled driver run that clobbered BASELINE.md)
    must trip the guard against the clean aae1438-seeded record."""
    r4 = json.loads((REPO / "BENCH_r04.json").read_text())["parsed"]
    rec = json.loads((REPO / "BENCH" / "record.json").read_text())
    throttled, ratio = bench.throttle_check(r4["queries"], rec)
    assert throttled, f"r4 snapshot should read throttled, ratio={ratio}"


def test_record_controls_ratchet_down_only():
    """r5: repeated sub-tolerance slowdowns must not drift the throttle
    reference — control entries keep their best (lowest) clean timing."""
    timings = {"pricing_summary": 0.5, "region_revenue": 0.55,
               "events_hourly": 0.35, "kg_doc_triples": 8.0}
    out = bench.ratchet_record(timings, RECORD)
    # controls: min(new, record)
    assert out["pricing_summary"] == 0.4
    assert out["region_revenue"] == 0.55   # new run genuinely faster
    assert out["events_hourly"] == 0.3
    # non-control queries track the latest run even when slower
    assert out["kg_doc_triples"] == 8.0
    # no record yet: timings pass through
    assert bench.ratchet_record(timings, None) == timings


def test_compounding_drift_blocked():
    """Three chained 1.25x slowdowns: with the ratchet, the third run
    still compares against the ORIGINAL controls and reads throttled
    once the cumulative ratio crosses tolerance."""
    record = {"queries": dict(RECORD["queries"])}
    for step in range(1, 4):
        factor = 1.25 ** step
        timings = {q: t * factor for q, t in RECORD["queries"].items()}
        throttled, ratio = bench.throttle_check(timings, record)
        if not throttled:
            record = {"queries": bench.ratchet_record(timings, record)}
    # cumulative 1.95x vs the anchored reference: detected
    assert throttled
    assert ratio > 1.9
