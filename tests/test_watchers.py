"""Qualification logic of the regime watchers (tools/quiet_bench_watch.py,
tools/scaling_watch.py) — pure-Python, no Spark.

These gates decide which committed benchmark artifacts count as
quiet-window evidence, so their edge cases deserve the same pinning as
library code: a too-lenient gate would commit a noisy number as "clean",
a too-strict one rejects a genuinely clean capture.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import quiet_bench_watch as qbw  # noqa: E402
import scaling_watch as sw  # noqa: E402


def _bench_art(thll_reps, steals, fault=(1500.0, 1200.0)):
    return {
        "queries": {"token_hll_build": min(thll_reps)},
        "all_reps": {"token_hll_build": list(thll_reps)},
        "steal_pct": {"token_hll_build": list(steals)},
        "fault_mb_s": list(fault),
    }


class TestQuietBenchQualifies:
    def test_clean_run_qualifies(self):
        ok, reasons = qbw.qualifies(_bench_art([1.4, 1.35, 1.5], [0.1, 0.0, 0.6]))
        assert ok and reasons == []

    def test_slow_flagship_disqualifies(self):
        ok, reasons = qbw.qualifies(_bench_art([2.5, 2.6, 2.4], [0.0, 0.0, 0.0]))
        assert not ok
        assert any("token_hll_build" in r for r in reasons)

    def test_steal_on_min_rep_disqualifies(self):
        # min rep is index 1; its steal is over the bar even though others pass
        ok, reasons = qbw.qualifies(_bench_art([1.6, 1.3, 1.5], [0.1, 5.0, 0.1]))
        assert not ok
        assert any("steal" in r for r in reasons)

    def test_steal_on_non_min_rep_is_fine(self):
        ok, _ = qbw.qualifies(_bench_art([1.6, 1.3, 1.5], [9.0, 0.1, 9.0]))
        assert ok

    def test_depressed_in_bench_canary_does_not_gate(self):
        # The in-bench canary rides as evidence only (structurally depressed
        # by JVM heap fragmentation) — a passing time with a sick canary
        # still qualifies.
        ok, reasons = qbw.qualifies(
            _bench_art([1.4, 1.35, 1.5], [0.1, 0.0, 0.6], fault=(80.0, 60.0))
        )
        assert ok and reasons == []


def _pair_art(eff, small_tps=10.0e6,
              small_times=(15.0, 15.5), large_times=(5.0, 5.2)):
    return {
        "value": eff,
        "small": {"tokens_per_sec": small_tps, "times": list(small_times)},
        "large": {"times": list(large_times)},
    }


class TestScalingQualifies:
    def test_clean_pass(self):
        ok, reasons = sw.qualifies(_pair_art(0.85))
        assert ok and reasons == []

    def test_degraded_small_leg_disqualifies(self):
        # a storm-slowed small leg INFLATES the ratio — the absolute gate is
        # what makes a high efficiency reading trustworthy
        ok, reasons = sw.qualifies(_pair_art(0.92, small_tps=5.0e6))
        assert not ok
        assert any("small leg" in r and "inflate" in r for r in reasons)

    def test_two_best_rounds_disagreeing_disqualifies(self):
        ok, reasons = sw.qualifies(_pair_art(0.85, small_times=(14.8, 19.6, 20.0)))
        assert not ok
        assert any("disagree" in r for r in reasons)

    def test_worst_round_is_shed(self):
        # min-of-N exists to shed fresh-process variance: one slow ROUND
        # (JVM start + warm-up each time) must not disqualify an attempt
        # whose two best rounds agree
        ok, reasons = sw.qualifies(_pair_art(0.85, large_times=(5.76, 4.37, 4.41)))
        assert ok and reasons == []

    def test_below_criterion_disqualifies(self):
        ok, reasons = sw.qualifies(_pair_art(0.77))
        assert not ok
        assert any("efficiency" in r for r in reasons)
