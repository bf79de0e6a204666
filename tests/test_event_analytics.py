"""Funnel + cohort retention vs hand-built synthetic event logs."""

from datetime import datetime

import pytest


def _ts(day, h, m=0):
    return datetime(2026, 1, day, h, m)


@pytest.mark.spark
class TestFunnel:
    def test_order_and_window_semantics(self, spark):
        from uci_searchengine_spark.operators.events import funnel

        rows = [
            # u1: full clean chain
            (1, "view", _ts(1, 9)), (1, "click", _ts(1, 9, 10)),
            (1, "purchase", _ts(1, 9, 30)),
            # u2: purchase BEFORE click -> converts view+click only
            (2, "purchase", _ts(1, 8)), (2, "view", _ts(1, 9)),
            (2, "click", _ts(1, 9, 5)),
            # u3: click too late (>30m after view) -> view only
            (3, "view", _ts(1, 9)), (3, "click", _ts(1, 10, 1)),
            # u4: click exactly at +30m boundary (inclusive) counts
            (4, "view", _ts(1, 9)), (4, "click", _ts(1, 9, 30)),
            # u5: never viewed -> not in funnel at all
            (5, "click", _ts(1, 9)), (5, "purchase", _ts(1, 9, 1)),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        got = {
            r["step"]: (r["n_users"], r["conv"])
            for r in funnel(ev, ["view", "click", "purchase"]).collect()
        }
        assert got["01_view"] == (4, 1.0)
        assert got["02_click"] == (3, 0.75)  # u1, u2, u4
        assert got["03_purchase"] == (1, pytest.approx(1 / 3, abs=1e-6))

    def test_earliest_step_event_is_the_anchor(self, spark):
        # the FIRST view anchors the window even when a later view
        # would have put the click in range
        from uci_searchengine_spark.operators.events import funnel

        ev = spark.createDataFrame(
            [
                (1, "view", _ts(1, 9)),
                (1, "view", _ts(1, 11)),
                (1, "click", _ts(1, 11, 10)),
            ],
            "user_id long, event_type string, ts timestamp",
        )
        got = {r["step"]: r["n_users"] for r in funnel(ev, ["view", "click"]).collect()}
        assert got == {"01_view": 1, "02_click": 0}


@pytest.mark.spark
class TestCohortRetention:
    def test_matrix_vs_hand(self, spark):
        from uci_searchengine_spark.operators.events import cohort_retention

        # week of 2026-01-05 (Mon): u1,u2 cohort; u1 returns week+1
        # week of 2026-01-12: u3 cohort, no return
        rows = [
            (1, "view", _ts(5, 9)), (2, "view", _ts(6, 9)),
            (1, "click", _ts(13, 9)),          # offset 1 for u1
            (3, "view", _ts(12, 9)),
            (2, "view", _ts(7, 9)),            # same week: still offset 0
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        got = [
            (r["cohort_week"], r["offset"], r["n_active"], r["retention"])
            for r in cohort_retention(ev).collect()
        ]
        assert got == [
            ("2026-01-05", 0, 2, 1.0),
            ("2026-01-05", 1, 1, 0.5),
            ("2026-01-12", 0, 1, 1.0),
        ]
