"""Batch-65 operators on hand-computed fixtures: lag-24h daily-cycle
autocorrelation (operators/stats.py) and digit-heavy document screen
(training/text.py)."""

import datetime as dt

from pyspark.sql import functions as F


# ------------------------------------------------------------------ daily_cycle

def _ev(spark, rows):
    return spark.createDataFrame(rows, "event_id long, ts timestamp")


def test_daily_cycle_perfect_repeat(spark):
    from dr_source_spark.operators.stats import daily_cycle

    # two days with the identical hourly pattern (1,2,3 events in
    # hours 0,1,2) -> lag-24 pairs are (1,1),(2,2),(3,3): r² = 10000
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in (0, 1):
        for hour, k in [(0, 1), (1, 2), (2, 3)]:
            for _ in range(k):
                rows.append((eid, base + dt.timedelta(days=day, hours=hour)))
                eid += 1
    r = daily_cycle(_ev(spark, rows)).collect()[0]
    assert (r["n_pairs"], r["num_sign"], r["r2_bp"]) == (3, 1, 10000)


def test_daily_cycle_anti_correlated(spark):
    from dr_source_spark.operators.stats import daily_cycle

    # day 2 inverts day 1's pattern -> negative sign
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hour, k in [(0, 1), (1, 3)]:
        for _ in range(k):
            rows.append((eid, base + dt.timedelta(hours=hour))); eid += 1
    for hour, k in [(0, 3), (1, 1)]:
        for _ in range(k):
            rows.append((eid, base + dt.timedelta(days=1, hours=hour))); eid += 1
    r = daily_cycle(_ev(spark, rows)).collect()[0]
    assert (r["n_pairs"], r["num_sign"], r["r2_bp"]) == (2, -1, -10000)


def test_daily_cycle_constant_series_degenerate(spark):
    from dr_source_spark.operators.stats import daily_cycle

    # constant hourly counts -> zero variance -> r2 NULL, sign 0
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(days=i // 2, hours=i % 2)) for i in range(8)]
    r = daily_cycle(_ev(spark, rows)).collect()[0]
    assert r["num_sign"] == 0 and r["r2_bp"] is None


# ----------------------------------------------------------- digit_heavy_screen

def test_digit_heavy_hand_computed(spark):
    from dr_source_spark.training.text import digit_heavy_screen

    rows = [
        (0, "en", "the 2024 report shows 15 units"),  # 6/26 non-ws digits < 30%
        (1, "en", "127 0 0 1 8080 443 22 3306"),      # digit dump -> flagged
        (2, "en", None),                              # NULL: 0 chars, not flagged
        (3, "de", "kein ziffern hier"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["lang"]: r for r in digit_heavy_screen(df).collect()}
    en = out["en"]
    assert (en["n_docs"], en["n_digit_heavy"], en["flagged_bp"]) == (3, 1, 3333)
    assert (out["de"]["n_digit_heavy"], out["de"]["flagged_bp"]) == (0, 0)
