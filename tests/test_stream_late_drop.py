"""Pin the measured Spark 4.1 availableNow watermark semantics the
stream_late_drop_census oracle replays: the watermark FILTERING batch k
is max(event time over batches <= k-2) - delay (one batch more lag than
the high-level docs suggest - commit timing), emission uses the global
max - delay, and a row drops iff its window END <= that lagged
watermark. If a Spark upgrade shifts either rule, these tests fail
before the driver oracle does."""

import datetime as dt
import os
import shutil

from pyspark.sql import functions as F

BASE = "/tmp/drs_latedrop_pytest"
T0 = dt.datetime(2024, 5, 1, 0, 30)


def _stage(spark, batches):
    """batches: list of lists of (ts_offset_hours, label) rows -> one
    file per batch with forced increasing mtimes."""
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(f"{BASE}/src")
    for b, rows in enumerate(batches):
        df = spark.createDataFrame(
            [(T0 + dt.timedelta(hours=h), s) for h, s in rows],
            "event_ts timestamp, severity string",
        )
        tmp = f"{BASE}/tmp_{b}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.startswith("part-")][0]
        dst = f"{BASE}/src/batch_{b}.parquet"
        shutil.copyfile(f"{tmp}/{part}", dst)
        os.utime(dst, (1_700_000_000 + b * 1000,) * 2)


def _run(spark, batches):
    from dr_source_spark.streaming.incremental import windowed_finding_counts

    _stage(spark, batches)
    stream = (
        spark.readStream.schema("event_ts timestamp, severity string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{BASE}/src")
    )
    counts = windowed_finding_counts(stream, window_dur="1 hour", watermark="1 hour")
    q = (
        counts.writeStream.format("memory")
        .queryName("latedrop_pytest")
        .outputMode("append")
        .option("checkpointLocation", f"{BASE}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    rows = {
        (r["window_start"].isoformat(), r["severity"]): r["n"]
        for r in spark.table("latedrop_pytest").collect()
    }
    return rows, dropped


class TestLateDropSemantics:
    def test_two_batch_late_row_drops(self, spark):
        # batch0 advances time to +10h; batch1 advances to +20h; batch2
        # carries a straggler back at hour 0. Filtering watermark for
        # batch2 = max(batch0) - 1h = +9h (LAG-2: batch1's max not yet
        # applied), so the straggler's window [0,1) <= +9h -> DROPPED.
        rows, dropped = _run(
            spark,
            [
                [(0, "a"), (10, "a")],
                [(20, "a")],
                [(0, "late"), (20.5, "a")],
            ],
        )
        assert dropped == 1
        # the hour-0 window emitted with ONLY the batch0 row
        k = (T0.replace(minute=0).isoformat(), "a")
        assert rows[k] == 1
        assert not any(s == "late" for _, s in rows)

    def test_one_batch_late_row_survives(self, spark):
        # identical, but the straggler arrives in batch1: filtering
        # watermark for batch1 = max(batches <= -1) = none -> admitted,
        # and it merges into the hour-0 window
        rows, dropped = _run(
            spark,
            [
                [(0, "a"), (10, "a")],
                [(0, "late"), (20, "a")],
            ],
        )
        assert dropped == 0
        k = (T0.replace(minute=0).isoformat(), "late")
        assert rows[k] == 1

    def test_open_windows_not_emitted(self, spark):
        # final watermark = global max - 1h: the last event's own window
        # is still open and must NOT appear in append output
        rows, dropped = _run(spark, [[(0, "a")], [(5, "a")]])
        last = (T0.replace(minute=0) + dt.timedelta(hours=5)).isoformat()
        assert (last, "a") not in rows
        assert (T0.replace(minute=0).isoformat(), "a") in rows
