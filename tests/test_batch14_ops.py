"""Planted-truth tests for the batch-14 operators: HITS, CUSUM
changepoint, inter-arrival profile, perceptual dHash dedup."""

import datetime as dt

from pyspark.sql import functions as F


def _ts(d, h=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=d, hours=h)


class TestHits:
    def test_star_hub_and_authority(self, spark):
        from dr_source_spark.operators.graph import hits_scores

        # h points at a1..a3; a1 is also pointed at by u. a1 is the top
        # authority, h the top hub, on every round.
        edges = [("h", "a1"), ("h", "a2"), ("h", "a3"), ("u", "a1")]
        df = spark.createDataFrame(edges, "src string, dst string")
        out = {r["node"]: (r["hub_scaled"], r["auth_scaled"]) for r in hits_scores(df, rounds=2).collect()}
        assert out["h"][0] == 10000  # max-normalized top hub
        assert out["a1"][1] == 10000  # top authority
        assert out["a1"][0] == 0  # a1 points at nothing
        assert out["a2"][1] < 10000 and out["a2"][1] > 0
        # u's hub score: points only at a1 -> weaker hub than h
        assert 0 < out["u"][0] < 10000

    def test_unrolled_integer_identity(self, spark):
        from dr_source_spark.operators.graph import hits_scores

        edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
        df = spark.createDataFrame(edges, "src string, dst string")
        out = {r["node"]: (r["hub_scaled"], r["auth_scaled"]) for r in hits_scores(df, rounds=2).collect()}

        # replicate the exact integer pipeline in python
        nodes = ["a", "b", "c"]
        e = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
        S = 10000
        hub = {n: S for n in nodes}
        auth = {}
        for _ in range(2):
            raw = {n: 0 for n in nodes}
            for u, v in e:
                raw[v] += hub[u]
            m = max(raw.values())
            auth = {n: (raw[n] * S) // m if m > 0 else 0 for n in nodes}
            raw = {n: 0 for n in nodes}
            for u, v in e:
                raw[u] += auth[v]
            m = max(raw.values())
            hub = {n: (raw[n] * S) // m if m > 0 else 0 for n in nodes}
        for n in nodes:
            assert out[n] == (hub[n], auth[n])

    def test_multi_edges_and_self_loops_dropped(self, spark):
        from dr_source_spark.operators.graph import hits_scores

        a = spark.createDataFrame(
            [("a", "b"), ("a", "b"), ("b", "b"), ("b", "a")],
            "src string, dst string",
        )
        b = spark.createDataFrame(
            [("a", "b"), ("b", "a")], "src string, dst string"
        )
        ra = sorted(map(tuple, hits_scores(a, rounds=1).collect()))
        rb = sorted(map(tuple, hits_scores(b, rounds=1).collect()))
        assert ra == rb


class TestCusumChangepoint:
    def test_level_shift_is_localized(self, spark):
        from dr_source_spark.operators.stats import cusum_changepoint

        # 10 days at 100 cents, then 10 days at 500: the max |CUSUM|
        # sits exactly at the last pre-shift day (index 10).
        rows = [("a", _ts(d), 100 if d < 10 else 500) for d in range(20)]
        df = spark.createDataFrame(rows, "grp string, ts timestamp, c long")
        r = cusum_changepoint(df, "grp", "ts", F.col("c")).collect()[0]
        assert r["n_buckets"] == 20
        assert r["cp_index"] == 10
        assert r["cp_bucket"] == _ts(9)  # 10th bucket (1-based index 10)
        assert r["pre_cents"] == 1000 and r["post_cents"] == 5000
        # |n*P_t - t*S| at t=10: |20*1000 - 10*6000| = 40000
        assert r["cusum_scaled"] == 40000

    def test_missing_days_count_as_zero(self, spark):
        from dr_source_spark.operators.stats import cusum_changepoint

        # activity only on days 0 and 9; the dense series has 10
        # buckets, and the zeros pull the changepoint to day 0 (all
        # the mass up front, tie broken earliest).
        rows = [("a", _ts(0), 900), ("a", _ts(9), 100)]
        df = spark.createDataFrame(rows, "grp string, ts timestamp, c long")
        r = cusum_changepoint(df, "grp", "ts", F.col("c")).collect()[0]
        assert r["n_buckets"] == 10
        assert r["cp_index"] == 1 and r["pre_cents"] == 900


class TestInterarrivalProfile:
    def test_exact_order_statistics(self, spark):
        from dr_source_spark.operators.stats import interarrival_profile

        # one entity with orders at days 0,1,3,7,15 -> gaps 1,2,4,8;
        # another with days 0,10 -> gap 10. One group.
        rows = [("g", 1, _ts(d), i) for i, d in enumerate([0, 1, 3, 7, 15])]
        rows += [("g", 2, _ts(d), 10 + i) for i, d in enumerate([0, 10])]
        df = spark.createDataFrame(rows, "seg string, ent long, ts timestamp, id long")
        r = interarrival_profile(df, "ent", "ts", "id", "seg").collect()[0]
        # gaps sorted: 1,2,4,8,10 -> n=5, median rank 3 -> 4,
        # p90 rank (45+9)//10 = 5 -> 10, max 10
        assert r["n_gaps"] == 5
        assert r["median_gap_days"] == 4
        assert r["p90_gap_days"] == 10
        assert r["max_gap_days"] == 10

    def test_single_order_entities_contribute_nothing(self, spark):
        from dr_source_spark.operators.stats import interarrival_profile

        rows = [("g", 1, _ts(0), 1), ("g", 2, _ts(5), 2), ("g", 2, _ts(8), 3)]
        df = spark.createDataFrame(rows, "seg string, ent long, ts timestamp, id long")
        r = interarrival_profile(df, "ent", "ts", "id", "seg").collect()[0]
        assert r["n_gaps"] == 1 and r["median_gap_days"] == 3


class TestDhash:
    def test_identical_payloads_hash_equal_and_pair_at_zero(self, spark):
        from dr_source_spark.training.multimodal import (
            dhash_pairs, dhash_signatures, synth_decodable_media,
        )

        docs = spark.range(0, 20).select(F.col("id").alias("doc_id"))
        # wrap=10: even docs 0..18 -> payload ids 0,2,4,6,8 twice each
        media = synth_decodable_media(docs, wrap=10).filter(
            F.col("kind") == "image"
        )
        sigs = dhash_signatures(media)
        rows = {r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"]) for r in sigs.collect()}
        for d in (0, 2, 4, 6, 8):
            assert rows[d] == rows[d + 10]
        pairs = {(r["media_a"], r["media_b"]): r["hamming"] for r in dhash_pairs(sigs, max_hamming=0).collect()}
        for d in (0, 2, 4, 6, 8):
            assert pairs[(d, d + 10)] == 0

    def test_signature_matches_closed_form(self, spark):
        from dr_source_spark.training.multimodal import (
            dhash_signatures, synth_decodable_media,
        )

        docs = spark.range(0, 8, 2).select(F.col("id").alias("doc_id"))
        media = synth_decodable_media(docs)
        got = {r["media_id"]: [r["b0"], r["b1"], r["b2"], r["b3"]] for r in dhash_signatures(media).collect()}

        def gray(d, sx, sy):
            return (
                (d + sx * 7 + sy * 13) % 256
                + (3 * d + sx * 11 + sy * 5) % 256
                + (5 * d + sx + sy * 17) % 256
            )

        for d in (0, 2, 4, 6):
            w, h = 4 + d % 5, 3 + d % 4
            bands = [0, 0, 0, 0]
            for gy in range(8):
                sy = (gy * h) // 8
                for gx in range(8):
                    if gray(d, ((gx + 1) * w) // 9, sy) > gray(d, (gx * w) // 9, sy):
                        i = gy * 8 + gx
                        bands[i // 16] |= 1 << (i % 16)
            assert got[d] == bands, f"doc {d}"

    def test_banding_recall_within_three_flips(self, spark):
        from dr_source_spark.training.multimodal import dhash_pairs

        # hand-built signatures: b differs from a by 3 bits all inside
        # band 0 -> bands 1-3 still collide -> pair MUST be found.
        sigs = spark.createDataFrame(
            [(1, 0b111, 5, 6, 7), (2, 0b000, 5, 6, 7), (3, 9, 10, 11, 12)],
            "media_id long, b0 long, b1 long, b2 long, b3 long",
        )
        pairs = {(r["media_a"], r["media_b"]): r["hamming"] for r in dhash_pairs(sigs, max_hamming=6).collect()}
        assert pairs == {(1, 2): 3}
