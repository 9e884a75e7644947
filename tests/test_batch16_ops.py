"""Planted-truth tests for the batch-16 operators: Fellegi-Sunter
weights and seasonal residual anomalies."""

import datetime as dt

from pyspark.sql import functions as F


class TestErFsWeights:
    def test_planted_separation(self, spark):
        from dr_source_spark.operators.entity_link import er_fs_weights

        # two entities, two mentions each: within-entity names are
        # near-identical, cross-entity names share nothing but still
        # collide in blocking via a shared rare gram
        rows = [
            (0, "jonathansmithxyzq1"),
            (1, "jonathansmithxyzq2"),
            (4, "elizabethjonesxyzq3"),
            (5, "elizabethjonesxyzq4"),
        ]
        df = spark.createDataFrame(rows, "mention_id long, name string")
        out = {
            r["feature"]: r
            for r in er_fs_weights(
                df, F.expr("mention_id div 4"), b=4, df_cap_pct=100, max_bucket=64
            ).collect()
        }
        assert set(out) == {"jaccard70", "prefix4", "len1"}
        # the within-entity candidates agree on every feature; the
        # cross-entity candidates (blocked via the shared 'xyzq' grams)
        # disagree on jaccard and prefix
        j = out["jaccard70"]
        assert j["m_bp"] == 10000
        assert j["u_bp"] == 0
        assert j["lr_x100"] == 10000 * 100 // 1  # u floored at 1
        p = out["prefix4"]
        assert p["m_bp"] == 10000 and p["u_bp"] == 0
        # length diff <= 1 holds for every pair here (all same length)
        l = out["len1"]
        assert l["m_bp"] == 10000 and l["u_bp"] == 10000
        assert l["lr_x100"] == 100  # uninformative feature -> LR ~ 1

    def test_counts_cover_all_candidates(self, spark):
        from dr_source_spark.operators.entity_link import (
            er_candidate_pairs, er_fs_weights, mention_grams,
        )

        rows = [
            (0, "aaabbbcccddd"),
            (1, "aaabbbcccdde"),
            (4, "aaabbbcccxyz"),
        ]
        df = spark.createDataFrame(rows, "mention_id long, name string")
        n_cand = er_candidate_pairs(
            mention_grams(df), b=4, df_cap_pct=100, max_bucket=64
        ).count()
        out = er_fs_weights(
            df, F.expr("mention_id div 4"), b=4, df_cap_pct=100, max_bucket=64
        ).collect()
        for r in out:
            assert r["n_match"] + r["n_nonmatch"] == n_cand


class TestSeasonalAnomalies:
    def test_planted_offcycle_spike_ranks_first(self, spark):
        from dr_source_spark.operators.stats import seasonal_residual_anomalies

        # 7 days x 24 hours: every day has 10 events at hour 9 and 2
        # events every other hour; day 3 hour 3 gets a 40-event spike.
        rows = []
        eid = 0
        for d in range(7):
            for h in range(24):
                n = 10 if h == 9 else 2
                if (d, h) == (3, 3):
                    n = 40
                for _ in range(n):
                    rows.append(
                        (dt.datetime(2024, 1, 1 + d, h, eid % 60 // 1), eid)
                    )
                    eid += 1
        df = spark.createDataFrame(rows, "ts timestamp, id long")
        out = seasonal_residual_anomalies(df, "ts", top_k=5).collect()
        top = out[0]
        assert top["rank"] == 1
        assert (top["date"], top["hour"]) == (dt.date(2024, 1, 4), 3)
        assert top["n_events"] == 40
        # the daily 9am peak is SEASONAL, not anomalous: no hour-9 cell
        # may outrank the spike's own-row/column shadow cells
        assert all(r["hour"] != 9 or r["rank"] > 1 for r in out)

    def test_exact_residual_identity(self, spark):
        from dr_source_spark.operators.stats import seasonal_residual_anomalies

        # tiny 2-day grid, hand-check r_scaled = R*C*x - C*Sd - R*Sh + T
        rows = []
        eid = 0
        counts = {}
        for d in range(2):
            for h in range(24):
                n = (d + 1) * (1 if h != 5 else 4)
                counts[(d, h)] = n
                for _ in range(n):
                    rows.append((dt.datetime(2024, 2, 1 + d, h), eid))
                    eid += 1
        df = spark.createDataFrame(rows, "ts timestamp, id long")
        out = {
            (r["date"], r["hour"]): r["resid_scaled"]
            for r in seasonal_residual_anomalies(df, "ts", top_k=48).collect()
        }
        R, C = 2, 24
        T = sum(counts.values())
        sd = {d: sum(counts[(d, h)] for h in range(24)) for d in range(2)}
        sh = {h: sum(counts[(d, h)] for d in range(2)) for h in range(24)}
        for (d, h), x in counts.items():
            want = R * C * x - C * sd[d] - R * sh[h] + T
            assert out[(dt.date(2024, 2, 1 + d), h)] == want


class TestNnMargin:
    def test_planted_clusters(self, spark):
        from dr_source_spark.training.similarity import nn_margin_stats

        # two tight clusters on orthogonal axes plus one mislabeled
        # point sitting inside the wrong cluster
        rows = [
            (0, [1.0, 0.0, 0.0], 0),
            (1, [0.99, 0.1, 0.0], 0),
            (2, [0.0, 1.0, 0.0], 1),
            (3, [0.1, 0.99, 0.0], 1),
            (4, [0.98, 0.05, 0.0], 1),  # labeled 1, lives with cluster 0
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        out = {r["vec_id"]: r for r in nn_margin_stats(df).collect()}
        # cluster-1 anchors are clean: nearest neighbor shares the label
        assert out[2]["correct_1nn"] is True and out[2]["margin_e6"] > 0
        assert out[3]["correct_1nn"] is True
        # the mislabel poisons BOTH sides: anchors 0 and 1 now have a
        # different-label vector closer than their own cluster mate,
        # and the mislabeled point itself sits in the wrong cluster —
        # exactly the rows a label-noise audit wants surfaced
        assert out[0]["correct_1nn"] is False
        assert out[1]["correct_1nn"] is False
        assert out[4]["correct_1nn"] is False
        assert out[4]["margin_e6"] < 0
        # hard negative of anchor 0 is the mislabeled lookalike
        assert out[0]["neg_id"] == 4

    def test_agg_form_matches_window_reference(self, spark):
        # round-6 restructure gate: hoisted norms + conditional
        # min(struct(-sim, b_id)) must reproduce the row_number-window
        # top-1 (sim DESC, b_id ASC) bit-for-bit, including ties (the
        # duplicated vectors below tie on sim and must resolve to the
        # LOWEST b_id) and one-sided/NULL anchors
        from pyspark.sql.window import Window

        from dr_source_spark.training.similarity import cosine_col, nn_margin_stats

        rows = []
        for i in range(60):
            # deterministic vectors with planted exact duplicates (ties)
            base = [(i * 7 + d * 13) % 17 - 8.0 for d in range(4)]
            rows.append((i, [float(x) for x in (base if i % 5 else [1.0, 2.0, 3.0, 4.0])], i % 3))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

        a = df.select(
            F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"), F.col("label").alias("a_lbl")
        )
        b = df.select(
            F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"), F.col("label").alias("b_lbl")
        )
        scored = (
            b.join(F.broadcast(a), F.col("b_id") != F.col("a_id"))
            .withColumn("sim", F.round(cosine_col(F.col("a_vec"), F.col("b_vec")), 6))
            .filter(F.col("sim").isNotNull())
        )
        w = Window.partitionBy("a_id").orderBy(F.desc("sim"), F.asc("b_id"))

        def top1(matched, oid, osim):
            return (
                matched.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") == 1)
                .select("a_id", F.col("b_id").alias(oid), F.col("sim").alias(osim))
            )

        ref = (
            df.select(F.col("vec_id").alias("a_id"), "label")
            .join(top1(scored.filter(F.col("a_lbl") == F.col("b_lbl")), "pos_id", "sim_pos"), "a_id", "left")
            .join(top1(scored.filter(F.col("a_lbl") != F.col("b_lbl")), "neg_id", "sim_neg"), "a_id", "left")
            .withColumn(
                "margin_e6",
                (F.round(F.col("sim_pos") * 1e6) - F.round(F.col("sim_neg") * 1e6)).cast("long"),
            )
            .withColumn(
                "correct_1nn",
                F.when(
                    F.col("sim_pos").isNull() | F.col("sim_neg").isNull(), F.lit(False)
                ).otherwise(F.col("sim_pos") > F.col("sim_neg")),
            )
            .withColumnRenamed("a_id", "vec_id")
        )
        got = nn_margin_stats(df)
        ref_rows = sorted(ref.collect(), key=lambda r: r["vec_id"])
        got_rows = sorted(got.collect(), key=lambda r: r["vec_id"])
        assert [tuple(r) for r in got_rows] == [
            tuple(r[c] for c in got.columns) for r in ref_rows
        ]

    def test_single_label_corpus_has_null_negatives(self, spark):
        from dr_source_spark.training.similarity import nn_margin_stats

        rows = [(0, [1.0, 0.0], 7), (1, [0.9, 0.1], 7)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        out = nn_margin_stats(df).collect()
        assert all(r["neg_id"] is None for r in out)
        assert all(r["correct_1nn"] is False for r in out)
        assert all(r["margin_e6"] is None for r in out)


class TestAudioFingerprint:
    def test_planted_duplicates_recovered_exactly(self, spark):
        from dr_source_spark.training.multimodal import (
            audio_fingerprint_pairs, synth_decodable_media,
        )

        docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
        # wrap=20: odd docs 1..39 -> payload ids cycle (1,3,...,19) twice
        media = synth_decodable_media(docs, wrap=20).filter(
            F.col("kind") == "audio"
        )
        pairs = {
            (r["media_a"], r["media_b"]): r["hamming"]
            for r in audio_fingerprint_pairs(media, max_hamming=3).collect()
        }
        # every planted duplicate (d, d+20) recovered at distance 0,
        # and nothing else matches
        want = {(d, d + 20) for d in range(1, 20, 2)}
        assert set(pairs) == want
        assert all(h == 0 for h in pairs.values())


class TestMotifFamily:
    def test_clustering_coefficients_planted(self, spark):
        from dr_source_spark.operators.graph import clustering_coefficients

        # triangle a-b-c plus pendant d off a: lcc(b)=lcc(c)=1,
        # lcc(a) = 1 triangle / C(3,2)=3 -> 3333 bp, lcc(d) undefined
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")],
            "src string, dst string",
        )
        out = {r["node"]: r for r in clustering_coefficients(e).collect()}
        assert out["b"]["lcc_bp"] == 10000 and out["c"]["lcc_bp"] == 10000
        assert out["a"]["lcc_bp"] == 20000 * 1 // (3 * 2)
        assert out["d"]["lcc_bp"] is None and out["d"]["degree"] == 1

    def test_four_cycles_bipartite_vs_triangle(self, spark):
        from dr_source_spark.operators.graph import four_cycle_census

        # K_{2,2} (a,b | x,y): exactly one 4-cycle, zero triangles
        k22 = spark.createDataFrame(
            [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")],
            "src string, dst string",
        )
        r = four_cycle_census(k22).collect()[0]
        assert r["n_four_cycles"] == 1
        # a pure triangle has none
        tri = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
        )
        assert four_cycle_census(tri).collect()[0]["n_four_cycles"] == 0
        # K4 has 3 rectangles
        k4 = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a"), ("b", "d")],
            "src string, dst string",
        )
        assert four_cycle_census(k4).collect()[0]["n_four_cycles"] == 3
