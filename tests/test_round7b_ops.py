"""Round-7 session-3 operator tests: synthetic-WAV audio near-dup
pipeline (the audio twin of the PNG/dHash path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators import multimodal


def _ids(spark, n=60):
    return spark.range(n).select(F.col("id").alias("media_id"))


def test_synth_wav_decodes_with_stdlib_wave(spark):
    media = multimodal.synth_wav_media(_ids(spark, 4)).collect()
    import io
    import wave

    for r in media:
        with wave.open(io.BytesIO(bytes(r.payload)), "rb") as w:
            assert w.getsampwidth() == 1
            assert w.getnchannels() == 1
            assert w.getnframes() == 64 * 25


@pytest.mark.slow  # 60 WAV syntheses + banded join; oracle-covered
def test_audio_fingerprint_planted_neardups_found_exactly(spark):
    media = multimodal.synth_wav_media(_ids(spark, 60))
    fps = multimodal.audio_energy_fingerprint(media)
    pairs = multimodal.phash_neardup(
        fps, max_hamming=6, hash_col="afp"
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # planted: every 13th id is a near-copy of its predecessor
    expected = {(m - 1, m) for m in range(13, 60, 13)}
    assert got == expected
    assert all(r.hamming <= 6 for r in pairs)


@pytest.mark.slow
def test_audio_fingerprint_gain_invariance(spark):
    # energy-delta bits compare ADJACENT frames, so a uniform gain
    # change (scaling every amplitude) preserves the fingerprint —
    # the audio analogue of dHash brightness invariance. Synthesize a
    # half-gain copy by hand and compare fingerprints.
    import io
    import wave

    media = multimodal.synth_wav_media(_ids(spark, 2)).collect()
    rows = []
    for r in media:
        with wave.open(io.BytesIO(bytes(r.payload)), "rb") as w:
            raw = bytearray(w.readframes(w.getnframes()))
        halved = bytes(128 + (b - 128) // 2 for b in raw)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(halved)
        rows.append((r.media_id, bytes(r.payload)))
        rows.append((r.media_id + 1000, buf.getvalue()))
    df = spark.createDataFrame(
        rows, "media_id long, payload binary"
    )
    fps = {
        r.media_id: r.afp
        for r in multimodal.audio_energy_fingerprint(df).collect()
    }
    for mid in (0, 1):
        assert fps[mid] == fps[mid + 1000]


def test_audio_fingerprint_malformed_payload_null(spark):
    df = spark.createDataFrame(
        [(1, b"not a wav"), (2, None), (3, b"")],
        "media_id long, payload binary",
    )
    out = multimodal.audio_energy_fingerprint(df).collect()
    assert all(r.afp is None for r in out)


def test_audio_fingerprint_indivisible_signal_null(spark):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([128] * 100))  # 100 % 64 != 0
    df = spark.createDataFrame(
        [(1, buf.getvalue())], "media_id long, payload binary"
    )
    assert multimodal.audio_energy_fingerprint(df).collect()[0].afp is None


class TestUnimaxAllocation:
    def _docs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, source string, n_tokens long"
        )

    def test_hand_computed_waterfill(self, spark):
        from icnarc_to_philips_linkage_spark.operators.sampling import (
            unimax_allocation,
        )

        docs = self._docs(
            spark,
            [(1, "a", 100), (2, "b", 200), (3, "c", 700)],
        )
        out = {
            r.source: r
            for r in unimax_allocation(
                docs, budget_tokens=900, max_epochs_pct=100
            ).collect()
        }
        # caps 100/200/700; level search: k=2 capped, C gets 600
        assert out["a"].capped and out["a"].alloc_tokens == 100.0
        assert out["b"].capped and out["b"].alloc_tokens == 200.0
        assert not out["c"].capped
        assert out["c"].alloc_tokens == 600.0
        assert out["c"].epochs == 0.857143

    def test_budget_above_caps_all_capped(self, spark):
        from icnarc_to_philips_linkage_spark.operators.sampling import (
            unimax_allocation,
        )

        docs = self._docs(spark, [(1, "a", 100), (2, "b", 300)])
        out = unimax_allocation(
            docs, budget_tokens=10_000, max_epochs_pct=200
        ).collect()
        assert all(r.capped for r in out)
        assert sorted(r.alloc_tokens for r in out) == [200.0, 600.0]

    def test_small_budget_nobody_capped_even_split(self, spark):
        from icnarc_to_philips_linkage_spark.operators.sampling import (
            unimax_allocation,
        )

        docs = self._docs(spark, [(1, "a", 100), (2, "b", 300)])
        out = {
            r.source: r
            for r in unimax_allocation(
                docs, budget_tokens=100, max_epochs_pct=100
            ).collect()
        }
        assert not out["a"].capped and not out["b"].capped
        assert out["a"].alloc_tokens == out["b"].alloc_tokens == 50.0

    def test_allocation_conserves_budget(self, spark):
        from icnarc_to_philips_linkage_spark.operators.sampling import (
            unimax_allocation,
        )

        docs = self._docs(
            spark,
            [(i, f"s{i % 5}", 50 + 37 * (i % 7)) for i in range(40)],
        )
        out = unimax_allocation(
            docs, budget_tokens=2000, max_epochs_pct=110
        ).collect()
        total = sum(r.alloc_tokens for r in out)
        assert total == pytest.approx(2000, abs=1e-3)

    def test_bad_params_raise(self, spark):
        from icnarc_to_philips_linkage_spark.operators.sampling import (
            unimax_allocation,
        )

        docs = self._docs(spark, [(1, "a", 10)])
        with pytest.raises(ValueError):
            unimax_allocation(docs, budget_tokens=0)
        with pytest.raises(ValueError):
            unimax_allocation(docs, max_epochs_pct=0)


class TestKeepBestPerCluster:
    def test_quality_overrides_min_id(self, spark):
        from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
            keep_best_per_cluster,
        )

        clusters = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
            "doc_id long, cluster_id long",
        )
        quality = spark.createDataFrame(
            [(1, 0.2), (2, 0.9), (3, 0.9), (10, 0.5), (11, None)],
            "doc_id long, p_quality double",
        )
        out = {
            r.doc_id: r
            for r in keep_best_per_cluster(clusters, quality).collect()
        }
        # cluster 1: docs 2 and 3 tie at 0.9 -> smaller id 2 wins
        # (min-id convention would have kept doc 1)
        assert out[2].keep and not out[1].keep and not out[3].keep
        # cluster 10: NULL quality ranks last
        assert out[10].keep and not out[11].keep
        # exactly one keeper per cluster
        keepers = [r for r in out.values() if r.keep]
        assert len(keepers) == 2


def test_source_overlap_report_hand_computed(spark):
    from icnarc_to_philips_linkage_spark.operators.reports import (
        source_overlap_report,
    )

    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.5), (4, 5, 0.7)],
        "id_a long, id_b long, jaccard double",
    )
    labels = spark.createDataFrame(
        [(1, "web"), (2, "web"), (3, "books"), (4, "books"), (5, "web")],
        "doc_id long, source string",
    )
    out = {
        (r.source_a, r.source_b): r
        for r in source_overlap_report(pairs, labels).collect()
    }
    # (1,2): web-web; (1,3): books-web (ordered); (4,5): books-web
    assert out[("web", "web")].n_pairs == 1
    assert out[("web", "web")].avg_sim == 0.9
    assert out[("books", "web")].n_pairs == 2
    assert out[("books", "web")].avg_sim == 0.6


class TestRandomProjection:
    def test_distance_preservation_on_average(self, spark):
        # JL with +-1 signs preserves squared distances in expectation;
        # with out_dim=16 individual pairs can distort, but the MEAN
        # ratio over many pairs concentrates near 1.
        import random

        from icnarc_to_philips_linkage_spark.operators.similarity import (
            random_projection,
        )

        rng = random.Random(7)
        rows = [
            (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(80)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        proj = {
            r.vec_id: r.proj
            for r in random_projection(df, in_dim=64, out_dim=16).collect()
        }
        orig = dict(rows)

        def d2(a, b):
            return sum((x - y) ** 2 for x, y in zip(a, b))

        ratios = []
        for a in range(0, 40):
            b = a + 40
            ratios.append(d2(proj[a], proj[b]) / d2(orig[a], orig[b]))
        mean = sum(ratios) / len(ratios)
        assert 0.8 < mean < 1.2, mean

    def test_deterministic_across_partitionings(self, spark):
        from icnarc_to_philips_linkage_spark.operators.similarity import (
            random_projection,
        )

        rows = [(i, [float(i + j) for j in range(8)]) for i in range(20)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        a = sorted(
            (r.vec_id, tuple(r.proj))
            for r in random_projection(
                df.repartition(1), in_dim=8, out_dim=4
            ).collect()
        )
        b = sorted(
            (r.vec_id, tuple(r.proj))
            for r in random_projection(
                df.repartition(9), in_dim=8, out_dim=4
            ).collect()
        )
        assert a == b

    def test_salt_changes_projection(self, spark):
        from icnarc_to_philips_linkage_spark.operators.similarity import (
            random_projection,
        )

        rows = [(1, [1.0, 2.0, 3.0, 4.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        p1 = random_projection(df, in_dim=4, out_dim=4).collect()[0].proj
        p2 = random_projection(
            df, in_dim=4, out_dim=4, salt="other"
        ).collect()[0].proj
        assert p1 != p2

    def test_bad_dims_raise(self, spark):
        import pytest as _pytest

        from icnarc_to_philips_linkage_spark.operators.similarity import (
            random_projection,
        )

        df = spark.createDataFrame(
            [(1, [1.0])], "vec_id long, embedding array<double>"
        )
        with _pytest.raises(ValueError):
            random_projection(df, in_dim=0)
        with _pytest.raises(ValueError):
            random_projection(df, in_dim=1, out_dim=0)


class TestMergeUpsert:
    def test_all_three_arms(self, spark):
        from icnarc_to_philips_linkage_spark.operators.scd import (
            merge_upsert,
        )

        target = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        )
        source = spark.createDataFrame(
            [(2, "B", "U"), (4, "d", "U"), (3, None, "D")],
            "k long, v string, op string",
        )
        out = {
            r.k: r.v
            for r in merge_upsert(target, source, ["k"], op_col="op").collect()
        }
        assert out == {1: "a", 2: "B", 4: "d"}  # 3 deleted

    def test_no_op_col_pure_upsert(self, spark):
        from icnarc_to_philips_linkage_spark.operators.scd import (
            merge_upsert,
        )

        target = spark.createDataFrame([(1, "a")], "k long, v string")
        source = spark.createDataFrame(
            [(1, "A"), (2, "b")], "k long, v string"
        )
        out = {
            r.k: r.v for r in merge_upsert(target, source, ["k"]).collect()
        }
        assert out == {1: "A", 2: "b"}


def test_merge_upsert_property_vs_dict_reference(spark):
    """Randomized MERGE batches against a driver-side dict model:
    apply the same update/insert/delete stream both ways; results
    must agree exactly."""
    import random

    from icnarc_to_philips_linkage_spark.operators.scd import merge_upsert

    rng = random.Random(42)
    target_rows = [(k, f"v{k}") for k in range(50)]
    model = dict(target_rows)
    src_rows = []
    for k in rng.sample(range(80), 40):
        op = rng.choice(["U", "U", "D"])
        if op == "D":
            src_rows.append((k, None, "D"))
            model.pop(k, None)
        else:
            src_rows.append((k, f"new{k}", "U"))
            model[k] = f"new{k}"
    target = spark.createDataFrame(target_rows, "k long, v string")
    source = spark.createDataFrame(src_rows, "k long, v string, op string")
    out = {
        r.k: r.v
        for r in merge_upsert(target, source, ["k"], op_col="op").collect()
    }
    assert out == model
