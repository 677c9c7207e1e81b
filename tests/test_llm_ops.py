"""Operator-level tests for the training-data-pipeline ops: properties
the oracle differential can't see (recall vs brute force, stub
contracts, batch shapes)."""

from __future__ import annotations

import pytest

# full LLM-operator sweeps over the sf0.001 tables: the heavy lane
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from icnarc_to_philips_linkage_spark.operators import (
    dedup_scale,
    multimodal,
    similarity,
)
from icnarc_to_philips_linkage_spark.plans.tables import load
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF_SMOKE, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF_SMOKE, "embeddings").cache()


def test_minhash_lsh_finds_true_near_dups(spark, docs):
    """Every pair with true Jaccard ≥ 0.7 must be surfaced by LSH with
    k=8/b=4 (band collision probability at j=0.7 is ~97%); and LSH output
    must never report a pair below the verify threshold."""
    sh = dedup_scale.doc_shingles(docs)
    sh.cache()
    truth = (
        dedup_scale.jaccard_verify(
            # all-pairs ground truth via a self-join on shingles
            sh.select(F.col("doc_id").alias("id_a"))
            .distinct()
            .crossJoin(sh.select(F.col("doc_id").alias("id_b")).distinct())
            .filter(F.col("id_a") < F.col("id_b")),
            sh,
        )
        .filter(F.col("jaccard") >= 0.7)
    )
    found = dedup_scale.minhash_lsh_dedup(docs, threshold=0.4)
    truth_pairs = {(r.id_a, r.id_b) for r in truth.collect()}
    found_pairs = {(r.id_a, r.id_b): r.jaccard for r in found.collect()}
    missed = truth_pairs - set(found_pairs)
    assert not missed, f"LSH missed high-similarity pairs: {missed}"
    assert all(j >= 0.4 for j in found_pairs.values())


def test_simhash_similar_docs_close(spark, docs):
    """SimHash of a doc and itself-with-one-extra-token differ in few
    bits; unrelated docs differ in many (on average)."""
    base = docs.limit(1).select("doc_id", "text")
    perturbed = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzunique")).alias("text"),
    )
    both = dedup_scale.simhash16(base.unionByName(perturbed))
    h1, h2 = [r.simhash for r in both.orderBy("doc_id").collect()]
    hamming = bin(h1 ^ h2).count("1")
    assert hamming <= 6, f"perturbed doc moved {hamming} bits"


def test_knn_self_excluded_and_ranked(spark, emb):
    out = similarity.knn_brute_force(emb, emb.filter(F.col("vec_id") < 3), k=5)
    rows = out.collect()
    by_q = {}
    for r in rows:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r.cos_sim)
    for q, sims in by_q.items():
        assert len(sims) == 5
        assert sims == sorted(sims, reverse=True)


def test_ivf_matches_brute_force_within_cell(spark, emb):
    """IVF results are exactly the brute-force top-k restricted to the
    routed cell — verify the subset property: every IVF neighbor's
    similarity ≤ brute-force best at same rank, and all IVF neighbors
    share the routed label."""
    q = emb.filter(F.col("vec_id") < 3)
    ivf = similarity.ivf_topk(emb, q, k=5)
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    rows = ivf.collect()
    assert len(rows) == 15
    for qid in {r.query_id for r in rows}:
        neigh_labels = {labels[r.neighbor_id] for r in rows if r.query_id == qid}
        assert len(neigh_labels) == 1, "IVF must search exactly one cell"


def test_rh_lsh_recall_vs_brute_force(spark, emb):
    """Bucketed ANN recall@5 vs exact top-5: with 6 planes on
    near-orthogonal vectors recall is modest by design — assert the
    plumbing (every result is in the query's bucket ⇒ subset of exact
    ordering within bucket) and a sane floor (>0)."""
    q = emb.filter(F.col("vec_id") < 5)
    exact = similarity.knn_brute_force(emb, q, k=5)
    approx = similarity.ann_rh_lsh(emb, q, k=5, n_planes=4)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = tot = 0
    for r in approx.collect():
        tot += 1
        if r.neighbor_id in exact_sets.get(r.query_id, set()):
            hits += 1
    assert tot > 0
    assert hits > 0, "LSH with 4 planes must recover some exact neighbors"


def test_multiprobe_recall_at_least_single_probe(spark, emb):
    """Hamming-1 multi-probe must recall at least every neighbor the
    single-probe variant finds (its probe set strictly contains the home
    bucket), and typically more."""
    q = emb.filter(F.col("vec_id") < 5)
    exact_sets = {}
    for r in similarity.knn_brute_force(emb, q, k=5).collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)

    def recall(df):
        hits = tot = 0
        for r in df.collect():
            tot += 1
            hits += r.neighbor_id in exact_sets.get(r.query_id, set())
        return hits

    single = recall(similarity.ann_rh_lsh(emb, q, k=5, n_planes=4))
    multi = recall(
        similarity.ann_rh_lsh_multiprobe(emb, q, k=5, n_planes=4)
    )
    assert multi >= single


def test_kmeans_deterministic_and_total(spark, emb):
    from icnarc_to_philips_linkage_spark.operators import clustering

    a1 = clustering.kmeans(emb, k=4, max_iter=2)
    a2 = clustering.kmeans(emb.repartition(13), k=4, max_iter=2)
    r1 = sorted(map(tuple, a1.collect()))
    r2 = sorted(map(tuple, a2.collect()))
    assert r1 == r2, "kmeans must be partitioning-independent"
    assert len(r1) == emb.count(), "every vector assigned exactly once"
    sizes = clustering.cluster_sizes(a1).collect()
    assert sum(r.n for r in sizes) == emb.count()
    assert len(sizes) >= 2


def test_multimodal_decode_stub_contract(spark, docs):
    media = multimodal.documents_as_media(docs.limit(50))
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )
    decoded = multimodal.decode_media(media, fake=True)
    rows = decoded.collect()
    assert len(rows) == 50
    assert all(r.n_bytes > 0 and 64 <= r.width < 64 + 1024 for r in rows)
    # deterministic across re-execution / partitioning
    rows2 = multimodal.decode_media(media.repartition(7), fake=True).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_multimodal_real_decode_when_pillow_present(spark):
    """Real-codec path (VERDICT r3 item 6): where Pillow is installed,
    decode_media(fake=False) decodes actual image bytes — dimensions
    from the codec, undecodable payloads quarantined as NULL-metadata
    rows. Skips (with the enabling condition) where Pillow is absent."""
    pytest.importorskip(
        "PIL", reason="Pillow not installed in this container; "
        "test runs wherever the executor image ships it"
    )
    import io

    from PIL import Image
    from pyspark.sql import Row

    buf = io.BytesIO()
    Image.new("RGB", (320, 200)).save(buf, format="PNG")
    rows = [
        Row(media_id=1, media_type="image", payload=bytearray(buf.getvalue()),
            meta={}),
        Row(media_id=2, media_type="image", payload=bytearray(b"not an image"),
            meta={}),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in
           multimodal.decode_media(media, fake=False).collect()}
    assert (got[1].width, got[1].height, got[1].n_frames) == (320, 200, 1)
    assert got[2].width is None and got[2].n_bytes == 12


def test_multimodal_real_decode_png_wav_dependency_free(spark):
    """VERDICT r4 #4: the real (non-fake) metadata decode path for PNG
    and WAV needs NO optional libraries — IHDR dimensions and fmt/data
    duration parse in pure Python — so it runs (not skips) in this
    container, end-to-end through the mapInPandas plumbing. Bytes are
    generated in-repo: a fully valid PNG (zlib IDAT + CRCs) and a WAV
    written by the stdlib wave module."""
    import io
    import struct
    import wave
    import zlib

    from pyspark.sql import Row

    def png_bytes(w, h):
        def chunk(typ, data):
            return (
                struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data))
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        raw = b"".join(b"\x00" + b"\x00\x00\x00" * w for _ in range(h))
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    def wav_bytes(n_frames, rate):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(b"\x00\x00" * n_frames)
        return buf.getvalue()

    rows = [
        Row(media_id=1, media_type="image",
            payload=bytearray(png_bytes(320, 200)), meta={}),
        Row(media_id=2, media_type="audio",
            payload=bytearray(wav_bytes(8000, 16000)), meta={}),
        Row(media_id=3, media_type="image", payload=None, meta={}),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in
           multimodal.decode_media(media, fake=False).collect()}
    assert (got[1].width, got[1].height, got[1].n_frames) == (320, 200, 1)
    assert got[1].duration_s is None
    assert (got[2].width, got[2].height, got[2].n_frames) == (None, None, 8000)
    assert abs(got[2].duration_s - 0.5) < 1e-9
    assert got[3].n_bytes is None and got[3].width is None


def test_multimodal_features_and_resize(spark, docs):
    media = multimodal.documents_as_media(docs.limit(20))
    feats = multimodal.extract_features(media).collect()
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in feats)
    decoded = multimodal.decode_media(media, fake=True)
    plan = multimodal.resize_plan(decoded, max_dim=224).collect()
    for r in plan:
        assert max(r.target_width, r.target_height) <= 224
        if r.needs_resize:
            assert max(r.width, r.height) > 224


def test_frame_sampling(spark, docs):
    media = multimodal.documents_as_media(docs.limit(10)).withColumn(
        "media_type", F.lit("video")
    )
    decoded = multimodal.decode_media(media, fake=True)
    frames = multimodal.sample_frames(decoded, every_n=8)
    rows = frames.collect()
    nf = {r.media_id: r.n_frames for r in decoded.collect()}
    for mid, expected in nf.items():
        got = [r.frame_idx for r in rows if r.media_id == mid]
        assert got == list(range(0, expected, 8))


def test_hash_sampling_is_deterministic_and_partition_free(spark):
    """Hash sampling must give the identical row set regardless of
    partitioning; fraction 1.0 keeps everything, 0.0 nothing; splits are
    exclusive and exhaustive when fractions sum to 1."""
    from icnarc_to_philips_linkage_spark.operators import sampling

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id for r in sampling.hash_sample(df, "doc_id", 0.3).collect()}
    s2 = {r.doc_id for r in
          sampling.hash_sample(df.repartition(7), "doc_id", 0.3).collect()}
    assert s1 == s2
    assert 0.2 < len(s1) / 2000 < 0.4  # ~binomial around 0.3
    assert sampling.hash_sample(df, "doc_id", 1.0).count() == 2000
    assert sampling.hash_sample(df, "doc_id", 0.0).count() == 0

    split = sampling.hash_split(
        df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert None not in counts and sum(counts.values()) == 2000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # same salt → train membership is a superset-disjoint band structure:
    # re-deriving the split yields identical assignment
    again = {r.doc_id: r["split"] for r in split.collect()}
    assert {r.doc_id: r["split"] for r in split.collect()} == again


def test_ngram_jaccard_blocks_catch_exact_and_near_dups(spark):
    """1-permutation blocking is exact for identical shingle sets
    (jaccard 1.0 pairs always share their min digest) and must agree
    with full exact Jaccard on every pair it emits."""
    from pyspark.sql import Row

    docs = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=3, text="the quick brown fox jumps over a lazy dog"),
        Row(doc_id=4, text="completely different text about spark engines"),
    ])
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in dedup_scale.ngram_jaccard_dedup(docs, threshold=0.1).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 4) not in pairs and (2, 4) not in pairs
    # doc 3 differs in one word -> if blocked with 1/2, jaccard must be
    # the true set jaccard (7 shingles each, 4 shared with n=3)
    for key in [(1, 3), (2, 3)]:
        if key in pairs:
            assert pairs[key] == pytest.approx(4 / 10, abs=1e-6)


@pytest.mark.parametrize("driver_threshold", [2_000_000, 0])
def test_connected_components_chain_and_triangle(spark, driver_threshold):
    """A 4-node chain (diameter 3) and a separate triangle resolve to
    their component minima on BOTH physical paths: driver-side
    union-find (threshold high) and distributed min-label propagation
    (threshold 0). Reversed-duplicate edge (12,10) must collapse."""
    from pyspark.sql import Row

    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=3, id_b=4),
         Row(id_a=10, id_b=11), Row(id_a=11, id_b=12), Row(id_a=10, id_b=12),
         Row(id_a=12, id_b=10)]
    )
    comp = {r.node: r.component
            for r in dedup_scale.connected_components(
                pairs, driver_threshold=driver_threshold).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_tfidf_top_terms_semantics(spark):
    """Hand-computed TF-IDF on a 4-doc corpus: corpus-wide terms get
    idf=ln(1)=0, rarer terms outrank them; rank ties break by term name;
    k truncates per doc."""
    import math

    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="apple banana apple"),
         Row(doc_id=2, text="apple cherry"),
         Row(doc_id=3, text="apple date date date"),
         Row(doc_id=4, text="apple")]
    )
    out = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rk, r.term, r.tf, r.tfidf))
    for v in by_doc.values():
        v.sort()
    ln = lambda x: round(x, 6)
    # 'apple' is in all 4 docs -> idf = ln(4/4) = 0 everywhere
    assert by_doc[1] == [
        (1, "banana", 1, ln(math.log(4 / 1))),  # unique term wins
        (2, "apple", 2, 0.0),
    ]
    # doc 3: 'date' tf=3, df=1
    assert by_doc[3][0] == (1, "date", 3, ln(3 * math.log(4 / 1)))
    # doc 4 has only the zero-scored corpus-wide term
    assert by_doc[4] == [(1, "apple", 1, 0.0)]
    assert all(len(v) <= 2 for v in by_doc.values()), "k=2 enforced"


def test_weighted_hash_sample_proportional_and_deterministic(spark):
    """Weight-proportional sampling: inclusion rate tracks w/max(w);
    weight == max (p >= 1) rows are always kept; membership is identical
    under repartitioning."""
    from icnarc_to_philips_linkage_spark.operators import sampling

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        # thirds with weights 1, 5, 10 -> p = 0.1, 0.5, 1.0 at scale=1
        F.when(F.col("id") % 3 == 0, 1)
        .when(F.col("id") % 3 == 1, 5)
        .otherwise(10)
        .alias("w"),
    )
    out = sampling.weighted_hash_sample(df, "doc_id", "w", scale=1.0)
    rates = {
        r.w: r.n / 1000
        for r in out.groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert rates[10] == 1.0, "p>=1 stratum kept in full"
    assert 0.06 < rates[1] < 0.14
    assert 0.44 < rates[5] < 0.56
    again = {
        r.doc_id
        for r in sampling.weighted_hash_sample(
            df.repartition(11), "doc_id", "w", scale=1.0
        ).collect()
    }
    assert {r.doc_id for r in out.collect()} == again


def test_repetition_and_corpus_stats(spark):
    """dup_gram_ratio: 0 for all-distinct trigrams, high for looping
    text, 0 for sub-trigram docs; corpus_stats counts tokens, vocab, and
    hapax terms exactly."""
    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators.text import (
        corpus_stats,
        with_repetition,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d e"),          # 3 distinct trigrams
         Row(doc_id=2, text="x y x y x y x y"),    # loop: 6 grams, 2 distinct
         Row(doc_id=3, text="one two")]            # too short -> 0 grams
    )
    rep = {r.doc_id: (r.n_grams, r.dup_gram_ratio)
           for r in with_repetition(docs).collect()}
    assert rep[1] == (3, 0.0)
    assert rep[2] == (6, round(4 / 6, 6))
    assert rep[3] == (0, 0.0)

    stats = corpus_stats(docs).collect()[0]
    # tokens: 5 + 8 + 2 = 15; vocab: a b c d e x y one two = 9
    # hapax: a b c d e one two = 7 (x appears 4x, y 4x)
    assert (stats.n_tokens, stats.vocab, stats.hapax) == (15, 9, 7)
    assert stats.type_token_ratio == round(9 / 15, 6)


def test_pmi_bigrams_contract(spark):
    """PMI collocations: exactly top-25, every pair above the count
    floor, scores monotonically non-increasing."""
    from icnarc_to_philips_linkage_spark.plans.llm import text_pmi_bigrams

    sf = "/root/testdata/sf0.001"
    out = text_pmi_bigrams(spark, sf).collect()
    assert len(out) == 25
    assert all(r.cb >= 5 for r in out)
    pmis = [r.pmi for r in out]
    assert pmis == sorted(pmis, reverse=True)


def test_lsh_mega_bucket_cap_bounds_candidates(spark):
    """VERDICT r4 #7 skew hardening: 1000 identical boilerplate docs
    send every band bucket to size 1000 — uncapped, the self-join emits
    C(1000,2)·bands ≈ 2M candidate rows through four join keys. With
    ``max_bucket_size`` the mega-buckets are dropped BEFORE the join:
    the candidate set collapses to just the genuine near-dup pair
    (whose buckets are small), and the boilerplate remains covered by
    EXACT dedup (identical content digests)."""
    from pyspark.sql import Row

    boiler = [
        Row(doc_id=i,
            text="this license header is identical boilerplate text "
                 "repeated for every file in the corpus")
        for i in range(1000)
    ]
    a = ("the quick brown fox jumps over the lazy dog near the quiet "
         "river bank before dawn")
    pair = [Row(doc_id=2001, text=a), Row(doc_id=2002, text=a + " extra")]
    docs = spark.createDataFrame(boiler + pair)

    bands_df = dedup_scale.lsh_bands(
        dedup_scale.minhash_signatures_arr(
            dedup_scale.shingle_sets(docs), "doc_id", 8
        ),
        "doc_id", 8, 4,
    )
    capped = dedup_scale.lsh_candidate_pairs(
        bands_df, max_bucket_size=100
    ).collect()
    assert [(r.id_a, r.id_b) for r in capped] == [(2001, 2002)], (
        "mega-bucket must be dropped, small buckets kept"
    )

    out = dedup_scale.minhash_lsh_dedup(
        docs, threshold=0.4, max_bucket_size=100
    ).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(2001, 2002)}
    # the dropped bucket's docs are exact duplicates — the digest
    # groupBy collapses all 1000 to one keeper, so no recall is lost
    groups = dedup_scale.exact_dedup_groups(docs).collect()
    assert {(r.keep_id, r.n_copies) for r in groups if r.n_copies > 1} == {
        (0, 1000)
    }


def test_incremental_ingest_drops_known_and_dedups_batch(spark):
    """Incoming docs already in the corpus vanish; fresh dups collapse
    to one keeper with a copy count; the within-batch groupBy reuses the
    anti join's digest partitioning (no third exchange)."""
    from pyspark.sql import Row

    existing = spark.createDataFrame(
        [Row(doc_id=1, text="alpha"), Row(doc_id=2, text="beta")]
    )
    incoming = spark.createDataFrame(
        [Row(doc_id=10, text="alpha"),   # already in corpus -> dropped
         Row(doc_id=11, text="gamma"),
         Row(doc_id=12, text="gamma"),   # in-batch dup of 11
         Row(doc_id=13, text="delta")]
    )
    out = dedup_scale.incremental_ingest(incoming, existing)
    got = {r.keep_id: r.n_batch_copies for r in out.collect()}
    assert got == {11: 2, 13: 1}
    # on the shuffled (at-scale) path, the within-batch groupBy reuses
    # the anti join's digest partitioning: exactly the join's two hash
    # exchanges, no third for the aggregate
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        shuffled = dedup_scale.incremental_ingest(incoming, existing)
        shuffled.collect()
        plan = (
            shuffled._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert plan.count("Exchange hashpartitioning") == 2, plan
        assert "BroadcastExchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_incremental_ingest_bloom_prefilter(spark):
    """Bloom prefilter path (VERDICT r3 item 4): identical results to
    the plain anti join — including under a deliberately tiny,
    collision-heavy bloom (64 bits) where most existing rows are false
    positives — and the physical plan shows the bitmap broadcast +
    bloom predicate applied to the existing side BEFORE the anti join's
    exchange."""
    from pyspark.sql import Row

    existing = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in range(50)]
    )
    incoming = spark.createDataFrame(
        [Row(doc_id=100, text="doc 7"),      # already in corpus
         Row(doc_id=101, text="fresh one"),
         Row(doc_id=102, text="fresh one"),  # in-batch dup
         Row(doc_id=103, text="fresh two")]
    )
    plain = {
        (r.keep_id, r.n_batch_copies)
        for r in dedup_scale.incremental_ingest(incoming, existing).collect()
    }
    assert plain == {(101, 2), (103, 1)}
    for bits, k in [(1 << 20, 5), (64, 2)]:  # designed fp rate / fp-heavy
        bloomed = {
            (r.keep_id, r.n_batch_copies)
            for r in dedup_scale.incremental_ingest(
                incoming, existing, bloom_bits=bits, bloom_k=k
            ).collect()
        }
        assert bloomed == plain, (bits, k)

    # the prefilter must land on the existing-corpus side BEFORE the
    # anti join: the bloom bit-test (xxhash64 against the literal
    # bitmap) is a plain Filter under the join's right side — no join,
    # no broadcast machinery for the bitmap itself
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = dedup_scale.incremental_ingest(
            incoming, existing, bloom_bits=1 << 20
        )
        df.collect()
        plan = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        anti_part = plan[plan.index("LeftAnti"):]
        assert "xxhash64" in anti_part and "element_at" in anti_part, (
            f"bloom bit-test must sit under the anti join's existing "
            f"side:\n{plan}"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_incremental_ingest_auto_bloom_scans_incoming_once_eagerly(spark):
    """VERDICT r4 #2 regression: with ``bloom_bits='auto'`` the eager
    phase must scan the incoming source exactly ONCE — the bitmap
    aggregation carries the sizing count (``bloom_bitmap_auto``), so
    there is no separate count job/scan as in r4 — and no persisted RDD
    may outlive the call. The incoming frame is wrapped in a
    row-counting mapInPandas (opaque to column pruning), so the
    accumulator counts true source scans."""
    from pyspark.sql import Row

    acc = spark.sparkContext.accumulator(0)
    base = spark.createDataFrame(
        [Row(doc_id=100 + i, text=f"t{i}") for i in range(10)]
    )

    def traced(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    incoming = base.mapInPandas(traced, base.schema)
    existing = spark.createDataFrame([Row(doc_id=1, text="t0")])
    sc = spark.sparkContext
    n_cached_before = sc._jsc.sc().getPersistentRDDs().size()
    out = dedup_scale.incremental_ingest(
        incoming, existing, bloom_bits="auto", min_corpus_bytes=0
    )
    assert acc.value == 10, (
        f"eager sizing+bitmap phase scanned the incoming source "
        f"{acc.value / 10:g} times; the digest cache should make it 1"
    )
    assert sc._jsc.sc().getPersistentRDDs().size() == n_cached_before, (
        "incremental_ingest leaked a persisted RDD"
    )
    got = {(r.keep_id, r.n_batch_copies) for r in out.collect()}
    assert got == {(100 + i, 1) for i in range(1, 10)}
    assert acc.value == 20, "final plan should re-scan exactly once"


def test_incremental_ingest_auto_bloom_is_corpus_size_adaptive(spark, tmp_path):
    """``bloom_bits='auto'`` skips the eager prefilter when the corpus
    side's Catalyst size estimate is below ``min_corpus_bytes`` (the
    build cannot pay for itself with nothing to prune), and builds it
    when forced with threshold 0. A source with UNKNOWN stats
    (Long.MaxValue, e.g. a local relation) is conservatively treated as
    large. Results identical either way."""
    from pyspark.sql import Row

    incoming = spark.createDataFrame(
        [Row(doc_id=10, text="a"), Row(doc_id=11, text="b")]
    )
    local_existing = spark.createDataFrame([Row(doc_id=1, text="a")])
    # parquet-backed corpus → real (tiny) size statistics
    local_existing.write.parquet(str(tmp_path / "corpus"))
    existing = spark.read.parquet(str(tmp_path / "corpus"))

    def has_bloom_probe(df):
        return "xxhash64" in df._jdf.queryExecution().optimizedPlan().toString()

    skipped = dedup_scale.incremental_ingest(
        incoming, existing, bloom_bits="auto"  # tiny known corpus → skip
    )
    forced = dedup_scale.incremental_ingest(
        incoming, existing, bloom_bits="auto", min_corpus_bytes=0
    )
    unknown = dedup_scale.incremental_ingest(
        incoming, local_existing, bloom_bits="auto"  # unknown stats → keep
    )
    assert not has_bloom_probe(skipped)
    assert has_bloom_probe(forced)
    assert has_bloom_probe(unknown)
    assert sorted(map(tuple, skipped.collect())) == sorted(
        map(tuple, forced.collect())
    )


def test_bloom_bitmap_auto_fold_matches_direct_build(spark):
    """The fold-down build (one pass at 2^22 resolution, folded to the
    sized power-of-two width) must set every bit a direct build at that
    width sets — no false negatives — and size from the carried count:
    200 items * 16 bits -> 3200 -> next pow2 8192 = the min_bits floor."""
    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        bloom_bitmap,
        bloom_bitmap_auto,
        bloom_might_contain,
    )

    vals = spark.createDataFrame([Row(h=f"item-{i}") for i in range(200)])
    bm_auto, nbits = bloom_bitmap_auto(vals, "h", k=5)
    assert nbits == 1 << 13  # clamped to the floor
    hits = vals.filter(bloom_might_contain("h", bm_auto, nbits, 5)).count()
    assert hits == 200, "fold-down build produced a false negative"
    # positions mod a dividing power of two are identical, so the fold
    # must EQUAL the direct same-width build bit for bit
    bm_direct = bloom_bitmap(vals, "h", num_bits=nbits, k=5)
    assert bm_auto == bm_direct


def test_bloom_bitmap_no_false_negatives(spark):
    """Every inserted value tests positive; a disjoint probe set at the
    designed sizing tests almost entirely negative."""
    from icnarc_to_philips_linkage_spark.operators.dedup_scale import (
        bloom_bitmap,
        bloom_might_contain,
    )

    vals = spark.range(500).select(
        F.md5(F.col("id").cast("string")).alias("h")
    )
    bm = bloom_bitmap(vals, "h", num_bits=1 << 13, k=5)  # ~16 bits/item
    assert len(bm) == (1 << 13) // 64 and any(bm)
    hits = vals.filter(bloom_might_contain("h", bm, 1 << 13, 5)).count()
    assert hits == 500, "false negative: an inserted value tested absent"
    probe = spark.range(1000, 3000).select(
        F.md5(F.col("id").cast("string")).alias("h")
    )
    fp = probe.filter(bloom_might_contain("h", bm, 1 << 13, 5)).count()
    assert fp / 2000 < 0.05, f"false-positive rate {fp/2000} way above design"


def test_chunker_native_and_udtf_agree(spark):
    """Context-window chunking: hand-checked boundaries on the native
    path, and a Python UDTF (the §2.10 escape hatch the reference never
    needed) must produce the identical chunk set. Production uses the
    native explode+slice — the UDTF exists to prove the surface."""
    from pyspark.sql import Row
    from pyspark.sql.functions import udtf

    from icnarc_to_philips_linkage_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(f"w{i}" for i in range(95))),
         Row(doc_id=2, text="just a few tokens"),
         Row(doc_id=3, text="x")]
    )
    native = chunk_documents(docs, width=50, overlap=10)
    got = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_tokens) for r in native.collect()
    )
    # doc 1: 95 tokens, stride 40 -> starts 1, 41, 81 -> 50, 50, 15 tokens
    assert got == [
        (1, 0, 50), (1, 1, 50), (1, 2, 15),
        (2, 0, 4),
        (3, 0, 1),
    ]

    @udtf(returnType="chunk_idx int, chunk string, chunk_tokens int")
    class ChunkUdtf:
        def eval(self, text: str):
            toks = text.strip().lower().split()
            stride, width = 40, 50
            for k, start in enumerate(range(0, max(len(toks), 1), stride)):
                window = toks[start:start + width]
                yield k, " ".join(window), len(window)

    spark.udtf.register("chunk_udtf", ChunkUdtf)
    docs.createOrReplaceTempView("chunk_docs")
    via_udtf = spark.sql(
        """SELECT d.doc_id, c.chunk_idx, c.chunk, c.chunk_tokens
           FROM chunk_docs d, LATERAL chunk_udtf(d.text) c"""
    )
    assert sorted(map(tuple, native.collect())) == sorted(
        map(tuple, via_udtf.collect())
    )


def test_recall_at_k_boundaries(spark):
    """recall(truth, truth) == 1; disjoint approx == 0; missing queries
    count as 0 in the macro mean."""
    from pyspark.sql import Row

    truth = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=10), Row(query_id=1, neighbor_id=11),
         Row(query_id=2, neighbor_id=20)]
    )
    perfect = similarity.recall_at_k(truth, truth).collect()[0]
    assert (perfect.n_queries, perfect.mean_recall) == (2, 1.0)

    partial = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=10), Row(query_id=1, neighbor_id=99)]
    )  # q1: 1 of 2 hit; q2: absent -> 0
    r = similarity.recall_at_k(truth, partial).collect()[0]
    assert r.mean_recall == 0.25
    assert [(x.query_id, x.recall) for x in r.per_query] == [(1, 0.5), (2, 0.0)]


def test_weighted_hash_sample_nonpositive_weights(spark):
    """Regression (ADVICE r2): rows with weight <= 0 are never sampled,
    and an ALL-nonpositive corpus samples nothing — the NULL/negative
    __wmax degenerate case must not resolve to p=1 via least/greatest
    null-skipping."""
    from icnarc_to_philips_linkage_spark.operators import sampling

    mixed = spark.range(400).select(
        F.col("id").alias("doc_id"),
        # negative, zero, NULL, and positive strata
        F.when(F.col("id") % 4 == 0, -5.0)
        .when(F.col("id") % 4 == 1, 0.0)
        .when(F.col("id") % 4 == 2, None)
        .otherwise(10.0)
        .alias("w"),
    )
    kept = sampling.weighted_hash_sample(mixed, "doc_id", "w").collect()
    assert kept, "positive-weight rows should be sampled"
    assert all(
        r.w is not None and r.w > 0 for r in kept
    ), "NULL or w<=0 row sampled"

    for bad_w in (-5.0, 0.0):
        allbad = spark.range(100).select(
            F.col("id").alias("doc_id"), F.lit(bad_w).alias("w")
        )
        assert (
            sampling.weighted_hash_sample(allbad, "doc_id", "w").count() == 0
        ), f"all-{bad_w} corpus must sample nothing"


def test_grouped_top_k_agg_keeps_small_groups(spark):
    """Regression (ADVICE r2): groups with fewer than k rows survive
    in full (the slice(-k, k) formulation returned an empty array for
    them)."""
    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators import profile

    df = spark.createDataFrame(
        [Row(g="big", v=i) for i in range(5)]
        + [Row(g="small", v=100), Row(g="tiny", v=7)]
    )
    out = profile.grouped_top_k_agg(df, ["g"], ["v"], k=3)
    got = {}
    for r in out.collect():
        got.setdefault(r.g, []).append(r.v)
    assert sorted(got["big"], reverse=True) == [4, 3, 2]
    assert got["small"] == [100], "group with 1 < k rows dropped"
    assert got["tiny"] == [7]


def test_minhash_arr_equals_exploded(spark, docs):
    """Regression (ADVICE r2): the map-only array MinHash must produce
    byte-identical signatures to the exploded groupBy formulation —
    would have caught the lambda-arity salt-binding bug."""
    sets_df = dedup_scale.shingle_sets(docs)
    sh = dedup_scale.doc_shingles(docs)
    via_arr = sorted(
        map(tuple, dedup_scale.minhash_signatures_arr(sets_df).collect())
    )
    via_agg = sorted(
        map(tuple, dedup_scale.minhash_signatures(sh).collect())
    )
    assert via_arr == via_agg


def test_decontamination_flags_and_removes_overlaps(spark):
    """A training doc sharing one 13-gram with the benchmark is flagged
    with the right distinct-gram count; clean docs are untouched; short
    documents (< n tokens) use the whole-text-gram convention."""
    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators import decontam

    leak = " ".join(f"w{i}" for i in range(13))  # exactly one 13-gram
    bench = spark.createDataFrame(
        [Row(doc_id=900, text=f"question: {leak} answer: yes"),
         Row(doc_id=901, text="tiny bench doc")]
    )
    train = spark.createDataFrame(
        [Row(doc_id=1, text=f"prefix {leak} suffix"),    # contaminated
         Row(doc_id=2, text="completely unrelated text about nothing"),
         Row(doc_id=3, text="tiny bench doc"),           # short-doc exact hit
         Row(doc_id=4, text=leak)]                       # whole doc IS the gram
    )
    rep = {r.doc_id: r.n_shared_grams
           for r in decontam.contamination_report(train, bench).collect()}
    assert rep == {1: 1, 3: 1, 4: 1}
    clean = decontam.decontaminate(train, bench)
    assert sorted(r.doc_id for r in clean.collect()) == [2]

    # the overlap join must broadcast the benchmark gram set
    plan = (
        decontam.contamination_report(train, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_pii_scrub_semantics(spark):
    """Hand-checked redaction: email consumed before digit rules (its
    digits never recounted), phone and long-id hit independently,
    clean text passes through byte-identical, NULL stays NULL."""
    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators import pii

    rows = [
        Row(doc_id=1, text="mail a.b-c_9@ex-ample.co.uk now"),
        Row(doc_id=2, text="call 555-0199-1234 re acct 123456789"),
        Row(doc_id=3, text="nothing sensitive 123 here"),
        Row(doc_id=4, text=None),
    ]
    out = {r.doc_id: r for r in
           pii.scrub_pii(spark.createDataFrame(rows)).collect()}
    assert out[1].text == "mail [EMAIL] now"
    assert (out[1].n_email, out[1].n_phone, out[1].n_long_id) == (1, 0, 0)
    assert out[2].text == "call [PHONE] re acct [LONG_ID]"
    assert (out[2].n_email, out[2].n_phone, out[2].n_long_id) == (0, 1, 1)
    assert out[3].text == "nothing sensitive 123 here"
    assert (out[3].n_email, out[3].n_phone, out[3].n_long_id) == (0, 0, 0)
    assert out[4].text is None and out[4].n_email is None


def test_pq_train_encode_search(spark, emb):
    """Product quantization: deterministic codebooks (no RNG, stable
    across partitionings), codes in range, and ADC search must rank a
    PLANTED exact duplicate of each query vector at distance 0 / rank 1
    — the semantic contract compression must not break."""
    from icnarc_to_philips_linkage_spark.operators import pq

    DIM, M, KSUB = 64, 8, 16
    books = pq.pq_train(emb, dim=DIM, m=M, ksub=KSUB, max_iter=2)
    books2 = pq.pq_train(emb.repartition(13), dim=DIM, m=M, ksub=KSUB, max_iter=2)
    assert books == books2, "training must be partitioning-independent"
    assert len(books) == M and all(len(b) == KSUB for b in books)

    codes = pq.pq_encode(emb, books)
    rows = codes.collect()
    assert all(
        len(r.codes) == M and all(0 <= c < KSUB for c in r.codes)
        for r in rows
    )

    # plant exact duplicates of 5 query vectors under new ids
    queries = emb.filter(F.col("vec_id") < 5)
    dups = queries.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    corpus_codes = pq.pq_encode(emb.unionByName(dups), books)
    top = pq.pq_search(queries, corpus_codes, books, k=3)
    by_q: dict = {}
    for r in top.collect():
        by_q.setdefault(r.query_id, []).append(r)
    # ADC is asymmetric (raw query vs quantized candidate), so the
    # duplicate's distance is the query's own quantization error, not
    # 0 — but no candidate can score below it: the dup must rank 1
    for qid in (0, 1, 2, 3, 4):
        ranked = sorted(by_q[qid], key=lambda r: (r.adc_dist, r.neighbor_id))
        assert ranked[0].neighbor_id == qid + 100000, (
            f"planted duplicate not rank 1 for query {qid}: {ranked}"
        )


def test_pq_train_sampled_deterministic_and_search_quality(spark, emb):
    """VERDICT r4 #3: ``max_train_rows`` trains codebooks on a bounded
    deterministic hash sample. The sampled books must (a) differ from
    full-corpus books (the cap is real), (b) be identical across
    partitionings (hash sample, no RNG), and (c) still rank a planted
    exact duplicate of each query at rank 1 in ADC search — sampling
    cuts training cost, not the semantic contract."""
    from icnarc_to_philips_linkage_spark.operators import pq

    n = emb.count()
    cap = max(16, n // 4)
    books_s = pq.pq_train(emb, dim=64, m=8, ksub=16, max_iter=2,
                          max_train_rows=cap)
    books_s2 = pq.pq_train(emb.repartition(7), dim=64, m=8, ksub=16,
                           max_iter=2, max_train_rows=cap)
    assert books_s == books_s2, "sampled training must be deterministic"
    books_full = pq.pq_train(emb, dim=64, m=8, ksub=16, max_iter=2,
                             max_train_rows=None)
    assert books_s != books_full, (
        f"cap {cap} of {n} rows did not change the training set"
    )
    queries = emb.filter(F.col("vec_id") < 5)
    dups = queries.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    top = pq.pq_search(
        queries, pq.pq_encode(emb.unionByName(dups), books_s), books_s, k=3
    )
    by_q: dict = {}
    for r in top.collect():
        by_q.setdefault(r.query_id, []).append(r)
    for qid in (0, 1, 2, 3, 4):
        ranked = sorted(by_q[qid], key=lambda r: (r.adc_dist, r.neighbor_id))
        assert ranked[0].neighbor_id == qid + 100000, (
            f"planted duplicate not rank 1 with sampled books, query {qid}"
        )
    with pytest.raises(ValueError, match="max_train_rows"):
        pq.pq_train(emb, dim=64, m=8, ksub=16, max_train_rows=8)


def test_pq_search_beats_random_on_exact_l2(spark, emb):
    """Quality floor: the mean TRUE squared-L2 distance of PQ-returned
    neighbors must beat the corpus-wide mean distance by a wide margin
    (compression preserves neighborhood structure)."""
    from icnarc_to_philips_linkage_spark.operators import pq

    books = pq.pq_train(emb, dim=64, m=8, ksub=16, max_iter=2)
    queries = emb.filter(F.col("vec_id") < 10)
    top = pq.pq_search(queries, pq.pq_encode(emb, books), books, k=5)

    vecs = {r.vec_id: r.embedding for r in emb.collect()}

    def l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    got = [
        l2(vecs[r.query_id], vecs[r.neighbor_id]) for r in top.collect()
    ]
    qids = [r.vec_id for r in queries.collect()]
    baseline = [
        l2(vecs[q], v) for q in qids for vid, v in vecs.items() if vid != q
    ]
    # synthetic near-random 64-dim vectors compress coarsely (measured
    # ratio ~0.79 at m=8/ksub=16); the floor pins "preserves
    # neighborhood structure", not sharpness
    assert sum(got) / len(got) < 0.9 * sum(baseline) / len(baseline), (
        "PQ neighbors are no closer than random vectors"
    )


def test_ivfpq_restricts_to_routed_cell(spark, emb):
    """IVF-PQ: every returned neighbor belongs to the query's routed
    cell (the coarse quantizer's nearest-centroid cell), and results
    agree with plain PQ search manually restricted to that cell."""
    from icnarc_to_philips_linkage_spark.operators import pq, similarity

    books = pq.pq_train(emb, dim=64, m=8, ksub=16, max_iter=2)
    queries = emb.filter(F.col("vec_id") < 5)
    top = pq.ivf_pq_topk(emb, queries, books, k=3)

    # recompute routing independently
    cents = {
        r.label: r.centroid
        for r in similarity.centroids_by_label(emb).collect()
    }
    labels = {r.vec_id: r.label for r in emb.collect()}
    vecs = {r.vec_id: r.embedding for r in emb.collect()}

    def cos(a, b):
        import math

        dp = sum(x * y for x, y in zip(a, b))
        return dp / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    for r in top.collect():
        routed = max(
            cents, key=lambda lb: (round(cos(vecs[r.query_id], cents[lb]), 6), -lb)
        )
        assert labels[r.neighbor_id] == routed, (
            f"neighbor {r.neighbor_id} outside query {r.query_id}'s "
            f"routed cell {routed}"
        )


def test_pii_scrub_out_col_keeps_original(spark):
    """Regression (r4 review): a distinct out_col must KEEP the original
    text column (the audit shape), and a colliding out_col errors."""
    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators import pii

    df = spark.createDataFrame([Row(doc_id=1, text="mail a@b.io now")])
    out = pii.scrub_pii(df, out_col="clean").collect()[0]
    assert out.text == "mail a@b.io now"
    assert out.clean == "mail [EMAIL] now"
    assert out.n_email == 1
    with pytest.raises(ValueError, match="collides"):
        pii.scrub_pii(df, out_col="doc_id")


def test_table_diff_classifies_all_statuses(spark):
    """Hand-built diff: only_left / only_right / value_mismatch / equal
    each hit; NULL values compare equal to NULL (reconciliation
    semantics); column ORDER differences do not read as mismatches."""
    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators import reconcile

    left = spark.createDataFrame(
        [Row(k=1, a="x", b=None), Row(k=2, a="y", b="v"),
         Row(k=3, a="z", b="w")]
    )
    # k=1 equal (incl. NULL==NULL), k=2 value differs, k=3 missing,
    # k=4 extra; columns deliberately in a different order
    right = spark.createDataFrame(
        [Row(b=None, k=1, a="x"), Row(b="CHANGED", k=2, a="y"),
         Row(b="n", k=4, a="m")]
    )
    got = {r.k: r.status
           for r in reconcile.table_diff(left, right, ["k"]).collect()}
    assert got == {1: "equal", 2: "value_mismatch",
                   3: "only_left", 4: "only_right"}
    s = reconcile.diff_summary(left, right, ["k"]).collect()[0]
    assert (s.n_equal, s.n_value_mismatch, s.n_only_left, s.n_only_right) == (
        1, 1, 1, 1
    )


def test_table_diff_delimiter_values_not_equal(spark):
    """ADVICE r4 regression: values containing the join delimiter must
    not collide — ('a|b','c') vs ('a','b|c') previously digested
    identically and read as 'equal'. The length-prefixed encoding keeps
    them apart; a value equal to the old NULL sentinel is also distinct
    from a real NULL."""
    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators import reconcile

    left = spark.createDataFrame(
        [Row(k=1, a="a|b", b="c"), Row(k=2, a="<&NULL&>", b="x")]
    )
    right = spark.createDataFrame(
        [Row(k=1, a="a", b="b|c"), Row(k=2, a=None, b="x")]
    )
    got = {r.k: r.status
           for r in reconcile.table_diff(left, right, ["k"]).collect()}
    assert got == {1: "value_mismatch", 2: "value_mismatch"}


def test_check_report_and_uniqueness(spark):
    """Expectations: per-constraint violation counts in one aggregate;
    NULL-pass semantics for range/regex; uniqueness as a groupBy."""
    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators import checks

    df = spark.createDataFrame(
        [Row(id=1, v=5.0, code="AB12"),
         Row(id=2, v=500.0, code="XY!!"),   # v out of range, code malformed
         Row(id=3, v=None, code=None),      # NULLs pass range/regex
         Row(id=1, v=7.0, code="CD34")]     # duplicate id
    )
    rep = checks.check_report(
        df,
        [
            checks.not_null("v"),
            checks.in_range("v", 0, 100),
            checks.matches("code", "[A-Z]{2}[0-9]{2}"),
        ],
    ).collect()[0]
    assert rep.n_rows == 4
    assert rep.viol_v_not_null == 1
    assert rep.viol_v_in_range == 1
    assert rep.viol_code_matches == 1
    bad = checks.violating_rows(df, checks.in_range("v", 0, 100)).collect()
    assert [r.id for r in bad] == [2]
    dups = checks.uniqueness_violations(df, ["id"]).collect()
    assert [(r.id, r.n) for r in dups] == [(1, 2)]


def test_pack_sequences_layout_and_partition_independence(spark):
    """Hand-checked span layout (docs straddling window boundaries get
    one row per covered window with correct slice bounds; zero-token
    docs dropped), and — under repartitionByRange — the SAME layout at
    any partition count (the distributed prefix sum composes to the
    global one)."""
    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators import packing

    docs = spark.createDataFrame(
        [Row(doc_id=1, n_tokens=6), Row(doc_id=2, n_tokens=3),
         Row(doc_id=3, n_tokens=0),   # dropped
         Row(doc_id=4, n_tokens=10),  # spans windows 0,1 and 1,2? see calc
         Row(doc_id=5, n_tokens=2)]
    )
    # L=8, order 1,2,4,5: spans 1:[0,6) 2:[6,9) 4:[9,19) 5:[19,21)
    got = sorted(
        map(
            tuple,
            packing.pack_sequences(
                docs.repartitionByRange(2, "doc_id"), context_len=8
            ).collect(),
        )
    )
    want = sorted(
        [
            (0, 1, 0, 6, 0, 6),
            (0, 2, 6, 9, 6, 8),
            (1, 2, 6, 9, 8, 9),
            (1, 4, 9, 19, 9, 16),
            (2, 4, 9, 19, 16, 19),
            (2, 5, 19, 21, 19, 21),
        ]
    )
    assert got == want
    for n_parts in (1, 3):
        again = sorted(
            map(
                tuple,
                packing.pack_sequences(
                    docs.repartitionByRange(n_parts, "doc_id"), context_len=8
                ).collect(),
            )
        )
        assert again == want, f"layout differs at {n_parts} partitions"


def test_pack_sequences_tied_order_col_no_overlap(spark):
    """ADVICE r4 regression: a non-unique order_col (here a constant)
    must not give tied rows the same running sum — the ROWS frame with
    the id tiebreak keeps spans disjoint and contiguous."""
    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators import packing

    docs = spark.createDataFrame(
        [Row(doc_id=i, n_tokens=4, grp=0) for i in range(1, 7)]
    )
    spans = (
        packing.pack_sequences(
            docs.repartitionByRange(2, "doc_id"),
            context_len=8,
            order_col="grp",  # all tied
        )
        .select("doc_id", "doc_start", "doc_end")
        .distinct()
        .collect()
    )
    seen = sorted((r.doc_start, r.doc_end) for r in spans)
    assert seen[0][0] == 0 and seen[-1][1] == 24
    for (s1, e1), (s2, e2) in zip(seen, seen[1:]):
        assert e1 == s2, f"spans not contiguous/disjoint: {seen}"
        assert e1 - s1 == 4


def test_pack_bins_ffd_layout_and_fill(spark):
    """VERDICT r4 #6: FFD whole-document packing. Every packable doc
    lands in exactly one bin, bins never overflow, offsets tile each bin
    contiguously from 0, the layout is identical across input
    partitionings (hash groups, no partition-id dependence), zero/
    oversize docs are dropped, and the fill rate on a pairable corpus
    is near 1 (55+45 pairs + 30 triples at L=100)."""
    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators import packing

    lengths = [55] * 10 + [45] * 10 + [30] * 9
    rows = [Row(doc_id=i, n_tokens=n) for i, n in enumerate(lengths)]
    rows += [Row(doc_id=900, n_tokens=0), Row(doc_id=901, n_tokens=150)]
    docs = spark.createDataFrame(rows)
    packed = packing.pack_bins_ffd(
        docs, context_len=100, num_groups=2
    ).collect()
    assert sorted(r.doc_id for r in packed) == list(range(29))  # drops 900/901
    by_bin: dict = {}
    for r in packed:
        by_bin.setdefault(r.bin_id, []).append(r)
    for rs in by_bin.values():
        assert sum(r.n_tokens for r in rs) <= 100, "bin overflow"
        spans = sorted((r.bin_offset, r.bin_offset + r.n_tokens) for r in rs)
        assert spans[0][0] == 0
        assert all(a[1] == b[0] for a, b in zip(spans, spans[1:])), (
            f"offsets not contiguous: {spans}"
        )
    again = packing.pack_bins_ffd(
        docs.repartition(7), context_len=100, num_groups=2
    ).collect()
    assert sorted(map(tuple, packed)) == sorted(map(tuple, again))
    rep = packing.fill_report(
        packing.pack_bins_ffd(docs, context_len=100, num_groups=2), 100
    ).collect()[0]
    assert rep.n_docs == 29 and rep.total_tokens == 1270
    # 55/45 pair perfectly and 30s triple; hash-grouping may strand a
    # few at group margins — still far above a naive one-doc-per-bin
    # layout (0.44 here)
    assert rep.fill_rate >= 0.8, rep
    with pytest.raises(ValueError, match="context_len"):
        packing.pack_bins_ffd(docs, context_len=0)


def test_pack_sequences_no_global_window_sort(spark):
    """The plan must not contain a single-partition global Window —
    the prefix sum runs partitioned by spark_partition_id."""
    from icnarc_to_philips_linkage_spark.operators import packing
    from icnarc_to_philips_linkage_spark.operators.text import token_count

    d = (
        load(spark, SF_SMOKE, "documents")
        .select("doc_id", token_count("text").alias("n_tokens"))
        .repartitionByRange(4, "doc_id")
    )
    plan = (
        packing.pack_sequences(d, context_len=512)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan, (
        f"global-order window would single-partition the corpus:\n{plan}"
    )


def test_epoch_shuffle_reproducible_distinct_permutations(spark, docs):
    """Epoch shuffle: same epoch -> identical order regardless of
    partitioning; different epochs -> different permutations; keys are
    unique (a true ordering, no ties beyond the id tiebreak)."""
    from icnarc_to_philips_linkage_spark.operators import sampling

    d = docs.limit(200)
    e1 = [
        r.doc_id
        for r in sampling.epoch_shuffle(d, "doc_id", epoch=1)
        .orderBy("shuffle_key", "doc_id").collect()
    ]
    e1_again = [
        r.doc_id
        for r in sampling.epoch_shuffle(d.repartition(7), "doc_id", epoch=1)
        .orderBy("shuffle_key", "doc_id").collect()
    ]
    e2 = [
        r.doc_id
        for r in sampling.epoch_shuffle(d, "doc_id", epoch=2)
        .orderBy("shuffle_key", "doc_id").collect()
    ]
    assert e1 == e1_again, "same epoch must replay identically"
    assert sorted(e1) == sorted(e2), "shuffle must be a permutation"
    assert e1 != e2, "different epochs must reorder"
    keys = sampling.epoch_shuffle(d, "doc_id", 1).select("shuffle_key")
    assert keys.distinct().count() == keys.count()


def test_mixture_balance_hits_target_without_upsampling(spark):
    """Mixture balancing: the binding domain (smallest count/share)
    keeps ~everything, over-represented domains downsample toward their
    share, domains outside the target drop, and nothing upsamples.
    Deterministic across partitionings; bad shares raise."""
    from pyspark.sql import Row

    from icnarc_to_philips_linkage_spark.operators import sampling

    rows = (
        [Row(doc_id=i, dom="en") for i in range(800)]
        + [Row(doc_id=1000 + i, dom="de") for i in range(100)]
        + [Row(doc_id=2000 + i, dom="junk") for i in range(50)]
    )
    df = spark.createDataFrame(rows)
    target = {"en": 0.5, "de": 0.5}
    out = sampling.mixture_balance(df, "doc_id", "dom", target)
    got = {r.dom: r.n for r in out.groupBy("dom").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # binding domain: de (100/0.5 = 200 <= 800/0.5); keeps all 100
    assert got.get("de") == 100
    # en keeps ~ 0.5*200/800 = 12.5% of 800 = ~100 (Bernoulli, wide band)
    assert 60 <= got.get("en", 0) <= 140, got
    assert "junk" not in got
    again = {r.dom: r.n for r in
             sampling.mixture_balance(df.repartition(9), "doc_id", "dom", target)
             .groupBy("dom").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == again, "membership must be partition-independent"
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.mixture_balance(df, "doc_id", "dom", {"en": 0.4})
    with pytest.raises(ValueError, match="absent from the data"):
        sampling.mixture_balance(df, "doc_id", "dom", {"absent": 1.0})
    # a PARTIALLY absent target must also raise, not silently return a
    # corpus that cannot match the requested mixture
    with pytest.raises(ValueError, match="absent from the data.*fr"):
        sampling.mixture_balance(df, "doc_id", "dom", {"en": 0.5, "fr": 0.5})


def test_decode_audio_samples_real_pcm(spark):
    """Real PCM decode through stdlib wave: a generated sine WAV's RMS
    must come out at amplitude/sqrt(2) and duration exact — actual
    sample values flow through the Arrow batches, not just headers."""
    import io
    import math
    import struct
    import wave as wave_mod

    from icnarc_to_philips_linkage_spark.operators.multimodal import (
        decode_audio_samples,
    )

    def sine_wav(seconds=0.5, rate=8000, amp=0.5, freq=440.0) -> bytes:
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            n = int(seconds * rate)
            frames = b"".join(
                struct.pack(
                    "<h",
                    int(amp * 32767 * math.sin(2 * math.pi * freq * i / rate)),
                )
                for i in range(n)
            )
            w.writeframes(frames)
        return buf.getvalue()

    rows = [
        (1, "audio", bytearray(sine_wav())),
        (2, "audio", bytearray(b"not a wav at all")),
        (3, "audio", None),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    out = {r.media_id: r for r in decode_audio_samples(df).collect()}
    good = out[1]
    assert good.n_samples == 4000 and good.sample_rate == 8000
    assert good.duration_s == pytest.approx(0.5)
    assert good.rms == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)
    assert good.peak == pytest.approx(0.5, rel=1e-2)
    assert out[2].rms is None and out[3].rms is None


def _make_png(width, height, pixel_rows, color_type=2, filters=None):
    """Tiny PNG writer (stdlib zlib) — the test-side encoder for the
    dependency-free decoder. pixel_rows: list of rows of channel-tuples;
    filters: per-row filter byte (defaults to 0/None).

    Filter encoding mirrors the spec: the stored bytes are computed
    from the raw bytes so the decoder must UNDO the filter to recover
    the original pixels."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 6: 4}[color_type]
    filters = filters or [0] * height
    stride = width * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = bytes(
            v for px in pixel_rows[y] for v in (px if ch > 1 else (px,))
        )
        ft = filters[y]
        raw.append(ft)
        if ft == 0:
            enc = row
        elif ft == 1:  # Sub
            enc = bytes(
                (row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            enc = bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 4:  # Paeth
            enc = bytearray()
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc.append((row[i] - pred) & 0xFF)
            enc = bytes(enc)
        else:
            raise ValueError(ft)
        raw += enc
        prev = row

    def chunk(typ, data):
        body = typ + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_image_pixels_real_png(spark):
    """Real PNG pixel decode: known pixel values round-trip through
    zlib + all four nontrivial filters and produce exact luma stats."""
    from icnarc_to_philips_linkage_spark.operators.multimodal import (
        decode_image_pixels,
    )

    # 4x4 RGB gradient, one row per filter type (0, 1, 2, 4)
    rows = [
        [((x * 60 + y * 10) % 256,) * 3 for x in range(4)] for y in range(4)
    ]
    png = _make_png(4, 4, rows, color_type=2, filters=[0, 1, 2, 4])
    import numpy as np

    flat = np.array(
        [v / 255.0 for r in rows for px in r for v in px[:3]]
    ).reshape(16, 3)
    want_mean = flat.mean(axis=1).mean()
    want_std = flat.mean(axis=1).std()

    data = [
        (1, "image", bytearray(png)),
        (2, "image", bytearray(b"nonsense")),
    ]
    df = spark.createDataFrame(
        data, "media_id long, media_type string, payload binary"
    )
    out = {r.media_id: r for r in decode_image_pixels(df).collect()}
    good = out[1]
    assert (good.width, good.height, good.channels) == (4, 4, 3)
    assert good.mean_luma == pytest.approx(want_mean, abs=1e-9)
    assert good.std_luma == pytest.approx(want_std, abs=1e-9)
    assert out[2].mean_luma is None
