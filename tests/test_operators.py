"""Unit tests for the training-data operators (dedup / similarity / text /
multimodal) on small hand-checkable inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gfe_db_spark.operators import dedup as DD
from gfe_db_spark.operators import multimodal as MM
from gfe_db_spark.operators import similarity as SIM
from gfe_db_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the sleepy dog"),  # near dup
        (4, "completely different content about spark engines"),
        (5, "ab"),  # shorter than any shingle window
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    out = {r["representative"]: r["n_docs"] for r in DD.exact_dedup(docs).collect()}
    assert out[1] == 2  # docs 1 and 2 collapse
    assert out[3] == 1 and out[4] == 1


def test_shingles_and_jaccard(docs):
    sh = DD.shingles(docs, n=3)
    by_doc = sh.groupBy("doc_id").count().collect()
    counts = {r["doc_id"]: r["count"] for r in by_doc}
    assert counts[1] == 7  # 9 tokens → 7 shingles
    assert 5 not in counts  # too short → no shingles
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(sh, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical docs
    assert 0.3 <= pairs[(1, 3)] < 1.0  # near dup
    assert (1, 4) not in pairs


def test_minhash_lsh_recall(docs):
    sigs = DD.minhash_signatures(DD.shingles(docs, n=3), num_hashes=8)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in DD.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2).collect()
    }
    assert (1, 2) in pairs  # identical docs always collide on every band
    assert (1, 4) not in pairs


def test_deterministic_split(spark):
    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    out = TX.deterministic_split(docs)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    # hash buckets track the 80/10/10 ratios on 2000 ids (loose bounds)
    assert 0.7 < counts["train"] / 2000 < 0.9
    assert 0.05 < counts["val"] / 2000 < 0.15
    assert 0.05 < counts["test"] / 2000 < 0.15
    # assignment is a pure function of (id, salt): repartitioning must not
    # move any document, and a different salt must produce a different split
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in TX.deterministic_split(docs.repartition(7)).collect()
    }
    assert a == b
    c = {r["doc_id"]: r["split"] for r in TX.deterministic_split(docs, salt="v2").collect()}
    assert a != c


def test_vocab_top_tokens(docs):
    out = TX.vocab_top_tokens(docs, k=3).collect()
    assert [r["token"] for r in out[:1]] == ["the"]  # 5 occurrences
    freqs = [r["freq"] for r in out]
    assert freqs == sorted(freqs, reverse=True)


def test_simhash(docs):
    out = {r["doc_id"]: r["simhash64"] for r in DD.simhash(docs).collect()}
    assert out[1] == out[2]
    # near-dup → small hamming distance
    ham = bin((out[1] ^ out[3]) & ((1 << 64) - 1)).count("1")
    assert ham < 16
    ham_far = bin((out[1] ^ out[4]) & ((1 << 64) - 1)).count("1")
    assert ham_far > ham


def test_simhash_null_in_batch_keeps_int64_exact(spark):
    """A NULL text sharing an Arrow batch with real texts must not
    perturb the other fingerprints: the old `Series.map` return coerced
    a mixed int/None batch to float64, silently corrupting the low bits
    of any fingerprint beyond 2^53 (r13 — the UDF now builds an object
    Series). The gold value is recomputed here with the same algorithm
    row-at-a-time and is deliberately NOT float64-representable."""
    import hashlib

    import numpy as np

    text = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    toks = text.split()
    digs = np.frombuffer(
        b"".join(hashlib.md5(t.encode()).digest()[:8] for t in toks),
        dtype=np.uint8,
    ).reshape(-1, 8)
    ones = np.unpackbits(digs, axis=1, bitorder="little").sum(axis=0, dtype=np.int64)
    mask = (2 * ones > len(toks)).astype(np.uint8)
    v = int.from_bytes(np.packbits(mask, bitorder="little").tobytes(), "little")
    gold = v - (1 << 64) if v >= (1 << 63) else v
    assert abs(gold) > 2**53 and int(float(gold)) != gold  # exercises the trap
    rows = [(i, None if i % 2 == 0 else text) for i in range(512)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["simhash64"] for r in DD.simhash(df).collect()}
    assert all(out[i] is None for i in range(0, 512, 2))
    assert all(out[i] == gold for i in range(1, 512, 2))


def test_spread_small_input_keyed_is_deterministic(spark):
    """Keyed spread (r13): hash partitioning on the unique id — row-set
    preserved, full parallelism reached, and placement identical across
    evaluations (round-robin placement depended on input order under
    retries; hash of the id cannot)."""
    from pyspark.sql import functions as F

    from gfe_db_spark.operators import spread_small_input

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "doc_id long, text string"
    ).coalesce(1)
    out = spread_small_input(df, key="doc_id")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(100))
    place1 = {
        r["doc_id"]: r["p"]
        for r in out.withColumn("p", F.spark_partition_id()).collect()
    }
    place2 = {
        r["doc_id"]: r["p"]
        for r in out.withColumn("p", F.spark_partition_id()).collect()
    }
    assert place1 == place2
    assert len(set(place1.values())) > 1  # actually spread, not one bucket


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),  # duplicate of 0
        (2, [0.9, 0.1, 0.0, 0.0]),  # near
        (3, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_embedding_neardup(vectors):
    pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in DD.embedding_neardup_pairs(vectors, threshold=0.95).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 3) not in pairs and (0, 4) not in pairs


def test_brute_force_topk(vectors):
    top = SIM.brute_force_topk(vectors, [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in top] == [0, 1, 2]
    assert top[0]["cos"] == 1.0


def test_ivf(vectors):
    centroids = vectors.filter(F.col("vec_id").isin(0, 3)).select(
        F.col("vec_id").cast("int").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    assigned = SIM.ivf_assign(vectors, centroids)
    amap = {r["vec_id"]: r["centroid_id"] for r in assigned.collect()}
    assert amap[1] == 0 and amap[2] == 0 and amap[3] == 3
    top = SIM.ivf_topk(assigned, centroids, [1.0, 0.0, 0.0, 0.0], k=2, n_probe=1).collect()
    assert [r["vec_id"] for r in top] == [0, 1]


def test_lsh_buckets_deterministic(vectors):
    b1 = {r["vec_id"]: r["bucket"] for r in SIM.random_hyperplane_buckets(vectors, 4, dim=4).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in SIM.random_hyperplane_buckets(vectors, 4, dim=4).collect()}
    assert b1 == b2  # deterministic planes
    assert b1[0] == b1[1]  # identical vectors share buckets
    assert b1[0] != b1[4]  # opposite vectors flip every sign


def test_text_ops(spark):
    docs = spark.createDataFrame(
        [(1, "The quick fox! He is the best."), (2, "der hund und die katze ist da")],
        ["doc_id", "text"],
    )
    q = {r["doc_id"]: r for r in TX.quality_features(docs).collect()}
    assert q[1]["n_tokens"] == 7
    assert q[1]["punct_ratio"] > 0
    assert q[2]["punct_ratio"] == 0.0
    langs = {r["doc_id"]: r["lang_pred"] for r in TX.lang_scores(docs).collect()}
    assert langs[1] == "en" and langs[2] == "de"
    fp = {r["doc_id"]: r["fingerprint"] for r in TX.fingerprint(docs, k=4).collect()}
    assert fp[1] is not None and len(fp[1]) == 32
    short = spark.createDataFrame([(9, "one two")], ["doc_id", "text"])
    assert TX.fingerprint(short, k=4).collect()[0]["fingerprint"] is None


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", bytearray(b"fake-png-bytes"), (64, 48, None)),
        (2, "video", "video/mp4", bytearray(b"fake-mp4-bytes"), (640, 480, 3500)),
        (3, "audio", "audio/wav", None, (None, None, 2000)),
    ]
    return spark.createDataFrame(rows, schema=MM.MEDIA_SCHEMA)


def test_multimodal_features(media):
    out = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert out[1]["n_bytes"] == len(b"fake-png-bytes")
    assert len(out[1]["feature"]) == 8  # stub decoder contract
    assert out[3]["feature"] is None  # null payload propagates
    # deterministic stub: same payload → same feature
    again = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert out[1]["feature"] == again[1]["feature"]


def test_multimodal_resize_and_frames(media):
    resized = {r["media_id"]: r for r in MM.resize_images(media, 32, 32).collect()}
    assert resized[1]["meta"]["width"] == 32 and resized[1]["meta"]["height"] == 32
    # a fake payload is an ERROR now that the BMP resizer is real
    assert resized[1]["payload"] is None and resized[1]["resize_error"] is not None
    frames = MM.sample_video_frames(media, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]
    assert all(r["media_id"] == 2 for r in frames)


def test_bmp_resize_nearest_real(spark):
    """Real nearest-neighbor BMP resize: hand-checkable upscale (each
    source pixel becomes a 2x2 block), downscale round-trips through the
    decoder with correct dimensions, and non-image rows pass through."""
    from gfe_db_spark.operators.multimodal import (
        decode_bmp_rgb24,
        encode_bmp_rgb24,
        resize_bmp_nearest,
    )

    # 2x1 image: left pixel (1,2,3), right pixel (4,5,6) → 4x2 blocks
    src = encode_bmp_rgb24(2, 1, bytes([1, 2, 3, 4, 5, 6]))
    up = resize_bmp_nearest(src, 4, 2)
    w, h, mean = decode_bmp_rgb24(up)
    assert (w, h) == (4, 2)
    assert mean == (2 * (1 + 2 + 3) + 2 * (4 + 5 + 6)) * 2 / 24

    big = encode_bmp_rgb24(8, 4, bytes(range(96)))
    down = resize_bmp_nearest(big, 2, 2)
    assert decode_bmp_rgb24(down)[:2] == (2, 2)

    rows = [
        (1, "image", encode_bmp_rgb24(4, 4, bytes(48)), {"width": 4, "height": 4, "duration_ms": None}),
        (2, "audio", b"not-an-image", {"width": None, "height": None, "duration_ms": None}),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,duration_ms:int>",
    )
    got = {r.media_id: r for r in MM.resize_images(media, 2, 2).collect()}
    assert decode_bmp_rgb24(bytes(got[1].payload))[:2] == (2, 2)
    assert got[1].resize_error is None
    assert bytes(got[2].payload) == b"not-an-image" and got[2].resize_error is None


def test_ann_topk_join_contract(spark):
    """Every emitted neighbor is a true bucket-neighborhood candidate with
    the exact cosine, ranks are dense from 1 per vector, and an exact
    duplicate vector is always its twin's #1 neighbor."""
    from pyspark.sql import functions as F

    from gfe_db_spark.operators.similarity import ann_topk_join
    from gfe_db_spark.sources.tables import table
    from tests.conftest import SF_SMOKE

    emb = table(spark, SF_SMOKE, "embeddings")
    first = emb.limit(1).collect()[0]
    dup = spark.createDataFrame([(999999, list(first.embedding), first.label)], emb.schema)
    out = ann_topk_join(emb.unionByName(dup), k=3, n_planes=6, probe_bits=1).collect()

    by_vec = {}
    for r in out:
        by_vec.setdefault(r.vec_id, []).append(r)
    for rows in by_vec.values():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        ordered = sorted(rows, key=lambda r: r.rank)
        assert all(a.cos >= b.cos for a, b in zip(ordered, ordered[1:]))
    # identical vector (Hamming 0) must surface as the top neighbor
    assert by_vec[999999][0].neighbor_id == first.vec_id
    assert by_vec[999999][0].cos == 1.0


def test_quantize_embeddings_roundtrip_bound(spark):
    """Quantization error per element is ≤ scale/2 (the rounding bound),
    so rms_err ≤ scale/2; values fit int8 range."""
    from gfe_db_spark.operators.similarity import quantize_embeddings
    from gfe_db_spark.sources.tables import table
    from tests.conftest import SF_SMOKE

    emb = table(spark, SF_SMOKE, "embeddings")
    for r in quantize_embeddings(emb).collect():
        assert all(-128 <= q <= 127 for q in r.q)
        assert r.rms_err <= r.scale / 2 + 1e-12


def test_repetition_stats_signals(spark):
    """Hand-computable repetition cases: a looping doc scores high on both
    signals, a unique-token doc scores 0, single-token and empty docs get
    the documented null/absent treatment."""
    from gfe_db_spark.operators.text import repetition_stats

    rows = [
        (1, "a a a a"),         # dup 3/4, top bigram 'a a' 3 of 3
        (2, "w x y z"),         # no repetition
        (3, "solo"),            # no bigrams → null frac
        (4, "  "),              # tokenless → dropped
        (5, "b c b c b"),       # dup 3/5; 'b c' 2 of 4
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert set(got) == {1, 2, 3, 5}
    assert (got[1].n_tokens, got[1].dup_token_frac, got[1].top_bigram_frac) == (4, 0.75, 1.0)
    assert (got[2].dup_token_frac, got[2].top_bigram_frac) == (0.0, round(1 / 3, 6))
    assert got[3].top_bigram_frac is None
    assert (got[5].dup_token_frac, got[5].top_bigram_frac) == (0.6, 0.5)


def test_pack_sequences_contiguous_invariants(spark):
    """Packing invariants on real docs: pack_id equals the chunk holding
    the doc's start offset, crossings match the per-shard running sum, and
    shard assignment is the deterministic md5 gate (recomputed in plain
    Python)."""
    import hashlib

    from gfe_db_spark.operators.packing import pack_fill_stats, pack_sequences
    from gfe_db_spark.sources.tables import table
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    cap = 128
    out = pack_sequences(docs, max_tokens=cap, n_shards=8)
    rows = sorted(out.collect(), key=lambda r: (r.shard, r.doc_id))
    assert len(rows) == docs.count()
    running = {}
    for r in rows:
        h = hashlib.md5(f"{r.doc_id}:pack".encode()).digest()
        gate = int.from_bytes(h[:4], "little") % 10000
        assert r.shard == gate % 8
        start = running.get(r.shard, 0)
        assert r.pack_id == start // cap
        assert r.crosses_boundary == (
            r.n_tokens > 0 and (start + r.n_tokens - 1) // cap > start // cap
        )
        running[r.shard] = start + r.n_tokens
    fills = pack_fill_stats(out, max_tokens=cap).collect()
    assert all(f.n_docs >= 1 and f.tokens_started >= 0 for f in fills)


def test_contamination_counts_planted(spark):
    """A doc sharing a 3-gram with the benchmark is flagged with the exact
    overlap count; disjoint docs report zero. Benchmark docs contaminate
    themselves fully (the self-report a real scan must produce)."""
    from gfe_db_spark.operators.dedup import contamination_counts

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "completely different words here now"),
            (3, "we said the quick brown fox runs"),
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 1")
    got = {r.doc_id: r for r in contamination_counts(docs, bench, n=3).collect()}
    assert got[1].contaminated and got[1].n_contaminated == got[1].n_shingles == 3
    assert not got[2].contaminated and got[2].n_contaminated == 0
    # doc 3 shares 'the quick brown' and 'quick brown fox'
    assert got[3].contaminated and got[3].n_contaminated == 2


def test_stratified_sample_exact_gate(spark):
    """The kept set is exactly the per-stratum hash gate (recomputed in
    plain Python) — determinism and rate assignment in one check."""
    import hashlib

    from gfe_db_spark.operators.text import STRATA_DEFAULT_BP, STRATA_RATES_BP, stratified_sample
    from gfe_db_spark.sources.tables import table
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    kept = {r.doc_id for r in stratified_sample(docs).collect()}
    expect = set()
    for r in docs.select("doc_id", "lang").collect():
        h = hashlib.md5(f"{r.doc_id}:strat".encode()).digest()
        gate = int.from_bytes(h[:4], "little") % 10000
        if gate < STRATA_RATES_BP.get(r.lang, STRATA_DEFAULT_BP):
            expect.add(r.doc_id)
    assert kept == expect and kept


def test_lm_cross_entropy_orders_fluency(spark):
    """Docs made of corpus-frequent bigrams score lower cross-entropy than
    docs of one-off bigrams; a deterministic hand-check pins the math:
    -ln p for a bigram seen c_ab times after a first token seen c_a times
    is ln(c_a) - ln(c_ab)."""
    import math

    from gfe_db_spark.operators.text import lm_cross_entropy

    rows = [
        (1, "x y x y x y"),   # 'x y' dominant
        (2, "x y x y"),
        (3, "x q"),           # rare continuation of a common first token
        (4, "solo"),          # no bigrams → absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in lm_cross_entropy(docs).collect()}
    assert set(got) == {1, 2, 3}
    # corpus counts: c('x y')=5, c('y x')=3, c('x q')=1 → c('x',·)=6, c('y',·)=3
    h_xy = math.log(6) - math.log(5)
    h_yx = math.log(3) - math.log(3)
    h_xq = math.log(6) - math.log(1)
    assert got[1].n_bigrams == 5
    assert got[1].avg_neg_logp == round((3 * h_xy + 2 * h_yx) / 5, 6)
    assert got[3].avg_neg_logp == round(h_xq, 6)
    assert got[3].avg_neg_logp > got[1].avg_neg_logp  # rare ⇒ higher entropy


def test_hyperplane_and_probe_masks_pinned():
    """Hard-coded expected outputs for the generators SHARED between the
    Spark operators and their DuckDB oracle SQL (queries/lsh_sql.py). The
    oracle is derived from these same fragments, so a generator bug would
    cancel out in the hash-check; pinning literal values here keeps the
    generator itself independently verified. Recompute by hand:
    coordinate d of plane p = int(md5(f"{p}:{d}")[:8]) / 2**63 - 1."""
    import hashlib

    from gfe_db_spark.operators.dedup import probe_masks
    from gfe_db_spark.operators.similarity import hyperplane

    assert hyperplane(0, 4) == [
        -0.5103722530494315,
        0.013964474207067479,
        0.6273674092571808,
        0.3449757675994314,
    ]
    # independent recomputation straight from the definition
    h = hashlib.md5(b"3:1").digest()
    assert hyperplane(3, 2)[1] == int.from_bytes(h[:8], "big") / float(1 << 63) - 1.0
    # probe neighborhooods: identity, then single-bit, then 2-bit XOR masks
    assert probe_masks(8, 1) == [0, 1, 2, 4, 8, 16, 32, 64, 128]
    assert probe_masks(4, 2) == [0, 1, 2, 4, 8, 3, 5, 9, 6, 10, 12]


def test_deterministic_sample_stable_and_composable(spark):
    """Same (id, salt) → same kept set on every run; disjoint salts give
    different cuts; rate scales the kept fraction."""
    from gfe_db_spark.operators.text import deterministic_sample
    from gfe_db_spark.sources.tables import table
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    s1 = {r.doc_id for r in deterministic_sample(docs, 2000).select("doc_id").collect()}
    s2 = {r.doc_id for r in deterministic_sample(docs, 2000).select("doc_id").collect()}
    assert s1 == s2  # reproducible
    bigger = {
        r.doc_id for r in deterministic_sample(docs, 5000).select("doc_id").collect()
    }
    assert s1 <= bigger  # rate is a nested gate, not a reshuffle
    n = docs.count()
    assert 0 < len(s1) < n


def test_minhash_estimate_exact_duplicates_score_one(spark):
    """Identical docs share every signature component → estimate 1.0;
    estimates live in [0, 1]."""
    from gfe_db_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_jaccard_estimate,
        minhash_signatures,
        shingles,
    )

    rows = [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w q v")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(shingles(docs, distinct=False))
    pairs = lsh_candidate_pairs(sigs)
    est = {
        (r.doc_a, r.doc_b): r.jaccard_est
        for r in minhash_jaccard_estimate(sigs, pairs).collect()
    }
    assert est[(1, 2)] == 1.0
    assert all(0.0 <= v <= 1.0 for v in est.values())


def test_bmp_wav_roundtrip_and_error_channel(spark):
    """The real media codecs: encode→decode is exact (dimensions, rate,
    content mean); corrupt payloads land in decode_error, never a wrong
    row."""
    from gfe_db_spark.operators.multimodal import (
        decode_bmp_rgb24,
        decode_media_stats,
        decode_wav_pcm8,
        encode_bmp_rgb24,
        encode_wav_pcm8,
    )

    px = bytes(range(96))
    w, h, mean = decode_bmp_rgb24(encode_bmp_rgb24(8, 4, px))
    assert (w, h) == (8, 4)
    assert mean == sum(px) / 96
    # odd width exercises row padding
    w2, h2, mean2 = decode_bmp_rgb24(encode_bmp_rgb24(3, 2, bytes(range(18))))
    assert (w2, h2) == (3, 2)
    assert mean2 == sum(range(18)) / 18

    n, rate, smean = decode_wav_pcm8(encode_wav_pcm8(44100, bytes([5, 10, 15])))
    assert (n, rate, smean) == (3, 44100, 10.0)

    rows = [
        (1, "image", encode_bmp_rgb24(4, 4, bytes(48))),
        (2, "audio", encode_wav_pcm8(8000, bytes([1, 2, 3, 4]))),
        (3, "image", b"not a bitmap"),
        (4, "video", b"whatever"),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r.media_id: r for r in decode_media_stats(media).collect()}
    assert (got[1].width, got[1].height, got[1].mean_value) == (4, 4, 0.0)
    assert (got[2].n_samples, got[2].sample_rate, got[2].mean_value) == (4, 8000, 2.5)
    assert got[3].decode_error is not None and got[3].width is None
    assert "no decoder" in got[4].decode_error


def test_png_roundtrip_filters_and_errors(spark):
    """The zlib PNG codec: encode→decode is exact; every scanline filter
    type (Sub/Up/Average/Paeth) unfilters correctly against an
    independently hand-filtered stream; corrupt/forged payloads raise or
    land in decode_error."""
    import struct
    import zlib

    import pytest as _pytest

    from gfe_db_spark.operators.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_media_stats,
        decode_png,
        encode_bmp_rgb24,
        encode_png_rgb8,
    )

    px = bytes(range(96))
    w, h, mean = decode_png(encode_png_rgb8(8, 4, px))
    assert (w, h) == (8, 4)
    assert mean == sum(px) / 96

    # hand-filter a 2x2 grayscale image with each nontrivial filter type
    # and check the decoder recovers the intended pixels
    pixels = [[10, 20], [30, 250]]

    def build(filters):
        raw = bytearray()
        prev = [0, 0]
        for r, ftype in enumerate(filters):
            line = pixels[r]
            raw.append(ftype)
            for i, x in enumerate(line):
                left = line[i - 1] if i else 0
                up = prev[i]
                ul = prev[i - 1] if i else 0
                if ftype == 0:
                    raw.append(x)
                elif ftype == 1:
                    raw.append((x - left) & 0xFF)
                elif ftype == 2:
                    raw.append((x - up) & 0xFF)
                elif ftype == 3:
                    raw.append((x - (left + up) // 2) & 0xFF)
                elif ftype == 4:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    raw.append((x - pred) & 0xFF)
            prev = line
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 8-bit grayscale
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )

    expect = sum(sum(r) for r in pixels) / 4
    for filters in ([1, 2], [3, 4], [4, 3], [0, 4]):
        assert decode_png(build(filters))[2] == expect, f"filters {filters}"

    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"nope")
    with _pytest.raises(ValueError, match="unsupported PNG variant"):
        bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)  # 16-bit
        decode_png(_PNG_SIG + _png_chunk(b"IHDR", bad_ihdr) + _png_chunk(b"IEND", b""))
    # dimension forgery: header says 8x8 but the stream holds 2x2
    good = encode_png_rgb8(2, 2, bytes(12))
    forged = bytearray(good)
    ihdr_at = len(_PNG_SIG) + 8
    struct.pack_into(">II", forged, ihdr_at, 8, 8)
    with _pytest.raises(ValueError, match="mismatch|truncated|invalid|error"):
        decode_png(bytes(forged))

    # the distributed path sniffs the container per payload
    rows = [
        (1, "image", encode_png_rgb8(4, 4, bytes(48))),
        (2, "image", encode_bmp_rgb24(4, 4, bytes(48))),
        (3, "image", _PNG_SIG + b"garbage-after-signature"),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r.media_id: r for r in decode_media_stats(media).collect()}
    assert (got[1].width, got[1].height, got[1].mean_value) == (4, 4, 0.0)
    assert (got[2].width, got[2].height, got[2].mean_value) == (4, 4, 0.0)
    assert got[3].decode_error is not None and got[3].width is None


def test_ivf_train_deterministic_and_improves(spark):
    """k-means training: deterministic across runs; distortion (mean
    distance to assigned centroid) does not increase with more
    iterations; trained centroids beat the untrained init."""
    from pyspark.sql import functions as F

    from gfe_db_spark.operators.dedup import cosine
    from gfe_db_spark.operators.similarity import ivf_assign, ivf_train
    from gfe_db_spark.sources.tables import table
    from tests.conftest import SF_SMOKE

    emb = table(spark, SF_SMOKE, "embeddings")

    def distortion(cents):
        a = ivf_assign(emb, cents)
        scored = a.join(F.broadcast(cents), "centroid_id").select(
            cosine(
                F.col("embedding").cast("array<double>"),
                F.col("centroid").cast("array<double>"),
            ).alias("cos")
        )
        return scored.agg(F.avg("cos")).collect()[0][0]

    c0 = ivf_train(emb, k=4, iters=0)
    c2 = ivf_train(emb, k=4, iters=2)
    c2_again = ivf_train(emb, k=4, iters=2)
    assert [r.asDict() for r in c2.collect()] == [r.asDict() for r in c2_again.collect()]
    assert distortion(c2) >= distortion(c0) - 1e-9  # cosine: higher = tighter


def test_wav_chunk_walk_and_bmp_truncation():
    """Review regressions: an 18-byte fmt chunk (PCM + cbSize) decodes
    correctly; truncated BMPs and dimension-forging headers raise."""
    import struct

    import pytest

    from gfe_db_spark.operators.multimodal import (
        decode_bmp_rgb24,
        decode_wav_pcm8,
        encode_bmp_rgb24,
    )

    samples = bytes([10, 20, 30, 40])
    fmt18 = struct.pack("<HHIIHHH", 1, 1, 8000, 8000, 1, 8, 0)  # cbSize=0
    wav18 = (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt18) + 8 + len(samples), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt18)) + fmt18
        + struct.pack("<4sI", b"data", len(samples)) + samples
    )
    assert decode_wav_pcm8(wav18) == (4, 8000, 25.0)

    good = encode_bmp_rgb24(8, 4, bytes(96))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp_rgb24(good[:-10])
    forged = bytearray(good)
    struct.pack_into("<i", forged, 22, 2**30)  # hostile height
    with pytest.raises(ValueError, match="truncated|invalid"):
        decode_bmp_rgb24(bytes(forged))


def test_redact_pii_replaces_and_counts(spark):
    from gfe_db_spark.operators.text import redact_pii

    rows = [
        (1, "mail me at jo.doe+x@example.org or call +1 (555) 123-4567 now"),
        (2, "see https://example.com/a?b=c and http://foo.bar"),
        (3, "clean text, nothing to scrub"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert got[1].n_email == 1 and got[1].n_phone == 1
    assert "<EMAIL>" in got[1].text_redacted and "<PHONE>" in got[1].text_redacted
    assert "example.org" not in got[1].text_redacted
    assert got[2].n_url == 2 and got[2].text_redacted.count("<URL>") == 2
    assert got[3].text_redacted == rows[2][1]


def test_chunk_documents_cover_and_overlap(spark):
    from gfe_db_spark.operators.text import chunk_documents

    rows = [
        (1, "a" * 50),            # shorter than one chunk → 1 partial chunk
        (2, "b" * 200),           # exactly one chunk
        (3, "x" * 201),           # one char past → 2 chunks
        (4, "".join(chr(97 + i % 26) for i in range(520))),  # 4 chunks
        (5, ""),                  # empty doc still yields one empty chunk
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(docs, chunk_chars=200, stride=150).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r.chunk_idx)

    assert [len(by_doc[d]) for d in (1, 2, 3, 4, 5)] == [1, 1, 2, 4, 1]
    # every chunk is the exact substring at its stride offset, and the
    # concatenation of each chunk's non-overlapping tail reconstructs the doc
    text = dict(rows)
    for doc_id, rs in by_doc.items():
        rebuilt = ""
        for r in rs:
            start = r.chunk_idx * 150
            assert r.chunk_text == text[doc_id][start : start + 200]
            assert r.chunk_len == len(r.chunk_text) <= 200
            assert r.n_chunks == len(rs)
            rebuilt += r.chunk_text[len(rebuilt) - start :] if start < len(rebuilt) else r.chunk_text
        assert rebuilt == text[doc_id]


def test_mixture_resample_hits_target_mixture(spark):
    from gfe_db_spark.operators.text import mixture_resample

    # 3 domains, heavily imbalanced: target weights 2:1:1
    rows = [(i, "heavy") for i in range(1000)]
    rows += [(10_000 + i, "mid") for i in range(300)]
    rows += [(20_000 + i, "rare") for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_resample(
        docs, weights={"heavy": 2, "mid": 1, "rare": 1}, default_weight=1
    )
    kept = out.groupBy("source").count().collect()
    by_src = {r.source: r["count"] for r in kept}
    # T = min(1000*4/2, 300*4/1, 120*4/1) = 480; targets: 240/120/120,
    # gated by hash < rate_bp so kept counts approximate the target
    assert by_src["rare"] <= 120
    total = sum(by_src.values())
    share_heavy = by_src["heavy"] / total
    assert 0.4 < share_heavy < 0.6  # target 0.5, hash-gate jitter allowed
    # rerun is byte-identical (deterministic gate)
    again = mixture_resample(
        docs, weights={"heavy": 2, "mid": 1, "rare": 1}, default_weight=1
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_rolling_spend_window_matches_naive(spark):
    from gfe_db_spark.queries.relational import rolling_spend_7d
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 1, 1)
    # customer 1: orders every 3 days → frames overlap pairwise
    for i in range(6):
        rows.append((i, 1, 10.0 * (i + 1), base + dt.timedelta(days=3 * i)))
    # customer 2: single order
    rows.append((100, 2, 5.0, base))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
    )
    import tempfile, os

    tmp = tempfile.mkdtemp(prefix="roll_")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "orders.parquet"))
    got = {r.o_orderkey: r for r in rolling_spend_7d(spark, tmp).collect()}
    # naive recomputation
    for k, cust, price, ts in rows:
        expect = sum(
            p for (_, c, p, t) in rows
            if c == cust and 0 <= (ts - t).days <= 7
        )
        assert abs(got[k].spend_7d - expect) < 1e-9, (k, got[k].spend_7d, expect)
    assert got[0].n_orders_7d == 1 and got[1].n_orders_7d == 2


def test_morton_interleave_known_values(spark):
    from gfe_db_spark.operators import layout as LAY

    df = spark.createDataFrame([(3, 1), (0, 0), (1023, 0), (0, 1023)], ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", LAY.morton_interleave(F.col("x"), F.col("y"), bits=10).alias("z")
        ).collect()
    }
    # x bits land on even positions, y bits on odd: (3,1) → 0b0111
    assert got[(3, 1)] == 7
    assert got[(0, 0)] == 0
    # 10 one-bits spread to alternating positions
    assert got[(1023, 0)] == 0b01010101010101010101
    assert got[(0, 1023)] == 0b1010101010101010101 << 1


def test_zorder_write_files_are_z_contiguous(spark, tmp_path):
    """repartitionByRange guarantees disjoint z-ranges per output file —
    the property that gives min/max file skipping on both dimensions."""
    from gfe_db_spark.operators import layout as LAY

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, ["x", "y"])
    path = str(tmp_path / "zorder")
    LAY.zorder_write(df, path, "x", "y", bits=4, n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 256 and set(back.columns) == {"x", "y"}
    z = LAY.morton_interleave(F.col("x"), F.col("y"), bits=4)
    per_file = (
        back.select(F.input_file_name().alias("f"), z.alias("z"))
        .groupBy("f")
        .agg(F.min("z").alias("zmin"), F.max("z").alias("zmax"))
        .collect()
    )
    assert len(per_file) > 1
    spans = sorted((r.zmin, r.zmax) for r in per_file)
    for (a_min, a_max), (b_min, b_max) in zip(spans, spans[1:]):
        assert a_max < b_min, f"overlapping z-ranges: {spans}"


def test_shuffle_order_deterministic_and_complete(spark):
    from gfe_db_spark.operators import layout as LAY

    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    a = LAY.shuffle_order(df, seed=42).collect()
    b = LAY.shuffle_order(df, seed=42).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    assert sorted(r.doc_id for r in a) == list(range(200))  # a permutation
    # per-shard positions are contiguous 1..n
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # a different seed produces a different order (not a different set)
    c = LAY.shuffle_order(df, seed=7).collect()
    key_a = {r.doc_id: r.shuffle_key for r in a}
    key_c = {r.doc_id: r.shuffle_key for r in c}
    assert key_a != key_c


def test_incremental_dup_flags_planted(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "spark engines process relational data at scale"),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # dup of 1
            (11, "an entirely novel document about astronomy and telescopes"),
        ],
        ["doc_id", "text"],
    )
    cs = DD.minhash_signatures(DD.shingles(corpus, n=3), num_hashes=8)
    bs = DD.minhash_signatures(DD.shingles(batch, n=3), num_hashes=8)
    got = {r.doc_id: r.is_dup for r in DD.incremental_dup_flags(cs, bs).collect()}
    assert got == {10: True, 11: False}


def test_pq_self_codes_and_adc_zero(spark):
    """Codeword-source vectors encode to their own id in every subspace
    (self-distance 0), and the query's own ADC distance is exactly 0."""
    from tests.conftest import SF_SMOKE
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cb = SIM.pq_codebook(emb, m=4, ks=8)
    assert cb.count() == 32
    codes = SIM.pq_encode(emb, cb, m=4)
    own = {
        r.vec_id: r.codes
        for r in codes.filter(F.col("vec_id") < 8).collect()
    }
    for vid, cs in own.items():
        assert cs == [vid] * 4, (vid, cs)
    query = emb.filter(F.col("vec_id") == 0).select("embedding")
    top = SIM.pq_adc_topk(codes, cb, query, k=1, m=4).collect()
    assert top[0].vec_id == 0 and top[0].adc_d2 == 0.0


def test_bpe_merge_pair_overlap_semantics(spark):
    """Greedy leftmost-non-overlapping merge: 'aaa' with pair (a,a) gives
    [aa, a]; 'aaaa' gives [aa, aa]; a merged token never re-merges."""
    from gfe_db_spark.operators import bpe as BPE

    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["a", "b", "a", "b"],), (["x"],)],
        ["s"],
    )
    got = [r.m for r in df.select(BPE.merge_pair(F.col("s"), "a", "a").alias("m")).collect()]
    assert got[0] == ["aa", "a"]
    assert got[1] == ["aa", "aa"]
    assert got[2] == ["a", "b", "a", "b"]
    assert got[3] == ["x"]
    got_ab = [r.m for r in df.select(BPE.merge_pair(F.col("s"), "a", "b").alias("m")).collect()]
    assert got_ab[2] == ["ab", "ab"]


def test_bpe_train_hand_checked(spark):
    """Tiny corpus with a known merge sequence: 'low' x3 + 'lower' x1 →
    first merge is (l,o) with weighted count 4, then (lo,w) with 4."""
    from gfe_db_spark.operators import bpe as BPE

    docs = spark.createDataFrame(
        [(1, "low low low lower")],
        ["doc_id", "text"],
    )
    merges, syms = BPE.bpe_train(BPE.word_frequencies(docs), n_merges=2)
    assert merges[0][1:3] == ("l", "o") and merges[0][3] == 4
    assert merges[1][1:3] == ("lo", "w") and merges[1][3] == 4
    out = {r.word: r.s for r in syms.collect()}
    assert out["low"] == ["low"]
    assert out["lower"] == ["low", "e", "r"]


def test_pit_join_exactly_one_interval_per_probe(spark):
    """SCD2 point-in-time invariant: validity intervals partition each
    customer's timeline from first order onward, so every probe (order
    date + 30d, always ≥ that customer's first valid_from) matches
    EXACTLY one interval — n_probes summed over the result equals the
    order count, with no probe duplicated or dropped by the join."""
    from tests.conftest import SF_SMOKE

    from gfe_db_spark.queries.warehouse import scd2_point_in_time_join
    from gfe_db_spark.sources.tables import table

    out = scd2_point_in_time_join(spark, SF_SMOKE)
    n_orders = table(spark, SF_SMOKE, "orders").count()
    assert out.agg(F.sum("n_probes")).first()[0] == n_orders


def test_cdc_apply_tombstones_partition_keys(spark):
    """CDC apply invariant: result keys and tombstoned keys (latest op =
    'D') exactly partition the full key set — a delete followed by no
    re-insert removes the key; everything else survives."""
    from tests.conftest import SF_SMOKE

    from gfe_db_spark.queries.warehouse import cdc_apply_changelog
    from gfe_db_spark.sources.tables import table

    ev = table(spark, SF_SMOKE, "events")
    out_keys = {r.key for r in cdc_apply_changelog(spark, SF_SMOKE).select("key").collect()}
    latest = (
        ev.groupBy("user_id")
        .agg(F.max_by("event_type", F.struct("ts", "event_id")).alias("last_type"))
        .collect()
    )
    tombstoned = {r.user_id for r in latest if r.last_type == "error"}
    all_keys = {r.user_id for r in latest}
    assert out_keys == all_keys - tombstoned
    assert tombstoned, "fixture must exercise the delete path"


def test_set_similarity_join_planted_pairs(spark):
    """Planted corpus with hand-computed Jaccards around the 3/5 threshold:
    {a,b,c,d,e}x{a,b,c,d,f}: inter 4, union 6 → 2/3 ≥ 3/5 → kept;
    {a,b,c,d,e}x{a,b,g,h,i}: inter 2, union 8 → 1/4 < 3/5 → dropped;
    exact duplicates → jaccard 1.0 kept."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d f"),
            (3, "a b g h i"),
            (4, "a b c d e"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.da, r.db): r.jaccard
        for r in DD.set_similarity_join(docs, 3, 5).collect()
    }
    assert set(out) == {(1, 2), (1, 4), (2, 4)}
    assert out[(1, 4)] == 1.0


def test_priority_sample_weight_monotone(spark):
    """Priority sampling invariant: with equal hash-uniforms impossible,
    check determinism (two runs identical) and that k rows come back with
    priorities sorted descending."""
    from tests.conftest import SF_SMOKE

    from gfe_db_spark.sources.tables import table

    docs = table(spark, SF_SMOKE, "documents")
    s1 = TX.priority_sample(docs, k=20).collect()
    s2 = TX.priority_sample(docs, k=20).collect()
    assert [r.doc_id for r in s1] == [r.doc_id for r in s2]
    ps = [r.priority for r in s1]
    assert ps == sorted(ps, reverse=True) and len(ps) == 20


def test_dsir_scores_separate_target_domain(spark):
    """DSIR semantic check: documents IN the target domain score higher on
    average than documents outside it (the signal the resampler uses)."""
    from tests.conftest import SF_SMOKE

    from gfe_db_spark.sources.tables import table

    docs = table(spark, SF_SMOKE, "documents")
    out = TX.dsir_weights(docs, target_pred=F.col("lang") == "en")
    joined = out.join(docs.select("doc_id", "lang"), "doc_id")
    avg = dict(
        joined.groupBy((F.col("lang") == "en").alias("t"))
        .agg(F.avg("dsir_score").alias("s"))
        .collect()
    )
    assert avg[True] > avg[False]


def test_duplicated_span_stats_planted(spark):
    """Planted repeated passage: docs 1 and 2 share the same 10-token run
    (≥ k=8 → flagged; merged into ONE span covering those 10 tokens);
    doc 3 shares nothing. Also covers the internal-repeat case: doc 4
    repeats its own 8-token run twice → both occurrences flagged."""
    shared = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    docs = spark.createDataFrame(
        [
            (1, shared + " x1 x2 x3"),
            (2, "y1 y2 " + shared),
            (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11"),
            (4, "a1 a2 a3 a4 a5 a6 a7 a8 q1 q2 a1 a2 a3 a4 a5 a6 a7 a8"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in DD.duplicated_span_stats(docs, k=8).collect()}
    assert out[1].n_spans == 1 and out[1].n_dup_tokens == 10
    assert out[2].n_spans == 1 and out[2].n_dup_tokens == 10
    assert out[3].n_spans == 0 and out[3].n_dup_tokens == 0
    assert out[4].n_spans == 2 and out[4].n_dup_tokens == 16


def test_dq_constraint_suite_fires_on_planted_violations(spark, tmp_path):
    """Point the suite at a doctored star schema and every constraint must
    report its planted violation count — the negative test proving the
    gate can actually fail."""
    import pyspark.sql.functions as F

    d = str(tmp_path)
    spark.createDataFrame(
        [(1,), (1,), (2,)], "o_orderkey long"
    ).write.parquet(f"{d}/orders.parquet")  # dup pk (1 extra)
    spark.createDataFrame(
        [(1, 1, 10.0), (1, 1, 20.0), (99, 1, 999.0)],
        "l_orderkey long, l_linenumber long, l_quantity double",
    ).write.parquet(f"{d}/lineitem.parquet")  # dup pk, orphan fk 99, qty 999
    spark.createDataFrame(
        [(None, 7)], "ts timestamp, user_id long"
    ).write.parquet(f"{d}/events.parquet")  # null ts
    from gfe_db_spark.queries.warehouse import dq_constraint_suite

    got = {
        r.constraint_name: (r.n_violations, r.passed)
        for r in dq_constraint_suite(spark, d).collect()
    }
    assert got["orders_pk_unique"] == (1, False)
    assert got["lineitem_pk_unique"] == (1, False)
    assert got["lineitem_orderkey_fk_complete"] == (1, False)
    assert got["events_ts_user_not_null"] == (1, False)
    assert got["lineitem_quantity_in_range"] == (1, False)


def test_content_checksum_detects_single_row_change(spark, tmp_path):
    """The anti-entropy contract: mutating exactly one row changes exactly
    one shard's checksum, leaving the other 15 untouched."""
    import pyspark.sql.functions as F

    d = str(tmp_path)
    base = spark.range(200).selectExpr(
        "id AS o_orderkey", "id * 7 AS o_custkey", "'O' AS o_orderstatus"
    )
    base.write.parquet(f"{d}/orders.parquet")
    from gfe_db_spark.queries.warehouse import table_content_checksum

    a = {r.shard: (r.n_rows, r.checksum) for r in table_content_checksum(spark, d).collect()}

    d2 = str(tmp_path / "mut")
    base.withColumn(
        "o_orderstatus", F.when(F.col("o_orderkey") == 37, "F").otherwise("O")
    ).write.parquet(f"{d2}/orders.parquet")
    b = {r.shard: (r.n_rows, r.checksum) for r in table_content_checksum(spark, d2).collect()}

    diff = [s for s in a if a[s] != b[s]]
    assert diff == [37 % 16]
    assert all(a[s][0] == b[s][0] for s in a), "row counts must agree"


def test_outlier_mad_flags_planted_outliers(spark, tmp_path):
    """MAD robustness on planted data: a tight cluster plus extreme points
    — the extremes are flagged and (unlike mean/stddev z-scores) do not
    drag the center estimate."""
    import pyspark.sql.functions as F  # noqa: F401

    d = str(tmp_path)
    vals = [10.0, 10.5, 11.0, 9.5, 10.2, 9.8, 10.1, 500.0, -300.0]
    spark.createDataFrame(
        [("a", v) for v in vals], "event_type string, value double"
    ).write.parquet(f"{d}/events.parquet")
    from gfe_db_spark.queries.tpch_plus import outlier_mad_values

    row = outlier_mad_values(spark, d).collect()[0]
    assert row.n == 9
    assert row.n_outliers == 2, (row.med, row.mad, row.n_outliers)
    assert 9.5 <= row.med <= 11.0  # center not dragged by the extremes


def test_fixed_k_sample_small_stratum_returns_all(spark, tmp_path):
    d = str(tmp_path)
    rows = [(i, "big") for i in range(50)] + [(100 + i, "tiny") for i in range(3)]
    spark.createDataFrame(rows, "doc_id long, lang string").write.parquet(
        f"{d}/documents.parquet"
    )
    from gfe_db_spark.queries.text import fixed_k_per_group_sample

    got = fixed_k_per_group_sample(spark, d).groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in got}
    assert counts == {"big": 20, "tiny": 3}


def test_division_planted_non_covering_customer(spark, tmp_path):
    """Relational division on a planted schema: the customer who misses
    one region must not count as covering; the one who reaches all must."""
    d = str(tmp_path)
    spark.createDataFrame(
        [(1, "SEG"), (2, "SEG")], "c_custkey long, c_mktsegment string"
    ).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(10, 1), (11, 2)], "o_orderkey long, o_custkey long"
    ).write.parquet(f"{d}/orders.parquet")
    # two regions, two nations, two suppliers; customer 1 buys from both
    # suppliers, customer 2 only from supplier 100
    spark.createDataFrame(
        [(10, 100), (10, 200), (11, 100)], "l_orderkey long, l_suppkey long"
    ).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        [(100, 0), (200, 1)], "s_suppkey long, s_nationkey long"
    ).write.parquet(f"{d}/supplier.parquet")
    spark.createDataFrame(
        [(0, 0), (1, 1)], "n_nationkey long, n_regionkey long"
    ).write.parquet(f"{d}/nation.parquet")
    spark.createDataFrame([(0,), (1,)], "r_regionkey long").write.parquet(
        f"{d}/region.parquet"
    )
    from gfe_db_spark.queries.tpch_plus import division_all_regions

    row = division_all_regions(spark, d).collect()[0]
    assert (row.n_customers, row.n_covering) == (2, 1)


def test_simhash_hamming_pairs_planted(spark):
    """Pigeonhole banding finds exactly the pairs within the Hamming
    radius: planted signatures at distance 0, 2, 3, and far."""
    from gfe_db_spark.operators import dedup as DD

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    base = 0x0123456789ABCDEF
    rows = [
        (1, signed(base)),                       # anchor
        (2, signed(base)),                       # distance 0 from 1
        (3, signed(base ^ 0b101)),               # distance 2 from 1/2
        (4, signed(base ^ (1 << 63) ^ (1 << 0) ^ (1 << 32))),  # distance 3, spans blocks
        (5, signed(base ^ 0xFFFF0000FFFF0000)),  # far (distance 32)
        (6, None),                               # null signature: dropped
    ]
    sig = spark.createDataFrame(rows, "doc_id long, simhash64 long")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in DD.simhash_hamming_pairs(sig, max_hamming=3, n_blocks=4).collect()
    }
    # (3,4): bit 0 cancels in the XOR, leaving bits {2, 32, 63} — also in
    assert got == {(1, 2): 0, (1, 3): 2, (2, 3): 2, (1, 4): 3, (2, 4): 3, (3, 4): 3}


def test_simhash_exact_dup_gate_bounds_candidates(spark):
    """A corpus of 1k exact duplicates must NOT go quadratic in the banded
    join: the exact-digest gate collapses identical fingerprints into one
    signature class, so the candidate join sees 2 classes (not 1001 docs)
    and produces 1 rep-level pair (not ~500k bucket collisions)."""
    from gfe_db_spark.operators import dedup as DD

    base = 0x0123456789ABCDEF
    rows = [(i, base) for i in range(1000)]  # 1k exact duplicates
    rows.append((5000, base ^ 0b1))  # one near-dup class at hamming 1
    sig = spark.createDataFrame(rows, "doc_id long, simhash64 long")

    _, classes = DD._simhash_classes(sig, "doc_id", "simhash64")
    assert classes.count() == 2
    rep_pairs = DD._banded_class_pairs(classes, max_hamming=3, n_blocks=4)
    assert rep_pairs.count() == 1  # bounded by distinct sigs, not corpus size

    # Drop-list path: everything except the smallest id drops, with no
    # pair enumeration anywhere in the plan.
    drops = DD.simhash_neardup_drops(sig, max_hamming=3, n_blocks=4)
    assert drops.count() == 1000
    assert drops.filter(F.col("doc_id") == 0).count() == 0

    # Pair-expanding path keeps the full pair semantics (k*(k+1)/2 pairs
    # over the 1001 mutually-near docs) even though the join was bounded.
    assert DD.simhash_hamming_pairs(sig, max_hamming=3, n_blocks=4).count() == (
        1001 * 1000
    ) // 2


def test_neardup_components_exact_dup_gate_bounds_pairs(spark):
    """1k identical docs must NOT go quadratic in the shingle self-join:
    the exact-digest gate collapses them to ONE representative, so the
    Jaccard join sees 2 reps and zero candidate pairs (ungated, the k
    copies put k rows in every shared-shingle bucket → ~500k pair-groups),
    while the verdict still assigns every member to the class-min
    cluster."""
    rows = [(i, "alpha beta gamma delta epsilon") for i in range(1000)]
    rows.append((2000, "wholly unrelated words over here instead"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r.doc_id: r.cluster_id for r in DD.neardup_components(docs).collect()}
    assert len(out) == 1001
    assert all(out[i] == 0 for i in range(1000))
    assert out[2000] == 2000

    # The join input after the gate: one rep per distinct text → 0 pairs.
    from pyspark.sql.window import Window as W

    cls = docs.withColumn(
        "rep_id", F.min("doc_id").over(W.partitionBy(F.md5("text")))
    )
    reps = cls.filter("doc_id = rep_id")
    assert reps.count() == 2
    assert DD.ngram_jaccard_pairs(DD.shingles(reps, n=3), threshold=0.5).count() == 0


def test_simhash_neardup_drops_matches_pair_semantics(spark):
    """simhash_neardup_drops == {doc_b of every simhash_hamming_pairs
    pair} on a mixed corpus (exact-dup classes + near classes + isolates)."""
    from gfe_db_spark.operators import dedup as DD

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    base = 0x0123456789ABCDEF
    rows = [
        (7, signed(base)),
        (2, signed(base)),          # exact dup of 7 (rep of this class = 2)
        (11, signed(base)),         # exact dup
        (3, signed(base ^ 0b101)),  # hamming 2 from the class above
        (40, signed(base ^ 0xFFFF0000FFFF0000)),  # far isolate: survives
        (41, signed((base ^ 0xFFFF0000FFFF0000) ^ (1 << 63))),  # h1 of 40
        (50, None),
    ]
    sig = spark.createDataFrame(rows, "doc_id long, simhash64 long")
    pairs = DD.simhash_hamming_pairs(sig, max_hamming=3, n_blocks=4)
    expect = {r.doc_b for r in pairs.collect()}
    got = {r.doc_id for r in DD.simhash_neardup_drops(sig, max_hamming=3, n_blocks=4).collect()}
    assert got == expect == {3, 7, 11, 41}


def test_simhash_hamming_rejects_incomplete_banding():
    import pytest as _pytest

    from gfe_db_spark.operators import dedup as DD

    with _pytest.raises(ValueError):
        DD.simhash_hamming_pairs(None, max_hamming=4, n_blocks=4)


def test_strip_boilerplate_planted_shared_lines(spark):
    """Lines shared by >= min_docs documents are stripped everywhere they
    occur; unique lines survive in original order; a doc reduced to
    nothing yields the empty string."""
    from gfe_db_spark.operators import text as TX

    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nreal content one\nFOOTER"),
            (2, "COOKIE BANNER\nreal content two\nFOOTER"),
            (3, "COOKIE BANNER\nFOOTER"),  # nothing left after stripping
            (4, "only unique lines\nhere"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in TX.strip_boilerplate(docs, min_docs=2).collect()}
    assert (got[1].n_lines, got[1].n_kept, got[1].cleaned) == (3, 1, "real content one")
    assert (got[2].n_lines, got[2].n_kept, got[2].cleaned) == (3, 1, "real content two")
    assert (got[3].n_lines, got[3].n_kept, got[3].cleaned) == (2, 0, "")
    assert (got[4].n_lines, got[4].n_kept, got[4].cleaned) == (
        2,
        2,
        "only unique lines\nhere",
    )


def test_strip_boilerplate_within_doc_repeats_not_boilerplate(spark):
    """A line repeated only inside ONE doc has document frequency 1 and
    must not be stripped (df counts distinct docs, not occurrences)."""
    from gfe_db_spark.operators import text as TX

    docs = spark.createDataFrame(
        [(1, "la\nla\nbody")], "doc_id long, text string"
    )
    row = TX.strip_boilerplate(docs, min_docs=2).collect()[0]
    assert (row.n_lines, row.n_kept, row.cleaned) == (3, 3, "la\nla\nbody")


def test_strip_boilerplate_distinct_texts_is_duplication_invariant(spark):
    """The digest-gated df (r9): exact copies of a document must not turn
    its lines into boilerplate (each line counts once per distinct TEXT),
    while a line genuinely shared by two DIFFERENT texts is still
    stripped — on the raw-doc df the duplicated corpus strips itself
    empty (the sf10 probe's corpus_prep_pipeline_v3 rows=0)."""
    from gfe_db_spark.operators import text as TX

    docs = spark.createDataFrame(
        [
            (1, "SHARED FOOTER\nunique body one"),
            (2, "SHARED FOOTER\nunique body one"),   # exact copy of 1
            (3, "SHARED FOOTER\nunique body one"),   # exact copy of 1
            (4, "SHARED FOOTER\nunique body two"),   # different text, same footer
        ],
        "doc_id long, text string",
    )
    gated = {
        r.doc_id: r
        for r in TX.strip_boilerplate(docs, min_docs=2, distinct_texts=True).collect()
    }
    # footer IS boilerplate (2 distinct texts share it); bodies survive
    # in every copy — duplication did not empty the corpus
    for d in (1, 2, 3):
        assert (gated[d].n_kept, gated[d].cleaned) == (1, "unique body one")
    assert (gated[4].n_kept, gated[4].cleaned) == (1, "unique body two")
    # raw-doc df on the same corpus: copies 1-3 make BOTH their lines
    # df>=2, so the duplicated docs strip to empty — the failure mode the
    # gate exists to prevent
    raw = {r.doc_id: r for r in TX.strip_boilerplate(docs, min_docs=2).collect()}
    assert raw[1].cleaned == ""


def test_bloom_m_bits_sizing_and_oracle_derivation():
    """Count-derived Bloom width: floors at 2^16 (bench-scale plans
    unchanged), grows as the smallest power of two holding 16 bits per
    item, clamps at 2^26 — and DuckDB derives the SAME width from
    COUNT(*) with the same integer ladder the oracles embed."""
    import duckdb

    from gfe_db_spark.operators.dedup import bloom_m_bits

    assert bloom_m_bits(1) == 65536
    assert bloom_m_bits(4096) == 65536          # 4096*16 == 2^16 exactly
    assert bloom_m_bits(4097) == 131072         # first width past the floor
    assert bloom_m_bits(250_000) == 4194304     # the sf10 benchmark scale
    assert bloom_m_bits(10**9) == 1 << 26       # clamp
    con = duckdb.connect()
    for n in (1, 4096, 4097, 250_000, 262_144, 262_145, 10**9):
        sql = f"""
        WITH nb AS (SELECT CAST({n} AS BIGINT) AS n),
        mb AS (
          SELECT CAST((CAST(1 AS BIGINT) << CAST(COALESCE(MIN(p), 26) AS INT)) AS BIGINT) AS m
          FROM range(16, 27) r(p), nb
          WHERE nb.n * 16 <= (CAST(1 AS BIGINT) << CAST(p AS INT))
        ) SELECT m FROM mb
        """
        assert con.execute(sql).fetchone()[0] == bloom_m_bits(n), n


def test_shard_by_token_budget_matches_naive_global_cumsum(spark):
    """The two-phase prefix sum (bucket cumsum + exclusive bucket
    offsets) must equal the naive global running sum for every row,
    including ids that straddle bucket boundaries and empty docs."""
    from gfe_db_spark.operators.packing import shard_by_token_budget

    rows = [(i, "tok " * (i % 7)) for i in range(0, 50)] + [(103, "a b c"), (205, "")]
    docs = spark.createDataFrame([(i, t.strip()) for i, t in rows], "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.shard)
        for r in shard_by_token_budget(docs, budget=10, bucket_span=8).collect()
    }
    run = 0
    for i, t in sorted(rows):
        n = len([w for w in t.split() if w])
        assert got[i] == (n, run, run // 10), (i, got[i], (n, run, run // 10))
        run += n


def test_logreg_learns_separable_data(spark):
    """On linearly separable data the GD loop must reach accuracy 1.0 and
    a positive slope; the run must be reproducible bit-for-bit across
    repartitionings (decimal-routed gradient sums)."""
    from gfe_db_spark.operators.ml import logreg_fit_summary, train_logreg

    rows = [(float(i % 7) / 7.0 - 1.0, 0.0) for i in range(40)] + [
        (float(i % 7) / 7.0 + 0.5, 1.0) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "x1 double, y double")
    out = logreg_fit_summary(df, ["x1"], "y", steps=30, lr=1.0).collect()[0]
    assert out.accuracy == 1.0
    assert out.w1 > 0  # separating direction
    w_a, _ = train_logreg(df, ["x1"], "y", steps=5, lr=1.0)
    w_b, _ = train_logreg(df.repartition(13), ["x1"], "y", steps=5, lr=1.0)
    assert w_a == w_b  # exact, not approximate


def test_standardize_embeddings_moments_and_constant_dim(spark):
    """Standardized dims have (population) mean 0 / std 1; a constant
    dimension maps to all-zero instead of NaN."""
    import math

    from gfe_db_spark.operators.similarity import standardize_embeddings

    rows = [(i, [float(i), 5.0, float(i * i % 7)]) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = standardize_embeddings(emb).collect()
    by_pos = {}
    for r in out:
        by_pos.setdefault(r.pos, []).append(r.z)
    assert all(z == 0.0 for z in by_pos[1])  # constant dim
    for pos in (0, 2):
        zs = by_pos[pos]
        assert abs(sum(zs) / len(zs)) < 1e-6
        assert abs(math.sqrt(sum(z * z for z in zs) / len(zs)) - 1.0) < 1e-6


def test_ivf_pq_prunes_unprobed_cells(spark):
    """IVFADC with n_probe=1 must return only vectors assigned to the
    query's cell — members of the far cluster never appear, even when the
    PQ approximation would score them."""
    rows = []
    for i in range(8):  # cluster A: near e0
        v = [0.0] * 8
        v[0], v[1] = 1.0, 0.01 * i
        rows.append((i, v))
    for i in range(8, 16):  # cluster B: near e4
        v = [0.0] * 8
        v[4], v[5] = 1.0, 0.01 * i
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = emb.filter(F.col("vec_id").isin(0, 8)).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    cb = SIM.pq_codebook(emb, m=4, ks=4, dim=8)
    query = emb.filter(F.col("vec_id") == 0).select("embedding")
    got = SIM.ivf_pq_topk(
        emb, centroids, cb, query, k=16, n_probe=1, m=4, dim=8
    ).collect()
    ids = {r.vec_id for r in got}
    assert ids <= set(range(8)) and 0 in ids
    # self-query: the query's own code has ADC distance 0
    assert min(r.adc_d2 for r in got) == 0.0


def test_corpus_prep_v3_stage_interactions(spark, tmp_path):
    """Composition semantics: (a) boilerplate stripping happens BEFORE the
    token gate, so a doc that is mostly banner drops out; (b) the SimHash
    near-dup stage drops the larger id of an identical pair; (c) shards
    partition the surviving token stream in doc_id order."""
    d = str(tmp_path)
    banner = "SHARED BANNER LINE"
    # 64-token bodies differing in ONE word: distinct as lines (so the
    # stripper keeps them — line df=1) but SimHash-near (hamming 1,
    # precomputed for this exact vocabulary)
    body_a = " ".join(f"w{i}" for i in range(64))
    body_b = " ".join(f"w{i}" for i in range(63)) + " zz"
    rows = [
        (1, f"{banner}\n{body_a}"),
        (2, f"{banner}\n{body_b}"),         # near-dup of 1 post-strip
        (3, f"{banner}\nshort text"),        # only 2 tokens post-strip: gated out
        (4, "unique document with plenty of distinct tokens here"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    from gfe_db_spark.queries.dedup import corpus_prep_pipeline_v3

    out = corpus_prep_pipeline_v3(spark, d).collect()
    # survivors: doc 1 (kept, min of the near-dup pair, 64 tokens) and
    # doc 4 (8 tokens); doc 2 dropped as near-dup, doc 3 gated
    assert [(r.shard, r.n_docs, r.n_tokens) for r in out] == [(0, 2, 72)]


def test_perceptual_ahash_is_container_independent(spark):
    """The same pixel content encoded as BMP and as PNG must produce the
    SAME aHash (canonical top-down grid both ways) — the property that
    makes it a cross-format dedup key, which payload-digest dedup lacks.
    An asymmetric gradient makes the hash orientation-sensitive, so a
    missing BMP row-flip would fail this test."""
    from gfe_db_spark.operators.multimodal import (
        encode_bmp_rgb24,
        encode_png_rgb8,
        perceptual_ahash,
    )

    px = bytes((7 * i) % 251 for i in range(96))  # asymmetric 8x4 RGB gradient
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_bmp_rgb24(8, 4, px))),
            (2, bytearray(encode_png_rgb8(8, 4, px))),
            (3, bytearray(b"not-an-image")),
        ],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in perceptual_ahash(media).collect()}
    assert got[1].container == "bmp" and got[2].container == "png"
    assert got[1].ahash == got[2].ahash and got[1].ahash is not None
    assert got[3].ahash is None and "no pixel decoder" in got[3].ahash_error
    # cross-check against a directly computed reference hash
    grays = [px[3 * p] + px[3 * p + 1] + px[3 * p + 2] for p in range(32)]
    ref = sum(1 << p for p, g in enumerate(grays) if 32 * g > sum(grays))
    assert got[2].ahash == ref  # PNG grid is already canonical


def test_perceptual_ahash_custom_columns_and_edge_grids(spark):
    """Three regression pins: (1) non-default id/payload column names
    work (the closure reads the ALIASED columns, not the caller's names);
    (2) the canonical 8x8 = 64-pixel grid is accepted, with bit 63
    wrapping to the signed-long sign bit like _simhash; (3) a PNG
    signature with a corrupt deflate stream routes to the error column
    (zlib.error is part of the malformed-payload contract) instead of
    failing the task."""
    from gfe_db_spark.operators.multimodal import (
        _PNG_SIG,
        encode_bmp_rgb24,
        encode_png_rgb8,
        perceptual_ahash,
    )

    # bright pixel in slot 63 so bit 63 is set → hash must come back negative
    px = bytes(([0] * 63 * 3) + [255, 255, 255])
    bad_png = bytes(encode_png_rgb8(2, 2, bytes(12)))
    # corrupt the deflate stream inside IDAT but keep chunk structure valid
    idat = bad_png.index(b"IDAT")
    bad_png = bad_png[: idat + 4] + b"\xff\xff\xff\xff" + bad_png[idat + 8 :]
    assert bad_png[: len(_PNG_SIG)] == _PNG_SIG
    media = spark.createDataFrame(
        [(10, bytearray(encode_bmp_rgb24(8, 8, px))), (11, bytearray(bad_png))],
        "doc_id long, img_bytes binary",
    )
    got = {
        r.media_id: r
        for r in perceptual_ahash(media, id_col="doc_id", payload_col="img_bytes").collect()
    }
    assert got[10].ahash is not None and got[10].ahash < 0  # bit 63 → signed wrap
    assert got[11].ahash is None and got[11].ahash_error  # corrupt IDAT → error channel


def test_mode_per_group_tie_breaks_to_smaller_value(spark, tmp_path):
    """Two values tied on count: the mode must be the lexicographically
    smaller one (deterministic argmax contract)."""
    d = str(tmp_path)
    rows = [(1, "B"), (1, "B"), (1, "A"), (1, "A"), (2, "Z")]
    spark.createDataFrame(rows, "p_size int, p_brand string").write.parquet(
        f"{d}/part.parquet"
    )
    from gfe_db_spark.queries.relational import mode_per_group

    got = {r.p_size: (r.mode_value, r.mode_count) for r in mode_per_group(spark, d).collect()}
    assert got == {1: ("A", 2), 2: ("Z", 1)}


def test_chisq_independence_hand_computed(spark, tmp_path):
    """2x2 contingency with known chi-square: observed [[10,20],[20,10]]
    gives chisq = 60*(10*10-20*20)^2/(30*30*30*30) * ... verified against
    the direct formula; dof = 1."""
    import datetime

    d = str(tmp_path)
    # Sunday 2026-08-09 (dow 1) and Monday 2026-08-10 (dow 2)
    sun = datetime.datetime(2026, 8, 9, 10, 0, 0)
    mon = datetime.datetime(2026, 8, 10, 10, 0, 0)
    rows = (
        [(i, sun, 1, "a", 0.0, "{}") for i in range(10)]
        + [(i + 10, mon, 1, "a", 0.0, "{}") for i in range(20)]
        + [(i + 30, sun, 1, "b", 0.0, "{}") for i in range(20)]
        + [(i + 50, mon, 1, "b", 0.0, "{}") for i in range(10)]
    )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    from gfe_db_spark.queries.relational import chisq_independence

    row = chisq_independence(spark, d).collect()[0]
    # chi-square for [[10,20],[20,10]]: N*(ad-bc)^2 / (r1*r2*c1*c2)
    expect = 60 * (10 * 10 - 20 * 20) ** 2 / (30 * 30 * 30 * 30)
    assert row.dof == 1
    assert abs(row.chisq - expect) < 1e-6


def test_ivf_append_batch_converges_to_full_index(spark, tmp_path):
    """Index built from half the corpus + an appended batch must answer
    probes identically to an index built from everything at once, and the
    append must touch only the batch's centroid partitions."""
    import os

    from gfe_db_spark.operators.similarity import (
        ivf_append_batch,
        ivf_assign,
        ivf_probe_index,
        ivf_write_index,
    )

    rows = []
    for i in range(24):
        v = [0.0] * 8
        v[(i % 2) * 4] = 1.0
        v[(i % 2) * 4 + 1] = 0.01 * i
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = emb.filter(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    full_path = f"{tmp_path}/full"
    incr_path = f"{tmp_path}/incr"
    ivf_write_index(ivf_assign(emb, centroids), full_path)
    first, batch = emb.filter("vec_id < 12"), emb.filter("vec_id >= 12")
    ivf_write_index(ivf_assign(first, centroids), incr_path)
    touched = ivf_append_batch(spark, incr_path, batch, centroids)
    assert touched == [0, 1]  # batch has members of both cells
    query = emb.filter(F.col("vec_id") == 2).select("embedding")
    a = ivf_probe_index(spark, full_path, centroids, query, k=5, n_probe=1).collect()
    b = ivf_probe_index(spark, incr_path, centroids, query, k=5, n_probe=1).collect()
    assert [(r.vec_id, r.cos) for r in a] == [(r.vec_id, r.cos) for r in b]
    # the untouched-index guarantee: append wrote only under centroid dirs
    assert sorted(
        d for d in os.listdir(incr_path) if d.startswith("centroid_id=")
    ) == ["centroid_id=0", "centroid_id=1"]


def test_association_rules_hand_computed_lift(spark, tmp_path):
    """4 baskets: {A,B} x3 and {A,C} x1 → rule (A,B): n_ab=3, support
    3/4, confidence 3/4 (n_A=4), lift 3*4/(4*3)=1.0; pair (A,C) is
    filtered by the min-count floor."""
    d = str(tmp_path)
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20), (4, 10), (4, 30)]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        f"{d}/lineitem.parquet"
    )
    from gfe_db_spark.queries.tpch_plus import association_rules_lift

    got = association_rules_lift(spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.part_a, r.part_b, r.n_ab) == (10, 20, 3)
    assert (r.support, r.confidence, r.lift) == (0.75, 0.75, 1.0)


def test_entity_match_hot_block_pair_cost_is_capped(spark):
    """Planted degenerate blocking key (every row in ONE block): the
    candidate-pair count must be bounded by n·cap, not n² — the round-5
    verdict's first-casualty-at-100× guard for entity_match_blocking.
    At or under the cap the head×all scheme generates EXACTLY the full
    a<b pair set, so the cap is invisible on well-blocked data."""
    from gfe_db_spark.queries.warehouse import blocked_match_pairs

    n, cap = 50, 8
    rows = [(i, f"name-{i:04d}", "hot") for i in range(n)]
    df = spark.createDataFrame(rows, "k long, name string, block string")
    capped = blocked_match_pairs(df, max_dist=10**6, max_block_size=cap)
    # head ids 0..cap-1; pairs (a, b) with a in head, a < b
    expect = sum(n - 1 - a for a in range(cap))
    assert capped.count() == expect
    assert expect <= n * cap
    # cap >= block size → identical to the uncapped full pair set
    full = blocked_match_pairs(df, max_dist=10**6, max_block_size=None)
    assert full.count() == n * (n - 1) // 2
    wide = blocked_match_pairs(df, max_dist=10**6, max_block_size=n)
    assert wide.count() == n * (n - 1) // 2


def test_semdedup_hot_cluster_pair_cost_is_capped(spark):
    """Planted hot cluster (every vector assigned to ONE centroid): the
    within-cluster candidate count must be bounded by n·cap, not n² —
    the round-5 verdict's guard for semdedup_prune (the sf1 sweep's 282 s
    wall). Mass-duplication recall: identical vectors occupy the head,
    so every tail duplicate still pairs with a head duplicate."""
    from gfe_db_spark.queries.similarity import cluster_head_pairs

    n, cap = 60, 8
    rows = [(i, 0, [1.0, 0.0, float(i)]) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, centroid_id int, embedding array<double>"
    )
    capped = cluster_head_pairs(df, max_cluster_size=cap)
    expect = sum(n - 1 - a for a in range(cap))
    assert capped.count() == expect
    assert expect <= n * cap
    assert cluster_head_pairs(df, max_cluster_size=None).count() == n * (n - 1) // 2
    # duplicates-dominate-the-head recall property: 10 identical vectors
    # scattered over the id range; with cap=8 the head holds several of
    # them, so every later copy still finds an exact match in the head
    dup_ids = [0, 3, 6, 12, 20, 30, 40, 50, 55, 59]
    # one-hot basis: non-dups are mutually orthogonal (cosine 0), dups all
    # share the last axis (cosine 1) — no accidental near-parallels
    def one_hot(j):
        return [1.0 if p == j else 0.0 for p in range(n + 1)]

    rows2 = [(i, 0, one_hot(n) if i in dup_ids else one_hot(i)) for i in range(n)]
    df2 = spark.createDataFrame(
        rows2, "vec_id long, centroid_id int, embedding array<double>"
    )
    from pyspark.sql import functions as SF

    from gfe_db_spark.operators.dedup import cosine

    hits = (
        cluster_head_pairs(df2, max_cluster_size=cap)
        .filter(SF.round(cosine(SF.col("va"), SF.col("vb")), 9) >= 0.99)
        .select("id_b")
        .distinct()
        .collect()
    )
    assert {r.id_b for r in hits} == set(dup_ids) - {0}


def test_semdedup_gated_prune_equals_ungated(spark):
    """The class-gated SemDeDup prune (r10: the duplication-adaptive plan
    in semdedup_prune) must produce the IDENTICAL pruned vec_id set as
    the ungated head-pair rule, including where the head cap cuts the
    middle of a duplicate class, where a class's min id falls outside the
    head (its copies must not prune anything), and where a HIGHER-min
    class prunes the upper members of a LOWER-min class (the no-
    id_a<id_b-on-classes subtlety)."""
    from pyspark.sql import functions as SF

    from gfe_db_spark.operators.dedup import _dot
    from gfe_db_spark.queries.similarity import (
        cluster_head_pairs,
        cluster_prune_flags_gated,
    )

    def ungated_pruned(df, cap, tau):
        pair_cos = _dot(SF.col("va"), SF.col("vb")) / (SF.col("na") * SF.col("nb"))
        return {
            r.id_b
            for r in cluster_head_pairs(df, max_cluster_size=cap)
            .filter(SF.round(pair_cos, 9) >= tau)
            .select("id_b")
            .distinct()
            .collect()
        }

    def gated_pruned(df, cap, tau):
        return {
            r.vec_id
            for r in cluster_prune_flags_gated(
                df, threshold=tau, max_cluster_size=cap
            ).collect()
        }

    # two clusters; cluster 0 mixes: class A (5 copies, ids straddling the
    # cap), class B (near-dup of A, cos ~0.995), class C (orthogonal),
    # class D whose min id is past the cap (never a pruner), and a
    # higher-min class E near-parallel to C (E prunes C's upper members).
    A = [1.0, 0.0, 0.0]
    B = [0.995, 0.0998749217771909, 0.0]  # cos(A,B) ~ 0.995
    C = [0.0, 0.0, 1.0]
    E = [0.0, 0.01, 0.9999499987499375]  # cos(C,E) ~ 0.99995
    D = [0.0, 1.0, 0.0]
    rows = [
        (0, 0, A), (2, 0, C), (3, 0, A), (4, 0, B), (5, 0, E),
        (6, 0, A), (7, 0, C), (8, 0, D), (9, 0, A), (10, 0, D),
        (11, 0, A), (12, 0, C),
        # cluster 1: lone class + its copies
        (20, 1, [0.5, 0.5, 0.5]), (21, 1, [0.5, 0.5, 0.5]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, centroid_id int, embedding array<double>"
    )
    for cap in (2, 4, 8, None):
        u = ungated_pruned(df, cap, 0.9)
        g = gated_pruned(df, cap, 0.9)
        assert u == g, f"cap={cap}: ungated {sorted(u)} != gated {sorted(g)}"
    # sanity at cap=4 (head ids 0,2,3,4): D's min (8) is outside the head,
    # so D's copy 10 must NOT be pruned; E(5) outside head too, but C's own
    # min (2) IS in the head, so 7 and 12 prune via C; 5 prunes via C too.
    assert gated_pruned(df, 4, 0.9) == {3, 4, 5, 6, 7, 9, 11, 12, 21}


def test_ngram_jaccard_gated_equals_ungated(spark):
    """The digest-gated exact-Jaccard path (r8: the registered
    dedup_ngram_jaccard) must be ROW-IDENTICAL to the ungated self-join on
    a corpus mixing exact duplicates (gate-collapsed), near-duplicates
    (cross-class pairs), short texts (< n tokens: zero shingles, never
    paired, excluded from the gate), NULLs, and duplicated short texts
    (must NOT be merged by the gate — the ungated graph keeps them
    apart)."""
    from gfe_db_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
            (7, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
            (3, "the quick brown fox jumps over the lazy cat"),  # near-dup
            (4, "completely different text about spark engines here"),
            (5, "tiny doc"),  # < 3 tokens: no shingles
            (6, "tiny doc"),  # duplicated short text: still never paired
            (8, None),
            (9, "completely different text about spark engines here"),  # dup of 4
        ],
        "doc_id long, text string",
    )
    ungated = {
        tuple(r)
        for r in DD.ngram_jaccard_pairs(DD.shingles(docs, n=3), threshold=0.5).collect()
    }
    gated = {
        tuple(r)
        for r in DD.ngram_jaccard_pairs_gated(docs, n=3, threshold=0.5).collect()
    }
    assert gated == ungated
    # sanity on the fixture: the within-class (jaccard=1.0), cross-class
    # near-dup, and second exact class are all represented
    assert (1, 2) in {(a, b) for a, b, *_ in gated}
    assert (4, 9) in {(a, b) for a, b, *_ in gated}
    assert not any({a, b} & {5, 6, 8} for a, b, *_ in gated)


_GATE_CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (7, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),  # near-dup
    (4, "completely different text about spark engines here"),
    (5, "tiny doc"),  # < 3 tokens: no shingles
    (6, "tiny doc"),  # duplicated short text: still never banded
    (8, None),
    (9, "completely different text about spark engines here"),  # dup of 4
]


def test_lsh_gated_equals_ungated(spark):
    """The digest-gated LSH candidate path (r9: the registered
    dedup_lsh_pairs) must be ROW-IDENTICAL to the ungated banded
    self-join on the same planted corpus the Jaccard gate test uses:
    identical texts have identical signatures, so they band identically
    — the gate only moves WHERE the pairing happens (distinct texts),
    never WHICH pairs come out."""
    from gfe_db_spark.operators import dedup as DD

    docs = spark.createDataFrame(_GATE_CORPUS, "doc_id long, text string")
    sigs = DD.minhash_signatures(
        DD.shingles(docs, n=3, distinct=False), num_hashes=8
    )
    ungated = {
        tuple(r)
        for r in DD.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2).collect()
    }
    gated = {
        tuple(r)
        for r in DD.lsh_candidate_pairs_gated(
            docs, bands=4, rows_per_band=2, n=3, num_hashes=8
        ).collect()
    }
    assert gated == ungated
    assert {(1, 2), (1, 7), (2, 7), (4, 9)} <= gated  # within-class always band
    assert not any({a, b} & {5, 6, 8} for a, b in gated)


def test_minhash_est_gated_equals_ungated(spark):
    """Same identity for the estimate entry: cross-class member pairs
    inherit the representative pair's jaccard_est verbatim and
    within-class pairs are 8/8 = 1.0 — the value the ungated estimator
    computes from their (identical) signatures."""
    from gfe_db_spark.operators import dedup as DD

    docs = spark.createDataFrame(_GATE_CORPUS, "doc_id long, text string")
    sigs = DD.minhash_signatures(
        DD.shingles(docs, n=3, distinct=False), num_hashes=8
    )
    pairs = DD.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    ungated = {
        tuple(r)
        for r in DD.minhash_jaccard_estimate(sigs, pairs, num_hashes=8).collect()
    }
    gated = {
        tuple(r)
        for r in DD.minhash_est_pairs_gated(
            docs, bands=4, rows_per_band=2, n=3, num_hashes=8
        ).collect()
    }
    assert gated == ungated
    assert (1, 2, 1.0) in gated


@pytest.mark.parametrize("n_planes,probe_bits", [(8, 2), (9, 1), (12, 1), (16, 1)])
def test_bucketed_embedding_full_recall_of_exact_duplicates(
    spark, n_planes, probe_bits
):
    """Planted exact-duplicate vectors are recalled at ANY LSH sizing:
    identical vectors share every sign bit, so they land in the same
    bucket and pair under probe mask 0 regardless of plane count or probe
    width — the property that makes the r8 data-dependent sizing
    (lsh_plane_count) safe to scale up (r7 verdict item 1)."""
    import hashlib

    from gfe_db_spark.operators import dedup as DD

    def vec(seed, dim=16):
        return [
            int.from_bytes(hashlib.md5(f"{seed}:{d}".encode()).digest()[:4], "big")
            / 2**31
            - 1.0
            for d in range(dim)
        ]

    dup_pairs = [(0, 50), (3, 77), (10, 99)]
    base = {i: vec(i) for i in range(100)}
    for a, b in dup_pairs:
        base[b] = base[a]
    emb = spark.createDataFrame(
        [(i, v) for i, v in base.items()], "vec_id long, embedding array<double>"
    )
    got = {
        (r.id_a, r.id_b)
        for r in DD.embedding_neardup_pairs_bucketed(
            emb, threshold=0.999, n_planes=n_planes, probe_bits=probe_bits, dim=16
        ).collect()
    }
    assert set(dup_pairs) <= got


def _py_lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("max_dist", [1, 2])
def test_entity_match_length_band_is_lossless(spark, max_dist):
    """r10 (r9 verdict item 1): the length-band prefilter
    |len(a)-len(b)| <= max_dist added to blocked_match_pairs' join is a
    levenshtein LOWER BOUND, so the banded join must return EXACTLY the
    pairs the threshold DP kept — verified against a Python brute force
    on names whose lengths differ by 0..6 chars (the band genuinely
    prunes most pairs here, and several same-length pairs still exceed
    max_dist, so both filters are exercised)."""
    from gfe_db_spark.queries.warehouse import blocked_match_pairs

    names = [
        "alpha", "alphaa", "alphaaa", "alphaaaaaa", "alpXa", "aXpha",
        "beta", "betas", "betaXY", "gamma", "gammagamma", "g",
    ]
    rows = [(i, nm, "blk" if i % 3 else "blk2") for i, nm in enumerate(names)]
    df = spark.createDataFrame(rows, "k long, name string, block string")
    got = sorted(
        (r.block, r.dist)
        for r in blocked_match_pairs(df, max_dist=max_dist, max_block_size=None).collect()
    )
    want = sorted(
        (ba, _py_lev(na, nb))
        for ka, na, ba in rows
        for kb, nb, bb in rows
        if ba == bb and ka < kb and _py_lev(na, nb) <= max_dist
    )
    assert got == want
    # the band must actually prune something on this fixture (sanity that
    # the test exercises the prefilter, not just the DP threshold)
    n_band_pruned = sum(
        1
        for ka, na, ba in rows
        for kb, nb, bb in rows
        if ba == bb and ka < kb and abs(len(na) - len(nb)) > max_dist
    )
    assert n_band_pruned > 0


def test_dedup_gate_chooser_picks_by_duplication_and_plans_agree(spark, tmp_path):
    """r10 (r9 verdict item 2): the duplication-adaptive chooser in
    queries/dedup must pick the UNGATED plan on a distinct corpus and the
    GATED plan on a mass-duplicated one — and because the choice is a
    physical decision between row-identical plans, the registered entry's
    output on each corpus must equal BOTH direct operator plans."""
    import os

    from gfe_db_spark.operators import dedup as DD
    from gfe_db_spark.queries.dedup import (
        _use_digest_gate,
        dedup_lsh_pairs,
        dedup_minhash_est,
    )

    base = [
        f"document number {i} talks about topic {i % 7} in mild detail "
        f"with some extra words {i * 13 % 101}"
        for i in range(40)
    ]
    distinct_dir = str(tmp_path / "distinct")
    dup_dir = str(tmp_path / "dup")
    os.makedirs(distinct_dir)
    os.makedirs(dup_dir)
    spark.createDataFrame(
        list(enumerate(base)), "doc_id long, text string"
    ).write.parquet(f"{distinct_dir}/documents.parquet")
    dup_rows = [(k * 40 + i, t) for k in range(10) for i, t in enumerate(base)]
    spark.createDataFrame(dup_rows, "doc_id long, text string").write.parquet(
        f"{dup_dir}/documents.parquet"
    )

    assert _use_digest_gate(spark, distinct_dir) is False
    assert _use_digest_gate(spark, dup_dir) is True

    for sf_dir in (distinct_dir, dup_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sigs = DD.minhash_signatures(
            DD.shingles(docs, n=3, distinct=False), num_hashes=8
        )
        ungated = {
            tuple(r)
            for r in DD.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2).collect()
        }
        gated = {
            tuple(r)
            for r in DD.lsh_candidate_pairs_gated(
                docs, bands=4, rows_per_band=2, n=3, num_hashes=8
            ).collect()
        }
        chosen = {tuple(r) for r in dedup_lsh_pairs(spark, sf_dir).collect()}
        assert chosen == ungated == gated
        est_ungated = {
            tuple(r)
            for r in DD.minhash_jaccard_estimate(
                sigs, DD.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2), num_hashes=8
            ).collect()
        }
        est_chosen = {tuple(r) for r in dedup_minhash_est(spark, sf_dir).collect()}
        assert est_chosen == est_ungated


def test_sizing_memo_fingerprint_invalidates_on_rewrite(spark, tmp_path):
    """r10 (r9 advice): the sizing memo keys on an on-disk fingerprint
    (file names + sizes + mtimes), so regenerating a table at the SAME
    path must refresh the cached count instead of serving the stale one —
    the failure mode that would silently desync a derived LSH plane count
    from the oracle's COUNT(*)."""
    from gfe_db_spark.sources.tables import corpus_stats, table_rowcount

    d = str(tmp_path)
    spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    ).write.parquet(f"{d}/documents.parquet")
    assert table_rowcount(spark, d, "documents") == 10
    assert corpus_stats(spark, d, "documents")[0] == 10
    spark.createDataFrame(
        [(i, f"text {i % 5}") for i in range(25)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    assert table_rowcount(spark, d, "documents") == 25
    n, dist = corpus_stats(spark, d, "documents")
    assert n == 25
    assert dist < 10  # ~5 distinct texts: the distinct stat refreshed too


def test_entity_match_variant_cutoff_boundary_is_lossless(spark):
    """r10: the delete-neighborhood path handles names up to
    variant_max_len and the direct path everything longer; a distance-1
    pair can straddle lengths (L, L+1), so the split must not lose pairs
    at the cutoff. Drive a tiny cutoff (4) with name lengths 2..7 so
    pairs land under, over, and exactly across the boundary, and compare
    to the Python brute force."""
    from gfe_db_spark.queries.warehouse import blocked_match_pairs

    names = ["ab", "abc", "abcd", "abcde", "abcdef", "abcdXf", "abXd",
             "xy", "xyz", "xyzaaaa"]
    rows = [(i, nm, "blk") for i, nm in enumerate(names)]
    df = spark.createDataFrame(rows, "k long, name string, block string")
    got = sorted(
        (r.block, r.dist)
        for r in blocked_match_pairs(
            df, max_dist=1, max_block_size=None, variant_max_len=4
        ).collect()
    )
    want = sorted(
        ("blk", _py_lev(na, nb))
        for ka, na, _ in rows
        for kb, nb, _ in rows
        if ka < kb and _py_lev(na, nb) <= 1
    )
    assert got == want
    # fixture sanity: at least one kept pair crosses the cutoff (4,5)
    assert ("blk", _py_lev("abcd", "abcde")) == ("blk", 1)


def test_entity_match_gated_equals_ungated_under_duplication(spark):
    """r10: the digest-gated entity matcher (distinct-name candidate join
    + member expansion under the head rule) must reproduce the ungated
    (block, dist) pair MULTISET exactly on a corpus with duplicated
    names, near-matches, NULLs, and a head cap that actually bites —
    and both must agree with the Python brute force."""
    from collections import Counter

    from gfe_db_spark.queries.warehouse import (
        blocked_match_pairs,
        blocked_match_pairs_gated,
    )

    base = ["anna", "annb", "anXa", "bob", "bobb", "zed"]
    rows = []
    for copy in range(4):  # 4-way duplication, interleaved keys
        for i, nm in enumerate(base):
            rows.append((copy + 10 * i, nm, "blk" if i % 2 else "blk2"))
    rows.append((999, None, "blk"))
    df = spark.createDataFrame(rows, "k long, name string, block string")
    cap = 5  # binds: blocks have 12 rows each

    ungated = Counter(
        (r.block, r.dist)
        for r in blocked_match_pairs(df, max_dist=1, max_block_size=cap).collect()
    )
    gated = Counter(
        (r.block, r.dist)
        for r in blocked_match_pairs_gated(df, max_block_size=cap).collect()
    )
    # brute force with the head rule
    by_block: dict = {}
    for k, nm, blk in rows:
        by_block.setdefault(blk, []).append((k, nm))
    want: Counter = Counter()
    for blk, mem in by_block.items():
        head = {k for k, _ in sorted(mem)[:cap]}
        for ka, na in mem:
            for kb, nb in mem:
                if ka < kb and ka in head and na is not None and nb is not None:
                    d = _py_lev(na, nb)
                    if d <= 1:
                        want[(blk, d)] += 1
    assert gated == ungated == want
    assert sum(want.values()) > 10  # fixture produces real volume


def test_aggregate_checksum_referee_render_contract(spark, tmp_path):
    """r10: the sf10 aggregate-checksum referee (tools/sweep_agg_oracle)
    compares engines through a canonical row rendering — bigints verbatim,
    doubles as round(x*1e9) BIGINT, booleans as 1/0, NULL as a sentinel —
    hashed with the md5-LE32 contract and reduced to
    (shard, count, xor, sum). Pin that Spark and DuckDB produce IDENTICAL
    aggregate rows for a fixture that exercises every rendered dtype,
    NULLs included; a drift here would silently turn sf10 value checks
    into false mismatches (or worse, false agreements)."""
    import importlib.util
    import duckdb
    from pyspark.sql import functions as F

    spec = importlib.util.spec_from_file_location(
        "sweep_agg_oracle", "/root/repo/tools/sweep_agg_oracle.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from gfe_db_spark.operators.text import hash_le32_expr

    rows = [
        (1, 0.123456789, "plain", True),
        (2, None, None, False),
        (3, -0.5, "pipe|inside", None),
        (4, 1.0, "", True),
        (5, 0.999999999, "dup", True),
        (6, 0.999999999, "dup", True),  # exact duplicate row except id
    ]
    df = spark.createDataFrame(rows, "id long, x double, s string, b boolean")
    cols = sorted(df.columns)
    dtypes = dict(df.dtypes)
    rowstr = F.concat_ws("|", *[F.expr(mod._spark_render(c, dtypes[c])) for c in cols])
    h = hash_le32_expr(rowstr)
    h2 = hash_le32_expr(F.concat(rowstr, F.lit(":agg")))
    got = sorted(
        tuple(r)
        for r in df.select((h % 16).alias("shard"), h2.alias("h2"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor("h2").alias("cksum"),
            F.sum("h2").alias("hsum"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    duck_render = ", ".join(mod._duck_render(c, dtypes[c]) for c in cols)
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH r AS (SELECT concat_ws('|', {duck_render}) AS rowstr FROM t),
            hh AS (SELECT CAST(md5_number_upper(rowstr) & 4294967295 AS BIGINT) AS h,
                          CAST(md5_number_upper(rowstr || ':agg') & 4294967295 AS BIGINT) AS h2
                   FROM r)
            SELECT CAST(h % 16 AS BIGINT), CAST(COUNT(*) AS BIGINT),
                   bit_xor(h2), CAST(SUM(h2) AS BIGINT)
            FROM hh GROUP BY 1
            """
        ).fetchall()
    )
    assert got == want


def test_union_find_cc_referee_equals_recursive_oracle():
    """r12 (r11 verdict item 2): the large-slice referee for the CC family
    replaces the oracle's recursive-CTE transitive closure with a linear
    Python union-find (tools/sweep_agg_oracle.rewrite_cc_oracle_with_
    union_find) — the recursion materializes up to |component|^2 rows per
    component and was the 25+ min straggler on 645-way-class edge sets.
    Pin the surgery: for EVERY entry routed through the rewrite, the
    rewritten oracle must produce row-for-row the same result as the
    registered recursive oracle on the same DuckDB connection (sf0.001 —
    real near-dup components present). No Spark involved: this isolates
    the rewrite itself."""
    import importlib.util
    import os

    from tests.conftest import SF_SMOKE

    spec = importlib.util.spec_from_file_location(
        "sweep_agg_oracle",
        os.path.join(os.path.dirname(__file__), "..", "tools", "sweep_agg_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from gfe_db_spark.queries import all_queries
    from gfe_db_spark.testing import duckdb_connection

    specs = all_queries()
    assert mod.CC_UNION_FIND_ENTRIES <= set(specs)
    for name in sorted(mod.CC_UNION_FIND_ENTRIES):
        con = duckdb_connection(SF_SMOKE)
        sql = specs[name].sql
        want = con.execute(sql).fetchall()  # registered recursive oracle
        rewritten = mod.rewrite_cc_oracle_with_union_find(con, sql)
        assert "reach" not in rewritten.lower().replace("unreach", ""), name
        got = con.execute(rewritten).fetchall()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want)), (
            f"{name}: union-find rewrite diverges from the recursive closure"
        )
        assert want, f"{name}: vacuous pin (oracle returned 0 rows at sf0.001)"


def test_zipf_text_expr_deterministic_and_zipf_shaped():
    """r12 (r11 verdict item 3): the mixed slices synthesize document
    text from a Zipf(1) vocabulary (make_scaled_sf.zipf_text_expr) so
    the shingle-df spectrum spans decades like real text. Pin the
    generator itself: (a) byte-identical across evaluations (hash-based,
    no RNG state — regenerated slices must reproduce exactly); (b) token
    count preserved from the source text; (c) the token frequency
    distribution is actually Zipf-shaped (rank-1 frequency ≈ N/(r·H(V))
    — check top-rank dominance and a heavy df-1 tail)."""
    import importlib.util
    import os

    import duckdb

    spec = importlib.util.spec_from_file_location(
        "make_scaled_sf",
        os.path.join(os.path.dirname(__file__), "..", "tools", "make_scaled_sf.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s AS SELECT i AS doc_id, "
        "array_to_string(list_transform(range(0, 40), x -> 'w'), ' ') AS text "
        "FROM range(500) t(i)"
    )
    expr = mod.zipf_text_expr(5000, doc_id_col="s.doc_id", text_col="s.text")
    a = con.execute(f"SELECT {expr} FROM s ORDER BY doc_id").fetchall()
    b = con.execute(f"SELECT {expr} FROM s ORDER BY doc_id").fetchall()
    assert a == b, "generator must be deterministic"
    toks = a[0][0].split(" ")
    assert len(toks) == 40, "token count must match the source text"
    counts = con.execute(
        f"""
        WITH g AS (SELECT {expr} AS t FROM s),
        tok AS (SELECT unnest(string_split(t, ' ')) AS w FROM g)
        SELECT w, COUNT(*) AS c FROM tok GROUP BY w ORDER BY c DESC
        """
    ).fetchall()
    total = sum(c for _, c in counts)
    # Zipf s=1 over V=5000: P(rank 1) = 1/H(5000) ~= 1/9.1 ~= 11%
    assert counts[0][0] == "tok1" and counts[0][1] / total > 0.08
    singletons = sum(1 for _, c in counts if c == 1)
    assert singletons > len(counts) * 0.3, "expected a heavy df-1 tail"


def test_mixed_duplication_slice_pins_gate_choice_and_plan_identity(spark, tmp_path):
    """r11 (r10 verdict item 3): the uniform scaled slices only exercise
    the duplication-adaptive choosers at the extremes (all-distinct at
    bench scale, massive exact duplication at sf1/sf10). This builds the
    committed mixed-duplication slice (tools/make_scaled_sf.py --mode
    mixed: Zipf head classes, every-5th-replica near-dup token edits,
    distinct ratio targeted near the 0.95 gate threshold) at sf0.001 and
    pins (a) that the slice really is skewed + near-duplicated, (b) that
    each chooser's decision equals the documented rule applied to the
    SAME memoized stats it consumes — so threshold behavior is pinned
    against the slice's actual stats, not an assumed side — and (c) that
    the registered entry's rows equal BOTH direct plans on this slice,
    keeping the choice physical-only where it matters most (organic
    near-dup families at the boundary)."""
    import importlib.util
    import os

    from pyspark.sql import functions as F

    from gfe_db_spark.operators import dedup as DD
    from gfe_db_spark.queries.dedup import (
        GATE_DISTINCT_RATIO,
        _use_digest_gate,
        dedup_lsh_pairs,
    )
    from gfe_db_spark.sources.tables import corpus_stats

    spec = importlib.util.spec_from_file_location(
        "make_scaled_sf",
        os.path.join(os.path.dirname(__file__), "..", "tools", "make_scaled_sf.py"),
    )
    mk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mk)

    from tests.conftest import SF_SMOKE
    src = SF_SMOKE
    if not os.path.isdir(src):
        import pytest

        pytest.skip("driver testdata not present")
    dst = str(tmp_path / "sfmix")
    stats = mk.make_mixed(src, dst, target_ratio=0.94)

    # (a) the slice is genuinely mixed: skewed exact classes AND near-dup
    # variants (distinct texts inside a head class's replica family)
    docs = spark.read.parquet(f"{dst}/documents.parquet")
    cls = docs.groupBy("text").count()
    assert cls.agg(F.max("count")).collect()[0][0] >= 2, "no exact classes"
    assert stats["documents"]["ratio"] < 1.0
    n_rows, n_distinct_digest = corpus_stats(spark, dst, "documents")
    assert n_rows == stats["documents"]["rows"]

    # (b) chooser decision == rule applied to the stats it consumes: the
    # HLL estimate may sit on either side of the threshold at a ratio
    # this close, but the DECISION must be consistent with it
    expected = n_distinct_digest < GATE_DISTINCT_RATIO * n_rows
    assert _use_digest_gate(spark, dst) is expected

    # (c) registered entry == both direct plans on the mixed slice
    sigs = DD.minhash_signatures(DD.shingles(docs, n=3, distinct=False), num_hashes=8)
    ungated = {
        tuple(r)
        for r in DD.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2).collect()
    }
    gated = {
        tuple(r)
        for r in DD.lsh_candidate_pairs_gated(
            docs, bands=4, rows_per_band=2, n=3, num_hashes=8
        ).collect()
    }
    chosen = {tuple(r) for r in dedup_lsh_pairs(spark, dst).collect()}
    assert chosen == ungated == gated

    # prescale path (builds LARGE near-threshold slices from a small
    # distinct source): payloads must stay all-distinct after the P-way
    # expansion, and the Zipf head must apply on top of it
    dst2 = str(tmp_path / "sfmix_pre")
    stats2 = mk.make_mixed(src, dst2, target_ratio=0.94, prescale=3)
    assert stats2["documents"]["rows"] > 3 * (stats["documents"]["rows"] // 2)
    docs2 = spark.read.parquet(f"{dst2}/documents.parquet")
    assert docs2.groupBy("text").count().agg(F.max("count")).collect()[0][0] >= 2
    assert docs2.select("doc_id").distinct().count() == docs2.count()
    n2, nd2 = corpus_stats(spark, dst2, "documents")
    assert _use_digest_gate(spark, dst2) is (nd2 < GATE_DISTINCT_RATIO * n2)
