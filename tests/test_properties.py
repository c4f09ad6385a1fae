"""Property-based tests (hypothesis) for the engine's custom invariants —
the pieces where a single golden example can't cover the input space.

Spark jobs are slow per-example, so each property runs few, large,
randomized examples (deadline disabled; derandomized for CI stability)
and asserts over whole DataFrames, not per-row.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gfe_db_spark.plans.accession import AccessionRegistry

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

seq_st = st.text(alphabet="ACGT", min_size=1, max_size=12)
feature_st = st.tuples(
    st.sampled_from(["HLA-A", "HLA-B"]),
    st.sampled_from(["EXON", "INTRON"]),
    st.integers(min_value=1, max_value=3),
    seq_st,
)


def _features_df(spark, rows):
    return spark.createDataFrame(
        [(l, t, r, s) for (l, t, r, s) in rows],
        "locus string, term string, rank int, sequence string",
    )


@given(rows=st.lists(feature_st, min_size=1, max_size=40))
@settings(**SETTINGS)
def test_accession_bijection_and_determinism(spark, tmp_path_factory, rows):
    """Within (locus, term, rank): accession ↔ sequence is 1-to-1, numbering
    is dense from 1, and a fresh registry fed the same rows in ANY partition
    layout assigns identical accessions."""
    base = tmp_path_factory.mktemp("acc")
    df = _features_df(spark, rows)

    r1 = AccessionRegistry(spark, str(base / "r1"))
    out1 = r1.assign(df, "3550")
    got1 = {
        (r["locus"], r["term"], r["rank"], r["sequence"]): r["accession"]
        for r in out1.collect()
    }

    # 1-to-1 + dense per context
    per_ctx: dict[tuple, dict] = {}
    for (l, t, rk, s), acc in got1.items():
        per_ctx.setdefault((l, t, rk), {})[s] = acc
    for ctx, mapping in per_ctx.items():
        accs = sorted(mapping.values())
        assert accs == list(range(1, len(mapping) + 1)), (ctx, mapping)

    # determinism under repartitioning
    r2 = AccessionRegistry(spark, str(base / "r2"))
    out2 = r2.assign(df.repartition(7), "3550")
    got2 = {
        (r["locus"], r["term"], r["rank"], r["sequence"]): r["accession"]
        for r in out2.collect()
    }
    assert got1 == got2


@given(
    batch1=st.lists(feature_st, min_size=1, max_size=20),
    batch2=st.lists(feature_st, min_size=1, max_size=20),
)
@settings(**SETTINGS)
def test_accession_stability_under_append(spark, tmp_path_factory, batch1, batch2):
    """The permanence invariant: assigning a second release never changes
    any accession handed out for the first."""
    base = tmp_path_factory.mktemp("acc2")
    reg = AccessionRegistry(spark, str(base / "r"))

    out1 = reg.assign(_features_df(spark, batch1), "3550")
    before = {
        (r["locus"], r["term"], r["rank"], r["sequence"]): r["accession"]
        for r in out1.collect()
    }
    reg.assign(_features_df(spark, batch2), "3560")
    # re-resolve batch1 against the grown registry
    out_again = reg.assign(_features_df(spark, batch1), "3570")
    after = {
        (r["locus"], r["term"], r["rank"], r["sequence"]): r["accession"]
        for r in out_again.collect()
    }
    assert after == before


word_st = st.text(alphabet="abcd", min_size=1, max_size=6)


@given(
    texts=st.lists(
        st.lists(word_st, min_size=3, max_size=8).map(" ".join),
        min_size=2,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_minhash_lsh_finds_exact_duplicates(spark, texts):
    """Any two identical texts share every shingle, hence every minhash
    signature, hence every band bucket — LSH candidate generation can never
    miss an exact duplicate (recall=1 at similarity 1.0, the property that
    makes banding sound)."""
    from gfe_db_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    # duplicate every text once, with distinct ids
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (1000 + i, t) for i, t in enumerate(texts)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(minhash_signatures(shingles(docs))).collect()
    }
    for i in range(len(texts)):
        assert (i, 1000 + i) in pairs


@given(
    corpus=st.lists(
        st.tuples(
            st.one_of(
                st.none(),
                st.lists(word_st, min_size=0, max_size=8).map(" ".join),
            ),
            st.integers(min_value=1, max_value=3),  # exact-copy multiplicity
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_gated_pair_paths_equal_ungated_on_random_corpus(spark, corpus):
    """r8 verdict item 7: the planted-corpus identity tests pin the gated
    paths on known shapes; this pins them on RANDOM corpora — arbitrary
    short/empty/NULL texts at arbitrary exact-copy multiplicities. All
    three digest-gated operators must reproduce their ungated pair sets
    exactly (the gate is a cost transformation, never a semantic one)."""
    from gfe_db_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_gated,
        minhash_est_pairs_gated,
        minhash_jaccard_estimate,
        minhash_signatures,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_gated,
        shingles,
    )

    rows = []
    for text, copies in corpus:
        for _ in range(copies):
            rows.append((len(rows), text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh_set = shingles(docs, n=3)
    assert {
        tuple(r) for r in ngram_jaccard_pairs_gated(docs, n=3, threshold=0.3).collect()
    } == {tuple(r) for r in ngram_jaccard_pairs(sh_set, threshold=0.3).collect()}

    sigs = minhash_signatures(shingles(docs, n=3, distinct=False), num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    assert {
        tuple(r) for r in lsh_candidate_pairs_gated(docs).collect()
    } == {tuple(r) for r in pairs.collect()}
    assert {
        tuple(r) for r in minhash_est_pairs_gated(docs).collect()
    } == {tuple(r) for r in minhash_jaccard_estimate(sigs, pairs, num_hashes=8).collect()}


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=50
    ),
    salt=st.integers(min_value=2, max_value=32),
)
@settings(**SETTINGS)
def test_salted_count_distinct_any_salt(spark, vals, salt):
    from gfe_db_spark.operators.skew import salted_count_distinct

    df = spark.createDataFrame([(1, v) for v in vals], "k long, v double")
    expected = len(set(vals))
    got = salted_count_distinct(df, "k", "v", salt=salt).collect()[0]["n_distinct"]
    assert got == expected


def test_bucketed_neardup_subset_and_probe_complete(spark):
    """Contract of the bucketed embedding near-dup vs the exact all-pairs
    recall oracle (`embedding_neardup_pairs`):

    1. soundness — every bucketed pair appears in the exact result with an
       identical cosine (bucketing may drop pairs, never invent or distort);
    2. probe completeness — every exact pair whose sign-LSH buckets differ
       in ≤ probe_bits bits IS found: the multi-probe neighborhood is the
       only recall loss, exactly as documented;
    3. exact duplicates (Hamming 0 by construction) are always found."""
    from gfe_db_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_bucketed,
    )
    from gfe_db_spark.operators.similarity import hyperplane_bucket_id
    from gfe_db_spark.sources.tables import table
    from tests.conftest import SF_SMOKE

    emb = table(spark, SF_SMOKE, "embeddings")
    threshold, n_planes, probe_bits = 0.4, 8, 2
    bucketed = {
        (r.id_a, r.id_b): r.cos
        for r in embedding_neardup_pairs_bucketed(
            emb, threshold=threshold, n_planes=n_planes, probe_bits=probe_bits
        ).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.cos
        for r in embedding_neardup_pairs(emb, threshold=threshold).collect()
    }
    # 1. soundness
    assert set(bucketed) <= set(exact)
    assert all(exact[p] == c for p, c in bucketed.items())
    # 2. probe completeness
    buckets = {r.vec_id: r.bucket for r in hyperplane_bucket_id(emb, n_planes=n_planes).collect()}
    expected_found = {
        p for p in exact if bin(buckets[p[0]] ^ buckets[p[1]]).count("1") <= probe_bits
    }
    assert expected_found == set(bucketed)
    assert exact, "fixture must produce near-dup pairs"

    # 3. planted exact duplicate is always recalled
    first = emb.limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(999999, list(first.embedding), first.label)], emb.schema
    )
    planted = emb.unionByName(dup)
    found = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs_bucketed(
            planted, threshold=0.99, n_planes=n_planes, probe_bits=0
        ).collect()
    }
    assert (first.vec_id, 999999) in found


def test_registry_compaction_preserves_contents(spark, tmp_path_factory):
    """10 sequential commits with a low compaction threshold: the registry
    ends with ≤ max_files part files and the accession mapping is
    byte-identical to what the commits assigned (compaction is a pure
    file-layout rewrite)."""
    import os

    from gfe_db_spark.plans.accession import AccessionRegistry

    path = str(tmp_path_factory.mktemp("reg") / "registry")
    # pinned to the legacy flat-dir layout: this test asserts its
    # top-level part-file bound; the tx layout's structural bounds are
    # asserted in test_gfe_pipeline.test_registry_tx_* instead
    reg = AccessionRegistry(spark, path, max_files=5, compact_files=2, layout="inplace")
    assigned = {}
    for batch in range(10):
        feats = spark.createDataFrame(
            [("HLA-A", "exon", 1, f"SEQ{batch}_{i}") for i in range(4)],
            "locus string, term string, rank int, sequence string",
        )
        out = reg.assign(feats, release=str(3550 + 10 * batch))
        for r in out.collect():
            key = (r.locus, r.term, r.rank, r.sequence)
            assert assigned.get(key, r.accession) == r.accession
            assigned[key] = r.accession
    n_parts = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_parts <= 5, f"{n_parts} part files after compaction"
    final = {
        (r.locus, r.term, r.rank, r.sequence): r.accession for r in reg.load().collect()
    }
    assert final == assigned
    # accessions are a bijection per context: 40 distinct seqs → 1..40
    assert sorted(final.values()) == list(range(1, 41))


def test_registry_compaction_recovers_without_success_marker(spark, tmp_path_factory):
    """Crash between delete and rename during compaction, on a cluster
    where the committer's _SUCCESS marker is disabled: recovery promotes
    the staged dir via the registry's own _COMPACTION_COMPLETE marker. A
    staged dir with NO completion marker at all still refuses promotion."""
    import os
    import shutil

    import pytest as _pytest

    from gfe_db_spark.plans.accession import AccessionRegistry

    path = str(tmp_path_factory.mktemp("reg") / "registry")
    # legacy layout: the .compacting-marker recovery protocol under test
    # exists only there (the tx layout needs no swap recovery)
    reg = AccessionRegistry(spark, path, layout="inplace")
    feats = spark.createDataFrame(
        [("HLA-A", "exon", 1, f"S{i}") for i in range(4)],
        "locus string, term string, rank int, sequence string",
    )
    reg.assign(feats, release="3550")
    before = {(r.locus, r.term, r.rank, r.sequence): r.accession for r in reg.load().collect()}

    # simulate the crash point: registry deleted, fully-written staged dir
    # present with our marker but WITHOUT the committer's _SUCCESS
    shutil.move(path, path + ".compacting")
    open(path + ".compacting/_COMPACTION_COMPLETE", "w").write("ok")
    success = path + ".compacting/_SUCCESS"
    if os.path.exists(success):
        os.remove(success)

    after = {(r.locus, r.term, r.rank, r.sequence): r.accession for r in reg.load().collect()}
    assert after == before
    assert os.path.isdir(path) and not os.path.exists(path + ".compacting")
    assert not os.path.exists(path + "/_COMPACTION_COMPLETE")

    # a partial staged dir (no marker of either kind) must not be promoted
    shutil.move(path, path + ".compacting")
    for m in ("_COMPACTION_COMPLETE", "_SUCCESS"):
        p = os.path.join(path + ".compacting", m)
        if os.path.exists(p):
            os.remove(p)
    with _pytest.raises(RuntimeError, match="manual recovery"):
        reg.load()


@given(
    vec=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=1,
        max_size=16,
    )
)
@settings(**SETTINGS)
def test_quantize_roundtrip_error_bound_property(spark, vec):
    """For ANY vector — including all-zero, where scale is 0 and q must be
    the zero vector rather than NaN — int8 quantization round-trips within
    scale/2 per element and q stays in int8 range (the operator contract,
    not just the fixture)."""
    from gfe_db_spark.operators.similarity import quantize_embeddings

    emb = spark.createDataFrame([(0, vec)], "vec_id long, embedding array<float>")
    r = quantize_embeddings(emb).collect()[0]
    assert all(q is not None and -128 <= q <= 127 for q in r.q)
    if all(x == 0 for x in vec):
        assert r.scale == 0 and set(r.q) == {0} and r.rms_err == 0
    # elementwise bound implies the rms bound; allow rounding slack on scale
    for x, q in zip([float(f) for f in emb.collect()[0].embedding], r.q):
        assert abs(x - q * r.scale) <= r.scale / 2 + 1e-9


@given(rates=st.lists(st.integers(min_value=0, max_value=10000), min_size=2, max_size=4))
@settings(**SETTINGS)
def test_deterministic_sample_nested_property(spark, rates):
    """Sampling gates nest: for any rates r1 ≤ r2, sample(r1) ⊆ sample(r2)
    under the same salt — the property that makes rate changes safe on a
    live corpus (only adds/removes the delta, never reshuffles)."""
    from gfe_db_spark.operators.text import deterministic_sample

    docs = spark.range(0, 300).selectExpr("id AS doc_id")
    rates = sorted(rates)
    prev: set[int] | None = None
    for rate in rates:
        cur = {r.doc_id for r in deterministic_sample(docs, rate).collect()}
        if prev is not None:
            assert prev <= cur
        prev = cur


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=12
    )
)
@settings(**SETTINGS)
def test_repetition_stats_bounds_property(spark, texts):
    """For ANY corpus: dup_token_frac ∈ [0, 1); top_bigram_frac ∈ (0, 1]
    when defined; n_tokens matches a plain-Python tokenization; tokenless
    docs are absent."""
    from gfe_db_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    for i, text in enumerate(texts):
        toks = [t for t in text.split() if t]
        if not toks:
            assert i not in got
            continue
        r = got[i]
        assert r.n_tokens == len(toks)
        assert abs(r.dup_token_frac - round(1 - len(set(toks)) / len(toks), 6)) < 1e-9
        if len(toks) >= 2:
            assert 0 < r.top_bigram_frac <= 1
        else:
            assert r.top_bigram_frac is None


@given(
    lengths=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30),
    cap=st.integers(min_value=8, max_value=64),
)
@settings(**SETTINGS)
def test_pack_sequences_partition_property(spark, lengths, cap):
    """For ANY token-length distribution and chunk budget: every shard's
    packs tile its token stream exactly — pack_ids are the contiguous
    chunk indices of the running offset, token mass is conserved, and
    no pack_id is negative."""
    from gfe_db_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lengths)],
        "doc_id long, text string",
    )
    rows = sorted(
        pack_sequences(docs, max_tokens=cap, n_shards=4).collect(),
        key=lambda r: (r.shard, r.doc_id),
    )
    assert len(rows) == len(lengths)
    offset: dict[int, int] = {}
    for r in rows:
        start = offset.get(r.shard, 0)
        assert r.pack_id == start // cap >= 0
        offset[r.shard] = start + r.n_tokens
    assert sum(offset.values()) == sum(n for n in lengths)


@given(
    texts=st.lists(
        st.lists(word_st, min_size=3, max_size=8).map(" ".join),
        min_size=2,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_contamination_properties(spark, texts):
    """For ANY corpus and benchmark ⊆ corpus: benchmark docs are fully
    self-contaminated, contaminated counts never exceed totals, and a
    SMALLER benchmark can only lower per-doc contamination (monotone in
    the benchmark set)."""
    from gfe_db_spark.operators.dedup import contamination_counts

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    bench_big = docs.filter("doc_id % 2 = 0")
    bench_small = docs.filter("doc_id % 4 = 0")
    big = {r.doc_id: r for r in contamination_counts(docs, bench_big, n=3).collect()}
    small = {r.doc_id: r for r in contamination_counts(docs, bench_small, n=3).collect()}
    for did, r in big.items():
        assert 0 <= r.n_contaminated <= r.n_shingles
        if did % 2 == 0:
            assert r.n_contaminated == r.n_shingles and r.contaminated
        assert small[did].n_contaminated <= r.n_contaminated


@given(
    texts=st.lists(
        st.lists(word_st, min_size=2, max_size=8).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_lm_cross_entropy_bounds_property(spark, texts):
    """For ANY corpus: every score is ≥ 0 (counts satisfy c_ab ≤ c_a) and
    ≤ ln(total bigram mass); a doc repeated verbatim many times drives its
    score toward 0 relative to a one-off doc's."""
    import math

    from gfe_db_spark.operators.text import lm_cross_entropy

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = lm_cross_entropy(docs).collect()
    total_bigrams = sum(r.n_bigrams for r in rows)
    for r in rows:
        assert r.avg_neg_logp >= 0
        assert r.avg_neg_logp <= math.log(max(total_bigrams, 2)) + 1e-6


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA0),
            max_size=700,
        ),
        min_size=1,
        max_size=12,
    ),
    chunk=st.integers(min_value=2, max_value=300),
)
@settings(**SETTINGS)
def test_chunk_documents_reconstruction_property(spark, texts, chunk):
    """Chunking invariants for arbitrary unicode text and chunk geometry:
    (1) stitching each chunk's non-overlap tail reconstructs the document
    exactly, (2) every chunk except the last is full-width, (3) chunk
    counts follow the integer formula both engines share."""
    from gfe_db_spark.operators.text import chunk_documents

    stride = max(1, chunk * 3 // 4)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = chunk_documents(docs, chunk_chars=chunk, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, t in enumerate(texts):
        rs = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        n = len(t)
        expect_chunks = 1 if n <= chunk else 1 + -(-(n - chunk) // stride)
        assert len(rs) == expect_chunks
        rebuilt = ""
        for r in rs:
            start = r.chunk_idx * stride
            assert r.chunk_text == t[start : start + chunk]
            if r.chunk_idx < len(rs) - 1:
                assert r.chunk_len == chunk  # only the tail may be short
            rebuilt = rebuilt[:start] + r.chunk_text
        assert rebuilt == t


_doc_st = st.lists(
    st.lists(st.sampled_from(list("abcdefgh")), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=12,
)


@given(texts=_doc_st)
@settings(**SETTINGS)
def test_set_similarity_prefix_filter_lossless(spark, texts):
    """The PPJoin prefix filter must be LOSSLESS: against random
    small-vocab corpora, the prefix-filtered join returns exactly the
    pairs a brute-force exact Jaccard (plain Python) finds at t = 3/5."""
    from gfe_db_spark.operators.dedup import set_similarity_join

    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r.da, r.db)
        for r in set_similarity_join(docs, 3, 5).collect()
    }
    sets = {i: set(t.split()) for i, t in enumerate(texts)}
    want = set()
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if inter * 5 >= 3 * union:
                    want.add((a, b))
    assert got == want


@given(texts=_doc_st)
@settings(**SETTINGS)
def test_duplicated_spans_match_bruteforce(spark, texts):
    """Span coverage must equal a brute-force reference: flag every k-gram
    occurring >1 time in the corpus, merge per-doc intervals, count
    covered tokens (k=3 so short random docs exercise the path)."""
    from collections import Counter

    from gfe_db_spark.operators.dedup import duplicated_span_stats

    k = 3
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_spans, r.n_dup_tokens)
        for r in duplicated_span_stats(docs, k=k).collect()
    }
    grams: Counter = Counter()
    toks = {i: t.split() for i, t in enumerate(texts)}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            grams[tuple(ts[p : p + k])] += 1
    want = {}
    for i, ts in toks.items():
        flagged = [
            p for p in range(len(ts) - k + 1) if grams[tuple(ts[p : p + k])] > 1
        ]
        spans = []
        for p in flagged:
            # merge iff the window STARTS inside the current span
            # (p <= prev_end); p == prev_end + 1 starts a new span,
            # matching the operator's strict p > prev_end island rule
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k - 1)
            else:
                spans.append([p, p + k - 1])
        want[i] = (len(spans), sum(e - s + 1 for s, e in spans))
    assert got == want


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),  # user
            st.integers(min_value=0, max_value=15),  # epoch day
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_rolling_distinct_matches_bruteforce(spark, pairs):
    """Trailing-7-day distinct users vs a brute-force recount, for ANY
    activity pattern (gaps, repeats, single-day bursts)."""
    from gfe_db_spark.queries.streaming import rolling_distinct_users_7d
    import os
    import tempfile

    rows = [(u, d * 86400 + 3600) for u, d in pairs]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(rows, "user_id long, secs long").selectExpr(
            "user_id", "timestamp_seconds(secs) AS ts"
        ).write.parquet(os.path.join(tmp, "events.parquet"))
        got = {
            r.day: r.n_users_7d
            for r in rolling_distinct_users_7d(spark, tmp).collect()
        }
    want = {}
    days = {d for _, d in pairs}
    for d in days:
        want[d] = len({u for u, dd in pairs if d - 6 <= dd <= d})
    assert got == want


def test_bucketed_candidates_are_unique_without_dedupe(spark):
    """XOR multi-probe candidate generation emits every (id_a, id_b) pair
    at most once — the single matching mask is bucket_a XOR bucket_b — so
    the scoring pipeline's lack of a dedupe shuffle is sound. Checked for
    both pair semantics over the real embeddings table."""
    from gfe_db_spark.operators.dedup import _bucketed_candidate_scores
    from gfe_db_spark.sources.tables import table
    from tests.conftest import SF_SMOKE

    emb = table(spark, SF_SMOKE, "embeddings")
    for ordered in (True, False):
        cand = _bucketed_candidate_scores(
            emb, n_planes=8, probe_bits=2, id_col="vec_id",
            vec_col="embedding", dim=64, ordered_pairs=ordered,
        )
        total = cand.count()
        distinct = cand.select("id_a", "id_b").distinct().count()
        assert total == distinct, f"duplicate candidates (ordered={ordered})"


@given(
    texts=st.lists(
        st.lists(word_st, min_size=3, max_size=10).map(" ".join),
        min_size=2,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_leakage_safe_split_cluster_consistent(spark, texts):
    """The leakage-safety invariant for ANY corpus: every near-dup cluster
    lands wholly inside one split (no train/test contamination channel),
    and singleton docs get exactly the per-doc hash split — so adopting
    the safe split changes nothing for docs without near-dups."""
    from gfe_db_spark.operators.dedup import neardup_components
    from gfe_db_spark.operators.text import deterministic_split

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    assigned = deterministic_split(neardup_components(docs), id_col="cluster_id")
    per_cluster = assigned.groupBy("cluster_id").agg(
        F.count_distinct("split").alias("n_splits"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    assert per_cluster.filter("n_splits > 1").count() == 0, "cluster spans splits"
    singles = assigned.join(
        per_cluster.filter("n_docs = 1").select("cluster_id"), "cluster_id"
    )
    doc_split = deterministic_split(docs.select("doc_id"), id_col="doc_id").select(
        "doc_id", F.col("split").alias("doc_hash_split")
    )
    disagree = (
        singles.join(doc_split, "doc_id")
        .filter("split <> doc_hash_split")
        .count()
    )
    assert disagree == 0, "singleton split differs from per-doc hash split"


@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.lists(word_st, min_size=0, max_size=8).map(" ".join),
        ),
        min_size=2,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_neardup_components_gate_preserves_clusters(spark, texts):
    """The exact-digest gate is a pure optimization: components computed
    over digest-class representatives and fanned back out equal the
    components of the ungated doc-level pair graph, for ANY corpus
    (hypothesis drives duplicate-heavy ones — the word alphabet is tiny,
    so identical texts are common; min_size=0 plus None admits empty,
    sub-n-token, and NULL texts, the round-5 advice divergence: the gate
    must keep those as singletons, never collapse identical short docs)."""
    from gfe_db_spark.operators.dedup import (
        neardup_components,
        ngram_jaccard_pairs,
        shingles,
    )
    from gfe_db_spark.plans.graph_algos import connected_components

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    gated = {
        (r.doc_id, r.cluster_id) for r in neardup_components(docs).collect()
    }
    pairs = ngram_jaccard_pairs(shingles(docs, n=3), threshold=0.5)
    cc = connected_components(
        docs.select(F.col("doc_id").alias("node")),
        pairs.select("doc_a", "doc_b"),
        "doc_a",
        "doc_b",
    )
    ungated = {(r.node, r.component) for r in cc.collect()}
    assert gated == ungated


@given(
    keys=st.lists(st.integers(min_value=0, max_value=8), min_size=20, max_size=200)
)
@settings(**SETTINGS)
def test_freq_items_superset_of_exact_hitters(spark, keys):
    """The heavy-hitter contract for ANY key distribution: freqItems with
    support s returns a superset of every key whose frequency is strictly
    above s (Karp counter guarantee — false positives allowed, false
    negatives never)."""
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    support = 0.2
    sketch = set(df.stat.freqItems(["user_id"], support).first()[0])
    n = len(keys)
    from collections import Counter

    exact = {k for k, c in Counter(keys).items() if c > support * n}
    assert exact <= sketch, f"missed hitters: {exact - sketch}"


@given(
    texts=st.lists(
        st.lists(word_st, min_size=3, max_size=10).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_bloom_filter_no_false_negatives(spark, texts):
    """The Bloom contract, for ANY corpus/benchmark and a deliberately tiny
    filter (high collision pressure): every term in the build set probes
    true (zero false negatives — the guarantee decontamination relies on),
    and the bitset is exactly m_bits/32 words with only in-word bits set."""
    from gfe_db_spark.operators.dedup import bloom_bitset, bloom_probe, shingles

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    bench_sh = shingles(docs.filter("doc_id % 2 = 0"), n=3).select("shingle").distinct()
    doc_sh = shingles(docs, n=3)
    # m=64 bits forces collisions, so false POSITIVES are likely — the
    # property is that false NEGATIVES still never happen.
    for m_bits in (64, 4096):
        bloom = bloom_bitset(bench_sh, m_bits=m_bits, k=3)
        words = {r.word: r.bits for r in bloom.collect()}
        assert all(0 <= w < m_bits // 32 for w in words), "word id out of range"
        assert all(0 <= b <= 0xFFFFFFFF for b in words.values()), (
            "bits outside the 32-bit word"
        )
        probed = bloom_probe(doc_sh, bloom, m_bits=m_bits, k=3)
        missed = (
            probed.join(bench_sh, "shingle", "left_semi")
            .filter(~F.col("bloom_hit"))
            .count()
        )
        assert missed == 0, f"false negatives at m_bits={m_bits}"


@given(
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # start day
            st.integers(min_value=0, max_value=10),  # duration
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_interval_concurrency_matches_bruteforce(spark, spans):
    """The boundary-delta running sum equals a per-day brute-force count
    of open intervals, for ANY interval set (overlaps, nesting, zero
    length), and closes to zero after the last end."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    rows = [(i, s, s + d) for i, (s, d) in enumerate(spans)]
    df = spark.createDataFrame(rows, "id long, start_day long, end_day long")
    deltas = df.select(F.col("start_day").alias("day"), F.lit(1).alias("delta")).unionAll(
        df.select((F.col("end_day") + 1).alias("day"), F.lit(-1).alias("delta"))
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    got = {
        r.day: r.open
        for r in deltas.groupBy("day")
        .agg(F.sum("delta").alias("d"))
        .withColumn("open", F.sum("d").over(w))
        .collect()
    }
    days = sorted(got)
    for day in days:
        want = sum(1 for _, s, e in rows if s <= day <= e)
        assert got[day] == want, (day, got[day], want)
    assert got[days[-1]] == 0  # day after the last end closes everything


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(**SETTINGS)
def test_simhash_banding_complete_and_exact(spark, seed):
    """Pigeonhole banding is COMPLETE and PRECISE: over random 64-bit
    signatures (plus planted near-dups), the banded join returns exactly
    the brute-force pair set within Hamming distance 3 — no recall loss
    (the pigeonhole guarantee) and no extra pairs (the exact bit_count
    check)."""
    import random

    from gfe_db_spark.operators.dedup import simhash_hamming_pairs

    rng = random.Random(seed)

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    sigs = {i: rng.getrandbits(64) for i in range(60)}
    # plant near-dups of random anchors at distances 1..3
    for j, d in [(60, 1), (61, 2), (62, 3), (63, 3)]:
        base = sigs[rng.randrange(60)]
        flip = 0
        while bin(flip).count("1") < d:
            flip |= 1 << rng.randrange(64)
        sigs[j] = base ^ flip
    expect = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    df = spark.createDataFrame(
        [(i, signed(v)) for i, v in sigs.items()], "doc_id long, simhash64 long"
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_hamming_pairs(df, max_hamming=3, n_blocks=4).collect()
    }
    assert got == expect


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=40),
)
@settings(**SETTINGS)
def test_shard_by_token_budget_equals_naive_cumsum(spark, sizes, budget):
    """The two-phase distributed prefix sum equals the naive sequential
    cumulative sum for arbitrary doc sizes, ids, and budgets, with ids
    deliberately sparse so bucket boundaries are irregular."""
    from gfe_db_spark.operators.packing import shard_by_token_budget

    rows = [(7 * i + (i % 3), "x " * n) for i, n in enumerate(sizes)]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.start_offset, r.shard)
        for r in shard_by_token_budget(docs, budget=budget, bucket_span=5).collect()
    }
    run = 0
    for i, t in sorted(rows):
        n = len(t.split())
        assert got[i] == (n, run, run // budget)
        run += n


name_st = st.text(
    alphabet="abcdeXY", min_size=0, max_size=12
)


@given(
    names=st.lists(name_st, min_size=2, max_size=14),
    max_dist=st.integers(min_value=1, max_value=3),
)
@settings(**SETTINGS)
def test_length_band_prefilter_is_lossless_on_random_names(spark, names, max_dist):
    """r9 verdict item 7 (hypothesis twin of the planted length-band
    test): for ARBITRARY names and thresholds, blocked_match_pairs with
    the |len(a)-len(b)| <= max_dist band in the join condition must equal
    the Python brute-force threshold levenshtein — the band is a lower
    bound, so it can only remove pairs the DP would reject anyway."""
    from gfe_db_spark.queries.warehouse import blocked_match_pairs

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rows = [(i, nm, f"b{i % 2}") for i, nm in enumerate(names)]
    df = spark.createDataFrame(rows, "k long, name string, block string")
    got = sorted(
        (r.block, r.dist)
        for r in blocked_match_pairs(
            df, max_dist=max_dist, max_block_size=None
        ).collect()
    )
    want = sorted(
        (ba, lev(na, nb))
        for ka, na, ba in rows
        for kb, nb, bb in rows
        if ba == bb and ka < kb and lev(na, nb) <= max_dist
    )
    assert got == want


@given(
    classes=st.lists(
        st.tuples(name_st, st.integers(min_value=1, max_value=3)),
        min_size=1,
        max_size=8,
    ),
    cap=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_entity_gate_equals_ungated_on_random_duplicated_names(spark, classes, cap):
    """r10: the digest-gated entity matcher must equal the ungated pair
    MULTISET on random names at random duplication multiplicities with a
    random (often-binding) head cap — the gate is a cost transformation
    of the candidate join, never a semantics change."""
    from collections import Counter

    from gfe_db_spark.queries.warehouse import (
        blocked_match_pairs,
        blocked_match_pairs_gated,
    )

    rows = []
    for name, copies in classes:
        for _ in range(copies):
            rows.append((len(rows), name, f"b{len(rows) % 2}"))
    df = spark.createDataFrame(rows, "k long, name string, block string")
    ungated = Counter(
        (r.block, r.dist)
        for r in blocked_match_pairs(df, max_dist=1, max_block_size=cap).collect()
    )
    gated = Counter(
        (r.block, r.dist)
        for r in blocked_match_pairs_gated(df, max_block_size=cap).collect()
    )
    assert gated == ungated


@given(
    classes=st.lists(
        st.tuples(
            st.lists(
                st.integers(min_value=-3, max_value=3), min_size=3, max_size=3
            ),
            st.integers(min_value=1, max_value=4),  # copies
            st.integers(min_value=0, max_value=1),  # cluster
        ),
        min_size=1,
        max_size=8,
    ),
    cap=st.integers(min_value=1, max_value=6),
    tau=st.sampled_from([0.3, 0.7, 0.95]),
)
@settings(**SETTINGS)
def test_semdedup_gate_equals_ungated_on_random_duplicated_vectors(
    spark, classes, cap, tau
):
    """r10: the class-gated SemDeDup prune must equal the ungated
    head-pair prune SET on random small-integer vectors at random
    duplication multiplicities, random cluster assignment, and a random
    (often-binding) head cap — the gate is a cost transformation of the
    pairwise cosine scan, never a semantics change. Small-integer
    coordinates make exact-duplicate classes and cross-class collisions
    likely; the zero vector is excluded (cosine undefined)."""
    from gfe_db_spark.operators.dedup import _dot
    from gfe_db_spark.queries.similarity import (
        cluster_head_pairs,
        cluster_prune_flags_gated,
    )

    rows = []
    for vec, copies, cluster in classes:
        if all(x == 0 for x in vec):
            vec = [1, 0, 0]
        for _ in range(copies):
            rows.append((len(rows), cluster, [float(x) for x in vec]))
    df = spark.createDataFrame(
        rows, "vec_id long, centroid_id int, embedding array<double>"
    )
    pair_cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    ungated = {
        r.id_b
        for r in cluster_head_pairs(df, max_cluster_size=cap)
        .filter(F.round(pair_cos, 9) >= tau)
        .select("id_b")
        .distinct()
        .collect()
    }
    gated = {
        r.vec_id
        for r in cluster_prune_flags_gated(
            df, threshold=tau, max_cluster_size=cap
        ).collect()
    }
    assert gated == ungated
