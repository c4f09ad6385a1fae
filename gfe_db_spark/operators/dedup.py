"""Deduplication operators over a document corpus.

Five strategies, all DataFrame-native (the only Python UDF is SimHash's
bit-packing, which has no builtin equivalent):

- exact_dedup:        hash-groupBy on content digest
- shingles:           word n-gram shingling (the shared substrate)
- minhash_signatures: portable MinHash via per-seed min(md5(seed||shingle))
- lsh_candidate_pairs: banded LSH → candidate pairs without all-pairs
- ngram_jaccard_pairs: exact Jaccard on shingle sets for candidate pairs
- simhash:            64-bit SimHash fingerprint (pandas UDF)
- embedding_neardup_pairs: cosine-threshold pairs over embedding vectors

Scale notes (100 TB): every pair-producing operator goes through a
*bucketed* join (shingle, band hash, or LSH bucket) — never a cross join —
so the shuffle is keyed by content and hot buckets can be salted or capped
(`max_bucket_size`). MinHash seeds use md5, which both Spark and DuckDB
implement, keeping the signatures oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content digest; keeps the min-id
    representative. One shuffle on the digest."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("representative"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def shingles(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    distinct: bool = True,
) -> DataFrame:
    """Word n-gram shingles, one row per (doc, shingle).

    Built-ins only: split → sliding window via transform over index array →
    explode. Stays in whole-stage codegen.

    `distinct=True` (needed for Jaccard set semantics) dedupes INSIDE the
    shingle array before the explode (`array_distinct`): every shingle of
    a doc is generated from that doc's single source row, so per-row array
    dedup IS the distinct (doc_id, shingle) set — no (doc_id, shingle)
    shuffle + double hash-aggregate, which previously re-serialized and
    re-hashed every distinct shingle string across an exchange (r13: one
    Exchange removed from every distinct-shingle consumer; callers must
    feed unique doc_ids, which every call site does — they pass PK-keyed
    docs or per-class representatives). Min-hashing is
    multiplicity-insensitive, so the minhash path passes `distinct=False`
    and skips even the array dedup."""
    # shingling fans out ~50× per doc — spread compact inputs first
    from gfe_db_spark.operators import spread_small_input

    docs = spread_small_input(docs, key=id_col)
    # Tokenize into a PROJECTED column before the sliding window: Catalyst
    # does not subexpression-eliminate a split() referenced inside a
    # transform() lambda, so the inline form re-runs the regex split once
    # PER SHINGLE INDEX — O(tokens²) per doc, measured 4-7× slower at sf1.
    toked = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), "\\s+").alias("toks")
    )
    tk = F.col("toks")
    # Unrolled element_at reads instead of slice()+concat_ws over an array:
    # slice allocates an n-element array per shingle just to concatenate
    # it; indexing the token array directly skips that allocation. Same
    # output strings (r13: 0 differing rows at sf0.1). Isolated explode
    # ~25% faster; end-to-end it shows where the suite is CPU-bound —
    # lock-step A/B pairwise 0.92-0.94x at local[8] for the
    # contamination/LSH entries, wall-neutral at local[32].
    sh = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - F.lit(n)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tk, i + F.lit(j + 1)) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    if distinct:
        sh = F.array_distinct(sh)
    # NOTE (r13, negative result): do NOT emit a precomputed per-doc size
    # column by exploding a projected array attribute — once the generator
    # input is a bare attribute, InferFiltersFromGenerate adds a
    # size(e)>0 filter and predicate pushdown substitutes the WHOLE
    # split+transform+array_distinct expression into it below the spread
    # exchange (with the split inlined per element_at), roughly doubling
    # task CPU (measured 13.4 -> 29.3 s on dedup_ngram_jaccard at sf0.1).
    # Exploding the complex expression directly, as here, is what keeps
    # that inference off.
    return toked.select("doc_id", F.explode(sh).alias("shingle"))


def minhash_signatures(
    shingle_df: DataFrame, num_hashes: int = 8
) -> DataFrame:
    """MinHash signature per doc: sig_i = min over shingles of
    md5(i || shingle). md5-as-hash-family keeps this portable to any SQL
    oracle; one shuffle (groupBy doc_id) computes all seeds at once."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(i)), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return shingle_df.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """Banded LSH: docs sharing any band key become candidate pairs.

    Pairs come from a self-join keyed on (band, band_hash) — the join key
    IS the bucket, so no all-pairs shuffle; AQE's skew handling (or an
    explicit bucket-size cap upstream) bounds hot buckets."""
    band_cols = []
    for b in range(bands):
        segs = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *segs)).alias("bh")))
    banded = signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("band_hash"))
    # NOTE (r13, negative result): pinning a band-keyed exchange here so
    # the self-join sides share one minhash pipeline pass (the SimHash
    # class-exchange pattern) was measured SLOWER end-to-end (16.1 -> 17.9
    # task CPU s, duel pairwise 1.11): the broadcast-build duplication it
    # removes is cheaper than the extra exchange materialization. Left
    # unpinned on evidence.
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def _band_keys(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """(doc_id, band, band_hash) — one row per band per doc. The band key
    is the LSH bucket; everything downstream joins on it."""
    band_cols = []
    for b in range(bands):
        segs = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *segs)).alias("bh"))
        )
    return signatures.select("doc_id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("band_hash")
    )


def incremental_dup_flags(
    corpus_sigs: DataFrame,
    batch_sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    batch_ids: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dedup: flag each NEW batch doc that LSH-collides
    with the EXISTING corpus — the shape every continuously-crawled
    training pipeline runs per ingest (dedup the delta against 100 TB
    without ever re-pairing the corpus with itself).

    The corpus side is just its banded signature table — in production a
    materialized parquet bucketed by (band, band_hash), built once and
    appended per ingest, so each batch pays O(|batch| + collisions), not
    O(|corpus|). The batch side is small → broadcast; the corpus-side
    scan-and-probe never shuffles the corpus. The batch's band keys
    broadcast (the batch is the small delta by construction) and the
    corpus streams through the broadcast hash join — with the bucketed
    materialization the scan additionally prunes to the batch's
    (band, band_hash) buckets. No pair materialization — just the
    distinct set of batch ids that collide at least once.

    ``batch_ids`` (optional): a one-column (doc_id) frame listing exactly
    the batch docs that produced signatures. Without it the id list is
    derived from ``batch_sigs`` itself, and because column pruning
    specializes that branch's aggregate (no min-hash functions) it does
    NOT canonicalize equal to the band-key branch, so exchange reuse
    misses and the whole batch shingle+minhash pipeline runs a second
    time just to list ids (r13 stage audit). Callers that know the
    batch's shingle-existence predicate (size(split(text)) >= n) should
    pass that cheap scan here instead."""
    corpus_banded = _band_keys(corpus_sigs, bands, rows_per_band)
    batch_banded = _band_keys(batch_sigs, bands, rows_per_band).withColumnRenamed(
        "doc_id", "batch_doc_id"
    )
    dup_ids = (
        corpus_banded.join(F.broadcast(batch_banded), ["band", "band_hash"])
        .select(F.col("batch_doc_id").alias("doc_id"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    ids = batch_ids if batch_ids is not None else batch_sigs.select("doc_id")
    return (
        ids.join(dup_ids, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("_dup"), F.lit(False)).alias("is_dup"))
    )


def minhash_jaccard_estimate(
    signatures: DataFrame, pairs: DataFrame, num_hashes: int = 8
) -> DataFrame:
    """Estimated Jaccard for candidate pairs: the fraction of matching
    MinHash components (the unbiased MinHash estimator). This is the
    at-scale verification shortcut — O(pairs) with two keyed joins against
    the (small) signature table, instead of re-joining the full shingle
    set per pair as `ngram_jaccard_pairs` does."""
    sig_cols = [f"sig_{i}" for i in range(num_hashes)]
    sa = signatures.select(
        F.col("doc_id").alias("doc_a"), *[F.col(c).alias(f"a_{c}") for c in sig_cols]
    )
    sb = signatures.select(
        F.col("doc_id").alias("doc_b"), *[F.col(c).alias(f"b_{c}") for c in sig_cols]
    )
    matches = sum(
        F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0) for c in sig_cols
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(matches / F.lit(float(num_hashes)), 9).alias("jaccard_est"),
        )
    )


def ngram_jaccard_pairs(
    shingle_df: DataFrame,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    shared_exchange: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|), computed from a shingle-keyed
    self-join (common count) with per-doc sizes derived as a COUNT window
    over the shingle rows and carried through the join — no size dim to
    aggregate and join back, so the shingle explode is evaluated once per
    join side instead of once per derived table. `max_bucket_size` drops
    degenerate shingles (stop-shingles shared by everyone) via a
    shingle-keyed window count — the filter runs on the full rows, sizes
    are computed BEFORE the cap (|A| is the true set size), and the
    shingle-partitioned window output feeds the shingle equi-join with no
    extra exchange."""
    from pyspark.sql.window import Window as W

    sh = shingle_df.withColumn("sz", F.count(F.lit(1)).over(W.partitionBy("doc_id")))
    if shared_exchange:
        # Pin ONE shingle-keyed exchange that BOTH self-join sides (and a
        # broadcast build, when Catalyst picks one) reuse — the SimHash
        # class-exchange pattern. Opt-in (gated callers only): shuffling
        # the exploded shingle strings costs MORE than re-running the
        # explode when the upstream is a plain scan (r13 A/B: ungated
        # jaccard 10.4 -> 22.7 task CPU s with the pin), but LESS when the
        # upstream carries the digest-gate md5 window, which the join's
        # broadcast-build side otherwise re-derives in full
        # (dedup_clusters 59 -> 40 with the pin).
        sh = sh.repartition(F.col("shingle"))
    if max_bucket_size is not None:
        sh = sh.withColumn(
            "df_", F.count(F.lit(1)).over(W.partitionBy("shingle"))
        ).filter(F.col("df_") <= max_bucket_size)
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        # sz_a/sz_b are functionally dependent on doc_a/doc_b — extra
        # group keys, identical groups
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")), 9
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def _exact_class_map(
    docs: DataFrame, n: int, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """(members, reps) for the exact-digest gate shared by the `*_gated`
    pair operators: gate-eligible docs (non-NULL text with >= n tokens —
    exactly the docs that produce >= 1 word n-shingle) collapse to the
    min-id representative of their md5(text) class; ineligible docs stay
    singleton classes. `members` is (doc_id, rep_id); `reps` is the one
    row per class that feeds the expensive shingle/signature work."""
    from pyspark.sql.window import Window as W

    gate_eligible = F.col("text").isNotNull() & (
        F.size(F.split(F.col("text"), "\\s+")) >= n
    )
    cls = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).withColumn(
        "rep_id",
        F.when(
            gate_eligible, F.min("doc_id").over(W.partitionBy(F.md5(F.col("text"))))
        ).otherwise(F.col("doc_id")),
    )
    return cls.select("doc_id", "rep_id"), cls.filter(
        F.col("doc_id") == F.col("rep_id")
    )


def _expand_rep_pairs(rep_pairs: DataFrame, members: DataFrame, *carry: str) -> DataFrame:
    """Cross-class expansion for the gated operators: every
    (member of A) x (member of B) inherits the representative pair's
    carried columns verbatim; least/greatest restores doc_a < doc_b."""
    ma = members.select(F.col("rep_id").alias("doc_a"), F.col("doc_id").alias("m_a"))
    mb = members.select(F.col("rep_id").alias("doc_b"), F.col("doc_id").alias("m_b"))
    return (
        rep_pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            F.least("m_a", "m_b").alias("doc_a"),
            F.greatest("m_a", "m_b").alias("doc_b"),
            *carry,
        )
    )


def _within_class_pairs(members: DataFrame) -> DataFrame:
    """All (rep_id, doc_a < doc_b) pairs inside one exact-dup class. Only
    gate-eligible classes can have >= 2 members (ineligible docs are
    singletons by construction), so no eligibility filter is needed."""
    m1 = members.alias("x")
    m2 = members.alias("y")
    return (
        m1.join(m2, "rep_id")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            "rep_id",
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
    )


def lsh_candidate_pairs_gated(
    docs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    n: int = 3,
    num_hashes: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """`lsh_candidate_pairs` semantics over a RAW corpus, with the
    exact-digest gate: the banded self-join runs over DISTINCT texts only
    and the declared doc-level candidate set is reconstructed from the
    exact-dup classes.

    Row-identical to shingles→minhash→lsh_candidate_pairs on the raw
    corpus because identical texts have identical shingle sets, hence
    identical MinHash signatures, hence identical band keys:

      - within-class pairs collide in EVERY band, so they are always
        candidates — emitted directly from the class mapping;
      - a cross-class member pair collides iff its representatives do,
        and copies inherit the rep's signature verbatim.

    Docs with NULL text or < n tokens produce zero shingles, so they have
    no signature row and never band — on either path. Cost: without the
    gate, k copies of a text put k rows in every shared band bucket and
    the self-join shuffle goes quadratic in k (the same exposure the r7
    sf10 probe demonstrated on the ungated Jaccard entry); gated, the
    band join is bounded by distinct texts and only the DECLARED pair
    output stays quadratic under mass duplication."""
    members, reps = _exact_class_map(docs, n, text_col, id_col)
    sigs = minhash_signatures(
        shingles(reps, n=n, distinct=False), num_hashes=num_hashes
    )
    rep_pairs = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows_per_band)
    return _expand_rep_pairs(rep_pairs, members).unionByName(
        _within_class_pairs(members).select("doc_a", "doc_b")
    )


def minhash_est_pairs_gated(
    docs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    n: int = 3,
    num_hashes: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gated form of LSH candidates + MinHash Jaccard estimate
    (`minhash_jaccard_estimate` over `lsh_candidate_pairs`): signatures,
    banding, and the estimate all run over DISTINCT texts; cross-class
    member pairs inherit the representative pair's estimate verbatim
    (identical texts have identical signatures), and within-class pairs
    are jaccard_est = num_hashes/num_hashes = 1.0 by identity."""
    members, reps = _exact_class_map(docs, n, text_col, id_col)
    sigs = minhash_signatures(
        shingles(reps, n=n, distinct=False), num_hashes=num_hashes
    )
    rep_pairs = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows_per_band)
    rep_est = minhash_jaccard_estimate(sigs, rep_pairs, num_hashes=num_hashes)
    cross = _expand_rep_pairs(rep_est, members, "jaccard_est")
    within = _within_class_pairs(members).select(
        "doc_a", "doc_b", F.lit(1.0).alias("jaccard_est")
    )
    return cross.unionByName(within)


def ngram_jaccard_pairs_gated(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """`ngram_jaccard_pairs` semantics over a RAW corpus, with the same
    exact-digest gate as `neardup_components`: identical texts collapse to
    one representative before any shingle work, the shingle self-join and
    pair aggregation run over DISTINCT texts only, and the declared
    doc-level pair set is reconstructed from the exact-dup classes:

      - within-class pairs: two copies of the same text have identical
        shingle sets, so n_common = |shingles(text)| and jaccard = 1.0
        (>= any threshold <= 1) — emitted directly from the class
        mapping, no join through the shingle graph;
      - cross-class pairs: every (member of A) x (member of B) inherits
        the representative pair's (n_common, jaccard) verbatim.

    Docs the Jaccard graph cannot pair — NULL text or < n tokens (zero
    shingles) — stay singleton classes outside the gate, exactly as in
    `neardup_components`, so the output is row-identical to the ungated
    form. What changes is cost: without the gate a corpus with k copies
    of a text puts k rows in every shared-shingle bucket and the pair
    groupBy goes quadratic in k (the r7 sf10 probe ENOSPC'd the ungated
    entry at 961 s on a 100-way-duplicated corpus); gated, the self-join
    is bounded by distinct texts and only the DECLARED pair output stays
    quadratic under mass duplication.

    The row-identity claim holds for `max_bucket_size=None` (the
    registered path). WITH a cap the two forms intentionally diverge:
    under the gate the stop-shingle document frequency is computed over
    DISTINCT texts (a shingle carried by k copies of one text counts
    once, so mass duplication cannot push real content shingles over the
    cap), and within-class jaccard=1.0 pairs bypass the cap entirely
    (identical texts are duplicates regardless of which shingles survive
    it). The ungated form's df is per raw doc — duplication-inflated —
    which is the wrong frequency signal at scale; callers who need the
    capped semantics to agree must pre-dedup the corpus themselves."""
    members, reps = _exact_class_map(docs, n, text_col, id_col)
    sh = shingles(reps, n=n)
    rep_pairs = ngram_jaccard_pairs(
        sh, threshold=threshold, max_bucket_size=max_bucket_size, shared_exchange=True
    )
    cross = _expand_rep_pairs(rep_pairs, members, "n_common", "jaccard")
    if threshold <= 1.0:
        # within-class pairs are jaccard = 1.0 by identity; n_common is the
        # class text's distinct shingle count (multi-member classes are
        # gate-eligible, so it is >= 1 and present in `sh`)
        rep_sz = sh.groupBy(F.col("doc_id").alias("rep_id")).agg(
            F.count(F.lit(1)).alias("n_common")
        )
        within = (
            _within_class_pairs(members)
            .join(rep_sz, "rep_id")
            .select("doc_a", "doc_b", "n_common", F.lit(1.0).alias("jaccard"))
        )
        return cross.unionByName(within)
    return cross


def neardup_components(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate components per document: (doc_id, cluster_id) where
    cluster_id = min doc_id of the doc's n-gram-Jaccard connected
    component. The shared core of `dedup_clusters` / `dedup_keep_list` /
    `leakage_safe_split`.

    An exact-digest gate runs FIRST: identical texts collapse to one
    representative (min id per md5(text) class, via a digest-keyed window)
    before any shingle work, and components computed over representatives
    broadcast back to all members through the class mapping. Semantics are
    unchanged — exact duplicates with ≥ n tokens have Jaccard 1 ≥ any
    threshold, so the member graph is exactly the quotient blow-up of the
    representative graph, and the component min over members equals the
    component min over representatives (each rep IS its class min). Docs
    the Jaccard graph cannot connect — NULL text, or fewer than n tokens
    (zero shingles ⇒ never pair, each its own component) — are EXCLUDED
    from the gate and kept as singleton classes: collapsing them would
    merge docs the ungated graph keeps apart (the round-5 advice
    finding). What changes is
    cost: a corpus with k copies of a text contributes ONE row to the
    shingle self-join instead of k — without the gate, k copies put k²
    rows in every shared-shingle bucket and the pair groupBy goes
    quadratic (measured: `leakage_safe_split` at sf1 — a 10×-replicated
    corpus — ran >8 min ungated; gated it is back to sf0.1-like cost).

    Scale: one digest-keyed window (same shuffle an exact-dedup pass
    already pays), the shingle equi-join and CC loop over DISTINCT texts
    only, and one rep_id-keyed equi-join to fan the verdict back out."""
    from pyspark.sql.window import Window as W

    from gfe_db_spark.plans.graph_algos import connected_components

    gate_eligible = F.col("text").isNotNull() & (
        F.size(F.split(F.col("text"), "\\s+")) >= n
    )
    cls = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).withColumn(
        "rep_id",
        F.when(
            gate_eligible, F.min("doc_id").over(W.partitionBy(F.md5(F.col("text"))))
        ).otherwise(F.col("doc_id")),
    )
    reps = cls.filter(F.col("doc_id") == F.col("rep_id"))
    pairs = ngram_jaccard_pairs(
        shingles(reps, n=n),
        threshold=threshold,
        max_bucket_size=max_bucket_size,
        shared_exchange=True,
    )
    cc = connected_components(
        reps.select(F.col("doc_id").alias("node")),
        pairs.select("doc_a", "doc_b"),
        "doc_a",
        "doc_b",
    )
    return cls.select("doc_id", "rep_id").join(
        cc.select(F.col("node").alias("rep_id"), F.col("component").alias("cluster_id")),
        "rep_id",
    ).select("doc_id", "cluster_id")


def contamination_counts(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination check: for every corpus document, how many
    of its distinct word n-grams also appear in the benchmark set (the
    train/test-overlap scan every training-data pipeline needs before a
    release).

    Shape at scale: distinct shingles both sides, then an equi-join on the
    shingle string — the benchmark side is tiny relative to the corpus, so
    Catalyst broadcasts it and the corpus is never shuffled; the per-doc
    count is a keyed agg with map-side combine. Never all-pairs.
    """
    doc_sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    bench_sh = (
        shingles(benchmark, n=n, text_col=text_col, id_col=id_col)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # single pass: left-join the broadcast benchmark onto the corpus
    # shingles, then one keyed agg computes totals and hits together —
    # the corpus is scanned and shuffled once, not twice
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_contaminated",
            (F.col("n_contaminated") > 0).alias("contaminated"),
        )
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash fingerprint per document (pandas UDF: bit packing has
    no builtin form). Near-dup = small Hamming distance between
    fingerprints; pair generation would bucket on rotated fingerprint
    chunks (same banding idea as LSH).

    NOTE (r13, negative result — do not retry blindly): a pure-JVM
    formulation (explode tokens → md5 hex → conv to LE int → 64 bit-vote
    sums keyed by doc_id, reusing the spread exchange; bit-identical to
    the oracle at sf0.001/0.01/0.1) LOST a quiet-host ABBA duel at
    local[32]: dedup_simhash_hamming 1.20-1.33 s → 1.91-2.06 s,
    corpus_prep_pipeline_v3 3.26-3.30 s → 5.99-6.84 s. Three compounding
    causes, each measured: (a) ~25 µs/token of JVM expression work
    (isolated: explode+md5 is free, the 8-substring/concat/conv chain +
    64 agg-buffer updates cost ~2 s CPU/run at sf0.1) vs the memoized
    Python body; (b) the fingerprint became an aggregate, so per-consumer
    column pruning diverged the subtrees below the class pin and the
    pass re-ran ~3× in the hamming entry (7 s CPU vs 2 s isolated) — the
    nondeterministic UDF had doubled as the optimizer fence that made the
    shared exchange reusable; (c) ~0.4-0.6 s/call of driver-side
    construction+analysis for the 65-agg plan (py4j tree building alone
    was 0.8 s before switching to F.expr strings). The boundary this UDF
    pays is Arrow transfer of compact texts, amortized across cores —
    cheaper than all three put together."""
    import pandas as pd
    from pyspark.sql import types as T

    # note: no `pd.Series` type hints — under `from __future__ import
    # annotations` they become strings a locally-defined UDF can't resolve
    @F.pandas_udf(T.LongType())
    def _simhash(texts):
        import hashlib

        import numpy as np

        # Token-digest memo (r13, guide §4.2/§4.5): text token
        # frequencies are Zipf-shaped, so token instances outnumber
        # unique tokens by an order of magnitude and the per-instance
        # md5 loop was most of the fingerprint pass's CPU. The memo
        # lives for the task (closure state survives across batches in
        # the worker) and is size-capped so an adversarial vocabulary
        # cannot grow it unboundedly. Same digest per token → identical
        # fingerprints, measured 2x less CPU on a 5k-word Zipf corpus.
        # (A batch-level np.unique formulation was tried and was 20x
        # SLOWER: sorting large object arrays is Python-comparison
        # bound; a plain dict probe is the right tool.)
        memo: dict = {}

        def dig(tok, _md5=hashlib.md5):
            d = memo.get(tok)
            if d is None:
                d = _md5(tok.encode("utf-8")).digest()[:8]
                if len(memo) < (1 << 20):
                    memo[tok] = d
            return d

        def one(t):
            if t is None:
                return None
            toks = t.split()
            if not toks:
                return 0
            # little-endian first-8-bytes: byte order is an arbitrary
            # bit permutation for SimHash (Hamming distances are
            # unchanged), and this orientation is exactly DuckDB's
            # md5_number_upper — which makes the op oracle-checkable.
            # Bit-vote in numpy: unpackbits(little) index 8j+k is bit k
            # of digest byte j == bit (8j+k) of the little-endian int,
            # so the vectorized vote is bit-identical to the int loop.
            digs = np.frombuffer(b"".join(map(dig, toks)), dtype=np.uint8).reshape(
                -1, 8
            )
            ones = np.unpackbits(digs, axis=1, bitorder="little").sum(
                axis=0, dtype=np.int64
            )
            mask = (2 * ones > len(toks)).astype(np.uint8)  # acc[i] > 0
            v = int.from_bytes(
                np.packbits(mask, bitorder="little").tobytes(), "little"
            )
            # to signed 64-bit
            return v - (1 << 64) if v >= (1 << 63) else v

        # dtype=object, NOT texts.map(one): pandas coerces a mixed
        # int/None map result to float64, silently corrupting the low
        # bits of any fingerprint beyond 2^53 whenever the batch holds a
        # single NULL text (found in the r13 audit; latent before only
        # because the fixtures carry no NULL text alongside large
        # fingerprints in one batch).
        import pandas as pd

        return pd.Series([one(t) for t in texts], dtype=object, index=texts.index)

    from gfe_db_spark.operators import spread_small_input

    docs = spread_small_input(docs, key=id_col)
    # asNondeterministic: downstream null-filters on the fingerprint
    # otherwise get pushed below the spread repartition and the optimizer
    # DUPLICATES the pandas UDF (one ArrowEvalPython feeding the pushed
    # filter, a second re-computing the column above the exchange) — every
    # text crossed the Python boundary twice, measured in the r13 plan
    # audit. SimHash is value-deterministic per row; the flag is purely an
    # optimizer fence (spark_optimization_guide §4.4).
    sh = _simhash.asNondeterministic()
    return docs.select(F.col(id_col).alias("doc_id"), sh(F.col(text_col)).alias("simhash64"))


def simhash_hamming_pairs(
    sig: DataFrame,
    max_hamming: int = 3,
    n_blocks: int = 4,
    id_col: str = "doc_id",
    sig_col: str = "simhash64",
) -> DataFrame:
    """Near-duplicate pairs from 64-bit SimHash fingerprints, by exact
    Hamming distance ≤ ``max_hamming`` — the candidate-generation half
    SimHash needs to be a dedup operator rather than just a fingerprint.

    Pigeonhole banding makes it complete without all-pairs: split the 64
    bits into ``n_blocks`` disjoint blocks; two fingerprints within
    Hamming distance k differ in at most k blocks, so with
    ``n_blocks >= k + 1`` they must agree EXACTLY on at least one block.
    The plan is a narrow map (each row → n_blocks ``(block_id,
    block_val)`` keys), an equi-join on those two scalars, then the exact
    ``bit_count(a XOR b)`` check on surviving candidates only. At 100 TB
    the corpus shuffles ``n_blocks``× scalars — never a cross join; block
    width (64 / n_blocks) controls the collision fan-out, so raising
    ``max_hamming`` (more, narrower blocks) trades join fan-out for
    recall window exactly like LSH banding does.

    An exact-digest gate (`_simhash_classes`) runs first: identical
    fingerprints collapse into one signature-class row, so the banded
    join is bounded by the number of DISTINCT fingerprints — a corpus
    with k exact duplicates no longer piles k²/2 candidates into one
    (block_id, block_val) bucket. Class pairs are expanded back to doc
    pairs afterwards (output semantics unchanged); pipelines that only
    need a drop list should call `simhash_neardup_drops`, which skips
    the expansion entirely.
    """
    _validate_banding(max_hamming, n_blocks)
    _members, classes = _simhash_classes(sig, id_col, sig_col)
    rep_pairs = _banded_class_pairs(
        classes.select("sig", "rep"), max_hamming, n_blocks
    )
    # Expand signature-class pairs back to doc pairs. Each unordered doc
    # pair is produced exactly once (a class pair maps 1:1 to an unordered
    # sig pair; within-class pairs have equal sigs, cross-class unequal),
    # so no final distinct() is needed. Both legs derive from the class
    # table's grouped member list — the member rows are shuffled ONCE (by
    # sig, inside _simhash_classes), replacing the r5 plan's two full
    # member-table joins plus a member self-join (the round-5 verdict's
    # avoidable-exchange question): the within leg is pure generator
    # expansion (explode×2, no join at all) and the cross joins carry one
    # array row per class, not one row per member.
    cls_members = classes.select("sig", "ids")
    cross = (
        rep_pairs.join(
            cls_members.withColumnsRenamed({"sig": "sig_a", "ids": "ids_a"}), "sig_a"
        )
        .join(
            cls_members.withColumnsRenamed({"sig": "sig_b", "ids": "ids_b"}), "sig_b"
        )
        .select("hamming", F.explode("ids_a").alias("_xa"), "ids_b")
        .select("hamming", "_xa", F.explode("ids_b").alias("_xb"))
        .select(
            F.least("_xa", "_xb").alias("doc_a"),
            F.greatest("_xa", "_xb").alias("doc_b"),
            "hamming",
        )
    )
    within = (
        cls_members.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.lit(0).cast("int").alias("hamming"))
    )
    return cross.unionByName(within)


def _validate_banding(max_hamming: int, n_blocks: int) -> None:
    if n_blocks < max_hamming + 1:
        raise ValueError(
            f"pigeonhole completeness needs n_blocks >= max_hamming + 1 "
            f"(got n_blocks={n_blocks}, max_hamming={max_hamming})"
        )
    if 64 % n_blocks != 0:
        raise ValueError(f"n_blocks must divide 64 (got {n_blocks})")


def _simhash_classes(
    sig: DataFrame, id_col: str, sig_col: str
) -> tuple[DataFrame, DataFrame]:
    """Exact-digest gate for SimHash banding: collapse identical
    fingerprints into signature classes (one row per distinct signature,
    representative = smallest member id) before any pairwise work. A
    corpus with k exact duplicates contributes ONE row to the banded
    join instead of k — without this, k identical docs put k²/2
    candidate pairs in a single (block_id, block_val) bucket and the
    bit_count verify + distinct() do quadratic work on them."""
    members = (
        sig.filter(F.col(sig_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), F.col(sig_col).alias("sig"))
        # Explicit sig-keyed shuffle so every consumer branch shares ONE
        # exchange (guide §2.4): column pruning otherwise specializes the
        # class aggregation per consumer (partial_min for the banded
        # side, partial_collect_list for the pair-expansion legs), the
        # specialized subtrees no longer canonicalize equal, and
        # exchange reuse re-runs the corpus scan + Python fingerprint
        # pass per specialization (2 full passes measured in the r13
        # stage audit). With the shuffle pinned here the scan + UDF run
        # exactly once; each consumer re-aggregates the compact 16-byte
        # (doc_id, sig) rows from the reused exchange instead.
        .repartition(F.col("sig"))
    )
    # rep AND the member list from ONE keyed aggregation — consumers that
    # only band on (sig, rep) project `ids` away before any explode, and
    # the pair expansion reads `ids` without a second member shuffle.
    # Only the PAIR-EXPANDING consumer may read `ids`: a k-member class
    # is one k-element array row, acceptable where the output is already
    # quadratic in k (the pair set); the linear drop-list path must NOT
    # depend on it (a mass-duplicated class would put the whole
    # membership in a single aggregation buffer) — it streams through the
    # members join instead.
    classes = members.groupBy("sig").agg(
        F.min("doc_id").alias("rep"), F.collect_list("doc_id").alias("ids")
    )
    return members, classes


def _banded_class_pairs(
    classes: DataFrame, max_hamming: int, n_blocks: int
) -> DataFrame:
    """Pigeonhole-banded candidate join over DISTINCT signatures only:
    (sig_a, sig_b, rep_a, rep_b, hamming) with rep_a < rep_b and
    1 <= hamming <= max_hamming. The join input is bounded by the number
    of distinct fingerprints, never the corpus row count."""
    _validate_banding(max_hamming, n_blocks)
    width = 64 // n_blocks
    mask = (1 << width) - 1
    blocks = classes.select(
        "rep",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), width * i).bitwiseAND(F.lit(mask))
                    for i in range(n_blocks)
                ]
            )
        ).alias("block_id", "block_val"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(b, ["block_id", "block_val"])
        .filter(F.col("a.rep") < F.col("b.rep"))
        .select(
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
            F.col("a.rep").alias("rep_a"),
            F.col("b.rep").alias("rep_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_neardup_drops(
    sig: DataFrame,
    max_hamming: int = 3,
    n_blocks: int = 4,
    id_col: str = "doc_id",
    sig_col: str = "simhash64",
) -> DataFrame:
    """Drop list for keep-the-smallest-id near-dup pruning, WITHOUT
    expanding exact-duplicate classes into pairs: returns one ``doc_id``
    column holding every doc that has some smaller-id doc within
    ``max_hamming``. Equivalent to collecting ``doc_b`` of every
    `simhash_hamming_pairs` pair, but linear in the corpus even when the
    corpus is dominated by exact duplicates:

    - every non-representative class member is a Hamming-0 dup of its
      class rep (the class min), so it is dropped outright — a keyed
      groupBy + join, no pair enumeration;
    - a representative r is dropped iff some OTHER class within
      ``max_hamming`` has min id < r, which is exactly the rep-level
      banded pair (rep', r) with rep' < r.

    This is the form pipelines should consume (`corpus_prep_pipeline_v3`
    does); the pair-expanding form exists for pair-set consumers and
    oracle parity."""
    members, classes = _simhash_classes(sig, id_col, sig_col)
    # STREAMING non-rep derivation (members ⨝ class reps, row at a time):
    # this is the linear path and must stay linear in memory too — it
    # deliberately does NOT read the grouped `ids` array, which for a
    # mass-duplicated class would materialize the whole membership in one
    # row (the pair-expanding form may, since its output is quadratic in
    # class size anyway)
    non_reps = (
        members.join(classes.select("sig", "rep"), "sig")
        .filter(F.col("doc_id") != F.col("rep"))
        .select("doc_id")
    )
    dropped_reps = (
        _banded_class_pairs(classes.select("sig", "rep"), max_hamming, n_blocks)
        .select(F.col("rep_b").alias("doc_id"))
        .distinct()
    )
    # The two sides are disjoint (reps vs non-reps) and each is already
    # distinct, so no final distinct() shuffle is needed.
    return non_reps.unionByName(dropped_reps)


def _dot(a: Column, b: Column) -> Column:
    """Array dot product with builtins: zip_with → aggregate. Left-to-right
    summation keeps it deterministic (and matches DuckDB's list functions)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# Measured dead end (r7), recorded so it isn't retried: unrolling _dot
# into a 64-term GetArrayItem expression chain is 3-4x SLOWER than the
# zip_with→aggregate HOF — the giant expression tree falls out of
# whole-stage codegen (hugeMethodLimit) into interpreted eval with two
# array-bounds checks per term. The effective pair-path optimizations are
# hoisting norms per VECTOR (one dot per pair instead of three) and
# broadcasting the capped head side (see cluster_head_pairs).


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine-threshold near-duplicate pairs over an embedding column.

    This is the exact (all-pairs) baseline — O(n²) pairs, kept as the
    recall oracle for property tests. The registered scale path is
    `embedding_neardup_pairs_bucketed`, which joins on a sign-LSH bucket
    key instead of cross-joining."""
    av = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va"))
    bv = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb"))
    pairs = av.crossJoin(bv).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 9))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def probe_masks(n_planes: int, probe_bits: int) -> list[int]:
    """Multi-probe XOR masks: the bucket itself, then every bucket within
    Hamming distance `probe_bits` of it. Deterministic and tiny
    (1 + C(n,1) + C(n,2) for probe_bits=2)."""
    import itertools

    masks = [0]
    for r in range(1, probe_bits + 1):
        masks += [
            sum(1 << i for i in combo) for combo in itertools.combinations(range(n_planes), r)
        ]
    return masks


def embedding_neardup_pairs_bucketed(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    probe_bits: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Scale path for embedding near-dup: sign-LSH bucket (integer bucket
    id, `similarity.hyperplane_bucket_id`) → multi-probe explode of one
    side into the `probe_masks` XOR neighborhood → equi-join on `bucket`
    → exact cosine within the candidate set.

    The shuffle is keyed by bucket — never an all-pairs product — so at
    100 TB this behaves like any other keyed self-join (AQE skew splitting
    applies; a degenerate bucket can additionally be capped like
    `ngram_jaccard_pairs` does for stop-shingles). Candidate fan-out is
    bounded by len(probe_masks) (37 for 8 planes / 2 probe bits), the
    price of recall: two vectors are compared iff their buckets differ in
    ≤ probe_bits sign bits. Recall vs the exact all-pairs baseline
    (`embedding_neardup_pairs`) is pinned by a property test."""
    scored = _bucketed_candidate_scores(
        emb,
        n_planes=n_planes,
        probe_bits=probe_bits,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        ordered_pairs=True,
    )
    return scored.filter(F.col("cos") >= threshold).select("id_a", "id_b", "cos")


def _bucketed_candidate_scores(
    emb: DataFrame,
    n_planes: int,
    probe_bits: int,
    id_col: str,
    vec_col: str,
    dim: int,
    ordered_pairs: bool,
) -> DataFrame:
    """Shared candidate-generation core for the bucketed embedding ops:
    sign-LSH int bucket → multi-probe explode → equi-join on bucket →
    cosine per candidate (each (id_a, id_b) candidate arises exactly once —
    see the uniqueness note below — so no dedupe pass exists).

    Two scale choices: per-vector norms are computed once per ROW before
    the join (not 3 dot products per pair), and the cosine is scored
    *before* the collision dedupe so the groupBy shuffles 20-byte
    (id_a, id_b, cos) rows instead of pairs of 64-double vectors.
    `ordered_pairs=True` keeps only id_a < id_b (near-dup pair semantics);
    False keeps both directions (k-NN join semantics)."""
    from gfe_db_spark.operators import spread_small_input
    from gfe_db_spark.operators.similarity import hyperplane_bucket_id

    b = hyperplane_bucket_id(
        spread_small_input(emb, key=id_col), n_planes=n_planes, id_col=id_col, vec_col=vec_col, dim=dim
    ).withColumn("__v", F.col(vec_col).cast("array<double>"))
    b = b.withColumn("__norm", F.sqrt(_dot(F.col("__v"), F.col("__v"))))
    probes = F.array(
        *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in probe_masks(n_planes, probe_bits)]
    )
    a = b.select(
        F.col(id_col).alias("id_a"),
        F.col("__v").alias("va"),
        F.col("__norm").alias("na"),
        F.explode(probes).alias("bucket"),
    )
    bb = b.select(
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        F.col("__v").alias("vb"),
        F.col("__norm").alias("nb"),
    )
    pair_filter = (
        (F.col("id_a") < F.col("id_b")) if ordered_pairs else (F.col("id_a") != F.col("id_b"))
    )
    return (
        a.join(bb, "bucket")
        .filter(pair_filter)
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 9
            ).alias("cos"),
        )
        # candidates are already UNIQUE per (id_a, id_b): the a-side probe
        # for mask m meets b iff bucket_a XOR m = bucket_b, i.e. the single
        # mask m = bucket_a XOR bucket_b — XOR probing cannot produce the
        # same pair from two probe rows, so no dedupe (and no extra
        # shuffle) is needed; uniqueness is pinned by a property test
    )


def set_similarity_join(
    docs: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact set-similarity self-join with PPJoin-style prefix filtering:
    all document pairs whose token-set Jaccard ≥ threshold (a rational
    num/den so every comparison stays in integer arithmetic — no float
    boundary can disagree across engines).

    Candidate generation: order tokens globally by (df asc, token) —
    rarest first — and index each document only by its PREFIX of length
    n - ceil(t*n) + 1 (integer ceil): any pair with overlap ≥ ceil(t*n)
    (implied by J ≥ t, since |A∩B| ≥ t·|A∪B| ≥ t·|A|) must collide on at
    least one prefix token, so the filter is lossless. Pairs are generated
    by an equi-join on the prefix token — candidate cost is Σ df(prefix
    tokens)², concentrated on RARE tokens by construction, instead of the
    all-pairs Σ df(all tokens)² of a naive token join.

    Verification is exact: candidates rejoin the (doc, token) table on
    both sides to count the true intersection, then the integer test
    inter·den ≥ num·(|A|+|B|-inter) decides. All equi-joins + keyed aggs —
    no cross join, no floats in the decision path.

    Plan shape: token df and doc size are COUNT windows over the deduped
    (doc, token) rows rather than aggregates joined back — the expensive
    explode+distinct subtree is evaluated once for the prefix build (and
    once per verification side), not once per derived aggregate; doc
    sizes ride through the candidate join so the final filter needs no
    size re-join."""
    # NOT spread (r13, negative result): a doc_id-keyed input spread
    # (which would also absorb the distinct's exchange) was measured
    # SLOWER at sf0.1 (2.49 -> 2.84 s) and the 10x slice (3.47 -> 3.63 s):
    # this entry's wall is the latency of its window/join stage chain,
    # its total task CPU is only ~2 s, and the extra exchange + 10x task
    # count buy nothing. Contrast entity_match_blocking, where the same
    # spread won 3-4x because serialized broadcast builds dominated.
    dt = (
        docs.select(F.col(id_col).alias("doc"), F.explode(F.split(F.col(text_col), "\\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    from pyspark.sql.window import Window as W

    ranked = dt.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("tok"))
    ).withColumn("n", F.count(F.lit(1)).over(W.partitionBy("doc")))
    w = W.partitionBy("doc").orderBy("df", "tok")
    # integer ceil(num*n/den) = (num*n + den - 1) div den — integer div,
    # so the prefix bound can't wobble on a float boundary
    required = F.expr(
        f"({threshold_num} * n + {threshold_den - 1}) div {threshold_den}"
    )
    prefix_len = F.col("n") - required + F.lit(1)
    prefix = (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select("doc", "tok", "n")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc") < F.col("b.doc")))
        .select(
            F.col("a.doc").alias("da"),
            F.col("b.doc").alias("db"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .distinct()
    )
    ta = dt.select(F.col("doc").alias("da"), "tok")
    tb = dt.select(F.col("doc").alias("db"), "tok")
    inter = (
        cand.join(ta, "da")
        .join(tb, ["db", "tok"])
        # na/nb are functionally dependent on da/db — extra keys, same groups
        .groupBy("da", "db", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.filter(
            F.col("inter") * threshold_den
            >= F.lit(threshold_num) * (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .select(
            "da", "db", "inter", "na", "nb",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 9).alias("jaccard"),
        )
    )


def duplicated_span_stats(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplication scan (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" shape,
    token-level): find every k-token window that occurs more than once in
    the corpus, merge the flagged windows into maximal per-document spans,
    and report how much of each document is covered by duplicated text —
    the signal an exact-substring trimmer removes.

    Plan shape at 100 TB: shingling is one narrow map (the k-gram hashes
    are built inside an array transform per row — the token array is
    never exploded before hashing); corpus-wide duplication is ONE
    shuffle keyed by shingle hash (a count window over the hash);
    span-merging is a per-document window (gaps-and-islands: a window
    starts a new span when its position exceeds every preceding window's
    end). Nothing global, no joins of the corpus with itself."""
    from pyspark.sql.window import Window as W

    toks = F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != "")
    base = docs.select(
        F.col(id_col).alias("doc"), toks.alias("toks")
    ).withColumn("n_tokens", F.size("toks"))
    sh = (
        base.filter(F.col("n_tokens") >= k)
        .select(
            "doc",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_tokens") - k),
                    lambda i: F.struct(
                        i.alias("p"),
                        F.md5(
                            F.concat_ws(" ", F.slice("toks", i + 1, k))
                        ).alias("h"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc", F.col("s.p").alias("p"), F.col("s.h").alias("h"))
    )
    flagged = sh.withColumn(
        "c", F.count(F.lit(1)).over(W.partitionBy("h"))
    ).filter(F.col("c") > 1)
    w_prev = W.partitionBy("doc").orderBy("p").rowsBetween(W.unboundedPreceding, -1)
    w_run = W.partitionBy("doc").orderBy("p").rowsBetween(W.unboundedPreceding, 0)
    prev_end = F.max(F.col("p") + k - 1).over(w_prev)
    islands = (
        flagged.withColumn(
            "st",
            (prev_end.isNull() | (F.col("p") > prev_end)).cast("int"),
        )
        .withColumn("island", F.sum("st").over(w_run))
    )
    spans = islands.groupBy("doc", "island").agg(
        F.min("p").alias("s"), (F.max("p") + k - 1).alias("e")
    )
    agg = spans.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("n_dup_tokens"),
    )
    return (
        base.select("doc", "n_tokens")
        .join(agg, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
            F.round(
                F.coalesce("n_dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                9,
            ).alias("dup_frac"),
        )
    )


def bloom_m_bits(
    n_items: int,
    bits_per_item: int = 16,
    min_pow: int = 16,
    max_pow: int = 26,
) -> int:
    """Data-dependent Bloom sizing: the smallest power-of-two bit count
    2**p in [2**min_pow, 2**max_pow] with n_items * bits_per_item <=
    2**p. At 16 bits/item and k=3 probes the false-positive rate is
    ~0.5%; a CONSTANT m is a scale-killer the same way a constant LSH
    plane count was (r9 sf10 probe: the fixed 64 Ki-bit benchmark filter
    saturated at ~250k benchmark shingles — every corpus doc probed
    'contaminated' and the decontamination pipeline emptied itself).
    Pure integer arithmetic (no float log2) so the Spark plan and the
    DuckDB oracle derive the SAME width from the same count. Floors at
    2**16 so every historical bench-scale plan (benchmark sets well
    under 4k shingles) is bit-identical."""
    for p in range(min_pow, max_pow + 1):
        if n_items * bits_per_item <= (1 << p):
            return 1 << p
    return 1 << max_pow


def bloom_bitset(
    terms: DataFrame,
    term_col: str = "shingle",
    m_bits: int = 4096,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Compile a term set into a SPARSE Bloom-filter bitset: a DataFrame
    ``{word: int, bits: long}`` holding only the non-zero 32-bit words of
    the m_bits-wide filter (stored in longs so the bit arithmetic is
    sign-safe in every engine).

    This is the decontamination scale path: instead of joining a 100 TB
    corpus against the benchmark term table, the benchmark compiles into a
    word table at most ``m_bits/32`` rows tall that broadcasts to every
    executor — the corpus side never shuffles and never sees a benchmark
    join key. The k probe positions use the portable md5-LE32 hash
    (`hash_le32_expr`) so a SQL oracle can rebuild the identical filter.

    The sparse form (not a 1-row ``array<long>``): a dense array column
    cross-joined onto the corpus is copied into EVERY output row by the
    join — at m_bits=2**19 that is 128 KB per shingle row, measured 250 s
    for a 0.5 M-row probe at sf1 vs ~2 s for the word-table hash joins
    `bloom_probe` now runs.
    """
    from gfe_db_spark.operators.text import hash_le32_expr

    pos_rows = terms.select(
        F.explode(
            F.array(
                *[
                    (
                        hash_le32_expr(
                            F.concat(F.col(term_col), F.lit(f":{salt}{i}"))
                        )
                        % m_bits
                    )
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    return (
        pos_rows.select(
            F.floor(F.col("pos") / 32).cast("int").alias("word"),
            # 2^bit is exact in double up to bit 31; stays in codegen
            F.pow(F.lit(2.0), (F.col("pos") % 32).cast("double"))
            .cast("long")
            .alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    doc_terms: DataFrame,
    bloom: DataFrame,
    term_col: str = "shingle",
    m_bits: int = 4096,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Add a boolean ``bloom_hit`` per row: true iff all k probe bits for
    the term are set in the sparse word table built by `bloom_bitset`
    (same m_bits/k/salt). k broadcast HASH joins on the probed word id —
    each attaches one long to the row; a probe into an absent word is a
    definitive miss (left join null -> 0 bits). No shuffle on the corpus
    side, no Python, no wide array column. All k joins reference ONE
    broadcast subtree, so Spark's ReuseExchange plans a single
    BroadcastExchange (the word table can be ~m_bits/32 rows — up to
    ~2 M at m=2**26 — so building/holding it k times would triple the
    broadcast cost for nothing). Bloom guarantee: a term in the build
    set always hits (no false negatives); a miss is definitive."""
    from gfe_db_spark.operators.text import hash_le32_expr

    reserved = {
        c
        for i in range(k)
        for c in (f"_bloom_w{i}", f"_bloom_m{i}", f"_bloom_b{i}")
    } | {"word", "bits"}
    clash = reserved.intersection(doc_terms.columns)
    if clash:
        raise ValueError(
            f"bloom_probe: doc_terms columns {sorted(clash)} collide with "
            "internal working names; rename them before probing"
        )

    # One broadcast subtree shared by every probe join: each iteration
    # joins the SAME DataFrame object, so the canonicalized exchange is
    # identical and ReuseExchange collapses the k-1 duplicates.
    bcast = F.broadcast(bloom.select("word", "bits"))
    probed = doc_terms
    hit = F.lit(True)
    for i in range(k):
        pos = (
            hash_le32_expr(F.concat(F.col(term_col), F.lit(f":{salt}{i}")))
            % m_bits
        )
        probed = probed.withColumn(f"_bloom_w{i}", F.floor(pos / 32).cast("int"))
        probed = probed.withColumn(
            f"_bloom_m{i}",
            F.pow(F.lit(2.0), (pos % 32).cast("double")).cast("long"),
        )
        probed = (
            probed.join(
                bcast, probed[f"_bloom_w{i}"] == bcast["word"], "left"
            )
            .withColumnRenamed("bits", f"_bloom_b{i}")
            .drop("word")
        )
        hit = hit & (
            F.coalesce(F.col(f"_bloom_b{i}"), F.lit(0).cast("long")).bitwiseAND(
                F.col(f"_bloom_m{i}")
            )
            != 0
        )
    drop_cols = [c for i in range(k) for c in (f"_bloom_w{i}", f"_bloom_m{i}", f"_bloom_b{i}")]
    return probed.withColumn("bloom_hit", hit).drop(*drop_cols)
