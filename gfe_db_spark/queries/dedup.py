"""Deduplication query inventory over `documents` / `embeddings`
(north-star extension): exact, MinHash+LSH, n-gram Jaccard, SimHash,
embedding-cosine near-dup — each as an oracle-checked query where the
semantics are SQL-expressible (SimHash is rows-only: 64-bit bit packing)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gfe_db_spark.operators import dedup as DD
from gfe_db_spark.queries import QuerySpec
from gfe_db_spark.sources.tables import table

_SHINGLE_CTE = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                  i -> array_to_string(toks[i:i+2], ' '))) AS shingle
    FROM t
  )
)
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return DD.exact_dedup(docs)


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS representative, COUNT(*) AS n_docs
FROM documents GROUP BY md5(text) ORDER BY content_hash
"""


def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sh = DD.shingles(docs, n=3, distinct=False)  # min() ignores multiplicity
    return DD.minhash_signatures(sh, num_hashes=8)


_SIG_COLS = ",\n       ".join(
    f"min(md5('{i}' || shingle)) AS sig_{i}" for i in range(8)
)

DEDUP_MINHASH_SQL = (
    _SHINGLE_CTE
    + f"""
SELECT doc_id,
       {_SIG_COLS}
FROM sh GROUP BY doc_id ORDER BY doc_id
"""
)


#: distinct/total threshold for the duplication-adaptive gate: above it
#: the corpus is essentially duplicate-free and the exact-digest gate's
#: fixed overhead (distinct-text window + two expansion joins) buys
#: nothing — use the direct ungated plan. Below it, duplication is real
#: and the gate bounds the band self-join by distinct texts. Both plans
#: are proven row-identical (within-class pairs collide in every band;
#: copies inherit the representative's signature), so this is a
#: stats-based PHYSICAL choice — like Catalyst picking broadcast vs
#: shuffle join from size stats — never a semantics fork.
GATE_DISTINCT_RATIO = 0.95


def _use_digest_gate(spark: SparkSession, sf_dir: str) -> bool:
    """True iff `documents` at sf_dir has enough exact duplication for the
    digest-gated plan to pay for itself. One memoized sizing job
    (`corpus_stats`: count + approx distinct digest in a single agg); the
    HLL++ distinct estimate (~2% error) is fine because both branches
    return identical rows."""
    from gfe_db_spark.sources.tables import corpus_stats

    n_rows, n_distinct = corpus_stats(spark, sf_dir, "documents")
    return n_distinct < GATE_DISTINCT_RATIO * n_rows


def dedup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs, duplication-adaptive (r9 verdict item 2): one
    memoized count-vs-distinct-digest stat picks the plan. Duplicated
    corpus → digest-gated (r8 item 3): banding runs over DISTINCT texts
    and the declared candidate set is expanded back through the exact-dup
    classes, bounding the band self-join shuffle that otherwise goes k²
    per bucket under k-way duplication. Near-distinct corpus → direct
    shingles→minhash→band self-join, skipping the gate's fixed overhead.
    Row-identical either way (identical texts band identically)."""
    docs = table(spark, sf_dir, "documents")
    if _use_digest_gate(spark, sf_dir):
        return DD.lsh_candidate_pairs_gated(
            docs, bands=4, rows_per_band=2, n=3, num_hashes=8
        )
    sigs = DD.minhash_signatures(DD.shingles(docs, n=3, distinct=False), num_hashes=8)
    return DD.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)


_BAND_EXPRS = ", ".join(
    f"md5(sig_{2 * b} || '|' || sig_{2 * b + 1}) AS band_{b}" for b in range(4)
)
_BAND_UNION = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, band_{b} AS band_hash FROM sigs" for b in range(4)
)

_LSH_BANDED_CTE = (
    _SHINGLE_CTE
    + f""", sigs AS (
  SELECT doc_id, {_SIG_COLS.replace(chr(10) + '       ', ' ')}
  FROM sh GROUP BY doc_id
), banded_raw AS (
  SELECT doc_id, {_BAND_EXPRS} FROM sigs
), banded AS (
  {_BAND_UNION.replace('sigs', 'banded_raw')}
)
"""
)

DEDUP_LSH_SQL = (
    _LSH_BANDED_CTE
    + """
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b ON a.band = b.band AND a.band_hash = b.band_hash
WHERE a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""
)


def dedup_minhash_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated Jaccard over the LSH candidate pairs from the MinHash
    signatures alone — the O(pairs) verification shortcut.
    Duplication-adaptive like `dedup_lsh_pairs` (same band-join exposure,
    same memoized stat): on a duplicated corpus the signatures, banding,
    and estimate run over DISTINCT texts — member pairs inherit the
    representative estimate (identical texts ⇒ identical signatures) and
    within-class pairs are est = 1.0 by identity; on a near-distinct
    corpus the direct plan skips the gate overhead. Row-identical."""
    docs = table(spark, sf_dir, "documents")
    if _use_digest_gate(spark, sf_dir):
        return DD.minhash_est_pairs_gated(
            docs, bands=4, rows_per_band=2, n=3, num_hashes=8
        )
    sigs = DD.minhash_signatures(DD.shingles(docs, n=3, distinct=False), num_hashes=8)
    pairs = DD.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    return DD.minhash_jaccard_estimate(sigs, pairs, num_hashes=8)


_EST_MATCHES = " + ".join(
    f"CASE WHEN sa.sig_{i} = sb.sig_{i} THEN 1 ELSE 0 END" for i in range(8)
)

DEDUP_MINHASH_EST_SQL = (
    _LSH_BANDED_CTE
    + f""", pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
)
SELECT p.doc_a, p.doc_b, round(({_EST_MATCHES}) / 8.0, 9) AS jaccard_est
FROM pairs p
JOIN sigs sa ON sa.doc_id = p.doc_a
JOIN sigs sb ON sb.doc_id = p.doc_b
ORDER BY doc_a, doc_b
"""
)


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs, duplication-adaptive like the banded
    LSH entries (same memoized stat, same rationale). Duplicated corpus →
    digest-gated: the shingle self-join runs over DISTINCT texts only and
    the doc-level pair set is expanded back through the exact-dup classes
    (within-class pairs are jaccard = 1.0 by identity), bounding the
    shuffle that ENOSPC'd the r7 sf10 probe on a 100-way-duplicated
    corpus. Near-distinct corpus → direct shingle self-join, skipping the
    gate's class window + expansion joins. Row-identical either way
    (pinned by the planted + hypothesis equivalence tests)."""
    docs = table(spark, sf_dir, "documents")
    if _use_digest_gate(spark, sf_dir):
        return DD.ngram_jaccard_pairs_gated(docs, n=3, threshold=0.5)
    return DD.ngram_jaccard_pairs(DD.shingles(docs, n=3), threshold=0.5)


DEDUP_JACCARD_SQL = (
    _SHINGLE_CTE
    + """, sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_common,
       round(n_common / (sa.sz + sb.sz - n_common), 9) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common / (sa.sz + sb.sz - n_common), 9) >= 0.5
ORDER BY doc_a, doc_b
"""
)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints, bit-for-bit oracle-checked: per-token 64-bit
    hash is md5 first-8-bytes little-endian (= DuckDB md5_number_upper),
    bit i of the fingerprint set iff more than half the tokens have it."""
    docs = table(spark, sf_dir, "documents")
    return DD.simhash(docs)


# shared CTE chain computing the bit-exact SimHash fingerprint in DuckDB;
# reused by the fingerprint entry and the Hamming-banded pair entry
_SIMHASH_SIG_CTES = r"""t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), h AS (
  SELECT doc_id, text, len(toks) AS n,
         list_transform(toks, tok -> md5_number_upper(tok)) AS hs
  FROM t
), sig AS (
  SELECT doc_id,
    CASE WHEN text IS NULL THEN NULL ELSE
      CAST(list_sum(list_transform(range(0, 64), i ->
        CASE WHEN 2 * len(list_filter(hs, hv -> (hv >> i) & 1 = 1)) > n
             THEN CASE WHEN i = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
                       ELSE CAST(1 AS HUGEINT) << i END
             ELSE CAST(0 AS HUGEINT) END)) AS BIGINT)
    END AS simhash64
  FROM h
)"""

DEDUP_SIMHASH_SQL = f"""
WITH {_SIMHASH_SIG_CTES}
SELECT doc_id, simhash64 FROM sig ORDER BY doc_id
"""


def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming distance ≤ 3 via pigeonhole
    banding (4 disjoint 16-bit blocks → equi-join on (block_id,
    block_val) → exact bit_count(XOR) on candidates). Complete for k ≤ 3
    by the pigeonhole principle; never all-pairs."""
    docs = table(spark, sf_dir, "documents")
    return DD.simhash_hamming_pairs(DD.simhash(docs), max_hamming=3, n_blocks=4)


# Shared unsigned-conversion + 16-bit pigeonhole-block CTEs over a `sig`
# CTE exposing (doc_id, simhash64). Single source of truth so the banded
# pair query and the v3 prep pipeline can never drift on block width or
# divisor constants.
_SIMHASH_BAND_CTES = r"""u AS (
  SELECT doc_id, simhash64,
         CASE WHEN simhash64 < 0
              THEN CAST(simhash64 AS HUGEINT) + CAST('18446744073709551616' AS HUGEINT)
              ELSE CAST(simhash64 AS HUGEINT) END AS uh
  FROM sig WHERE simhash64 IS NOT NULL
),
blocks AS (
  SELECT doc_id, simhash64, b.block_id,
         CAST((uh // b.dv) % 65536 AS BIGINT) AS block_val
  FROM u, (VALUES (0, CAST(1 AS HUGEINT)),
                  (1, CAST(65536 AS HUGEINT)),
                  (2, CAST(4294967296 AS HUGEINT)),
                  (3, CAST(281474976710656 AS HUGEINT))) b(block_id, dv)
)"""

DEDUP_SIMHASH_HAMMING_SQL = f"""
WITH {_SIMHASH_SIG_CTES},
{_SIMHASH_BAND_CTES}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash64, b.simhash64)) AS INT) AS hamming
FROM blocks a
JOIN blocks b
  ON a.block_id = b.block_id AND a.block_val = b.block_val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash64, b.simhash64)) <= 3
ORDER BY doc_a, doc_b
"""


# Adaptive sign-LSH sizing for the cosine near-dup entry: planes =
# smallest p >= 8 with N <= 64 * 2**p; 2-bit multi-probe only while
# p <= 8 (small corpora keep the wider recall neighborhood; at scale the
# mask count — 1 + C(p,1) + C(p,2) — is the candidate-pair multiplier the
# r7 sf10 probe saw explode: 8 planes / 37 masks at a 100-way-duplicated
# 200k-vector corpus built ~5.9G candidates and was killed at ~30 min,
# while the derived 12 planes / 1 probe bit finished in 38.8 s with full
# recall of the planted duplicate set — exact duplicates share every sign
# bit, so they pair under mask 0 at ANY sizing).
COSINE_TARGET_BUCKET = 64
COSINE_TWO_BIT_WHEN_LE = 8


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via the bucketed scale path: sign-LSH int
    bucket + multi-probe → equi-join on bucket → exact cosine. The plane
    count and probe width are DERIVED from the corpus size
    (`lsh_plane_count`; sf ≤ 0.1 keeps the historical 8 planes / 2 probe
    bits plan bit-identically). The exact all-pairs form
    (`DD.embedding_neardup_pairs`) stays as the recall oracle in
    tests/test_properties.py."""
    from gfe_db_spark.operators.similarity import lsh_plane_count

    from gfe_db_spark.sources.tables import table_rowcount

    emb = table(spark, sf_dir, "embeddings")
    p = lsh_plane_count(
        table_rowcount(spark, sf_dir, "embeddings"),
        target_bucket=COSINE_TARGET_BUCKET,
    )
    pb = 2 if p <= COSINE_TWO_BIT_WHEN_LE else 1
    return DD.embedding_neardup_pairs_bucketed(
        emb, threshold=0.4, n_planes=p, probe_bits=pb
    )


def _embedding_bucketed_sql(threshold: float = 0.4) -> str:
    """DuckDB mirror of the bucketed near-dup: identical hash-derived
    hyperplanes (similarity.hyperplane), identical XOR probe masks, and
    the SAME count-derived plane/probe sizing (adaptive_lsh_ctes)."""
    from gfe_db_spark.queries.lsh_sql import adaptive_lsh_ctes

    return f"""
WITH v0 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), {adaptive_lsh_ctes(COSINE_TARGET_BUCKET, two_bit_when_le=COSINE_TWO_BIT_WHEN_LE)}, cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
  FROM a JOIN b ON a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(list_cosine_similarity(va, vb), 9) AS cos
FROM cand
WHERE round(list_cosine_similarity(va, vb), 9) >= {threshold}
"""


DEDUP_EMBEDDING_SQL = _embedding_bucketed_sql()


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate clusters: connected components (iterative
    min-label propagation, plans/graph_algos.py) over the n-gram-Jaccard
    pair graph; component id = min doc_id. Returns cluster sizes. Runs
    behind the exact-digest gate (`neardup_components`): identical texts
    collapse to one representative before the shingle join, so a corpus
    dominated by exact duplicates can't go quadratic in a shingle bucket."""
    cc = DD.neardup_components(table(spark, sf_dir, "documents"))
    return (
        cc.groupBy(F.col("cluster_id").alias("component"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# Digest-gated transitive closure shared by the component-family oracles:
# identical texts collapse to a representative class before the shingle
# join, the recursive closure runs over representatives only, and the
# verdict fans back out through the class mapping — the same gate (and the
# same min-preservation argument) as operators.dedup.neardup_components,
# but closed via a recursive CTE instead of iterative label propagation.
# NULL / sub-3-token texts are singleton classes (zero shingles ⇒ the
# ungated graph never pairs them; collapsing would merge them — the
# round-5 advice finding), mirroring the operator's gate carve-out.
_GATED_COMPONENT_CTE = r"""
WITH RECURSIVE cls AS (
  SELECT doc_id, text,
         CASE WHEN text IS NOT NULL
                   AND len(string_split_regex(text, '\s+')) >= 3
              THEN MIN(doc_id) OVER (PARTITION BY md5(text))
              ELSE doc_id END AS rep_id
  FROM documents
), rd AS (
  SELECT doc_id, text FROM cls WHERE doc_id = rep_id
), t AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM rd
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                  i -> array_to_string(toks[i:i+2], ' '))) AS shingle
    FROM t
  )
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
), pairs AS (
  SELECT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
  ) c
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(n_common / (sa.sz + sb.sz - n_common), 9) >= 0.5
), edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM pairs
), reach(node, lab) AS (
  SELECT doc_id, doc_id FROM rd
  UNION
  SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
), comp AS (
  SELECT node AS rep_id, MIN(lab) AS cluster_id FROM reach GROUP BY node
), verdict AS (
  SELECT c.doc_id, m.cluster_id FROM cls c JOIN comp m ON c.rep_id = m.rep_id
)
"""

DEDUP_CLUSTERS_SQL = (
    _GATED_COMPONENT_CTE
    + """
SELECT cluster_id AS component, COUNT(*) AS n_docs
FROM verdict
GROUP BY cluster_id
ORDER BY component
"""
)


def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision list a dedup pass actually applies: every document with
    its near-dup cluster id and a keep flag (keep = cluster representative,
    i.e. the min doc_id — deterministic). Documents in no cluster keep
    themselves. This is `dedup_clusters` carried to the per-document
    verdict, the join target for filtering a corpus. Digest-gated like
    the rest of the component family."""
    cc = DD.neardup_components(table(spark, sf_dir, "documents"))
    return cc.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


DEDUP_KEEP_LIST_SQL = (
    _GATED_COMPONENT_CTE
    + """
SELECT doc_id, cluster_id, doc_id = cluster_id AS keep
FROM verdict
ORDER BY doc_id
"""
)


def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate documents are
    forced into the SAME split by hashing the near-dup CLUSTER id instead
    of the doc id. A per-doc hash split (text_split_assign) leaks: two
    near-identical docs can land in train and test, inflating eval (the
    contamination channel Lee et al., "Deduplicating Training Data Makes
    Language Models Better", measure). Pipeline: n-gram-Jaccard pairs →
    connected components → split = hash(cluster_id) gate. Singleton docs
    (cluster_id = doc_id) get exactly the text_split_assign assignment, so
    adopting the safe split only moves docs that have near-dups.

    Scale: candidate pairs are a shingle-keyed equi-join over DISTINCT
    texts only (the exact-digest gate in `neardup_components` collapses
    identical docs to a representative first — exact dups are Jaccard-1
    near-dups, so the clusters are unchanged), CC is the iterative
    path-halving loop (plans/graph_algos.py), and the split itself is a
    narrow map on cluster_id — no extra shuffle beyond the dedup pass a
    pipeline already runs."""
    from gfe_db_spark.operators.text import deterministic_split

    cc = DD.neardup_components(table(spark, sf_dir, "documents"))
    assigned = deterministic_split(cc, id_col="cluster_id")
    return assigned.select("doc_id", "cluster_id", "split")


# same gated recursive-CTE closure as dedup_keep_list; the split gate
# hashes the component id with the same md5-LE32 contract as TEXT_SPLIT_SQL
LEAKAGE_SAFE_SPLIT_SQL = (
    _GATED_COMPONENT_CTE
    + """, g AS (
  SELECT doc_id, cluster_id,
         CAST(md5_number_upper(CAST(cluster_id AS VARCHAR) || ':v1')
              & 4294967295 AS BIGINT) % 10000 AS bucket
  FROM verdict
)
SELECT doc_id, cluster_id,
       CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM g ORDER BY doc_id
"""
)


def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-corpus prep a real pipeline runs, end to end:
    quality gate (≥5 tokens) → exact dedup (md5, min-id representative) →
    near-dup dedup (n-gram Jaccard ≥ 0.5 → connected components → keep
    representatives) → deterministic train/val/test split → per-split
    stats. Every stage is one of the registered operators; this entry
    checks their *composition* against a single SQL oracle."""
    from gfe_db_spark.operators.text import deterministic_split, token_stats
    from gfe_db_spark.plans.graph_algos import connected_components

    from gfe_db_spark.plans.graph_algos import _cut_lineage

    docs = table(spark, sf_dir, "documents")
    q = token_stats(docs).filter(F.col("n_tokens") >= 5)
    ex = q.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("doc_id"))
    survivors = q.join(ex.select("doc_id"), "doc_id")
    # Materialize the COMPACT survivor keep-list once (r13): `survivors`
    # has three consumers (pair shingles, CC node list, final stats
    # join), and each re-derived the whole tokenize + exact-dedup
    # upstream per evaluation. The id+n_chars list is 16 B/row; the one
    # consumer that needs text re-attaches it from the base scan with an
    # id join instead of re-running the derivation (§8: decide with
    # small rows, re-attach the payload once).
    surv_keys = _cut_lineage(survivors.select("doc_id", "n_chars"))
    surv_docs = docs.join(surv_keys.select("doc_id"), "doc_id")
    # shared_exchange: the self-join's build side would otherwise re-run
    # the survivor re-attachment join per side (r13 measured pattern)
    pairs = DD.ngram_jaccard_pairs(
        DD.shingles(surv_docs, n=3), threshold=0.5, shared_exchange=True
    )
    cc = connected_components(
        surv_keys.select(F.col("doc_id").alias("node")),
        pairs.select("doc_a", "doc_b"),
        "doc_a",
        "doc_b",
    )
    keep = cc.filter(F.col("node") == F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    final = surv_keys.join(keep, "doc_id")
    return (
        deterministic_split(final)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
        )
        .orderBy("split")
    )


CORPUS_PREP_SQL = r"""
WITH RECURSIVE q AS (
  SELECT doc_id, text, n_chars FROM documents
  WHERE len(string_split_regex(text, '\s+')) >= 5
), ex AS (
  SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)
), s AS (
  SELECT q.* FROM q JOIN ex USING (doc_id)
), t AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM s
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                  i -> array_to_string(toks[i:i+2], ' '))) AS shingle
    FROM t
  )
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
), pairs AS (
  SELECT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
  ) c
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(n_common / (sa.sz + sb.sz - n_common), 9) >= 0.5
), edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM pairs
), reach(node, lab) AS (
  SELECT doc_id, doc_id FROM s
  UNION
  SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
), keep AS (
  SELECT node AS doc_id FROM (
    SELECT node, MIN(lab) AS component FROM reach GROUP BY node
  ) WHERE node = component
), final AS (
  SELECT s.* FROM s JOIN keep USING (doc_id)
), b AS (
  SELECT n_chars,
         CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || ':v1') & 4294967295 AS BIGINT)
           % 10000 AS bucket
  FROM final
)
SELECT CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY 1 ORDER BY split
"""


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test-overlap scan: distinct 3-gram shingles of every corpus
    document joined against a pseudo-benchmark set (docs with
    doc_id % 97 == 0 stand in for held-out eval data). Benchmark side is
    broadcast; the corpus side never shuffles for the probe."""
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter("doc_id % 97 = 0")
    return DD.contamination_counts(docs, bench, n=3)


CONTAMINATION_SQL = _SHINGLE_CTE + """
, bsh AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
), tot AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1
), hits AS (
  SELECT s.doc_id, COUNT(*) AS n_contaminated
  FROM sh s JOIN bsh USING (shingle) GROUP BY 1
)
SELECT t.doc_id,
       t.n_shingles,
       CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       COALESCE(h.n_contaminated, 0) > 0 AS contaminated
FROM tot t LEFT JOIN hits h USING (doc_id)
ORDER BY t.doc_id
"""


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: treat every 10th document (doc_id % 10
    = 0) as the newly-crawled batch and the rest as the existing corpus;
    flag each batch doc that MinHash-LSH-collides with the corpus. The
    batch's band keys broadcast; the corpus is probed, never self-paired
    and never shuffled (operators/dedup.incremental_dup_flags)."""
    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus_sigs = DD.minhash_signatures(DD.shingles(corpus, n=3, distinct=False), num_hashes=8)
    batch_sigs = DD.minhash_signatures(DD.shingles(batch, n=3, distinct=False), num_hashes=8)
    # batch_ids: a doc has a MinHash signature iff it has >= n tokens
    # (shingles yields no rows otherwise), so the output id list is this
    # cheap token-count scan — not a second full shingle+minhash pass of
    # the batch, which is what deriving ids from batch_sigs costs once
    # column pruning specializes the aggregate (r13 stage audit: one of
    # the three heavy stages here was exactly that recompute).
    batch_ids = batch.select("doc_id").where(
        F.size(F.split(F.col("text"), "\\s+")) >= 3
    )
    return DD.incremental_dup_flags(
        corpus_sigs, batch_sigs, bands=4, rows_per_band=2, batch_ids=batch_ids
    )


DEDUP_INCREMENTAL_SQL = (
    _LSH_BANDED_CTE
    + """
, dup AS (
  SELECT DISTINCT a.doc_id
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_hash = b.band_hash
  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
)
SELECT s.doc_id, (d.doc_id IS NOT NULL) AS is_dup
FROM sigs s LEFT JOIN dup d USING (doc_id)
WHERE s.doc_id % 10 = 0
ORDER BY s.doc_id
"""
)


def set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join (token-set Jaccard ≥ 3/5) with
    PPJoin-style prefix filtering on a deterministic corpus slice. The
    oracle generates candidates from ALL shared tokens — an independent
    (prefix-free) formulation, so a lossy prefix bound would show up as
    missing pairs, not cancel out. The slice is BOUNDED (doc_id < 5000,
    i.e. the full sf0.1 slice at every SF ≥ 0.1): the prefix-free oracle
    is Σ df² in shared tokens and goes quadratic on a growing corpus (the
    r5 sf1 sweep never finished it); the exact-pair entry exists to
    verify PPJoin semantics, and the SCALE path for set similarity is the
    banded MinHash family (`dedup_minhash_*`, `dedup_lsh_pairs`)."""
    docs = table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 5000)
    )
    out = DD.set_similarity_join(docs, threshold_num=3, threshold_den=5)
    return out


SET_SIM_JOIN_SQL = r"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0 AND doc_id < 5000),
dt AS (
  SELECT DISTINCT doc_id AS doc, tok
  FROM d, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS u(tok)
),
sizes AS (SELECT doc, COUNT(*) AS n FROM dt GROUP BY doc),
pairs AS (
  SELECT a.doc AS da, b.doc AS db, CAST(COUNT(*) AS BIGINT) AS inter
  FROM dt a JOIN dt b ON a.tok = b.tok AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT p.da, p.db, p.inter,
       CAST(sa.n AS BIGINT) AS na, CAST(sb.n AS BIGINT) AS nb,
       round(p.inter / (sa.n + sb.n - p.inter), 9) AS jaccard
FROM pairs p
JOIN sizes sa ON p.da = sa.doc
JOIN sizes sb ON p.db = sb.doc
WHERE p.inter * 5 >= 3 * (sa.n + sb.n - p.inter)
ORDER BY da, db
"""


def dedup_exact_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication scan (Lee et al. 2022 shape): per-doc
    count and coverage of maximal spans built from 8-token windows that
    occur more than once in the corpus."""
    docs = table(spark, sf_dir, "documents")
    return DD.duplicated_span_stats(docs, k=8)


DEDUP_SUBSTR_SQL = r"""
WITH b2 AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents
), b3 AS (SELECT doc_id, toks, len(toks) AS n_tokens FROM b2),
sh AS (
  SELECT doc_id, i - 1 AS p,
         md5(array_to_string(toks[i:i+7], ' ')) AS h
  FROM (SELECT doc_id, toks, unnest(range(1, n_tokens - 8 + 2)) AS i
        FROM b3 WHERE n_tokens >= 8)
),
flagged AS (
  SELECT doc_id, p FROM (
    SELECT doc_id, p, COUNT(*) OVER (PARTITION BY h) AS c FROM sh
  ) WHERE c > 1
),
isl AS (
  SELECT doc_id, p,
         CASE WHEN max(p + 7) OVER (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR p > max(p + 7) OVER (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS st
  FROM flagged
),
isl2 AS (
  SELECT doc_id, p, SUM(st) OVER (PARTITION BY doc_id ORDER BY p) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, island, MIN(p) AS s, MAX(p) + 7 AS e
  FROM isl2 GROUP BY 1, 2
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(e - s + 1) AS BIGINT) AS n_dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(a.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
       round(COALESCE(a.n_dup_tokens, 0) / greatest(b.n_tokens, 1), 9) AS dup_frac
FROM b3 b LEFT JOIN agg a USING (doc_id)
ORDER BY b.doc_id
"""


def _bench_bloom_bits(
    spark: SparkSession,
    sf_dir: str,
    bench_sh: DataFrame,
    bench_tag: str = "mod97:3gram",
) -> int:
    """Count-derived Bloom width for the benchmark shingle set
    (`DD.bloom_m_bits`): 16 bits per distinct benchmark shingle, floored
    at the historical 64 Ki so every bench-scale plan is unchanged. The
    oracle derives the SAME width from COUNT(*) over its own benchmark
    CTE — a fixed width saturates under corpus growth (the r9 sf10 probe
    measured the 64 Ki filter at ~250k benchmark shingles flagging EVERY
    doc as contaminated, emptying corpus_prep_pipeline_v2).

    Sizing the bitset needs the benchmark cardinality at
    query-CONSTRUCTION time; the benchmark is derived (filter + shingle +
    distinct), so its count is a real (small) Spark job — memoized via
    `memo_sizing` keyed on (sf_dir, table fingerprint, `bench_tag`). The
    tag names the benchmark DEFINITION (r9 advice): a caller with a
    different benchmark over the same sf_dir must pass a different tag or
    it would inherit this one's count."""
    from gfe_db_spark.sources.tables import memo_sizing

    n = memo_sizing(
        sf_dir, "documents", f"bench_shingles:{bench_tag}", bench_sh.count
    )
    return DD.bloom_m_bits(n, bits_per_item=16)


def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination: the benchmark set's distinct 3-gram
    shingles compile into a broadcast bitset whose width is COUNT-DERIVED
    from the benchmark cardinality (`_bench_bloom_bits`: 16 bits/item,
    power-of-2, floored at 64 Ki bits = 8 KB); every corpus shingle probes
    it with pure column arithmetic — no benchmark join key ever touches
    the corpus side (`bloom_probe`). Reports per-document bloom hits next to exact hits so
    the Bloom contract is visible in the output: exact_hits <= bloom_hits
    (no false negatives), n_false_pos bounds the filter's error.

    Scale: at 100 TB the benchmark bitset is a few MB broadcast once;
    the corpus does one doc-keyed agg — same cost as a plain count. The
    exact join here is the verification channel, not the scale path.
    """
    docs = table(spark, sf_dir, "documents")
    bench_sh = (
        DD.shingles(docs.filter("doc_id % 97 = 0"), n=3).select("shingle").distinct()
    )
    m = _bench_bloom_bits(spark, sf_dir, bench_sh)
    bloom = DD.bloom_bitset(bench_sh, m_bits=m, k=3)
    probed = DD.bloom_probe(DD.shingles(docs, n=3), bloom, m_bits=m, k=3)
    exact = probed.join(
        F.broadcast(bench_sh.withColumn("__exact", F.lit(1))), "shingle", "left"
    )
    return (
        exact.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).alias("bloom_hits"),
            F.sum(F.when(F.col("__exact").isNotNull(), 1).otherwise(0)).alias(
                "exact_hits"
            ),
            F.sum(
                F.when(F.col("bloom_hit") & F.col("__exact").isNull(), 1).otherwise(0)
            ).alias("n_false_pos"),
        )
        .withColumn("flagged", F.col("bloom_hits") > 0)
    )


# Oracle independence: both sides now build the filter in sparse join
# form (explode probes -> word-grouped bit_or -> join on word) — since
# r10 the Spark side uses a sparse (word, bits) table attached via k
# broadcast hash joins rather than a dense-array broadcast. Independence
# therefore rests on (a) the shared md5-LE32 hash contract
# (md5_number_upper & 0xFFFFFFFF = little-endian first 4 md5 bytes),
# pinned by its own unit test, and (b) the filter width m being derived
# independently on each side (Spark: `_bench_bloom_bits`; SQL: the `mb`
# CTE below) from the same count-vs-2^p rule.
BLOOM_DECONTAMINATE_SQL = _SHINGLE_CTE + """
, bsh AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
), mb AS (
  SELECT CAST((CAST(1 AS BIGINT) << CAST(COALESCE(MIN(p), 26) AS INT)) AS BIGINT) AS m
  FROM range(16, 27) r(p), (SELECT COUNT(*) AS n FROM bsh) nb
  WHERE nb.n * 16 <= (CAST(1 AS BIGINT) << CAST(p AS INT))
), probes AS (
  SELECT unnest(range(0, 3)) AS i
), bpos AS (
  SELECT DISTINCT
    CAST((md5_number_upper(b.shingle || ':bloom' || CAST(p.i AS VARCHAR))
          & 4294967295) % mb.m AS BIGINT) AS pos
  FROM bsh b CROSS JOIN probes p CROSS JOIN mb
), bloom AS (
  SELECT pos // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits
  FROM bpos GROUP BY 1
), pr AS (
  SELECT s.doc_id, s.shingle,
         CAST((md5_number_upper(s.shingle || ':bloom' || CAST(p.i AS VARCHAR))
               & 4294967295) % mb.m AS BIGINT) AS pos
  FROM sh s CROSS JOIN probes p CROSS JOIN mb
), tested AS (
  SELECT pr.doc_id, pr.shingle,
         bool_and((COALESCE(b.bits, 0)
                   & (CAST(1 AS BIGINT) << CAST(pr.pos % 32 AS INTEGER))) <> 0
         ) AS bloom_hit
  FROM pr LEFT JOIN bloom b ON b.word = pr.pos // 32
  GROUP BY 1, 2
), per_sh AS (
  SELECT t.doc_id, t.bloom_hit, (e.shingle IS NOT NULL) AS exact_hit
  FROM tested t LEFT JOIN bsh e ON e.shingle = t.shingle
)
SELECT doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS bloom_hits,
       CAST(SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT) AS exact_hits,
       CAST(SUM(CASE WHEN bloom_hit AND NOT exact_hit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos,
       (SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) > 0) AS flagged
FROM per_sh
GROUP BY doc_id
ORDER BY doc_id
"""


def corpus_prep_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-3 corpus-prep composition, end to end in ONE plan:
    quality gate (≥5 tokens) → exact dedup (md5, min-id representative) →
    Bloom decontamination (drop any doc whose 3-grams probe the broadcast
    benchmark bitset — the no-join scale path, zero false negatives) →
    LEAKAGE-SAFE split (near-dup clusters hashed as a unit) → per-split
    stats. v1 (`corpus_prep_pipeline`) proved the classic stages compose;
    this proves the r3 additions compose with them — the pipeline a 100 TB
    training-data release actually runs."""
    from gfe_db_spark.operators.text import deterministic_split, token_stats
    from gfe_db_spark.plans.graph_algos import connected_components

    docs = table(spark, sf_dir, "documents")
    q = token_stats(docs).filter(F.col("n_tokens") >= 5)
    ex = q.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("doc_id"))
    survivors = q.join(ex.select("doc_id"), "doc_id")
    # decontamination: same benchmark definition as bloom_decontaminate
    bench_sh = (
        DD.shingles(docs.filter("doc_id % 97 = 0"), n=3).select("shingle").distinct()
    )
    m = _bench_bloom_bits(spark, sf_dir, bench_sh)
    bloom = DD.bloom_bitset(bench_sh, m_bits=m, k=3)
    probed = DD.bloom_probe(DD.shingles(survivors, n=3), bloom, m_bits=m, k=3)
    flagged = probed.filter("bloom_hit").select("doc_id").distinct()
    clean = survivors.join(flagged, "doc_id", "left_anti")
    # Materialize the compact decontaminated keep-list once (r13): the
    # three `clean` consumers below each re-derived tokenize +
    # exact-dedup + the FULL Bloom probe (the most expensive subtree in
    # the registry audit — 68 task-CPU s/run, ~3x one pass). Same
    # pattern as corpus_prep_pipeline: ids+n_chars checkpoint, text
    # re-attached from the base scan for the one consumer that needs it.
    from gfe_db_spark.plans.graph_algos import _cut_lineage

    clean_keys = _cut_lineage(clean.select("doc_id", "n_chars"))
    clean_docs = docs.join(clean_keys.select("doc_id"), "doc_id")
    # leakage-safe split over the decontaminated corpus
    pairs = DD.ngram_jaccard_pairs(
        DD.shingles(clean_docs, n=3), threshold=0.5, shared_exchange=True
    )
    cc = connected_components(
        clean_keys.select(F.col("doc_id").alias("node")),
        pairs.select("doc_a", "doc_b"),
        "doc_a",
        "doc_b",
    )
    assigned = deterministic_split(
        cc.select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")),
        id_col="cluster_id",
    )
    return (
        assigned.join(clean_keys, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
        )
        .orderBy("split")
    )


def corpus_prep_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 corpus-prep composition, end to end in ONE plan:
    CCNet boilerplate strip (shared lines removed, survivors reassembled)
    → quality gate (≥5 tokens post-strip) → SimHash Hamming-banded
    near-dup drop (drop the larger id of every pair within distance 3)
    → GLOBAL token-budget sharding (two-phase prefix sum) → per-shard
    stats. v2 proved the r3 stages compose; this proves the r4 stages do
    — strip/dedup/shard is the writer path of a training-data release."""
    from gfe_db_spark.operators.packing import shard_by_token_budget
    from gfe_db_spark.operators.text import strip_boilerplate, tokenize

    docs = table(spark, sf_dir, "documents")
    cleaned = strip_boilerplate(docs, min_docs=2, distinct_texts=True).select(
        "doc_id", F.col("cleaned").alias("text")
    )
    n_tok = F.size(F.filter(tokenize(F.col("text")), lambda t: t != "")).cast("long")
    gated = cleaned.filter(n_tok >= 5).repartition(F.col("doc_id"))
    # Drop-list form, not pair expansion: `simhash_neardup_drops` collapses
    # exact-duplicate fingerprints into signature classes before the banded
    # join, so a corpus dominated by exact duplicates stays linear here
    # (the pair-expanding form would enumerate k²/2 within-class pairs
    # just to distinct() them back down to k-1 drop ids).
    drops = DD.simhash_neardup_drops(DD.simhash(gated), max_hamming=3, n_blocks=4)
    surv = gated.join(drops, "doc_id", "left_anti")
    sharded = shard_by_token_budget(surv, budget=4096, bucket_span=64)
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("shard")
    )


_SIMHASH_OVER_GATED = _SIMHASH_SIG_CTES.replace("FROM documents", "FROM gated")

CORPUS_PREP_V3_SQL = rf"""
WITH lines AS (
  SELECT doc_id, dg, generate_subscripts(l, 1) AS pos, unnest(l) AS line
  FROM (SELECT doc_id, md5(text) AS dg, string_split(text, chr(10)) AS l
        FROM documents)
), boiler AS (
  SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT dg) >= 2
), cleaned AS (
  SELECT l.doc_id,
         COALESCE(string_agg(CASE WHEN b.line IS NULL THEN l.line END,
                             chr(10) ORDER BY l.pos), '') AS text
  FROM lines l LEFT JOIN boiler b USING (line)
  GROUP BY l.doc_id
), gated AS (
  SELECT doc_id, text,
         CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> ''))
              AS BIGINT) AS n_tokens
  FROM cleaned
  WHERE len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) >= 5
), {_SIMHASH_OVER_GATED},
{_SIMHASH_BAND_CTES}, drops AS (
  SELECT DISTINCT b.doc_id
  FROM blocks a
  JOIN blocks b
    ON a.block_id = b.block_id AND a.block_val = b.block_val AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash64, b.simhash64)) <= 3
), surv AS (
  SELECT g.doc_id, g.n_tokens FROM gated g
  LEFT JOIN drops d USING (doc_id) WHERE d.doc_id IS NULL
), sharded AS (
  SELECT doc_id, n_tokens,
         CAST(FLOOR(CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) / 4096) AS BIGINT) AS shard
  FROM surv
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM sharded GROUP BY shard ORDER BY shard
"""


CORPUS_PREP_V2_SQL = r"""
WITH RECURSIVE q AS (
  SELECT doc_id, text, n_chars FROM documents
  WHERE len(string_split_regex(text, '\s+')) >= 5
), ex AS (
  SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)
), s AS (
  SELECT q.* FROM q JOIN ex USING (doc_id)
), bt AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks
  FROM documents WHERE doc_id % 97 = 0
), bsh AS (
  SELECT DISTINCT shingle FROM (
    SELECT unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
           i -> array_to_string(toks[i:i+2], ' '))) AS shingle
    FROM bt
  )
), mb AS (
  SELECT CAST((CAST(1 AS BIGINT) << CAST(COALESCE(MIN(p), 26) AS INT)) AS BIGINT) AS m
  FROM range(16, 27) r(p), (SELECT COUNT(*) AS n FROM bsh) nb
  WHERE nb.n * 16 <= (CAST(1 AS BIGINT) << CAST(p AS INT))
), probes AS (
  SELECT unnest(range(0, 3)) AS i
), bpos AS (
  SELECT DISTINCT
    CAST((md5_number_upper(b.shingle || ':bloom' || CAST(p.i AS VARCHAR))
          & 4294967295) % mb.m AS BIGINT) AS pos
  FROM bsh b CROSS JOIN probes p CROSS JOIN mb
), bloom AS (
  SELECT pos // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits
  FROM bpos GROUP BY 1
), st AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM s
), ssh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                  i -> array_to_string(toks[i:i+2], ' '))) AS shingle
    FROM st
  )
), pr AS (
  SELECT ssh.doc_id, ssh.shingle,
         CAST((md5_number_upper(ssh.shingle || ':bloom' || CAST(p.i AS VARCHAR))
               & 4294967295) % mb.m AS BIGINT) AS pos
  FROM ssh CROSS JOIN probes p CROSS JOIN mb
), tested AS (
  SELECT pr.doc_id, pr.shingle,
         bool_and((COALESCE(b.bits, 0)
                   & (CAST(1 AS BIGINT) << CAST(pr.pos % 32 AS INTEGER))) <> 0
         ) AS bloom_hit
  FROM pr LEFT JOIN bloom b ON b.word = pr.pos // 32
  GROUP BY 1, 2
), flagged AS (
  SELECT DISTINCT doc_id FROM tested WHERE bloom_hit
), clean AS (
  SELECT s.* FROM s LEFT JOIN flagged f USING (doc_id) WHERE f.doc_id IS NULL
), csh AS (
  SELECT ssh.doc_id, ssh.shingle FROM ssh JOIN clean USING (doc_id)
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM csh GROUP BY doc_id
), pairs AS (
  SELECT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM csh a JOIN csh b ON a.shingle = b.shingle
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
  ) c
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(n_common / (sa.sz + sb.sz - n_common), 9) >= 0.5
), edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM pairs
), reach(node, lab) AS (
  SELECT doc_id, doc_id FROM clean
  UNION
  SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node
), comp AS (
  SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node
), g AS (
  SELECT comp.doc_id,
         CAST(md5_number_upper(CAST(comp.cluster_id AS VARCHAR) || ':v1')
              & 4294967295 AS BIGINT) % 10000 AS bucket,
         clean.n_chars
  FROM comp JOIN clean USING (doc_id)
)
SELECT CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM g
GROUP BY split
ORDER BY split
"""


QUERIES: dict[str, QuerySpec] = {
    "corpus_prep_pipeline_v3": QuerySpec(
        corpus_prep_pipeline_v3,
        CORPUS_PREP_V3_SQL,
        "r4 composition: boilerplate strip → quality → SimHash dedup → prefix-sum shard",
    ),
    "corpus_prep_pipeline_v2": QuerySpec(
        corpus_prep_pipeline_v2,
        CORPUS_PREP_V2_SQL,
        "r3 composition: quality -> exact dedup -> Bloom decontaminate -> leakage-safe split",
    ),
    "dedup_exact_substrings": QuerySpec(
        dedup_exact_substrings,
        DEDUP_SUBSTR_SQL,
        "exact-substring duplicated-span coverage (repeated k-gram islands)",
    ),
    "set_similarity_join": QuerySpec(
        set_similarity_join,
        SET_SIM_JOIN_SQL,
        "exact Jaccard set-similarity join with lossless prefix filtering",
    ),
    "dedup_exact": QuerySpec(dedup_exact, DEDUP_EXACT_SQL, "exact hash dedup"),
    "dedup_incremental": QuerySpec(
        dedup_incremental,
        DEDUP_INCREMENTAL_SQL,
        "batch-vs-corpus incremental LSH dedup (broadcast delta probe)",
    ),
    "dedup_minhash_signatures": QuerySpec(
        dedup_minhash_signatures, DEDUP_MINHASH_SQL, "MinHash signatures"
    ),
    "dedup_lsh_pairs": QuerySpec(dedup_lsh_pairs, DEDUP_LSH_SQL, "LSH banded candidates"),
    "dedup_ngram_jaccard": QuerySpec(
        dedup_ngram_jaccard, DEDUP_JACCARD_SQL, "n-gram Jaccard pairs"
    ),
    "dedup_simhash": QuerySpec(dedup_simhash, DEDUP_SIMHASH_SQL, "SimHash fingerprints"),
    "dedup_simhash_hamming": QuerySpec(
        dedup_simhash_hamming,
        DEDUP_SIMHASH_HAMMING_SQL,
        "SimHash near-dup pairs: pigeonhole block banding + exact Hamming check",
    ),
    "dedup_minhash_est": QuerySpec(
        dedup_minhash_est, DEDUP_MINHASH_EST_SQL, "MinHash Jaccard estimate per pair"
    ),
    "dedup_clusters": QuerySpec(
        dedup_clusters, DEDUP_CLUSTERS_SQL, "near-dup clusters via connected components"
    ),
    "dedup_keep_list": QuerySpec(
        dedup_keep_list, DEDUP_KEEP_LIST_SQL, "per-document keep/drop verdict"
    ),
    "corpus_prep_pipeline": QuerySpec(
        corpus_prep_pipeline, CORPUS_PREP_SQL, "composed quality→dedup→split pipeline"
    ),
    "dedup_embedding_cosine": QuerySpec(
        dedup_embedding_cosine, DEDUP_EMBEDDING_SQL, "embedding near-dup pairs (LSH-bucketed)"
    ),
    "benchmark_contamination": QuerySpec(
        benchmark_contamination, CONTAMINATION_SQL, "train/test n-gram overlap scan"
    ),
    "bloom_decontaminate": QuerySpec(
        bloom_decontaminate,
        BLOOM_DECONTAMINATE_SQL,
        "Bloom-bitset decontamination with exact-hit verification channel",
    ),
    "leakage_safe_split": QuerySpec(
        leakage_safe_split,
        LEAKAGE_SAFE_SPLIT_SQL,
        "cluster-aware split: near-dups forced into the same train/val/test split",
    ),
}
