"""The load path (ref §3.2): build tables → property-graph node/edge
DataFrames with MERGE (dedup-upsert) semantics.

The ten `apoc.periodic.iterate` statements in `load.cyp:1-138` become ten
DataFrame pipelines. Cross-release accumulation (`ON MATCH SET`) is a
full-outer merge per table; the releases array union is the exact builtin
composition `array_sort ∘ array_distinct ∘ array_union` (`load.cyp:95`).

Key corrections over the reference (SURVEY §7 "inconsistencies"):
  - GFE keyed consistently on `name` (`create_constraints.cyp:1` says
    gfe_name but `load.cyp:7` merges on name);
  - HAS_SEQUENCE joins on `seq_id` (hash) instead of the multi-kb
    sequence string (`load.cyp:119`);
  - submit_date is a parameter, not `date()` (`load.cyp:109`), so loads
    are reproducible.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, fields

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from gfe_db_spark.functions.scalars import release_undotted
from gfe_db_spark.plans.build import BuildTables

# ref load.cyp:11-16 singleton
SUBMITTER = {
    "institution": "IPD",
    "name": "IPD-IMGT",
    "url": "https://www.ebi.ac.uk/ipd/imgt/hla/",
    "email": "<email>",
}


@dataclass
class GraphTables:
    nodes_gfe: DataFrame
    nodes_sequence: DataFrame
    nodes_feature: DataFrame
    nodes_ipd_allele: DataFrame
    nodes_ipd_accession: DataFrame
    nodes_submitter: DataFrame
    edges_has_ipd_allele: DataFrame
    edges_has_ipd_accession: DataFrame
    edges_submitted: DataFrame
    edges_has_sequence: DataFrame
    edges_has_feature: DataFrame

    def items(self):
        return [(f.name, getattr(self, f.name)) for f in fields(self)]

    def save(self, path: str) -> None:
        """S12: versioned snapshot — one parquet dataset per table."""
        for name, df in self.items():
            df.write.mode("overwrite").parquet(os.path.join(path, name))

    @staticmethod
    def load(spark: SparkSession, path: str) -> "GraphTables":
        """Load the accumulated graph. Layout is auto-detected: a
        `_graph_manifests` child marks the reader-isolated two-level
        manifest layout (`upsert_graph(layout="tx")`) — ONE graph-manifest
        read pins every table to the generation the same load committed,
        so the snapshot is consistent ACROSS tables, not just within each
        (a reader polling during a release load sees the whole graph
        before the load or the whole graph after it, the isolation the
        reference gets from Neo4j transactions, ref load.cyp:9). Without
        it, the in-place bucketed layout (plans/merge.py) is read live."""
        from gfe_db_spark.plans.merge import fs_exists, read_bucketed
        from gfe_db_spark.plans.txtable import latest_numbered_json, tx_read

        _n, gdoc = latest_numbered_json(spark, _graph_manifest_dir(path))
        if gdoc is not None:
            return GraphTables(**{
                f.name: tx_read(
                    spark,
                    os.path.join(path, f.name),
                    generation=gdoc["tables"][f.name],
                )
                for f in fields(GraphTables)
            })

        def load_one(name: str) -> DataFrame:
            tpath = os.path.join(path, name)
            if fs_exists(spark, os.path.join(tpath, "_manifests")):
                return tx_read(spark, tpath)
            return read_bucketed(spark, tpath)

        return GraphTables(**{f.name: load_one(f.name) for f in fields(GraphTables)})


def _dedup_first(df: DataFrame, keys: list[str], order: list) -> DataFrame:
    """Deterministic MERGE dedup: first row per key under an explicit
    ordering (the reference's MERGE takes CSV arrival order — we make the
    winner explicit)."""
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def load_release(
    spark: SparkSession,
    tables: BuildTables,
    release: str,
    submit_date: str = "2024-01-01",
    existing: GraphTables | None = None,
) -> GraphTables:
    """Run the ten MERGE pipelines for one release; `existing` carries the
    accumulated graph for multi-release upsert (idempotent on replay, ST3)."""
    gfe_seq = tables.gfe_sequences

    # A1: MERGE (gfe:GFE {name}) ON CREATE SET locus   (load.cyp:2-9)
    nodes_gfe = _dedup_first(
        gfe_seq.select(F.col("gfe_name").alias("name"), "locus"), ["name"], ["locus"]
    )

    # A5: singleton Submitter                          (load.cyp:10-16)
    nodes_submitter = spark.createDataFrame([SUBMITTER])

    # A2: Sequence node, name = gfe_name (ref quirk), last-writer props →
    # deterministic pick: max hla_name                  (load.cyp:18-33)
    nodes_sequence = _dedup_first(
        gfe_seq.select(
            F.col("gfe_name").alias("name"), "seq_id", "locus", "sequence", "length"
        ),
        ["name"],
        [F.desc("seq_id")],
    )

    # A3: Feature node on 5-col identity               (load.cyp:35-48)
    nodes_feature = tables.all_features.select(
        "locus", "rank", "term", "accession", "sequence"
    ).dropDuplicates(["locus", "rank", "term", "accession", "sequence"])

    # A4 + J5/F6: IPD_Allele with pivoted ARD annotations (load.cyp:49-83)
    ipd_base = _dedup_first(
        gfe_seq.select(F.col("hla_name").alias("name"), F.col("locus").alias("gene")),
        ["name"],
        ["gene"],
    )
    ard = (
        tables.all_groups.filter(F.col("ard_name").isin("G", "lg"))
        .groupBy("hla_name")
        .pivot("ard_name", ["G", "lg"])
        .agg(F.first("ard_id"))
    )
    nodes_ipd_allele = (
        ipd_base.join(ard, ipd_base.name == ard.hla_name, "left")
        .select("name", "gene", "G", "lg")
    )

    nodes_ipd_accession = gfe_seq.select(F.col("acc_name").alias("name")).dropDuplicates(
        ["name"]
    )

    # J2/A6: HAS_IPD_ALLELE with releases array         (load.cyp:85-95)
    edges_has_ipd_allele = (
        gfe_seq.select(
            F.col("gfe_name").alias("src"),
            F.col("hla_name").alias("dst"),
            release_undotted(F.col("imgt_release")).cast("int").alias("release"),
        )
        .groupBy("src", "dst")
        .agg(F.array_sort(F.collect_set("release")).alias("releases"))
    )

    # HAS_IPD_ACCESSION: release set ON CREATE only     (load.cyp:96-97)
    edges_has_ipd_accession = _dedup_first(
        gfe_seq.select(
            F.col("gfe_name").alias("src"),
            F.col("acc_name").alias("dst"),
            F.col("imgt_release").alias("release"),
        ),
        ["src", "dst"],
        ["release"],
    )

    # J6: SUBMITTED via cross join with the singleton   (load.cyp:101-111)
    edges_submitted = nodes_gfe.select(
        F.lit(SUBMITTER["email"]).alias("src"),
        F.col("name").alias("dst"),
        F.lit(submit_date).cast("date").alias("submit_date"),
    )

    # J3: HAS_SEQUENCE keyed by hash, not raw string    (load.cyp:113-122)
    edges_has_sequence = (
        gfe_seq.alias("g")
        .join(
            nodes_sequence.alias("s"),
            F.col("g.seq_id") == F.col("s.seq_id"),
        )
        .select(F.col("g.gfe_name").alias("src"), F.col("s.name").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )

    # J4: HAS_FEATURE on composite key                  (load.cyp:124-138)
    edges_has_feature = tables.all_features.select(
        F.col("gfe_name").alias("src"),
        F.col("locus").alias("dst_locus"),
        F.col("rank").alias("dst_rank"),
        F.col("term").alias("dst_term"),
        F.col("accession").alias("dst_accession"),
    ).dropDuplicates()

    new = GraphTables(
        nodes_gfe=nodes_gfe,
        nodes_sequence=nodes_sequence,
        nodes_feature=nodes_feature,
        nodes_ipd_allele=nodes_ipd_allele,
        nodes_ipd_accession=nodes_ipd_accession,
        nodes_submitter=nodes_submitter,
        edges_has_ipd_allele=edges_has_ipd_allele,
        edges_has_ipd_accession=edges_has_ipd_accession,
        edges_submitted=edges_submitted,
        edges_has_sequence=edges_has_sequence,
        edges_has_feature=edges_has_feature,
    )
    if existing is None:
        return new
    return merge_graphs(existing, new)


# ON MATCH rule per table, mirroring load.cyp: (merge keys, rule).
# 'create_only' = ON CREATE only; 'update' = ON MATCH SET (new wins);
# 'releases_union' = the A6 releases array set-union.
MERGE_RULES: dict[str, tuple[list[str], str]] = {
    "nodes_gfe": (["name"], "create_only"),
    "nodes_sequence": (["name"], "update"),
    "nodes_feature": (["locus", "rank", "term", "accession", "sequence"], "create_only"),
    "nodes_ipd_allele": (["name"], "update"),
    "nodes_ipd_accession": (["name"], "create_only"),
    "nodes_submitter": (["email"], "create_only"),
    "edges_has_ipd_allele": (["src", "dst"], "releases_union"),
    "edges_has_ipd_accession": (["src", "dst"], "create_only"),
    "edges_submitted": (["src", "dst"], "create_only"),
    "edges_has_sequence": (["src", "dst"], "create_only"),
    "edges_has_feature": (
        ["src", "dst_locus", "dst_rank", "dst_term", "dst_accession"],
        "create_only",
    ),
}


def _graph_manifest_dir(graph_path: str) -> str:
    return os.path.join(graph_path, "_graph_manifests")


def upsert_graph(
    new: GraphTables,
    graph_path: str,
    n_buckets: int = 16,
    layout: str = "tx",
) -> dict[str, list[int]]:
    """Commit one release's graph tables into the on-disk accumulated graph
    via the partition-pruned MERGE substrate: each table is hash-bucketed
    on its merge key and only the buckets this release touches are read
    and rewritten — commit cost is O(release), not O(accumulated graph).
    Semantics per table = merge_graphs (same rules, disk-backed). Returns
    touched buckets per table.

    `layout` picks the commit protocol, same merge semantics either way:
    - ``"inplace"``: `plans/merge.partitioned_upsert` — dynamic
      partition overwrite of the live dirs; cheapest, but a reader
      scanning DURING the commit can see a half-swapped partition mix —
      the documented opt-out for strictly single-reader deployments.
    - ``"tx"`` (default since r7): `plans/txtable.tx_upsert` — each table is a
      manifest-pointer table; a commit lands in a fresh generation dir
      published by an atomic manifest rename. On top, ONE graph-level
      manifest (``_graph_manifests/N.json``) is published AFTER all 11
      table commits, pinning each table to the generation this load
      produced — `GraphTables.load` resolves through it, so a polling
      reader sees the whole graph before the load or the whole graph
      after it, never release N's nodes with release N-1's edges (the
      cross-table atomicity the reference gets from Neo4j transactions,
      ref load.cyp:9 `apoc.periodic.iterate`)."""
    from gfe_db_spark.plans.merge import partitioned_upsert
    from gfe_db_spark.plans.txtable import (
        current_manifest_number,
        latest_numbered_json,
        publish_numbered_json,
        tx_upsert,
    )

    if layout not in ("inplace", "tx"):
        raise ValueError(f"unknown graph layout {layout!r}")
    # layout-switch guard: committing with the WRONG layout against an
    # existing graph silently loses data (tx sees an empty table and
    # publishes a graph manifest hiding the bucketed dirs; inplace writes
    # dirs the manifest-resolving reader never consults). Detect the
    # other layout's artifacts and refuse.
    from gfe_db_spark.plans.merge import fs_exists

    spark = new.nodes_gfe.sparkSession
    has_graph_manifest = fs_exists(spark, _graph_manifest_dir(graph_path))
    probe = os.path.join(graph_path, "nodes_gfe")
    # the inplace direction probes the per-table _manifests dir TOO (not
    # just the graph manifest): a tx load that crashed after some table
    # commits but before the first graph-manifest publish leaves
    # _manifests dirs with no _graph_manifests — an inplace commit then
    # would write bucketed dirs that tx-resolving readers (load_one
    # detects _manifests) never consult, the exact silent loss this
    # guard exists to prevent
    if layout == "inplace" and (
        has_graph_manifest or fs_exists(spark, os.path.join(probe, "_manifests"))
    ):
        raise ValueError(
            f"graph at {graph_path} uses the tx (manifest-pointer) layout; "
            "pass layout='tx' — an in-place commit would be invisible to "
            "manifest-resolving readers"
        )
    if (
        layout == "tx"
        and not has_graph_manifest
        and fs_exists(spark, probe)
        and not fs_exists(spark, os.path.join(probe, "_manifests"))
    ):
        raise ValueError(
            f"graph at {graph_path} uses the in-place bucketed layout; "
            "pass layout='inplace' — a tx commit would start from an empty "
            "table and hide the accumulated data"
        )
    do_upsert = tx_upsert if layout == "tx" else partitioned_upsert

    def releases_union(existing: DataFrame, batch: DataFrame) -> DataFrame:
        # __bucket = f(src, dst), so grouping by it alongside the keys is
        # exact (load.cyp:93-95 array union, as in merge_graphs)
        return (
            existing.unionByName(batch)
            .groupBy("src", "dst", "__bucket")
            .agg(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("releases")))
                ).alias("releases")
            )
        )

    def commit_one(item):
        name, df = item
        keys, rule = MERGE_RULES[name]
        path = os.path.join(graph_path, name)
        if rule == "releases_union":
            return name, do_upsert(
                df, path, keys, n_buckets=n_buckets, merge_fn=releases_union
            )
        return name, do_upsert(df, path, keys, on_match=rule, n_buckets=n_buckets)

    # the 11 table MERGEs are independent — run them as concurrent driver
    # jobs so the cluster pipelines them instead of paying 11 sequential
    # job-latency rounds (intra-release parallelism; releases themselves
    # stay serialized per ST6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        touched = dict(pool.map(commit_one, new.items()))

    if layout == "tx":
        # cross-table atomic publish: pin every table at the generation
        # this load just committed; readers resolve the graph through
        # this single pointer (see GraphTables.load)
        spark = new.nodes_gfe.sparkSession
        gens = {
            name: current_manifest_number(spark, os.path.join(graph_path, name))
            for name, _df in new.items()
        }
        gmdir = _graph_manifest_dir(graph_path)
        n, _doc = latest_numbered_json(spark, gmdir)
        publish_numbered_json(
            spark, gmdir, (n or 0) + 1, {"generation": (n or 0) + 1, "tables": gens}
        )
    return touched


def vacuum_graph(
    spark: SparkSession,
    graph_path: str,
    keep_graph_manifests: int = 2,
    keep_manifests: int = 2,
    grace_seconds: float | None = None,
) -> list[str]:
    """Graph-aware vacuum for a tx-layout graph: the ONLY safe way to
    reclaim space under member tables, because the graph manifest pins
    each table to a FIXED generation — a per-table `tx_vacuum` with no
    pins can prune the very manifest a retained graph manifest still
    references (two compactions, or keep_manifests=1, suffice), breaking
    `GraphTables.load` until the next load republishes.

    Three steps, each with the same retention contract (a reader that
    resolved any of the last `keep_graph_manifests` graph snapshots still
    finds every file it resolved):
    1. prune graph manifests to the newest `keep_graph_manifests`;
    2. for each member table, vacuum with the generations pinned by the
       RETAINED graph manifests unioned into its keep set;
    3. return every deleted path."""
    from gfe_db_spark.plans.txtable import (
        DEFAULT_GRACE_SECONDS,
        _list_names,
        fs_delete,
        fs_read_text,
        tx_vacuum,
    )
    import json

    if grace_seconds is None:
        grace_seconds = DEFAULT_GRACE_SECONDS
    gmdir = _graph_manifest_dir(graph_path)
    nums = sorted(
        int(n[:-5])
        for n in _list_names(spark, gmdir)
        if n.endswith(".json") and n[:-5].isdigit()
    )
    if not nums:
        raise FileNotFoundError(f"no graph manifests under {graph_path}")
    retained = nums[-max(keep_graph_manifests, 1):]
    removed: list[str] = []
    for n in nums:
        if n not in retained:
            path = f"{gmdir}/{n:08d}.json"
            fs_delete(spark, path)
            removed.append(path)
    # union of per-table generations pinned by the retained graph snapshots
    pins: dict[str, set[int]] = {}
    for n in retained:
        doc = json.loads(fs_read_text(spark, f"{gmdir}/{n:08d}.json"))
        for tname, gen in doc["tables"].items():
            pins.setdefault(tname, set()).add(gen)
    for f in fields(GraphTables):
        removed.extend(
            tx_vacuum(
                spark,
                os.path.join(graph_path, f.name),
                keep_manifests=keep_manifests,
                grace_seconds=grace_seconds,
                pin_generations=pins.get(f.name, set()),
            )
        )
    return removed


def merge_graphs(old: GraphTables, new: GraphTables) -> GraphTables:
    """Cross-release MERGE: ON CREATE = keep old row, insert new keys;
    ON MATCH behavior per table mirrors load.cyp (create-only vs update vs
    releases-array union)."""

    def create_only(old_df: DataFrame, new_df: DataFrame, keys: list[str]) -> DataFrame:
        return old_df.unionByName(new_df.join(old_df, on=keys, how="left_anti"))

    def update_on_match(old_df: DataFrame, new_df: DataFrame, keys: list[str]) -> DataFrame:
        # last-writer-wins: new release's row replaces matched rows
        return new_df.unionByName(old_df.join(new_df, on=keys, how="left_anti"))

    # releases array set-union (load.cyp:93-95)
    ipd_edges = (
        old.edges_has_ipd_allele.unionByName(new.edges_has_ipd_allele)
        .groupBy("src", "dst")
        .agg(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("releases")))).alias(
                "releases"
            )
        )
    )

    return GraphTables(
        nodes_gfe=create_only(old.nodes_gfe, new.nodes_gfe, ["name"]),
        nodes_sequence=update_on_match(old.nodes_sequence, new.nodes_sequence, ["name"]),
        nodes_feature=create_only(
            old.nodes_feature,
            new.nodes_feature,
            ["locus", "rank", "term", "accession", "sequence"],
        ),
        nodes_ipd_allele=update_on_match(
            old.nodes_ipd_allele, new.nodes_ipd_allele, ["name"]
        ),
        nodes_ipd_accession=create_only(
            old.nodes_ipd_accession, new.nodes_ipd_accession, ["name"]
        ),
        nodes_submitter=old.nodes_submitter,
        edges_has_ipd_allele=ipd_edges,
        edges_has_ipd_accession=create_only(
            old.edges_has_ipd_accession, new.edges_has_ipd_accession, ["src", "dst"]
        ),
        edges_submitted=create_only(old.edges_submitted, new.edges_submitted, ["src", "dst"]),
        edges_has_sequence=create_only(
            old.edges_has_sequence, new.edges_has_sequence, ["src", "dst"]
        ),
        edges_has_feature=create_only(
            old.edges_has_feature,
            new.edges_has_feature,
            ["src", "dst_locus", "dst_rank", "dst_term", "dst_accession"],
        ),
    )
