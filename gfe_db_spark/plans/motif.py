"""J8: graph motif queries as join compositions.

The reference's query surface is Cypher `MATCH` patterns
(`docs/source/reference.rst:92-96`). GraphFrames isn't available in this
environment, so this is a small motif→join compiler in its `find` style:

    find(g, "(a:GFE)-[:HAS_FEATURE]->(f:Feature)")

compiles to the edge table joined to both node tables, output columns
prefixed by the pattern variables (`a_name`, `f_term`, …). Chained hops
share variables:

    find(g, "(w:IPD_Allele)<-[:HAS_IPD_ALLELE]-(g1:GFE)-[:HAS_FEATURE]->(f:Feature)")

Each hop is one equi-join on node keys — Catalyst plans the join order;
label filtering prunes node scans before the joins (the custom rule the
survey flagged is unnecessary because node tables are already per-label).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfe_db_spark.plans.load import GraphTables

# node label → (table attr, key columns used by edges pointing at it)
_NODE_TABLE = {
    "GFE": "nodes_gfe",
    "Sequence": "nodes_sequence",
    "Feature": "nodes_feature",
    "IPD_Allele": "nodes_ipd_allele",
    "IPD_Accession": "nodes_ipd_accession",
    "Submitter": "nodes_submitter",
}

# Older schema labels used throughout the reference's documented query
# surface (`docs/source/reference.rst:20` — "the WHO and IMGT_HLA nodes";
# the doc's example queries write `(:WHO {name})`). Both are prior names
# for today's IPD_Allele node, so the doc's literal query text keeps
# working against this engine.
LABEL_ALIASES = {
    "WHO": "IPD_Allele",
    "IMGT_HLA": "IPD_Allele",
}


def _resolve_label(label: str) -> str:
    label = LABEL_ALIASES.get(label, label)
    if label not in _NODE_TABLE:
        raise ValueError(f"unknown node label: {label!r}")
    return label

# edge type → (table attr, src node label, dst node label, dst join spec)
# dst join spec: "name" for name-keyed nodes, or the composite feature key.
_EDGE_TABLE = {
    "HAS_IPD_ALLELE": ("edges_has_ipd_allele", "GFE", "IPD_Allele", "name"),
    "HAS_IPD_ACCESSION": ("edges_has_ipd_accession", "GFE", "IPD_Accession", "name"),
    "SUBMITTED": ("edges_submitted", "Submitter", "GFE", "name"),
    "HAS_SEQUENCE": ("edges_has_sequence", "GFE", "Sequence", "name"),
    "HAS_FEATURE": ("edges_has_feature", "GFE", "Feature", "feature_key"),
}

_HOP = re.compile(
    r"\((\w+):(\w+)\)\s*(<-|-)\[(\w*):(\w+)\]\s*(->|-)\s*(?=\((\w+):(\w+)\))"
)

# edge columns that are join plumbing, not edge properties — an edge
# variable's prefix applies to everything else (releases, release,
# submit_date, …), exposing them as `<evar>_<prop>` like node columns
_EDGE_KEY_COLS = {"src", "dst", "dst_locus", "dst_rank", "dst_term", "dst_accession"}


def _prefixed(df: DataFrame, var: str) -> DataFrame:
    return df.select([F.col(c).alias(f"{var}_{c}") for c in df.columns])


def find(graph: GraphTables, pattern: str) -> DataFrame:
    """Compile a motif pattern to joins. Supports chains of hops
    `(v:Label)-[:TYPE]->(v2:Label2)` with `<-` for reversed direction;
    repeated variables unify. A relationship variable `-[r:TYPE]->`
    exposes the edge's property columns as `r_<prop>` (the reference's
    validation queries read `r.releases` / `r.release`,
    ref execute_validation_queries/app.py:73-79)."""
    hops = []
    for m in _HOP.finditer(pattern):
        lvar, llab, larrow, evar, etype, rarrow, rvar, rlab = m.groups()
        reversed_ = larrow == "<-"
        hops.append((lvar, llab, evar or None, etype, rvar, rlab, reversed_))
    if not hops:
        raise ValueError(f"no hops parsed from pattern: {pattern!r}")

    result: DataFrame | None = None
    bound: set[str] = set()

    for lvar, llab, evar, etype, rvar, rlab, reversed_ in hops:
        llab, rlab = _resolve_label(llab), _resolve_label(rlab)
        table_attr, src_lab, dst_lab, dst_key = _EDGE_TABLE[etype]
        edges = getattr(graph, table_attr)
        if evar:
            edges = edges.select(
                [
                    F.col(c) if c in _EDGE_KEY_COLS else F.col(c).alias(f"{evar}_{c}")
                    for c in edges.columns
                ]
            )
        # pattern-direction: (l)-[:T]->(r) means l=src,r=dst; '<-' swaps
        src_var, dst_var = (rvar, lvar) if reversed_ else (lvar, rvar)
        src_node = _prefixed(getattr(graph, _NODE_TABLE[src_lab]), src_var)
        dst_node = _prefixed(getattr(graph, _NODE_TABLE[dst_lab]), dst_var)

        hop_df = edges
        # join src node on name key
        hop_df = hop_df.join(
            src_node, hop_df.src == src_node[f"{src_var}_name"], "inner"
        )
        if dst_key == "name":
            hop_df = hop_df.join(
                dst_node, hop_df.dst == dst_node[f"{dst_var}_name"], "inner"
            ).drop("src", "dst")
        else:  # composite feature key
            cond = (
                (hop_df.dst_locus == dst_node[f"{dst_var}_locus"])
                & (hop_df.dst_rank == dst_node[f"{dst_var}_rank"])
                & (hop_df.dst_term == dst_node[f"{dst_var}_term"])
                & (hop_df.dst_accession == dst_node[f"{dst_var}_accession"])
            )
            hop_df = hop_df.join(dst_node, cond, "inner").drop(
                "src", "dst_locus", "dst_rank", "dst_term", "dst_accession"
            )

        if result is None:
            result = hop_df
            bound |= {src_var, dst_var}
        else:
            shared = [v for v in (src_var, dst_var) if v in bound]
            if not shared:
                result = result.crossJoin(hop_df)
            else:
                # unify on the shared variable's columns present in both
                join_cols = [
                    c
                    for c in hop_df.columns
                    if c in result.columns and c.split("_", 1)[0] in shared
                ]
                # avoid duplicate non-join columns
                dup = [c for c in hop_df.columns if c in result.columns and c not in join_cols]
                hop_df = hop_df.drop(*dup)
                result = result.join(hop_df, on=join_cols, how="inner")
            bound |= {src_var, dst_var}

    return result


# --- mini-Cypher front end -------------------------------------------------
# Enough MATCH/WITH/UNWIND/RETURN/ORDER BY to run every literal Cypher
# text the reference executes or documents:
#
# the docs query (`docs/source/reference.rst:36`):
#     MATCH (:WHO {name:'HLA-A*01:03:01:01'})-[]-(:GFE)-[]-(f:Feature)
#     RETURN f.term, f.rank ORDER BY f.term, f.rank
#
# and the three validation queries
# (`execute_validation_queries/app.py:45,73-77,79`):
#     MATCH (n:GFE) RETURN count(n) as count;
#     MATCH (:GFE)-[r:HAS_IPD_ALLELE]->(:IPD_Allele)
#     WITH r, apoc.coll.toSet(r.releases) as releases
#     UNWIND toIntegerList(releases) as release_version
#     RETURN DISTINCT release_version, count(release_version) as count
#     ORDER BY release_version;
#     MATCH ()-[r:HAS_IPD_ACCESSION]->() RETURN DISTINCT
#     r.release as release_version, count(r.release) as count;
#
# i.e. anonymous nodes (labels inferable from a typed edge), `{key:'value'}`
# property filters, untyped undirected edges (type inferred from the
# endpoint label pair — unambiguous in this schema), relationship
# variables with property access, node-only patterns, `count()`
# aggregation (non-aggregated RETURN items become grouping keys, Cypher's
# implicit GROUP BY), `DISTINCT`, a WITH projection, a single UNWIND,
# label aliases, and `AS` aliases. Output columns are named
# `<var>_<prop>` unless aliased (anonymous variables get `anonN` — no
# leading underscore: `find` recovers the variable from a column name by
# splitting on the first `_`, so a leading underscore would break
# unification). `apoc.coll.toSet` → array_distinct and `toIntegerList` →
# cast array<int> are the two function translations the validation texts
# need.

_CY_NODE = re.compile(r"\(\s*(\w+)?\s*(?::(\w+))?\s*(\{[^}]*\})?\s*\)")
_CY_EDGE = re.compile(r"\s*(<-|-)\s*\[\s*(\w+)?\s*(?::(\w+))?\s*\]\s*(->|-)\s*")
_CY_PROP = re.compile(r"(\w+)\s*:\s*'([^']*)'")
_CY_QUERY = re.compile(
    r"^\s*MATCH\s+(?P<pattern>.+?)\s*"
    r"(?:WITH\s+(?P<with_>.+?)\s*)?"
    r"(?:UNWIND\s+(?P<unwind>.+?)\s+AS\s+(?P<unwind_alias>\w+)\s*)?"
    r"RETURN\s+(?P<distinct>DISTINCT\s+)?(?P<ret>.+?)"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CY_COUNT = re.compile(r"^count\s*\((.+)\)$", re.IGNORECASE | re.DOTALL)
_CY_AS = re.compile(r"^(.*?)\s+AS\s+(\w+)\s*$", re.IGNORECASE | re.DOTALL)


def _split_items(text: str) -> list[str]:
    """Comma-split at paren depth 0 (so `count(x), y` splits correctly
    even if a function ever grows a second argument)."""
    items, depth, start = [], 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append(text[start:i])
            start = i + 1
    items.append(text[start:])
    return [t.strip() for t in items if t.strip()]


def _infer_edge_type(llab: str, rlab: str) -> tuple[str, bool]:
    """Untyped edge `-[]-`: resolve the single edge type connecting the
    two endpoint labels (reversed_=True when the stored direction is
    rlab→llab). Ambiguity is a loud error — the schema currently has at
    most one edge type per label pair."""
    cands = []
    for etype, (_t, src, dst, _k) in _EDGE_TABLE.items():
        if (src, dst) == (llab, rlab):
            cands.append((etype, False))
        if (src, dst) == (rlab, llab):
            cands.append((etype, True))
    if len(cands) != 1:
        raise ValueError(
            f"cannot infer edge type between {llab} and {rlab}: "
            f"candidates {[c[0] for c in cands]}"
        )
    return cands[0]


def _cy_scalar(token: str) -> tuple:
    """(Column, default output name) for a scalar expression token:
    `var.prop` → the prefixed column, a bare name → a WITH/UNWIND-bound
    column, plus the two function translations the reference's validation
    texts use (`apoc.coll.toSet` → array_distinct, `toIntegerList` →
    cast array<int>)."""
    token = token.strip()
    m = re.match(r"^apoc\.coll\.toSet\s*\((.+)\)$", token, re.IGNORECASE | re.DOTALL)
    if m:
        inner, name = _cy_scalar(m.group(1))
        return F.array_distinct(inner), name
    m = re.match(r"^toIntegerList\s*\((.+)\)$", token, re.IGNORECASE | re.DOTALL)
    if m:
        inner, name = _cy_scalar(m.group(1))
        return inner.cast("array<int>"), name
    m = re.match(r"^(\w+)\.(\w+)$", token)
    if m:
        return F.col(f"{m.group(1)}_{m.group(2)}"), f"{m.group(1)}_{m.group(2)}"
    if re.match(r"^\w+$", token):
        return F.col(token), token
    raise ValueError(f"unsupported expression: {token!r}")


def run_cypher(graph: GraphTables, query: str) -> DataFrame:
    """Execute a doc-style Cypher query (the subset documented above)
    against the graph tables: normalize the pattern into `find`'s typed
    form (node-only patterns scan the label's table directly), then apply
    property filters, the optional WITH projection and UNWIND explode,
    RETURN projection with Cypher's implicit GROUP BY for `count()`,
    DISTINCT, and ORDER BY."""
    m = _CY_QUERY.match(query)
    if not m:
        raise ValueError(f"unsupported query shape: {query!r}")
    pattern, ret, order = m.group("pattern"), m.group("ret"), m.group("order")
    with_, unwind, unwind_alias = m.group("with_"), m.group("unwind"), m.group("unwind_alias")
    distinct = bool(m.group("distinct"))

    # tokenize: node (edge node)*
    pos = 0
    nodes: list[list] = []  # [var, label|None, props]
    edges: list[tuple[str | None, str | None, bool | None]] = []  # (evar, etype, reversed_)
    used_vars = {v for v, _l, _p in _CY_NODE.findall(pattern) if v}
    anon = 0
    nm = _CY_NODE.match(pattern, pos)
    if not nm:
        raise ValueError(f"pattern must start with a node: {pattern!r}")
    while True:
        var, label, props_src = nm.groups()
        if var is None:
            while f"anon{anon}" in used_vars:
                anon += 1
            var, anon = f"anon{anon}", anon + 1
        props = dict(_CY_PROP.findall(props_src)) if props_src else {}
        nodes.append([var, _resolve_label(label) if label else None, props])
        pos = nm.end()
        if pos >= len(pattern) or not pattern[pos:].strip():
            break
        em = _CY_EDGE.match(pattern, pos)
        if not em:
            raise ValueError(f"expected an edge at …{pattern[pos:]!r}")
        larrow, evar, etype, rarrow = em.groups()
        if larrow == "<-" and rarrow == "->":
            raise ValueError(f"edge has two arrowheads: {pattern!r}")
        # reversed_ is None ⇔ the user asserted NO direction (both plain
        # '-'), typed or not — Cypher's undirected edge matches either
        # orientation, so only an actual arrowhead can contradict the
        # stored direction (typed-undirected `-[:T]-` previously read as
        # an asserted forward arrow and falsely emptied one spelling)
        reversed_ = None if larrow == "-" and rarrow == "-" else (larrow == "<-")
        edges.append((evar, etype, reversed_))
        pos = em.end()
        nm = _CY_NODE.match(pattern, pos)
        if not nm:
            raise ValueError(f"expected a node at …{pattern[pos:]!r}")

    # infer missing node labels from typed edges (the validation texts
    # write `()-[r:HAS_IPD_ACCESSION]->()`): a directed typed edge fixes
    # both endpoint labels; an undirected one orients by whichever
    # endpoint is labeled (stored orientation when neither is — the
    # row set is the same either way for unlabeled endpoints)
    for i, (evar, etype, reversed_) in enumerate(edges):
        if etype is None:
            continue
        _t, src, dst, _k = _EDGE_TABLE[etype]
        ln, rn = nodes[i], nodes[i + 1]
        if reversed_ is None:
            if ln[1] == dst or rn[1] == src:
                want_l, want_r = dst, src
            else:
                want_l, want_r = src, dst
        else:
            want_l, want_r = (dst, src) if reversed_ else (src, dst)
        if ln[1] is None:
            ln[1] = want_l
        if rn[1] is None:
            rn[1] = want_r
    for var, label, _props in nodes:
        if label is None:
            raise ValueError(
                f"cannot infer a label for node {var!r}: give it a label "
                "or connect it with a typed edge"
            )

    # compile the pattern. A user arrow that CONTRADICTS the schema's
    # stored direction for the resolved edge type (e.g.
    # `(:GFE)<-[]-(:Feature)` when the store holds GFE→Feature) is valid
    # Cypher that simply matches nothing — compile the hop in the stored
    # direction for a correct schema, then empty the result (the round-5
    # advice fix: previously the wrong-direction hop mis-joined or threw).
    if not edges:  # node-only pattern: scan the label's table
        var, label, _props = nodes[0]
        out = _prefixed(getattr(graph, _NODE_TABLE[label]), var)
    else:
        hops = []
        contradicted = False
        for i, (evar, etype, reversed_) in enumerate(edges):
            lvar, llab, _ = nodes[i]
            rvar, rlab, _ = nodes[i + 1]
            if etype is None:
                etype, stored_rev = _infer_edge_type(llab, rlab)
            else:
                _t, src, _dst, _k = _EDGE_TABLE[etype]
                stored_rev = src != llab
            if reversed_ is not None and reversed_ != stored_rev:
                contradicted = True
            arrow = ("<-", "-") if stored_rev else ("-", "->")
            hops.append(
                f"({lvar}:{llab}){arrow[0]}[{evar or ''}:{etype}]{arrow[1]}({rvar}:{rlab})"
            )
        out = find(graph, "".join(hops))
        if contradicted:
            out = out.filter(F.lit(False))

    for var, _label, props in nodes:
        for key, val in props.items():
            out = out.filter(F.col(f"{var}_{key}") == val)

    varset = {n[0] for n in nodes} | {e[0] for e in edges if e[0]}

    if with_:
        select_cols = []
        for item in _split_items(with_):
            am = _CY_AS.match(item)
            if am and not re.match(r"^\w+$", item):
                col, _name = _cy_scalar(am.group(1))
                select_cols.append(col.alias(am.group(2)))
            elif re.match(r"^\w+$", item) and item in varset:
                # var passthrough: keep every column the variable owns
                select_cols.extend(
                    F.col(c) for c in out.columns if c.split("_", 1)[0] == item
                )
            else:
                col, name = _cy_scalar(item)
                select_cols.append(col.alias(name))
        out = out.select(select_cols)

    if unwind:
        col, _name = _cy_scalar(unwind)
        out = out.withColumn(unwind_alias, F.explode(col))

    # RETURN: items are (alias, column, is_aggregate); any aggregate makes
    # the non-aggregated items grouping keys (Cypher's implicit GROUP BY)
    proj: list[tuple[str, object, bool]] = []
    for item in _split_items(ret):
        alias = None
        am = _CY_AS.match(item)
        if am:
            item, alias = am.group(1).strip(), am.group(2)
        cm = _CY_COUNT.match(item)
        if cm:
            inner = cm.group(1).strip()
            if inner == "*" or (re.match(r"^\w+$", inner) and inner in varset):
                # count(*) / count(boundVar): a bound var is non-null on
                # every matched row, so both count rows
                col = F.count(F.lit(1))
            else:
                c, _n = _cy_scalar(inner)
                col = F.count(c)
            proj.append((alias or "count", col, True))
        else:
            c, name = _cy_scalar(item)
            proj.append((alias or name, c, False))

    if any(is_agg for _a, _c, is_agg in proj):
        key_aliases = []
        for a, c, is_agg in proj:
            if not is_agg:
                out = out.withColumn(a, c)
                key_aliases.append(a)
        grouped = out.groupBy(*key_aliases) if key_aliases else out.groupBy()
        out = grouped.agg(*[c.alias(a) for a, c, is_agg in proj if is_agg])
        out = out.select(*[a for a, _c, _g in proj])
    else:
        out = out.select(*[c.alias(a) for a, c, _g in proj])
    if distinct:
        out = out.dropDuplicates()

    if order:
        out = out.orderBy([_cy_scalar(t)[0] for t in _split_items(order)])
    return out
