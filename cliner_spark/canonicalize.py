"""Canonicalization (SURVEY.md A4; north rule: "canonicalized via salted
groupBy + connected-components (iterative DataFrame label propagation)").

Concept graph: nodes are cuis; an undirected edge connects two cuis that
share any normalized surface string (term or canonical). Connected-component
label = min(cui) in the component — the canonical concept node. Chains of
shared strings make this genuinely transitive (not just groupBy).

`connected_components` is a generic min-label-propagation fixpoint usable on
any edge list (also used by near-duplicate clustering in dedup.py). Each
iteration is one shuffle on the (small) frontier; lineage is cut with
localCheckpoint every CHECKPOINT_EVERY iterations so plans don't grow
unboundedly (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECKPOINT_EVERY = 3
MAX_ITERATIONS = 50


def concept_edges(gazetteer: DataFrame) -> DataFrame:
    """(src, dst) cui pairs sharing a normalized surface string; src < dst."""
    strings = (
        gazetteer.select(F.col("cui"), F.lower("term").alias("s"))
        .unionByName(gazetteer.select(F.col("cui"), F.lower("canonical").alias("s")))
        .distinct()
    )
    a, b = strings.alias("a"), strings.alias("b")
    return (
        a.join(b, F.col("a.s") == F.col("b.s"))
        .filter(F.col("a.cui") < F.col("b.cui"))
        .select(F.col("a.cui").alias("src"), F.col("b.cui").alias("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iterations: int = MAX_ITERATIONS,
    num_partitions: int | None = None,
    fixed_iterations: int | None = None,
) -> DataFrame:
    """Min-label propagation to fixpoint.

    edges: (src, dst) string columns, undirected (either orientation).
    nodes: optional (node) — isolated nodes to include; defaults to edge
    endpoints. Returns (node, comp) where comp = min node id reachable.

    num_partitions optionally pre-partitions the edge list by join key (use
    for web-scale graphs to co-locate the per-iteration joins); leave None
    for dimension-sized graphs — AQE's runtime coalescing already sizes the
    tiny shuffles, and explicit coalescing measurably fights it.

    fixed_iterations: run that many rounds with NO per-round convergence
    action, then VERIFY the fixpoint (one join + limit-1 count) and keep
    iterating until it holds. The budget is a floor, not a guarantee:
    pointer jumping does not always double the distance the component-min
    label has travelled when it must propagate against the id ordering
    (e.g. the path 1-6-5-4-3-2 advances the '1' frontier by one hop per
    round), so returning after ceil(log2 n)+1 rounds unverified can emit
    silently split components. Callers that know n cheaply (dimension
    graphs) still save the per-round convergence actions in the common
    case — the verify usually passes on the first check. When None, a
    changed-rows check runs each round (data-dependent early exit).
    """
    und = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    if num_partitions:
        und = und.repartition(num_partitions, "u")
    endpoint_nodes = und.select(F.col("u").alias(node_col)).distinct()
    if nodes is not None:
        all_nodes = nodes.select(F.col(node_col)).unionByName(endpoint_nodes).distinct()
    else:
        all_nodes = endpoint_nodes
    labels = all_nodes.withColumn("comp", F.col(node_col))
    und = und.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)

    def one_round(labels: DataFrame) -> DataFrame:
        # candidate label for each node = min(own, min over neighbors' labels)
        nbr = (
            und.join(labels, und["v"] == labels[node_col])
            .select(und["u"].alias(node_col), F.col("comp"))
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy(node_col)
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jumping (comp <- comp[comp]): collapses long chains —
        # same fixpoint, since a node's label is always another node of its
        # component and labels only decrease toward the component min.
        roots = new_labels.select(
            F.col(node_col).alias("_r"), F.col("comp").alias("_rc")
        )
        return (
            new_labels.join(roots, new_labels["comp"] == F.col("_r"), "left")
            .select(
                F.col(node_col),
                F.coalesce(F.col("_rc"), F.col("comp")).alias("comp"),
            )
        )

    def at_fixpoint(labels: DataFrame) -> bool:
        # Min-label propagation has converged iff every edge joins two
        # equally-labelled endpoints: labels are always node ids of the same
        # component and only decrease, the component-min node keeps labelling
        # itself, so edge-agreement forces every node's label to be that min.
        lu = labels.select(F.col(node_col).alias("_lu_n"), F.col("comp").alias("_lu"))
        lv = labels.select(F.col(node_col).alias("_lv_n"), F.col("comp").alias("_lv"))
        disagree = (
            und.join(lu, und["u"] == F.col("_lu_n"))
            .join(lv, und["v"] == F.col("_lv_n"))
            .filter(F.col("_lu") != F.col("_lv"))
            .limit(1)
            .count()
        )
        return disagree == 0

    if fixed_iterations is not None:
        # round budget with no per-round convergence action; but the
        # pointer-jump SELF-join doubles the logical plan per round, so
        # lineage must be cut eagerly on a cadence or analysis cost grows
        # 2^rounds
        for it in range(fixed_iterations):
            labels = one_round(labels)
            if (it + 1) % CHECKPOINT_EVERY == 0 and it != fixed_iterations - 1:
                labels = labels.localCheckpoint(eager=True)
        labels = labels.localCheckpoint(eager=True)
        # the budget is a floor, not a proof — verify and top up to fixpoint
        extra = 0
        while not at_fixpoint(labels):
            if extra >= max_iterations:
                raise RuntimeError(
                    f"connected_components: no fixpoint after {fixed_iterations}"
                    f" budgeted + {extra} extra rounds"
                )
            labels = one_round(labels).localCheckpoint(eager=True)
            extra += 1
        return labels

    for it in range(max_iterations):
        new_labels = one_round(labels)
        # the convergence check below is an action anyway; eager-checkpointing
        # here both cuts lineage and avoids recomputing the join twice
        if (it + 1) % CHECKPOINT_EVERY == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.cache()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), node_col)
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node u links its strictly-larger neighbors to
    min(N(u) ∪ {u}). Emits (a, b) with a > b; strictly shrinks large-id
    edges toward component minima."""
    nbr = e.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
        e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    mins = nbr.groupBy("u").agg(F.min("v").alias("mv"))
    return (
        nbr.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.least("mv", F.col("u")).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges toward the larger endpoint; every node
    u links its smaller neighbors (and itself) to min(N⁻(u))."""
    o = e.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("mv"))
    out = (
        o.join(mins, "u")
        .select(F.col("v").alias("src"), F.col("mv").alias("dst"))
        .unionByName(mins.select(F.col("u").alias("src"), F.col("mv").alias("dst")))
    )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def connected_components_twostar(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond") —
    the scheme with a PROVEN O(log n) round bound, unlike plain min-label
    propagation whose frontier can advance one hop per round against the id
    ordering. Same output contract as connected_components: (node, comp)
    with comp = min node id of the component.

    Convergence = the edge set reaches a fixpoint (star graphs rooted at
    component minima: every surviving edge is (x, component_min)). The
    fixpoint test is exact set equality (count + anti-join), not a
    checksum. Scale shape per round: two groupBy shuffles on node id; edge
    count never grows above 2x input (large-star emits one edge per
    larger-neighbor pair, small-star one per smaller-neighbor + one per
    oriented node)."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    endpoint_nodes = (
        e.select(F.col("src").alias(node_col))
        .unionByName(e.select(F.col("dst").alias(node_col)))
        .distinct()
    )
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=True)
        same_size = nxt.count() == e.count()
        if same_size and nxt.join(e, ["src", "dst"], "left_anti").limit(1).count() == 0:
            e = nxt
            break
        e = nxt
    else:
        raise RuntimeError(f"twostar CC: no fixpoint after {max_rounds} rounds")
    # converged stars: src = non-min member, dst = component min
    comp_edges = e.select(F.col("src").alias(node_col), F.col("dst").alias("comp"))
    all_nodes = endpoint_nodes
    if nodes is not None:
        all_nodes = nodes.select(F.col(node_col)).unionByName(endpoint_nodes).distinct()
    return (
        all_nodes.join(comp_edges, node_col, "left")
        .select(
            F.col(node_col), F.coalesce(F.col("comp"), F.col(node_col)).alias("comp")
        )
    )


def surface_form_counts(
    linked_with_canon: DataFrame, n_salt: int = 16
) -> DataFrame:
    """Salted two-phase aggregation (north rule: "canonicalized via salted
    groupBy"): per canonical concept, the count of each normalized mention
    surface form.

    A hot concept ("the" of clinical text — e.g. one drug mentioned in half
    of all turns) would serialize a single reducer in a naive
    groupBy(canon_cui, surface). Phase 1 spreads each (canon_cui, surface)
    key over n_salt partial groups keyed by a provenance-derived salt;
    phase 2 merges the (tiny) partials. Result is exactly the unsalted
    counts — the SQL oracle computes them with a plain GROUP BY.
    """
    salt = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(n_salt))
    partial = (
        linked_with_canon.withColumn("_salt", salt)
        .withColumn("surface", F.lower("mention_text"))
        .groupBy("canon_cui", "surface", "_salt")
        .agg(F.count(F.lit(1)).alias("_pn"))
    )
    return (
        partial.groupBy("canon_cui", "surface")
        .agg(F.sum("_pn").alias("n_mentions"))
    )


def canonical_concept_map(gazetteer: DataFrame) -> DataFrame:
    """(cui, canon_cui): every cui -> min cui of its connected component."""
    edges = concept_edges(gazetteer)
    nodes = gazetteer.select(F.col("cui").alias("node")).distinct()
    # Since connected_components VERIFIES the fixpoint after the budget and
    # tops up, the budget is purely a cost knob: each round costs 2-3 Spark
    # jobs, a verify costs 1, and gazetteer shared-string chains are shallow
    # (2-3 hops; pointer jumping covers depth 2^rounds). A flat budget of 3
    # + verify beats the former ceil(log2 n)+1 rounds — which, without the
    # verify, was also not sufficient for adversarial id orderings — and
    # needs no up-front count() job just to size the budget.
    comps = connected_components(
        edges, nodes=nodes, node_col="node", fixed_iterations=3,
    )
    return comps.select(F.col("node").alias("cui"), F.col("comp").alias("canon_cui"))
