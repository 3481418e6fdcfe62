"""Graph materialization & analytics over the constructed knowledge graph.

The north rule's last stage is "graph materialize": after triples exist
(triples.py), a KG consumer immediately needs graph-shaped queries —
which concepts co-occur (edge building), how connected each node is
(degrees), what is near a node (k-hop), and which nodes matter
(PageRank). All of it is expressed as DataFrame joins/aggregations so
Catalyst plans the shuffles; nothing here collects edge data to the
driver (only O(1) scalars such as the node count).

Scale notes (100 TB / 10^12 turns):
- co-occurrence self-joins on the per-document *distinct concept set*,
  never on raw mentions — the join input is ≤ |vocabulary| rows per
  document regardless of turn count, and marginal tables are broadcast.
- PageRank iterates over the concept graph, whose size is bounded by the
  gazetteer (~10^6 rows at UMLS scale), not by the corpus; each
  iteration is one shuffle on dst. Ranks use integer fixed-point
  arithmetic so results are bit-identical across engines, partition
  counts, and reduction orders — floating-point PageRank is
  order-dependent under Spark's partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FP_SCALE = 10**12  # fixed-point denominator for engine-exact PageRank


def cooccurrence_edges(
    linked: DataFrame, key: str = "conv_id", node: str = "cui"
) -> DataFrame:
    """Concept co-occurrence edges with PMI.

    For every unordered concept pair {a, b} appearing in the same `key`
    group (conversation/document): n_pair = #groups containing both,
    n_src/n_dst = #groups containing each, n_keys = #groups containing
    any concept. pmi = ln(n_pair * n_keys / (n_src * n_dst)) rounded to
    6 dp (the ratio is a small-integer quotient, so libm log agrees
    across engines at this precision).

    Plan shape: distinct() gives one row per (group, concept) — the
    self-join then touches k*(k-1)/2 pairs per group where k ≤ |gazetteer
    concepts|, independent of group text size. Marginals are concept-
    cardinality tables, broadcast into the pair aggregate.

    The distinct set is materialized once (localCheckpoint): four subtrees
    consume it (self-join a/b, marginals, totals), and without
    materialization each would re-execute the upstream mention-scan
    lineage — the same multiplicative-lineage trap fixed in pagerank/k_hop.
    """
    d = linked.select(key, node).distinct().localCheckpoint(eager=True)
    a, b = d.alias("a"), d.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col(f"a.{node}") < F.col(f"b.{node}")),
        )
        .groupBy(
            F.col(f"a.{node}").alias("src"),
            F.col(f"b.{node}").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    marg = d.groupBy(node).agg(F.countDistinct(key).alias("n_node"))
    totals = d.agg(F.countDistinct(key).alias("n_keys"))
    return (
        pairs.join(
            F.broadcast(marg.select(F.col(node).alias("src"), F.col("n_node").alias("n_src"))),
            "src",
        )
        .join(
            F.broadcast(marg.select(F.col(node).alias("dst"), F.col("n_node").alias("n_dst"))),
            "dst",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "src",
            "dst",
            "n_pair",
            "n_src",
            "n_dst",
            "n_keys",
            F.round(
                F.log(
                    F.col("n_pair")
                    * F.col("n_keys")
                    / (F.col("n_src") * F.col("n_dst"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def group_concept_pairs(
    linked: DataFrame, key: str = "conv_id", node: str = "cui"
) -> DataFrame:
    """Distinct unordered co-occurrence pairs (src < dst) per group — the
    edge set consumed by k_hop/pagerank. The distinct (group, node) set is
    materialized before the self-join so the upstream scan lineage executes
    once, and the self-join reads the checkpointed rows twice."""
    d = linked.select(key, node).distinct().localCheckpoint(eager=True)
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col(f"a.{node}") < F.col(f"b.{node}")),
        )
        .select(F.col(f"a.{node}").alias("src"), F.col(f"b.{node}").alias("dst"))
        .distinct()
    )


def degrees(triples: DataFrame) -> DataFrame:
    """Per-node degree by predicate and direction over (subj, pred, obj).

    Two groupBys + union — each a single partial-aggregated shuffle.
    """
    out = triples.groupBy(F.col("subj").alias("node"), "pred").agg(
        F.count(F.lit(1)).alias("degree")
    ).withColumn("direction", F.lit("out"))
    inn = triples.groupBy(F.col("obj").alias("node"), "pred").agg(
        F.count(F.lit(1)).alias("degree")
    ).withColumn("direction", F.lit("in"))
    return out.unionByName(inn)


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over undirected (src, dst)
    edges. Returns (node, n_triangles) for every node on ≥1 triangle.

    Canonical-orientation algorithm (each triangle enumerated exactly once
    as a < b < c): orient every edge low→high, build wedges (a,b)-(b,c) by
    one equi-join on the middle node, close them against the oriented edge
    set with a second equi-join. Two shuffle joins total, no symmetrize
    blow-up, and the wedge set — the scale driver — is bounded by
    sum(deg²) of the ORIENTED graph, the standard mitigation for skewed
    degree distributions (a hub's wedges split between its low and high
    sides instead of squaring).
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=True)  # consumed by both sides of two joins
    )
    wedge = (
        e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
        .join(e.select(F.col("lo").alias("b"), F.col("hi").alias("c")), "b")
    )
    tri = wedge.join(
        e.select(F.col("lo").alias("a"), F.col("hi").alias("c")), ["a", "c"]
    )
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view of (src, dst) edges: both directions, no self-loops."""
    e = edges.select("src", "dst")
    return (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def k_hop(edges: DataFrame, seed: str, k: int = 2) -> DataFrame:
    """Nodes within ≤k undirected hops of `seed`, with min hop distance.

    Breadth-first frontier expansion: each hop is one equi-join frontier ×
    edges + one anti-join against visited — k shuffles total, never
    materializing paths. For web-scale graphs the frontier stays a node
    set (no multiplicities): distinct() after each expansion.
    """
    # materialize the edge set once: every hop joins it, and without this
    # each hop would re-run the upstream edge-building lineage (e.g. the
    # full mention scan) from scratch
    sym = symmetrize(edges).localCheckpoint(eager=True)
    spark = edges.sparkSession
    visited = spark.createDataFrame([(seed, 0)], "node string, hops int")
    frontier = visited
    for hop in range(1, k + 1):
        nxt = (
            sym.join(
                F.broadcast(frontier.select(F.col("node").alias("src"))), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
            .localCheckpoint(eager=True)  # frontier is small; cuts lineage
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def kg_negative_samples(
    positives: DataFrame,
    subj_col: str = "conv_id",
    obj_col: str = "canon_cui",
) -> DataFrame:
    """Deterministic negative sampling for KG-embedding training: for every
    positive (subj, obj) edge, one corrupted edge (subj, neg_obj) with
    neg_obj drawn pseudo-uniformly from the concept vocabulary by an
    md5-derived index — reproducible across engines and partitionings (no
    RNG), so the sample is hash-verifiable. If the drawn concept equals the
    true object, the next index (mod n) is taken instead.

    Scale shape: the concept dimension (distinct objects) gets dense ids
    via one dimension-sized window, then TWO broadcast equi-joins attach
    the candidate and its fallback — the fact side never shuffles.
    """
    concepts = positives.select(obj_col).distinct()
    n = concepts.count()  # dimension cardinality (driver scalar, like n_lists)
    if n < 2:
        raise ValueError("negative sampling needs >= 2 distinct objects")
    cdim = concepts.withColumn(
        "rid", (F.row_number().over(Window.orderBy(obj_col)) - 1).cast("long")
    )
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col(subj_col), F.col(obj_col))), 1, 8),
        16,
        10,
    ).cast("long")
    pos = positives.select(subj_col, obj_col).distinct().withColumn(
        "_i1", F.pmod(h, F.lit(n))
    ).withColumn("_i2", F.pmod(F.col("_i1") + 1, F.lit(n)))
    c1 = cdim.select(F.col("rid").alias("_i1"), F.col(obj_col).alias("_c1"))
    c2 = cdim.select(F.col("rid").alias("_i2"), F.col(obj_col).alias("_c2"))
    return (
        pos.join(F.broadcast(c1), "_i1")
        .join(F.broadcast(c2), "_i2")
        .select(
            F.col(subj_col),
            F.col(obj_col).alias("pos_obj"),
            F.when(F.col("_c1") != F.col(obj_col), F.col("_c1"))
            .otherwise(F.col("_c2"))
            .alias("neg_obj"),
        )
    )


def windowed_cooccurrence(
    mentions: DataFrame,
    window: int = 2,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    node_col: str = "cui",
) -> DataFrame:
    """Temporal co-occurrence edges: concept pairs mentioned within ±window
    turns of each other in the same conversation.

    NOT a naive theta self-join (|ta-tb| <= w on top of a conv-only equi-join
    degenerates to per-conversation all-pairs — quadratic in conversation
    length, fatal on 10^5-turn hot conversations). Banded range join
    instead: the right side keys rows by bucket = turn div w; the left side
    expands each row to its 3 adjacent buckets; the join is then a pure
    equi-join on (conv, bucket) whose candidates are within 2w turns by
    construction, and the exact |ta-tb| <= w predicate prunes the rest.
    Each (left,right) row pair meets in exactly one bucket, so no dedup is
    needed. Output: (src, dst, n_cooc) per unordered pair, src < dst.
    """
    m = mentions.select(conv_col, turn_col, node_col).distinct()
    w = max(int(window), 1)
    bucket = (F.col(turn_col) / w).cast("long")  # floor for non-negative turns
    right = m.select(
        F.col(conv_col).alias("_c"),
        F.col(turn_col).alias("_tb"),
        F.col(node_col).alias("_nb"),
        bucket.alias("_bkt"),
    )
    left = (
        m.select(
            F.col(conv_col).alias("_c"),
            F.col(turn_col).alias("_ta"),
            F.col(node_col).alias("_na"),
            bucket.alias("_b0"),
        )
        .withColumn("_off", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_bkt", F.col("_b0") + F.col("_off"))
    )
    return (
        left.join(right, ["_c", "_bkt"])
        .filter(
            (F.abs(F.col("_ta") - F.col("_tb")) <= w)
            & (F.col("_na") < F.col("_nb"))
        )
        .groupBy(F.col("_na").alias("src"), F.col("_nb").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n_cooc"))
    )


def bfs_distances(edges: DataFrame, seed: str, max_hops: int = 10) -> DataFrame:
    """Single-source shortest hop distances over the undirected edge set,
    expanded to EXHAUSTION (the loop stops when the frontier empties, not at
    a fixed k — the Pregel/BSP shape: per-superstep frontier-x-edges join +
    anti-join against visited, frontier count as the driver-side loop
    control).

    max_hops bounds the supersteps (diameter guard); hitting it raises
    rather than silently returning partial distances. Scale: each superstep
    shuffles only frontier-adjacent edges; the visited/frontier sets stay
    node-sized and are broadcast into the expansion join.
    """
    sym = symmetrize(edges).localCheckpoint(eager=True)
    spark = edges.sparkSession
    visited = spark.createDataFrame([(seed, 0)], "node string, hops int")
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            sym.join(
                F.broadcast(frontier.select(F.col("node").alias("src"))), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            return visited
        visited = visited.unionByName(nxt)
        frontier = nxt
    if (
        sym.join(F.broadcast(frontier.select(F.col("node").alias("src"))), "src")
        .select(F.col("dst").alias("node"))
        .join(visited.select("node"), "node", "left_anti")
        .limit(1)
        .count()
        > 0
    ):
        raise RuntimeError(f"bfs_distances: frontier not empty after {max_hops} hops")
    return visited


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    scale: int = FP_SCALE,
    damping_pct: int = 85,
    personalize: str | None = None,
) -> DataFrame:
    """Integer fixed-point PageRank over the undirected edge set.

    rank_fp is the PageRank scaled by `scale` (1e12) and computed entirely
    in BIGINT arithmetic (`div` = truncating integer division):

        r0       = scale div N
        base     = ((100 - damping_pct) * scale div 100) div N
        contrib  = r div deg                  (per out-edge)
        r_next   = base + (damping_pct * sum(contrib)) div 100

    Float PageRank is reduction-order-dependent (Spark partial aggregation
    vs single-node summation differ in last ulps, amplified per
    iteration); fixed-point makes the result bit-identical across engines
    and partitionings, which is what lets the DuckDB oracle hash-check an
    iterative graph algorithm. Nodes = endpoints of `edges`; the node
    count is the only driver-side scalar.
    """
    # materialize edges/nodes/degrees once — every iteration joins all
    # three, and ranks feed the next iteration: without checkpoints the
    # plan (and the upstream edge-building lineage, e.g. a corpus-wide
    # mention scan) re-executes per iteration and grows multiplicatively
    sym = symmetrize(edges).localCheckpoint(eager=True)
    nodes = (
        sym.select(F.col("src").alias("node"))
        .unionByName(sym.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # O(1) scalar; graph is gazetteer-bounded
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(eager=True)
    if personalize is None:
        # uniform restart mass
        base_col = F.lit(((100 - damping_pct) * scale // 100) // n)
        r0_col = F.lit(scale // n)
    else:
        # personalized PageRank: ALL restart mass returns to the seed, so
        # rank_fp becomes relatedness-to-seed (the KG "related entities"
        # ranking) instead of global centrality; same BIGINT algebra.
        seed_mass = (100 - damping_pct) * scale // 100
        base_col = F.when(F.col("node") == personalize, F.lit(seed_mass)).otherwise(
            F.lit(0)
        )
        r0_col = F.when(F.col("node") == personalize, F.lit(scale)).otherwise(
            F.lit(0)
        )
    r = nodes.withColumn("rank_fp", r0_col.cast("bigint"))
    for _ in range(iters):
        contrib = (
            sym.join(r.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst"), F.expr("rank_fp div deg").alias("c"))
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        r = (
            nodes.join(sums.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    base_col
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).cast("bigint").alias("rank_fp"),
            )
            .localCheckpoint(eager=True)  # rank table: |nodes| rows
        )
    return r


def transition_edges(
    df: DataFrame,
    part_key: str,
    order_cols: list[str],
    label_col: str,
) -> DataFrame:
    """First-order transition counts: (prev_label, label) pairs per
    partition key under a total order — e.g. tool-call flow in agent
    transcripts (tool_a FOLLOWED_BY tool_b) or event-type funnels.

    One window (lag) + one groupBy; the window partitions by the same key
    the data is naturally bucketed on, so at scale this is a single
    shuffle shared by both steps.
    """
    w = Window.partitionBy(part_key).orderBy(*order_cols)
    return (
        df.withColumn("_prev", F.lag(F.col(label_col)).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("src"), F.col(label_col).alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def tool_flow_triples(transcripts: DataFrame) -> DataFrame:
    """Agent-transcript tool-flow edges as KG triples:
    (tool:a, FOLLOWED_BY, tool:b) weighted by transition count, ordered by
    (conv_id, turn_idx) — the input_hint's transcript shape directly."""
    t = transcripts.filter(F.col("tool").isNotNull())
    e = transition_edges(t, "conv_id", ["turn_idx"], "tool")
    return e.select(
        F.concat(F.lit("tool:"), F.col("src")).alias("subj"),
        F.lit("FOLLOWED_BY").alias("pred"),
        F.concat(F.lit("tool:"), F.col("dst")).alias("obj"),
        F.col("n").alias("weight"),
    )


def adamic_adar(
    edges: DataFrame,
    min_score: float = 0.0,
) -> DataFrame:
    """Adamic–Adar link-prediction score over an undirected edge list:
    for every non-adjacent? (we keep all) candidate pair (a, b) with at
    least one common neighbor w, score = Σ_w 1 / ln(deg(w)), rounded to 6
    decimals via a fixed-point BIGINT sum so partial-aggregation order
    cannot change the hash.

    Plan shape: degrees are one aggregation; the common-neighbor pair
    generation is a self-join of the adjacency list ON THE SHARED NEIGHBOR
    (w) — each neighbor w contributes deg(w)² ordered pairs, so the classic
    skew guard applies: a hub with degree d generates d² candidates. The
    inverse-log weighting is exactly why the algorithm stays usable — hubs
    contribute least — but at 100 TB a degree cap (drop w with deg > cap,
    provably contributing < 1/ln(cap) each) bounds the blowup; here the
    concept graph is gazetteer-sized so no cap is applied.

    Nodes with deg(w) == 1 are excluded as common neighbors (1/ln(1) is
    undefined/infinite and a degree-1 node cannot be a common neighbor of
    two distinct others anyway).
    """
    und = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    ).distinct()
    deg = und.groupBy(F.col("u").alias("w")).agg(F.count(F.lit(1)).alias("deg"))
    # adjacency keyed by the neighbor: (w, x) means x is adjacent to w
    adj = und.select(F.col("u").alias("w"), F.col("v").alias("x"))
    a = adj.select("w", F.col("x").alias("a"))
    b = adj.select("w", F.col("x").alias("b"))
    contrib_fp = F.floor(F.lit(1e6) / F.log(F.col("deg").cast("double"))).cast(
        "bigint"
    )
    pairs = (
        a.join(b, "w")
        .filter(F.col("a") < F.col("b"))
        .join(F.broadcast(deg.filter(F.col("deg") >= 2)), "w")
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(contrib_fp).alias("score_fp"),
        )
    )
    return pairs.filter(
        F.col("score_fp") >= F.lit(int(min_score * 1e6))
    ).select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        "n_common",
        "score_fp",
    )


def deterministic_walks(edges: DataFrame, steps: int = 3) -> DataFrame:
    """Random-walk corpus for KG-embedding training (DeepWalk/node2vec input),
    with the RNG replaced by a hash so walks are reproducible across engines,
    partitionings, and reruns (the repo-wide determinism invariant): from
    every node, one `steps`-step walk where step t leaves node v through its
    (md5(v '#' t) mod degree(v))-th neighbor (neighbors ranked by id).

    Input: undirected edge list (src, dst), one row per unordered pair.
    Output: (walk_start, step_1 .. step_{steps}).

    Scale: the adjacency (src, dst, rank, degree) is one window over the
    symmetrized edges; each step is one equi-join of the frontier against it
    — k steps = k joins of |V| rows each against |2E|, all broadcast-free
    hash joins keyed on the node id. No RNG state, so walks for different
    nodes never serialize on a shared generator — the property that lets
    this fan out to 10^12 edges."""
    sym = symmetrize(edges)
    w = Window.partitionBy("src").orderBy("dst")
    adj = sym.select(
        "src",
        "dst",
        (F.row_number().over(w) - 1).alias("rank"),
        F.count(F.lit(1)).over(Window.partitionBy("src")).alias("deg"),
    )

    def step_idx(node_col, t: int):
        hx = F.substring(F.md5(F.concat(node_col, F.lit(f"#{t}"))), 1, 4)
        return F.conv(hx, 16, 10).cast("bigint")

    frontier = adj.select(F.col("src").alias("walk_start")).distinct().withColumn(
        "cur", F.col("walk_start")
    )
    for t in range(1, steps + 1):
        nxt = adj.select(
            F.col("src").alias("cur"),
            F.col("dst").alias(f"step_{t}"),
            "rank",
            "deg",
        )
        frontier = (
            frontier.join(nxt, "cur")
            .filter(F.col("rank") == step_idx(F.col("cur"), t) % F.col("deg"))
            .drop("cur", "rank", "deg")
            .withColumn("cur", F.col(f"step_{t}"))
        )
    return frontier.drop("cur")


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per node over undirected (src, dst)
    edges: coeff = 2*triangles / (deg*(deg-1)), 0 when deg < 2.

    Reuses the canonical-orientation triangle_count (two equi-joins, wedge
    set bounded by oriented sum(deg^2)) plus one degree aggregation over the
    deduped undirected edge set; the final division is the only float op —
    both operands exact BIGINTs, rounded to 6 dp for engine parity.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=True)  # degrees + triangle joins share it
    )
    deg = (
        und.select(F.col("lo").alias("node"))
        .unionByName(und.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_count(und.select(F.col("lo").alias("src"), F.col("hi").alias("dst")))
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    (2 * F.coalesce("n_triangles", F.lit(0))).cast("double")
                    / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


def bellman_ford_sssp(
    weighted_edges: DataFrame, seed: str, max_hops: int = 10
) -> DataFrame:
    """Single-source shortest WEIGHTED distances from `seed` over undirected
    (src, dst, w) edges — Bellman-Ford relaxation, one equi-join + one
    min-aggregation per round, early exit at fixpoint.

    After r rounds the distances equal the min over paths of <= r edges, so
    an early exit (no row improved) and running out the full max_hops budget
    produce identical output — the property that lets a hop-bounded
    recursive-CTE oracle check a data-dependent iterative algorithm.
    Frontier-sized state only: (node, dist) rows, localCheckpointed per
    round to cut the iterative lineage.
    """
    und = (
        weighted_edges.select("src", "dst", "w")
        .unionByName(
            weighted_edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .localCheckpoint(eager=True)
    )
    spark = weighted_edges.sparkSession
    dist = spark.createDataFrame([(seed, 0)], "node string, dist long").localCheckpoint(
        eager=True
    )
    for _ in range(max_hops):
        cand = (
            und.join(dist, und.src == dist.node)
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        new = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        improved = (
            new.join(dist.withColumnRenamed("dist", "_old"), "node", "left")
            .filter(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
            .limit(1)
            .count()
        )
        dist = new
        if improved == 0:
            break
    return dist


def k_core(edges: DataFrame, k: int, max_rounds: int = 50) -> DataFrame:
    """k-core decomposition for a FIXED k: iteratively peel nodes of degree
    < k until the degree->=k fixpoint; returns the surviving nodes with
    their core-subgraph degree.

    Each round is one degree aggregation + two semi-joins filtering the
    edge list to surviving endpoints — the standard distributed peeling
    loop. The edge set shrinks monotonically, so per-round cost falls;
    lineage is cut every round (the loop is the algorithm, as with
    PageRank/CC). Raises if the peel hasn't converged in max_rounds — at
    that point the caller's graph is adversarial, not big.
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("lo").alias("node"))
            .unionByName(e.select(F.col("hi").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
            .localCheckpoint(eager=True)
        )
        keep = deg.filter(F.col("degree") >= k).select("node")
        n_drop = deg.filter(F.col("degree") < k).limit(1).count()
        if n_drop == 0:
            return deg.filter(F.col("degree") >= k)
        e = (
            e.join(keep.withColumnRenamed("node", "lo"), "lo", "left_semi")
            .join(keep.withColumnRenamed("node", "hi"), "hi", "left_semi")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(f"k_core: no fixpoint after {max_rounds} peel rounds")


def transitive_closure(isa: DataFrame, max_rounds: int = 10) -> DataFrame:
    """All (descendant, ancestor, depth) pairs over a directed acyclic ISA
    edge set (child, parent) — the UMLS/SNOMED subsumption closure that turns
    a parent-pointer ontology into a joinable "is-a*" table (reference
    analog: hierarchy expansion over the MRHIER relations shipped next to
    the MRCONSO gazetteer the S5 ETL reads).

    Algorithm: path DOUBLING — each round joins the closure-so-far with
    itself, so the covered path length doubles per round (O(log diameter)
    rounds vs O(diameter) for one-edge-at-a-time frontier expansion);
    min(depth) recovers the shortest derivation when parallel paths exist.
    Convergence is VERIFIED with an exceptAll changed-rows probe before
    returning — never assumed from the round budget (the canonicalize.py
    pointer-jumping lesson: fixed iteration counts silently under-converge).

    Scale: ontologies are dimension-sized next to the corpus (UMLS ISA is
    ~2M edges), so every self-join here broadcasts / stays executor-local;
    the closure is a build-once release artifact consumed by corpus-scale
    rollup joins, exactly like the canonical-concept map.
    """
    cl = (
        isa.select(
            F.col("child").alias("descendant"),
            F.col("parent").alias("ancestor"),
            F.lit(1).alias("depth"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        a, b = cl.alias("a"), cl.alias("b")
        hop = a.join(b, F.col("a.ancestor") == F.col("b.descendant")).select(
            F.col("a.descendant").alias("descendant"),
            F.col("b.ancestor").alias("ancestor"),
            (F.col("a.depth") + F.col("b.depth")).alias("depth"),
        )
        nxt = (
            cl.unionByName(hop)
            .groupBy("descendant", "ancestor")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint(eager=True)
        )
        if nxt.exceptAll(cl).limit(1).count() == 0:
            return nxt
        cl = nxt
    raise RuntimeError(f"transitive_closure: no fixpoint after {max_rounds} rounds")


def strongly_connected_components(
    edges: DataFrame, max_rounds: int = 10
) -> DataFrame:
    """SCC labels over a DIRECTED edge set (src, dst): scc_id(v) = the
    smallest node among {v} ∪ {u : v reaches u AND u reaches v}.

    Algorithm: reachability closure by path DOUBLING (O(log diameter)
    rounds, fixpoint VERIFIED with an exceptAll probe exactly like
    transitive_closure — never assumed from the budget), then one self-join
    of the closure against its transpose picks mutually-reachable pairs and
    a min-aggregate labels each node. Nodes on no cycle become singleton
    SCCs labelled by themselves.

    Scale: meant for dimension-sized relation graphs (concept precedence,
    tool flows — node set is the vocabulary, not the corpus); the closure
    self-joins stay executor-local at that size. Corpus-scale SCC would
    swap doubling for forward/backward reach coloring, but no reference
    operator needs it.
    """
    reach = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    for _ in range(max_rounds):
        a, b = reach.alias("a"), reach.alias("b")
        hop = a.join(b, F.col("a.dst") == F.col("b.src")).select(
            F.col("a.src").alias("src"), F.col("b.dst").alias("dst")
        )
        nxt = reach.unionByName(hop).distinct().localCheckpoint(eager=True)
        if nxt.exceptAll(reach).limit(1).count() == 0:
            reach = nxt
            break
        reach = nxt
    else:
        raise RuntimeError(f"scc: closure not converged in {max_rounds} rounds")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    f, r = reach.alias("f"), reach.alias("r")
    mut = f.join(
        r,
        (F.col("f.src") == F.col("r.dst")) & (F.col("f.dst") == F.col("r.src")),
    ).select(F.col("f.src").alias("node"), F.col("f.dst").alias("peer"))
    return (
        nodes.join(mut, "node", "left")
        .groupBy("node")
        .agg(F.min("peer").alias("_mp"))
        .select(
            "node",
            F.least(F.col("node"), F.coalesce(F.col("_mp"), F.col("node"))).alias(
                "scc_id"
            ),
        )
    )


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Synchronous label-propagation communities over an undirected edge
    set: every node starts as its own label; each round it adopts its
    neighbors' MOST FREQUENT label, ties broken to the smallest — the
    deterministic LPA variant (random-order async LPA is irreproducible,
    which makes it unauditable as a pipeline stage). A FIXED round budget,
    not a fixpoint: LPA on cliques oscillates under synchronous updates, so
    the bounded unroll IS the algorithm (and what the SQL oracle replays
    round for round).

    Scale: each round is one shuffle (edges join labels on src, groupBy
    dst×label) plus a per-node top-1 window — the same per-round cost as
    one PageRank step; rounds are few and fixed. Labels never leave the
    JVM."""
    sym = symmetrize(edges).localCheckpoint(eager=True)
    nodes = sym.select(F.col("src").alias("node")).distinct()
    lbl = nodes.select("node", F.col("node").alias("lbl"))
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("lbl"))
    for _ in range(rounds):
        cnt = (
            sym.join(lbl.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = (
            cnt.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "lbl")
        )
        # every node in `nodes` has degree >= 1 (node set comes from the
        # edge list), so `best` covers all of them; the left-join+coalesce
        # is belt-and-braces for callers passing exotic edge sets
        lbl = (
            nodes.join(best.withColumnRenamed("lbl", "_new"), "node", "left")
            .select("node", F.coalesce("_new", "node").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    return lbl.select("node", F.col("lbl").alias("community"))


def eccentricity(edges: DataFrame, max_hops: int = 10) -> DataFrame:
    """Per-node eccentricity (max shortest-hop distance to any reachable
    node) + reachable-set size over the undirected edge set; max(ecc) over
    the output = the graph diameter. Multi-source BFS: the frontier carries
    (root, node) pairs so ALL sources expand in the same superstep — one
    shuffle per hop level regardless of node count, against |V| sequential
    single-source runs.

    Scale: for dimension-sized graphs (concept/tool vocabularies) the
    frontier is at worst |V|² pairs — fine. For corpus-scale graphs
    eccentricity itself is the wrong ask (use HyperBall-style sketches);
    this operator targets the KG relation layer."""
    sym = symmetrize(edges).localCheckpoint(eager=True)
    nodes = sym.select(F.col("src").alias("node")).distinct()
    visited = nodes.select(
        F.col("node").alias("root"), "node", F.lit(0).alias("hops")
    ).localCheckpoint(eager=True)
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.select("root", F.col("node").alias("src"))
            .join(sym, "src")
            .select("root", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("root", "node"), ["root", "node"], "left_anti")
            .withColumn("hops", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    else:
        raise RuntimeError(f"eccentricity: frontier alive after {max_hops} hops")
    return visited.groupBy(F.col("root").alias("node")).agg(
        F.max("hops").cast("int").alias("ecc"),
        F.count(F.lit(1)).cast("long").alias("n_reachable"),
    )


def bfs_paths(edges: DataFrame, seed: str, max_hops: int = 10) -> DataFrame:
    """Shortest-hop path EXPLANATIONS from a seed over the undirected edge
    set: per reachable node, the hop distance plus one canonical witness
    path (the lexicographically smallest '>'-joined node string among all
    shortest paths — deterministic, engine-comparable). BFS guarantees the
    first visit is at min distance; the min-string pick inside the visit
    hop makes the witness unique.

    This is the "why is B related to A" query a KG serving layer answers;
    path strings stay bounded by the graph diameter. Same frontier/visited
    BSP shape (and scale story) as bfs_distances."""
    sym = symmetrize(edges).localCheckpoint(eager=True)
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(seed, 0, seed)], "node string, hops int, path string"
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            sym.join(
                F.broadcast(
                    frontier.select(F.col("node").alias("src"), "path")
                ),
                "src",
            )
            .select(
                F.col("dst").alias("node"),
                F.concat(F.col("path"), F.lit(">"), F.col("dst")).alias("path"),
            )
            .join(visited.select("node"), "node", "left_anti")
            .groupBy("node")
            .agg(F.min("path").alias("path"))
            .withColumn("hops", F.lit(hop))
            .select("node", "hops", "path")
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            return visited
        visited = visited.unionByName(nxt)
        frontier = nxt
    if (
        sym.join(F.broadcast(frontier.select(F.col("node").alias("src"))), "src")
        .select(F.col("dst").alias("node"))
        .join(visited.select("node"), "node", "left_anti")
        .limit(1)
        .count()
        > 0
    ):
        raise RuntimeError(f"bfs_paths: frontier not empty after {max_hops} hops")
    return visited


def bfs_path_counts(edges: DataFrame, seed: str, max_hops: int = 10) -> DataFrame:
    """Single-source shortest-path COUNTING (the sigma DP of Brandes'
    betweenness algorithm): per reachable node, the hop distance AND the
    exact number of distinct shortest paths from the seed, as BIGINT.
    Level-synchronous: when the BFS frontier advances, a new node's sigma
    is the SUM of the sigmas of its frontier in-neighbors (every shortest
    path to the neighbor extends to one shortest path here); a node already
    visited at an earlier level is excluded by the anti-join, so paths are
    counted only along shortest routes. Deterministic integer arithmetic —
    no floats anywhere — which is what makes the result hash-checkable
    against a simple-path-enumerating oracle on fixture-sized graphs.

    Scale shape: identical to bfs_distances (frontier-x-edges join per
    superstep, node-sized broadcast frontier); the only addition is a sum
    aggregation on the frontier expansion, which rides the same shuffle.
    """
    sym = symmetrize(edges).localCheckpoint(eager=True)
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(seed, 0, 1)], "node string, hops int, sigma long"
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            sym.join(
                F.broadcast(
                    frontier.select(F.col("node").alias("src"), "sigma")
                ),
                "src",
            )
            .join(visited.select(F.col("node").alias("dst")), "dst", "left_anti")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("sigma").cast("long").alias("sigma"))
            .withColumn("hops", F.lit(hop))
            .select("node", "hops", "sigma")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            return visited
        visited = visited.unionByName(nxt)
        frontier = nxt
    if (
        sym.join(F.broadcast(frontier.select(F.col("node").alias("src"))), "src")
        .join(visited.select(F.col("node").alias("dst")), "dst", "left_anti")
        .limit(1)
        .count()
        > 0
    ):
        raise RuntimeError(f"bfs_path_counts: frontier not empty after {max_hops} hops")
    return visited
