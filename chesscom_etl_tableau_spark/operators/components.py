"""Connected components over near-duplicate pair edges — the cluster
resolution step of large-scale dedup (beyond the reference surface;
pairs alone don't dedup: A~B and B~C must collapse into ONE cluster
{A,B,C} with one survivor).

Two algorithms behind one API (``method=``):

- ``"propagate"`` (default): iterative **min-label propagation**.
  Every node starts labeled with its own id; each round, every node
  takes the min of its own label and its neighbors' labels; converged
  when no label changes. Rounds needed = graph diameter. Near-dup
  graphs are unions of small near-cliques (similarity is
  ~transitive), so diameter is tiny and 2-4 rounds suffice even at
  100 TB.
- ``"star"``: the **large-star/small-star** alternation (Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC'14).
  Each round rewires edges toward each neighborhood's minimum:
  large-star hangs every larger neighbor of u under
  min(N(u) ∪ {u}); small-star hangs u and its smaller neighbors
  under their minimum. Converges in O(log² n) rounds regardless of
  diameter — the safe choice for adversarial long-chain graphs
  (e.g. 10⁶ pairwise-chained near-dups) where plain propagation
  needs diameter rounds.

Scale notes:
- each round is one shuffle-join + one groupBy-min over the current
  edge set; propagate re-uses a cached symmetric edge list across
  rounds, star rewrites (and typically shrinks) the edge set;
- `localCheckpoint` after every round cuts the lineage — without it
  the plan doubles per iteration and the job DAG explodes;
- propagate convergence uses the monotone label-sum invariant
  (labels only decrease, so the min-label sum strictly decreases
  until the fixpoint); star convergence compares an
  (edge-count, xxhash64-sum) checksum of the canonical edge set —
  one cheap agg per round instead of a full old-vs-new anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    method: str = "propagate",
) -> DataFrame:
    """Label every node with its component id = min node id reachable.

    `nodes`: one column `node_col` (all nodes, including singletons).
    `edges`: undirected pairs (`src_col`, `dst_col`).
    `method`: "propagate" (diameter rounds, best for near-clique dedup
    graphs) or "star" (O(log² n) rounds, safe for long chains).
    Returns (`node_col`, `component_id`).
    """
    if method == "star":
        labels, _ = star_components(
            nodes, edges, node_col, src_col, dst_col, max_iter=max_iter
        )
        return labels
    if method != "propagate":
        raise ValueError(f"unknown connected-components method: {method!r}")
    sym = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .union(edges.select(F.col(dst_col).alias("_s"), F.col(src_col).alias("_d")))
        .distinct()
        .cache()
    )
    # Iterate over edge-touched nodes ONLY (r12): a singleton's label is
    # its own id by definition and can never change, yet the old loop
    # dragged every singleton through each round's union + groupBy-min.
    # Dedup graphs are sparse (most docs have no near-dup), so the
    # per-round shuffle shrinks from |V| to |V_active|; singletons are
    # unioned back once at the end, label = own id. Same fixpoint.
    labels = (
        sym.select(F.col("_s").alias("_n"), F.col("_s").alias("_lbl"))
        .distinct()
        .localCheckpoint()
    )

    prev_sum = None
    for _ in range(max_iter):
        # neighbor labels flow along edges; keep own label via union.
        msgs = labels.join(sym, labels["_n"] == sym["_s"]).select(
            F.col("_d").alias("_n"), "_lbl"
        )
        labels = (
            labels.union(msgs).groupBy("_n").agg(F.min("_lbl").alias("_lbl"))
        ).localCheckpoint()
        cur_sum = labels.agg(F.sum("_lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()
    # singleton fold: one left join against the (checkpointed, active-
    # only) label frame; a node with no edges keeps its own id
    return nodes.select(F.col(node_col).alias("_n")).join(labels, "_n", "left").select(
        F.col("_n").alias(node_col),
        F.coalesce("_lbl", F.col("_n")).alias("component_id"),
    )


def star_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 50,
) -> tuple[DataFrame, int]:
    """Large-star/small-star connected components (Kiveris et al.,
    SoCC'14 §3). Returns (labels, rounds_used).

    Edge set is kept canonical as (_lo < _hi) pairs. One round =
    large-star then small-star:

    - large-star (grouped on each node u over its FULL neighborhood):
      m = min(N(u) ∪ {u}); every strictly-larger neighbor v > u is
      rewired to (m, v). Connectivity is preserved because the
      directed copy (m', u) of u's own smallest edge is emitted by
      the group of that smaller neighbor.
    - small-star (grouped on each node u over its SMALLER neighbors):
      m = min(N⁻(u)); emit (m, u) and (m, v) for the other smaller
      neighbors v — u's sub-star collapses onto its minimum.

    At the joint fixpoint the edge set is a union of stars centered
    at each component's minimum id, so the label map is just
    edge.(_hi → _lo) plus identity for roots/singletons.

    Convergence detection: (count, sum(xxhash64(_lo,_hi))) checksum
    equality between rounds — one tiny agg per round; a collision
    would need two distinct edge sets with equal count AND equal
    64-bit hash sum.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("_lo"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("_hi"),
        )
        .where(F.col("_lo") != F.col("_hi"))
        .distinct()
        .localCheckpoint()
    )

    def _checksum(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) sum: a bigint sum of 64-bit hashes overflows
            # under ANSI mode.
            F.sum(F.xxhash64("_lo", "_hi").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = _checksum(e)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # -- large-star ------------------------------------------------
        adj = e.select(F.col("_lo").alias("_u"), F.col("_hi").alias("_v")).union(
            e.select(F.col("_hi").alias("_u"), F.col("_lo").alias("_v"))
        )
        m = adj.groupBy("_u").agg(F.min("_v").alias("_minv"))
        m = m.select("_u", F.least(F.col("_u"), F.col("_minv")).alias("_m"))
        e = (
            adj.where(F.col("_v") > F.col("_u"))
            .join(m, "_u")
            .select(F.col("_m").alias("_lo"), F.col("_v").alias("_hi"))
            .where(F.col("_lo") != F.col("_hi"))
            .distinct()
        )
        # -- small-star ------------------------------------------------
        # every canonical edge (_lo,_hi) is _hi's link to a smaller
        # neighbor; group on _hi.
        dirn = e.select(F.col("_hi").alias("_u"), F.col("_lo").alias("_v"))
        mins = dirn.groupBy("_u").agg(F.min("_v").alias("_m"))
        rewired = (
            dirn.join(mins, "_u")
            .where(F.col("_v") != F.col("_m"))
            .select(F.col("_m").alias("_lo"), F.col("_v").alias("_hi"))
        )
        own = mins.select(F.col("_m").alias("_lo"), F.col("_u").alias("_hi"))
        e = (
            rewired.union(own)
            .where(F.col("_lo") != F.col("_hi"))
            .distinct()
            .localCheckpoint()
        )
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur

    star_map = e.select(F.col("_hi").alias("_n"), F.col("_lo").alias("_root"))
    # At the fixpoint each non-root has exactly one edge; the min-agg
    # is a no-op then, but keeps the answer well-defined if max_iter
    # cut the loop short on a pathological graph.
    star_map = star_map.groupBy("_n").agg(F.min("_root").alias("_root"))
    labels = (
        nodes.select(F.col(node_col).alias("_n"))
        .join(star_map, "_n", "left")
        .select(
            F.col("_n").alias(node_col),
            F.coalesce(F.col("_root"), F.col("_n")).alias("component_id"),
        )
    )
    return labels, rounds


def component_survivors(components: DataFrame, node_col: str = "doc_id") -> DataFrame:
    """Collapse a component assignment to one row per cluster:
    (component_id, survivor = min id, n_members)."""
    return components.groupBy("component_id").agg(
        F.min(node_col).alias("survivor_id"),
        F.count(F.lit(1)).alias("n_members"),
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007), made fully DETERMINISTIC: every node starts with its own
    id as label; each round, every node adopts the most frequent label
    among its in-neighbors, ties broken by MINIMUM label; an isolated
    node keeps its current label. Fixed `iterations` synchronous rounds
    (the async/randomized variant of the paper trades determinism for
    faster convergence — wrong trade for an oracle-checked engine; note
    the known synchronous-LPA caveat that bipartite regions can
    oscillate, which fixed-round semantics makes reproducible rather
    than harmful).

    Scale shape per round: one shuffle join (labels ⋈ edges on src),
    one map-side-combined count at (node, label) grain, one row_number
    window for the argmax — all relational, no driver state; the loop
    builds ONE Catalyst plan. Pass both edge directions for an
    undirected graph. Returns (node, label).

    The loop-INVARIANT inputs (edges, nodes) are persist()-marked:
    every iteration references them, and without the hint Catalyst
    re-expands (and the executor recomputes) the upstream
    edge-derivation subtree once per round — the triangle_count
    lesson applied to the iterative ops (measured 8.2s -> ~2s on the
    3-round trade-graph entry). persist is lazy, so the plan still
    builds without running a job.
    """
    edges = edges.persist()
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .persist()
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iterations):
        incoming = edges.join(
            labels.withColumnRenamed("node", "__u"), edges[src_col] == F.col("__u")
        ).select(F.col(dst_col).alias("node"), "label")
        counts = incoming.groupBy("node", "label").agg(F.count(F.lit(1)).alias("__n"))
        w = Window.partitionBy("node").orderBy(F.col("__n").desc(), F.col("label").asc())
        best = (
            counts.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("node", F.col("label").alias("__best"))
        )
        # each round reads the PREVIOUS labels twice (the neighbor-count
        # branch and the isolated-node carry) — persist the round result
        # or the lineage doubles per iteration (2^k subtree copies)
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce(F.col("__best"), F.col("label")).alias("label"))
            .persist()
        )
    return labels


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank in EXACT integer micro-units.

    The float formulation sums double contributions in shuffle order —
    nondeterministic across partitionings and engines. This variant
    keeps every rank in bigint micro-units with floor division:

        contrib(u)  = rank(u) DIV out_degree(u)
        rank'(v)    = (100 - d)*10_000  +  (d * Σ contrib(u→v)) DIV 100

    so the result is bit-identical on any engine / partition count /
    cluster size (oracle-checkable, replayable), at the cost of a ≤1
    micro-unit floor bias per term — irrelevant for ranking. Dangling
    mass is dropped (the standard simplification); pass both edge
    directions for an undirected graph.

    Scale: each iteration is one shuffle join (ranks ⋈ edges on src)
    plus one groupBy(dst) with map-side partial aggregation — the
    textbook iterative-join PageRank; degree is computed once and
    reused. `iterations` is fixed (plan-building loop, no eager
    actions), so the whole computation stays ONE Catalyst plan that
    AQE can re-optimize stage by stage. The loop-invariant inputs
    (edges, deg, nodes) are persist()-marked so each computes once
    instead of once per round (lazy hint — see label_propagation).
    """
    edges = edges.persist()
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("__deg")).persist()
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .persist()
    )
    ranks = nodes.select("node", F.lit(1_000_000).cast("long").alias("rank_micro"))
    base = (100 - damping_pct) * 10_000
    for _ in range(iterations):
        contrib = ranks.join(deg, ranks["node"] == deg[src_col]).select(
            F.col("node").alias("__u"),
            F.expr("rank_micro div __deg").alias("__c"),
        )
        msgs = (
            edges.join(contrib, edges[src_col] == F.col("__u"))
            .groupBy(F.col(dst_col).alias("node"))
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = nodes.join(msgs, "node", "left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.expr(f"({damping_pct} * coalesce(__s, 0L)) div 100")
            ).alias("rank_micro"),
        )
    return ranks


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation —
    the distributed "node-iterator++" algorithm (Suri & Vassilvitskii,
    WWW'11 "Counting Triangles and the Curse of the Last Reducer").

    Input: an undirected edge list (either or both directions;
    self-loops and duplicates are dropped). Output: one row per node
    that participates in ≥1 triangle — (node, n_triangles).

    Why orientation matters at scale: the naive wedge join groups on
    the wedge CENTER, so a degree-d hub generates d² candidate wedges
    — the "curse of the last reducer" (one skewed key does quadratic
    work). Orienting every edge from its lower-(degree, id) endpoint
    to its higher one makes each triangle countable exactly once AND
    bounds every node's out-degree by O(√m) on any graph, so the wedge
    join's per-key work is capped regardless of hub degree. Three hash
    joins total (wedge build + closing-edge probe), no cartesian.

    Determinism: the (degree, id) order is total (id string compare
    breaks degree ties), so the oriented edge set — and therefore
    every intermediate — is engine-exact; a DuckDB oracle replays the
    identical joins.

    The canonical edge set, degrees, and oriented edges are each
    consumed by 2-3 downstream joins; without persist() Catalyst
    re-expands the whole upstream subtree at every use (measured: a
    50x plan blowup on a projection-derived edge list). Marking them
    MEMORY_AND_DISK keeps the build lazy (persist is a hint, not an
    action) and each intermediate computes once — the same reuse
    discipline any multi-pass graph op needs at 100 TB.
    """
    # canonical undirected edges: u < v by id, deduped, no self-loops
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    deg = (
        canon.select(F.col("u").alias("node"))
        .unionAll(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # orient low-(deg, id) -> high-(deg, id); ids differ, so the total
    # order never leaves an edge unoriented
    oriented = (
        canon.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select(F.col("e.s").alias("s"), F.col("e.t").alias("t"))
        .persist()
    )
    # wedges at the LOW endpoint: a -> b, a -> c with b before c in the
    # oriented order; the closing oriented edge is then exactly b -> c
    o2 = oriented.select(F.col("s").alias("s2"), F.col("t").alias("t2"))
    dt = deg.select(F.col("node").alias("t"), F.col("deg").alias("d_b"))
    dt2 = deg.select(F.col("node").alias("t2"), F.col("deg").alias("d_c"))
    wedges = (
        oriented.join(dt, "t")
        .join(o2, F.col("s") == F.col("s2"))
        .join(dt2, "t2")
        .where(
            (F.col("d_b") < F.col("d_c"))
            | ((F.col("d_b") == F.col("d_c")) & (F.col("t") < F.col("t2")))
        )
        .select(F.col("s").alias("a"), F.col("t").alias("b"), F.col("t2").alias("c"))
    )
    closing = oriented.select(F.col("s").alias("b"), F.col("t").alias("c"))
    tris = wedges.join(closing, ["b", "c"])
    per_node = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node


def neighbor_jaccard(
    edges: DataFrame,
    node_col: str,
    neighbor_col: str,
    min_common: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """Link prediction by neighborhood Jaccard: score node pairs by
    |N(u) ∩ N(v)| / |N(u) ∪ N(v)| over a bipartite incidence list
    (e.g. suppliers sharing parts) — the classic "who should be
    connected next" signal, and the graph twin of the shingle-set
    Jaccard the dedup family uses on text.

    Scale shape: the same inverted-index discipline as
    `triangle_count`/`dedup_ngram_jaccard` — pairs are generated ONLY
    through shared neighbors (self-join on the neighbor key), never
    all-pairs, so the cost is Σ_nbr deg(nbr)² — the hub-neighbor
    quadratic term, the known hot spot; production corpora cap or
    sample hub neighbors (the df-cap pattern in dedup.py) — while
    degrees are one map-side-combinable count. Jaccard is exact
    integers until ONE IEEE division. Total order: score desc, then
    both ids asc.
    """
    e = edges.select(
        F.col(node_col).alias("u"), F.col(neighbor_col).alias("nb")
    ).distinct()
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    common = (
        e.join(e.select(F.col("u").alias("v"), "nb"), "nb")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    r6 = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("double") / F.lit(
        1000000.0
    )
    return (
        common.join(deg.select(F.col("u"), F.col("deg").alias("__du")), "u")
        .join(deg.select(F.col("u").alias("v"), F.col("deg").alias("__dv")), "v")
        .select(
            F.col("u").alias(f"{node_col}_a"),
            F.col("v").alias(f"{node_col}_b"),
            "n_common",
            r6(
                F.col("n_common").cast("double")
                / (F.col("__du") + F.col("__dv") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), F.col(f"{node_col}_a").asc(), F.col(f"{node_col}_b").asc())
        .limit(top_k)
    )


def kcore(
    edges: DataFrame,
    k,
    rounds: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded-round k-core peeling: repeatedly drop nodes with degree
    < k (and their edges); what survives `rounds` rounds is the k-core
    if peeling has converged by then — the standard "dense engaged
    subgraph" extraction behind spam/core-community analysis.

    FIXED-round semantics by design (like the 4-round BPE learner): the
    plan is a pure lazy chain of degree-aggregate + two semi-joins per
    round, identical on any engine — the DuckDB oracle unrolls the same
    rounds as chained CTEs and matches by construction whether or not
    the graph has converged. Convergence-by-`rounds` is asserted in
    tests for the registry graph (peeling a bipartite trade graph
    stabilizes in a handful of rounds); a non-converged result is a
    SUPERSET of the k-core, never a subset.

    Expects a symmetric (both-directions) edge list; degrees count
    out-edges, which under symmetry equal undirected degrees. Output:
    (node, degree) of the surviving subgraph.

    `k` is an int, or a 1-row DataFrame with a bigint column `k` for a
    DATA-ADAPTIVE threshold (e.g. a degree quantile) — joined broadcast
    into every round's filter so the whole pipeline stays one lazy
    plan: no collect, the threshold is computed inside the same job.

    Each round references the previous round's frame twice (degree agg
    + edge filter), so a naive chain doubles the LOGICAL plan per round
    — 2^rounds subtree copies kill the analyzer long before execution
    (measured: 8 rounds OOMs the driver at analysis). A
    localCheckpoint per round truncates the lineage while keeping the
    operator collect-free; the oracle needs the same medicine on its
    side (MATERIALIZED CTEs — DuckDB inlines multiply-referenced CTEs).
    NOTE: under AQE the checkpoint executes its stages at BUILD time
    (toRdd runs the query so AQE can observe runtime stats), so this
    operator is EAGER like the other iterative graph ops — the
    materialized rounds are reused by the final action, nothing is
    computed twice.
    """
    e = edges.select(src_col, dst_col).distinct()
    # Materialize the (1-row) adaptive-k aggregate ONCE: each round's
    # filter references kdf, and with per-round checkpoint
    # materialization an un-cut kdf would recompute its degree-quantile
    # subtree every round (up to `rounds` times).
    kdf = None if isinstance(k, int) else F.broadcast(k.select("k").localCheckpoint(eager=False))
    prev_edges = None
    for _ in range(rounds):
        deg = e.groupBy(src_col).agg(F.count(F.lit(1)).alias("__deg"))
        if kdf is not None:
            deg = deg.join(kdf)
        keep = deg.where(F.col("__deg") >= (F.lit(k) if kdf is None else F.col("k"))).select(
            F.col(src_col).alias("__n")
        )
        e = (
            e.join(keep, e[src_col] == keep["__n"], "left_semi")
            .join(
                keep.select(F.col("__n").alias("__m")),
                e[dst_col] == F.col("__m"),
                "left_semi",
            )
            .localCheckpoint(eager=False)
        )
        # Convergence early-exit: every node in `e` has >= 1 out-edge,
        # so peeling any node strictly shrinks the edge count — an
        # unchanged count IS the fixpoint, and running the remaining
        # rounds would reproduce `e` verbatim (the fixed-round oracle
        # stays green by idempotence). The count is a cheap job over
        # the just-materialized checkpoint, and it's what turns the
        # always-8-rounds worst case into rounds-until-converged.
        n_edges = e.count()
        if prev_edges is not None and n_edges == prev_edges:
            break
        prev_edges = n_edges
    return (
        e.groupBy(src_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .select(F.col(src_col).alias("node"), "degree")
    )


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Multi-source BFS: the minimum hop distance (<= max_depth) from
    any seed to every reachable node — "how far is every account from a
    known-bad seed set", the reach/contamination primitive.

    Frontier iteration with per-round persist (the connected-components
    discipline): each round expands the frontier one hop through an
    edges join, anti-joins the visited set, and stops early when the
    frontier empties — so the work per round is |frontier edges|, never
    the whole graph re-walked, and the loop is bounded by max_depth.
    First-visit depth IS the minimum distance (BFS invariant), so no
    min-aggregate is needed. Output: (node, dist), seeds at dist 0.
    """
    # Persist the edge list (optimization r15, guide §5): every round's
    # frontier expansion joins against `e`, and when `edges` is itself a
    # join/distinct pipeline (the trade graph is lineitem⋈orders +
    # distinct) an uncached `e` re-runs that build once PER ROUND — the
    # depth-4 fixture paid the edge build 4x. The other iterative graph
    # ops (pagerank, label_propagation, triangle_count) already persist
    # their edges; this aligns bfs with them.
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).persist()
    visited = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .persist()
    )
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["__s"])
            .select(F.col("__d").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("dist", F.lit(depth))
            .persist()
        )
        # count() (not isEmpty) fully materializes the persisted round,
        # so no later action re-derives `nxt` through the unpersisted
        # edge cache after the loop releases it.
        if nxt.count() == 0:
            nxt.unpersist()
            break
        prev = visited
        visited = visited.unionByName(nxt).persist()
        prev.unpersist()
        frontier = nxt
    # The final `visited` union tree reads only fully-materialized
    # per-round caches; the edge cache is no longer needed.
    e.unpersist(blocking=False)
    return visited
