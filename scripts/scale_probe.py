"""Scaling probe: dedup operator runtimes at 1x/2x/4x corpus size.

Duplicates the sf0.1 documents/embeddings tables with offset ids (a
dup-heavy corpus, the realistic worst case for near-dup work) and times
each operator. Expectation: inverted-index and LSH paths scale near-
linearly in corpus size + true-pair count; the exact embedding pair
join scales quadratically — which is why it is the baseline, not the
scale path. Run: python scripts/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from chesscom_etl_tableau_spark.operators import dedup as D
from chesscom_etl_tableau_spark.operators import similarity as SIM
from chesscom_etl_tableau_spark.operators import training as TR
from chesscom_etl_tableau_spark.operators.components import connected_components
from chesscom_etl_tableau_spark.operators.text import winnow_fingerprints
from chesscom_etl_tableau_spark.session import get_spark
from chesscom_etl_tableau_spark.sources.tables import load_table


def components_over_jaccard(docs):
    pairs = D.ngram_jaccard_pairs(docs, k=3, threshold=0.5).select("doc_a", "doc_b")
    return connected_components(docs.select("doc_id"), pairs)


def replicate(df, id_col, copies):
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000)) for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def timed(build, docs, emb) -> tuple[float, int]:
    """Times plan construction + execution: iterative operators
    (connected components) do real work at build time via eager
    localCheckpoints, so the build belongs inside the timed region."""
    build(docs, emb).count()  # warm
    t0 = time.time()
    n = build(docs, emb).count()
    return round(time.time() - t0, 2), n


def cc_probe(sf_dir: str) -> None:
    """Star vs propagate connected components on the two graph shapes
    that bracket real dedup workloads (round-3 verdict ask #7):

    - near-clique: jaccard(0.5) pairs over the replicated sf0.1 corpus —
      unions of small dense clusters, diameter 1-2. Propagate's home turf.
    - long chain: n pairwise-chained nodes, diameter n. Propagate needs
      diameter rounds (infeasible past a few hundred — NOT timed, by
      design); star needs O(log² n).

    Prints per-method wall time; star also reports rounds used.
    """
    from chesscom_etl_tableau_spark.operators.components import star_components

    spark = get_spark("cc-probe")
    docs0 = load_table(spark, sf_dir, "documents")

    def run_star(nodes, edges):
        t0 = time.time()
        labels, rounds = star_components(nodes, edges)
        n = labels.select("component_id").distinct().count()
        return round(time.time() - t0, 2), rounds, n

    def run_propagate(nodes, edges):
        t0 = time.time()
        labels = connected_components(nodes, edges)
        n = labels.select("component_id").distinct().count()
        return round(time.time() - t0, 2), n

    print(f"{'graph':<26}{'method':<12}{'x1':>16}{'x4':>16}{'x8':>16}")
    rows = {"propagate": [], "star": []}
    for copies in (1, 4, 8):
        docs = replicate(docs0, "doc_id", copies).cache()
        docs.count()
        pairs = (
            D.ngram_jaccard_pairs(docs, k=3, threshold=0.5)
            .select("doc_a", "doc_b")
            .localCheckpoint()  # freeze the edge list: time CC alone
        )
        nodes = docs.select("doc_id")
        sec, ncomp = run_propagate(nodes, pairs)
        rows["propagate"].append(f"{sec:>9.2f}s/{ncomp}")
        sec, rounds, ncomp = run_star(nodes, pairs)
        rows["star"].append(f"{sec:>6.2f}s/r{rounds}/{ncomp}")
        docs.unpersist()
    print(f"{'near-clique(jaccard)':<26}{'propagate':<12}" + "".join(f"{v:>16}" for v in rows["propagate"]))
    print(f"{'near-clique(jaccard)':<26}{'star':<12}" + "".join(f"{v:>16}" for v in rows["star"]))

    star_rows = []
    for n_nodes in (10_000, 40_000, 80_000):
        nodes = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
        edges = (
            spark.range(n_nodes - 1)
            .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
            .repartition(32)
            .localCheckpoint()
        )
        sec, rounds, ncomp = run_star(nodes, edges)
        star_rows.append(f"{sec:>6.2f}s/r{rounds}/{ncomp}")
    print(f"{'chain(10k/40k/80k)':<26}{'star':<12}" + "".join(f"{v:>16}" for v in star_rows))
    print(f"{'chain(10k/40k/80k)':<26}{'propagate':<12}" + "".join(f"{'(diameter rounds)':>16}" for _ in star_rows))


def sessionize_probe() -> None:
    """Streaming sessionize state/throughput scaling (round-4 verdict
    ask #6): x1/x4/x8 users, constant per-user structure (3 sessions x
    20 events, 60 s cadence, sessions 2 h apart, gap 30 min, watermark
    10 min). Time-sliced input files + maxFilesPerTrigger=1 force one
    microbatch per session wave so the watermark advances and seals
    sessions DURING the drain, as in production.

    Expectations printed for the committed table (BASELINE.md):
    - emitted == 2 sessions/user (the third stays open: wm < last+gap);
    - state rows at drain end == users exactly — state is bounded by
      OPEN sessions, not event volume or closed-session history;
    - drain wall time ~linear in total events.
    """
    import shutil
    import tempfile

    from chesscom_etl_tableau_spark.streaming.sessionize import (
        streaming_session_stats,
    )

    spark = get_spark("sessionize-probe")
    print(f"{'users':>8}{'events':>10}{'emitted':>10}{'state_rows':>12}{'state_mem':>12}{'drain_s':>10}")
    # warmup=0 spins up the Python worker pool + state store untimed —
    # without it the first measured row absorbs ~60s of one-off JVM
    # warmup and the scaling shape is unreadable
    for mult in (0, 1, 4, 8):
        users = 200 * mult if mult else 50
        ev = (
            spark.range(users)
            .select(F.col("id").alias("u"))
            .crossJoin(spark.range(3).select(F.col("id").alias("s")))
            .crossJoin(spark.range(20).select(F.col("id").alias("i")))
            .select(
                "s",
                F.concat(F.lit("user"), F.col("u")).alias("user_id"),
                F.to_timestamp(
                    F.from_unixtime(
                        F.lit(1_700_000_000) + F.col("s") * 7200 + F.col("i") * 60
                    )
                ).alias("ts"),
            )
        )
        tmp = tempfile.mkdtemp(prefix="sessprobe-")
        drop = os.path.join(tmp, "drop")
        os.makedirs(drop)
        # one file per session wave, written in time order
        for s in range(3):
            ev.where(F.col("s") == s).select("user_id", "ts").coalesce(1).write.parquet(
                os.path.join(drop, f"wave{s}.parquet")
            )
        stream = (
            spark.readStream.schema("user_id string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(drop + "/*")
        )
        name = f"sessprobe{mult}"
        t0 = time.time()
        q = (
            streaming_session_stats(stream, gap_minutes=30, watermark_delay="10 minutes")
            .writeStream.outputMode("append")
            .queryName(name)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .format("memory")
            .start()
        )
        q.awaitTermination()
        drain = round(time.time() - t0, 2)
        emitted = spark.sql(f"SELECT count(*) FROM {name}").first()[0]
        state_rows = state_mem = None
        for prog in reversed(q.recentProgress):
            ops = prog.get("stateOperators") or []
            if ops:
                state_rows = ops[0].get("numRowsTotal")
                state_mem = ops[0].get("memoryUsedBytes")
                break
        if mult:
            print(f"{users:>8}{users * 60:>10}{emitted:>10}{state_rows:>12}{state_mem:>12}{drain:>10.2f}")
        shutil.rmtree(tmp, ignore_errors=True)


def join_probe() -> None:
    """Stream-stream interval-join state scaling: x1/x2/x4 impressions
    with a constant 50% click-through inside the bound. Three time
    waves drained one file per microbatch so the watermarks advance
    mid-drain.

    Expectations for the committed table (BASELINE.md):
    - emitted == clicked impressions (one click each, inside `within`);
    - state is BOUNDED: rows held ~ the final wave's unexpired windows,
      not the full history (watermark + range eviction);
    - drain wall time ~linear in events.
    """
    import shutil
    import tempfile

    from chesscom_etl_tableau_spark.streaming.join_stream import (
        interval_join_streams,
    )

    spark = get_spark("join-probe")
    print(f"{'imps':>8}{'emitted':>10}{'state_rows':>12}{'drain_s':>10}")
    for mult in (0, 1, 2, 4):
        n = 2000 * mult if mult else 200
        base = 1_700_000_000
        imp = (
            spark.range(n)
            .select(
                F.col("id").alias("ad_id"),
                # three waves 2h apart, 1s cadence inside a wave
                F.to_timestamp(
                    F.from_unixtime(
                        F.lit(base) + (F.col("id") % 3) * 7200 + F.col("id")
                    )
                ).alias("imp_ts"),
            )
        )
        clk = imp.where(F.col("ad_id") % 2 == 0).select(
            "ad_id",
            (F.col("imp_ts") + F.expr("INTERVAL 5 MINUTES")).alias("click_ts"),
        )
        tmp = tempfile.mkdtemp(prefix="joinprobe-")
        idrop, cdrop = os.path.join(tmp, "i"), os.path.join(tmp, "c")
        for s in range(3):
            imp.where(F.col("ad_id") % 3 == s).coalesce(1).write.parquet(
                os.path.join(idrop, f"w{s}.parquet")
            )
            clk.where(F.col("ad_id") % 3 == s).coalesce(1).write.parquet(
                os.path.join(cdrop, f"w{s}.parquet")
            )
        imps = (
            spark.readStream.schema("ad_id long, imp_ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(idrop + "/*")
        )
        clks = (
            spark.readStream.schema("ad_id long, click_ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(cdrop + "/*")
        )
        joined = interval_join_streams(
            imps, clks, "ad_id", "imp_ts", "click_ts",
            watermark="10 minutes", within="10 minutes",
        )
        name = f"joinprobe{mult}"
        t0 = time.time()
        q = (
            joined.writeStream.outputMode("append")
            .queryName(name)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .format("memory")
            .start()
        )
        q.awaitTermination()
        drain = round(time.time() - t0, 2)
        emitted = spark.sql(f"SELECT count(*) FROM {name}").first()[0]
        state_rows = None
        for prog in reversed(q.recentProgress):
            ops = prog.get("stateOperators") or []
            if ops:
                state_rows = ops[0].get("numRowsTotal")
                break
        if mult:
            print(f"{n:>8}{emitted:>10}{state_rows:>12}{drain:>10.2f}")
        shutil.rmtree(tmp, ignore_errors=True)


def _hh(docs):
    from chesscom_etl_tableau_spark.operators.analytics import heavy_hitters
    from chesscom_etl_tableau_spark.operators.text import word_tokens

    toks = docs.select(F.explode(word_tokens(F.col("text"))).alias("token"))
    return heavy_hitters(toks, "token", k=30)


def _surprisal(docs):
    from chesscom_etl_tableau_spark.operators.text import unigram_surprisal

    return unigram_surprisal(docs)


def _bigram(docs):
    from chesscom_etl_tableau_spark.operators.text import bigram_surprisal

    return bigram_surprisal(docs)


def _dsir(docs):
    return TR.dsir_importance(docs, target_source="src0", n_buckets=1024)


def _dhash(docs):
    from chesscom_etl_tableau_spark.operators.multimodal import (
        dhash_neardup_stats,
        synth_dhash,
    )

    return dhash_neardup_stats(synth_dhash(docs))


def pagerank_probe(sf_dir: str) -> None:
    """PageRank runtime vs graph size: x1/x2/x4 disjoint copies of the
    customer<->supplier trade graph (offset node ids). Disjoint copies
    leave per-iteration join fan-in untouched, so the expectation is
    LINEAR wall-clock in |edges| — any super-linear drift implicates
    the join strategy, not the algorithm."""
    from chesscom_etl_tableau_spark.operators.components import pagerank

    spark = get_spark("pagerank-probe")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    print(f"{'copies':>8}{'edges':>12}{'sec':>10}")
    for copies in (1, 2, 4):
        parts = [
            pairs0.select(
                F.concat(F.lit(f"g{i}"), "c").alias("c"),
                F.concat(F.lit(f"g{i}"), "s").alias("s"),
            )
            for i in range(copies)
        ]
        pairs = parts[0]
        for p in parts[1:]:
            pairs = pairs.unionAll(p)
        pairs = pairs.cache()
        edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
            pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        )
        n_edges = edges.count()
        pagerank(edges).count()  # warm
        t0 = time.time()
        pagerank(edges).count()
        print(f"{copies:>8}{n_edges:>12}{time.time() - t0:>10.2f}")
        pairs.unpersist()


def tpch_probe(sf_dir: str) -> None:
    """Fact-table scaling for the TPC-H suite's three join regimes:
    the pure scan-agg (Q1 shape), the fact-fact shuffle join (Q12
    shape), and the 4-way broadcast-dim join + rollup (Q9 shape).
    Replicates lineitem/orders x1/x2/x4 with shifted orderkeys (joins
    stay key-aligned); expectation is linear wall-clock in fact rows
    for all three — dims never grow."""
    spark = get_spark("scale-probe")
    li0 = load_table(spark, sf_dir, "lineitem")
    orders0 = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    def scan_agg(li, orders):
        return li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1))
        )

    def fact_fact(li, orders):
        crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        return (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(crit, 1).otherwise(0)), F.count(F.lit(1)))
        )

    def star_rollup(li, orders):
        return (
            li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
            .join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
            .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
            .groupBy("n_name", F.year("o_orderdate"))
            .agg(F.sum("l_extendedprice"), F.count(F.lit(1)))
        )

    shapes = {"q1_scan_agg": scan_agg, "q12_fact_fact": fact_fact, "q9_star_rollup": star_rollup}
    print(f"{'shape':<18}{'x1':>14}{'x2':>14}{'x4':>14}")
    for name, build in shapes.items():
        row = []
        for copies in (1, 2, 4):
            li = replicate(li0, "l_orderkey", copies).cache()
            orders = replicate(orders0, "o_orderkey", copies).cache()
            li.count(), orders.count()
            build(li, orders).count()  # warm
            t0 = time.time()
            n = build(li, orders).count()
            row.append(f"{time.time() - t0:>8.2f}s/{n}")
            li.unpersist(), orders.unpersist()
        print(f"{name:<18}{row[0]:>14}{row[1]:>14}{row[2]:>14}")




def scd_probe(sf_dir: str) -> None:
    """Incremental-SCD2 maintenance cost vs history depth (r5 final).

    Claim under test (operators/scd.py::scd2_apply_changes): applying
    a FIXED change batch costs O(open versions of touched keys +
    batch) — independent of history DEPTH — while a full rebuild
    rescans everything. Construction: deepen each user's history x1/
    x2/x4 by unioning month-shifted copies of the purchase feed (the
    copy index is mixed into the tier so every copy boundary is a
    change, keeping versions ~ depth x originals); the applied batch
    is always the same final half-month. The dim is materialized to
    parquet first so the probe times ONLY the maintenance pass.

    Expected (committed in BASELINE.md): rebuild grows ~linearly with
    depth; apply stays ~flat (its inputs — open versions + batch —
    are depth-independent).
    """
    import shutil
    import tempfile
    import time

    from chesscom_etl_tableau_spark.operators.scd import (
        scd2_apply_changes,
        scd2_build,
    )
    from chesscom_etl_tableau_spark.sources.tables import load_table

    spark = get_spark("scd-probe")
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    base = ev.select(
        "user_id",
        F.floor(F.col("value") / 25).cast("int").alias("tier"),
        "ts",
        "event_id",
    )
    cutoff = F.lit("2024-01-16").cast("timestamp")
    batch = base.where(F.col("ts") >= cutoff)
    print("depth | hist_rows | dim_rows | rebuild_s | apply_s")
    # one untimed warmup pass (JIT/codegen): the first job on a fresh
    # session is ~4x slower regardless of data size
    scd2_build(batch, "user_id", "tier", "ts", ("event_id",)).count()
    for depth in (4, 16, 64):
        hist = None
        for c in range(depth):
            shifted = base.where(F.col("ts") < cutoff).select(
                "user_id",
                # mix the copy index into the tier so every copy
                # boundary is a change point: versions ~ depth x base
                (F.col("tier") + F.lit(c * 1000)).alias("tier"),
                (F.col("ts") - F.expr(f"INTERVAL {(depth - 1 - c)} MONTH")).alias("ts"),
                "event_id",
            )
            hist = shifted if hist is None else hist.unionByName(shifted)
        tmp = tempfile.mkdtemp(prefix="scdprobe")
        try:
            t0 = time.time()
            dim = scd2_build(hist, "user_id", "tier", "ts", ("event_id",))
            dim.write.mode("overwrite").parquet(tmp + "/dim")
            rebuild_s = time.time() - t0
            persisted = spark.read.parquet(tmp + "/dim")
            n_dim = persisted.count()
            t0 = time.time()
            out = scd2_apply_changes(
                persisted, batch, "user_id", "tier", "ts", ("event_id",)
            )
            out.write.mode("overwrite").parquet(tmp + "/out")
            apply_s = time.time() - t0
            print(
                f"x{depth} | {hist.count()} | {n_dim} | "
                f"{rebuild_s:.2f} | {apply_s:.2f}"
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def triangles_probe(sf_dir: str) -> None:
    """Triangle-count runtime vs graph size: x1/x2/x4 DISJOINT copies
    of the support-cut co-supply projection (offset node ids).
    Disjoint copies preserve per-node degree, so the degree-ordered
    wedge work grows linearly with copies — the expectation is LINEAR
    wall-clock in |edges|; super-linear drift would implicate the
    orientation (the whole point of the Suri/Vassilvitskii form is
    that wedge work is bounded by m^1.5 WITHIN a component and linear
    across disjoint ones)."""
    from chesscom_etl_tableau_spark.operators.components import triangle_count

    spark = get_spark("triangles-probe")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("u"))
        .distinct()
    )
    supp = (
        li.join(li.select("o", F.col("u").alias("v")), "o")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mx = supp.agg(F.max("n").alias("__mx"))
    edges0 = (
        supp.join(F.broadcast(mx))
        .where(F.col("n") * 2 >= F.col("__mx"))
        .select(
            F.col("u").cast("string").alias("src"),
            F.col("v").cast("string").alias("dst"),
        )
        .persist()
    )
    n0 = edges0.count()
    print(f"{'copies':>8}{'edges':>12}{'tri_nodes':>12}{'sec':>10}")
    for copies in (1, 2, 4):
        parts = [
            edges0.select(
                F.concat(F.lit(f"g{i}#"), "src").alias("src"),
                F.concat(F.lit(f"g{i}#"), "dst").alias("dst"),
            )
            for i in range(copies)
        ]
        edges = parts[0]
        for p in parts[1:]:
            edges = edges.unionAll(p)
        t0 = time.time()
        n_nodes = triangle_count(edges).count()
        print(f"{copies:>8}{n0 * copies:>12}{n_nodes:>12}{time.time() - t0:>10.1f}")


def graph2_probe(sf_dir: str) -> None:
    """kcore + bfs runtime vs graph size: x1/x2/x4 DISJOINT copies of
    the trade graph (offset node ids). Disjoint copies preserve the
    degree distribution, so the adaptive k (median degree + 1) is
    unchanged and peel work grows with |edges| — expectation LINEAR.
    BFS gets one seed per copy (same relative position), so frontier
    work also replicates — expectation LINEAR; super-linear drift would
    implicate the per-round visited anti-join."""
    from chesscom_etl_tableau_spark.operators.components import (
        bfs_distances,
        kcore,
    )

    spark = get_spark("graph2-probe")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges0 = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionAll(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .persist()
    )
    n0 = edges0.count()
    print(f"{'copies':>8}{'edges':>12}{'core_nodes':>12}{'kcore_s':>10}{'bfs_nodes':>12}{'bfs_s':>8}")
    for copies in (1, 2, 4):
        parts = [
            edges0.select(
                F.concat(F.lit(f"g{i}#"), "src").alias("src"),
                F.concat(F.lit(f"g{i}#"), "dst").alias("dst"),
            )
            for i in range(copies)
        ]
        edges = parts[0]
        for p in parts[1:]:
            edges = edges.unionAll(p)
        edges = edges.persist()
        edges.count()
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("dg"))
        kdf = deg.agg(
            (F.floor(F.percentile("dg", F.lit(0.5))) + F.lit(1))
            .cast("bigint")
            .alias("k")
        )
        t0 = time.time()
        n_core = kcore(edges, kdf, rounds=8).count()
        t_core = time.time() - t0
        seeds = spark.createDataFrame(
            [(f"g{i}#s1",) for i in range(copies)], "node string"
        )
        t0 = time.time()
        n_bfs = bfs_distances(edges, seeds, max_depth=4).count()
        t_bfs = time.time() - t0
        print(
            f"{copies:>8}{n0 * copies:>12}{n_core:>12}{t_core:>10.1f}"
            f"{n_bfs:>12}{t_bfs:>8.1f}"
        )
        edges.unpersist()


def r7_probe(sf_dir: str) -> None:
    """Round-7 additions. Events-based ops scale by REPLICATING USERS
    (offset user_id copies: more keys, constant per-key history — the
    realistic growth axis for per-key scans at 100 TB), ×1/×4/×16.
    Embedding ops replicate vec_ids ×1/×2/×4; knn_consistency is the
    documented exact O(n²) anchor (the corpus path is ivf_topk), so its
    growth is expected quadratic — printed, not hidden."""
    from chesscom_etl_tableau_spark.operators import analytics as AN

    spark = get_spark("scale-probe-r7")
    ev0 = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    emb0 = load_table(spark, sf_dir, "embeddings")

    def rep_events(copies):
        parts = [
            ev0.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
            .withColumn("event_id", F.col("event_id") + F.lit(i * 1_000_000_000))
            for i in range(copies)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    def ab(ev):
        per_user = ev.groupBy("user_id").agg(
            F.max(F.col("event_type") == "purchase").alias("converted"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("__sv"),
        )
        return AN.ab_test_summary(
            per_user.select(
                F.when(F.col("user_id") % 2 == 0, "control")
                .otherwise("treatment")
                .alias("variant"),
                "converted",
                F.col("__sv").cast("double").alias("value"),
            )
        )

    print(f"{'op':<24}{'x1':>12}{'x4':>12}{'x16':>12}")
    for name, build in {
        "ab_test": ab,
        "cusum(h=200)": lambda ev: AN.cusum_changepoints(
            ev, 50.0, 25.0, 200.0, max_events_per_key=None
        ),
        "pattern_cep(24h)": lambda ev: AN.pattern_matches(
            ev, ("signup", "view", "purchase"), within_minutes=24 * 60,
            max_events_per_key=None,
        ),
    }.items():
        row = []
        for copies in (1, 4, 16):
            df = build(rep_events(copies))
            df.count()  # warm
            t0 = time.time()
            n = df.count()
            row.append(f"{time.time() - t0:.2f}s/{n}")
        print(f"{name:<24}{row[0]:>12}{row[1]:>12}{row[2]:>12}")

    print(f"{'op':<24}{'x1':>12}{'x2':>12}{'x4':>12}")
    for name, build in {
        "knn_consistency(k=5)": lambda e: SIM.knn_label_consistency(e, k=5),
        "psi_drift(10 bins)": lambda e: SIM.psi_drift(
            e.where(F.col("vec_id") % 2 == 0), e.where(F.col("vec_id") % 2 != 0)
        ),
    }.items():
        row = []
        for copies in (1, 2, 4):
            df = build(replicate(emb0, "vec_id", copies))
            df.count()
            t0 = time.time()
            n = df.count()
            row.append(f"{time.time() - t0:.2f}s/{n}")
        print(f"{name:<24}{row[0]:>12}{row[1]:>12}{row[2]:>12}")


def r9_probe(sf_dir: str) -> None:
    """Round-9 IVF-PQ probe: replicate vec_ids x1/x2/x4 and time (a)
    the full index BUILD (capped training + residual encode, persisted
    partitioned by bucket) and (b) the persisted PROBE path alone.
    Expect build ~linear (one scan + bounded fits) and probe ~flat-to-
    linear-in-bucket-size (reads nprobe/nlist of the code table)."""
    import tempfile

    import chesscom_etl_tableau_spark.operators.similarity as SIM

    spark = get_spark("scale-probe-r9")
    emb0 = load_table(spark, sf_dir, "embeddings")
    n0 = emb0.count()
    print(f"# IVF-PQ scale probe ({sf_dir}, base n={n0})")
    for copies in (1, 2, 4):
        emb = replicate(emb0, "vec_id", copies).localCheckpoint()
        n = n0 * copies
        qs = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        with tempfile.TemporaryDirectory(prefix="sg_ivfpq_probe_") as tmp:
            path = f"{tmp}/index"
            t0 = time.time()
            cents, books = SIM.ivfpq_persist(
                emb, path, nlist=8, m=4, k=16, seed=42, dim=64,
                train_cap=4000, corpus_rows=n,
            )
            t_build = round(time.time() - t0, 2)
            SIM.ivfpq_topk_persisted(spark, path, cents, books, emb, qs, k=5, nprobe=2).count()
            t0 = time.time()
            got = SIM.ivfpq_topk_persisted(
                spark, path, cents, books, emb, qs, k=5, nprobe=2
            ).count()
            t_probe = round(time.time() - t0, 2)
        print(f"x{copies}: n={n} build={t_build}s probe={t_probe}s rows={got}")


def r10_probe(sf_dir: str) -> None:
    """Round-10 streaming-surface probe: replicate events USERS
    x1/x2/x4 (more keys, constant per-key history — the realistic
    growth axis for keyed streaming state) and drain the three r10
    surfaces' REAL pipelines end-to-end. Expectation: wall grows far
    sublinearly off the micro-batch machinery floor — CEP state is
    watermark-bounded per key, MG state is <= m + |batch keys| rows,
    and the DQ auditor is one fused scan per batch regardless of rule
    count."""
    import datetime as _dt
    import shutil
    import tempfile

    from chesscom_etl_tableau_spark.streaming.dq_stream import streaming_dq_gate
    from chesscom_etl_tableau_spark.streaming.heavy_stream import (
        streaming_heavy_hitters,
    )
    from chesscom_etl_tableau_spark.streaming.pattern_stream import (
        streaming_pattern_matches,
    )

    spark = get_spark("scale-probe-r10")
    ev0 = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    n0 = ev0.count()

    def rep_events(copies):
        parts = [
            ev0.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
            .withColumn("event_id", F.col("event_id") + F.lit(i * 1_000_000_000))
            for i in range(copies)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out.localCheckpoint()

    def drain(build, sink, ckpt):
        q = (
            build()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", sink)
            .start()
        )
        q.awaitTermination()

    print(f"# streaming-surface scale probe ({sf_dir}, base events n={n0})")
    print(f"{'surface':<26}{'x1':>16}{'x2':>16}{'x4':>16}")
    rows = {"cep_drain": [], "dq_drain": [], "mg_drain": []}
    for copies in (1, 2, 4):
        ev = rep_events(copies)
        bounds = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
        mid = bounds["lo"] + (bounds["hi"] - bounds["lo"]) / 2

        with tempfile.TemporaryDirectory(prefix="sg_probe_cep_") as tmp:
            drop, sink, ckpt = f"{tmp}/drop", f"{tmp}/sink", f"{tmp}/ckpt"
            ev.where(F.col("ts") <= mid).coalesce(1).write.parquet(drop)
            ev.where(F.col("ts") > mid).coalesce(1).write.mode("append").parquet(drop)
            for days in (30, 60):
                spark.createDataFrame(
                    [(-1, -1, "noop", bounds["hi"] + _dt.timedelta(days=days))],
                    "user_id long, event_id long, event_type string, ts timestamp",
                ).coalesce(1).write.mode("append").parquet(drop)
            t0 = time.time()
            drain(
                lambda: streaming_pattern_matches(
                    spark.readStream.schema(
                        "event_id long, user_id long, ts timestamp, event_type string"
                    ).option("maxFilesPerTrigger", 1).parquet(drop),
                    ("signup", "view", "purchase"),
                    within_minutes=24 * 60,
                    watermark_delay="0 seconds",
                ),
                sink, ckpt,
            )
            n = spark.read.parquet(sink).where(F.col("user_id") >= 0).count()
            rows["cep_drain"].append(f"{time.time()-t0:.2f}s/{n}")

        with tempfile.TemporaryDirectory(prefix="sg_probe_dq_") as tmp:
            drop, report, ckpt = f"{tmp}/drop", f"{tmp}/report", f"{tmp}/ckpt"
            ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(drop)
            ev.where(F.col("event_id") % 2 != 0).coalesce(1).write.mode(
                "append"
            ).parquet(drop)
            t0 = time.time()
            q = streaming_dq_gate(
                spark.readStream.schema(
                    "event_id long, user_id long, ts timestamp, event_type string"
                ).option("maxFilesPerTrigger", 1).parquet(drop),
                report_path=report,
                checkpoint_path=ckpt,
                rules=dict(
                    unique_keys=["event_id"],
                    accepted_values={
                        "event_type": ["click", "view", "purchase", "signup"]
                    },
                    max_null_rate={"user_id": 0.5},
                ),
            )
            q.awaitTermination()
            n = spark.read.parquet(report).count()
            rows["dq_drain"].append(f"{time.time()-t0:.2f}s/{n}")

        with tempfile.TemporaryDirectory(prefix="sg_probe_mg_") as tmp:
            drop, state, ckpt = f"{tmp}/drop", f"{tmp}/state", f"{tmp}/ckpt"
            keyed = ev.select(
                "event_id",
                F.when(
                    F.col("user_id") % 3 == 0,
                    F.concat(F.lit("hot"), (F.col("user_id") % 2).cast("string")),
                )
                .otherwise(
                    F.concat(F.lit("cold"), (F.col("user_id") % 997).cast("string"))
                )
                .alias("k"),
            )
            keyed.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(drop)
            keyed.where(F.col("event_id") % 2 != 0).coalesce(1).write.mode(
                "append"
            ).parquet(drop)
            t0 = time.time()
            q = streaming_heavy_hitters(
                spark.readStream.schema("event_id long, k string")
                .option("maxFilesPerTrigger", 1)
                .parquet(drop),
                key_col="k",
                state_path=state,
                checkpoint_path=ckpt,
                m=8,
            )
            q.awaitTermination()
            rows["mg_drain"].append(f"{time.time()-t0:.2f}s/-")
    for name, r in rows.items():
        print(f"{name:<26}{r[0]:>16}{r[1]:>16}{r[2]:>16}")


def r11_probe(sf_dir: str) -> None:
    """Round-11 dedup/ANN candidate-growth probe (verdict-r10 ask #6):
    replicate the corpus x1/x2/x4 and record WALL + CANDIDATE counts
    for the banded/bucketed families — committed evidence that banding
    keeps candidate growth near-linear while the all-pairs space grows
    quadratically. Replication duplicates every document verbatim
    (ids shifted), so each doc gains `copies-1` exact twins — the
    adversarial case for banding: every twin pair IS a candidate, so
    the measured counts are an upper envelope for real near-dup rates."""
    import chesscom_etl_tableau_spark.operators.similarity as SIM

    spark = get_spark("scale-probe-r11")
    docs0 = load_table(spark, sf_dir, "documents")
    emb0 = load_table(spark, sf_dir, "embeddings")
    n_docs0, n_emb0 = docs0.count(), emb0.count()
    print(f"# dedup/ANN candidate-growth probe ({sf_dir}, docs={n_docs0}, emb={n_emb0})")
    print(f"{'op':<26}{'x1':>24}{'x2':>24}{'x4':>24}")

    rows: dict[str, list[str]] = {
        "minhash_lsh": [], "incremental_near": [], "ann_ivf": [], "ann_ivfpq": [],
    }
    for copies in (1, 2, 4):
        docs = replicate(docs0, "doc_id", copies).cache()
        emb = replicate(emb0, "vec_id", copies).cache()
        n_d, n_e = docs.count(), emb.count()

        # -- MinHash LSH: candidate pairs vs the n*(n-1)/2 all-pairs space
        sigs = D.minhash_signatures(docs, "text", "doc_id", 3, 16)
        cand = D.minhash_lsh_candidates(sigs, bands=4).count()
        sec, pairs = timed(
            lambda d, e: D.minhash_dedup_pairs(d, k=3, num_hashes=16, bands=4, threshold=0.5),
            docs, emb,
        )
        allp = n_d * (n_d - 1) // 2
        rows["minhash_lsh"].append(f"{sec:.2f}s c={cand} p={pairs} ap={allp}")

        # -- Incremental near-dup: batch-vs-corpus candidates vs |batch|x|corpus|
        corpus = docs.where(F.col("doc_id") % 5 != 4)
        batch = docs.where(F.col("doc_id") % 5 == 4)
        index = D.dedup_index_frame(corpus)
        bsig = D.minhash_signatures(batch, "text", "doc_id", 3, 16)
        bb = D._banded(bsig, 4).select(F.col("doc").alias("batch_id"), "band_id", "band_key")
        ib = D._banded(index.select(F.col("doc_id").alias("doc"), "signature"), 4).select(
            F.col("doc").alias("corpus_id"), "band_id", "band_key"
        )
        icand = bb.join(ib, ["band_id", "band_key"]).select("batch_id", "corpus_id").distinct().count()
        sec, ipairs = timed(
            lambda d, e: D.incremental_near_dup_pairs(
                d.where(F.col("doc_id") % 5 == 4),
                d.where(F.col("doc_id") % 5 != 4),
                D.dedup_index_frame(d.where(F.col("doc_id") % 5 != 4)),
                threshold=0.5,
            ),
            docs, emb,
        )
        nb, nc = batch.count(), corpus.count()
        rows["incremental_near"].append(f"{sec:.2f}s c={icand} p={ipairs} ap={nb * nc}")

        # -- IVF: rows actually scored (probed-bucket members) vs |q|x|corpus|
        qs = emb.where(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
        nq = qs.count()
        cents = SIM.ivf_build_centroids(emb, nlist=8, seed=42, corpus_rows=n_e)
        bucketed = SIM.assign_buckets(emb, cents, "vec_id", "embedding")
        # reconstruct the probe selection to count scored candidates
        cent = cents.select("centroid_id", F.col("embedding").alias("__cvec"))
        q2 = qs.select("query_id", F.col("embedding").alias("__qvec"))
        qc = q2.crossJoin(F.broadcast(cent)).select(
            "query_id", "centroid_id", SIM.cosine(F.col("__qvec"), F.col("__cvec")).alias("__sim")
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.round(F.col("__sim"), 6).desc(), F.col("centroid_id").asc()
        )
        probes = qc.withColumn("__rn", F.row_number().over(wq)).where(
            F.col("__rn") <= 2
        ).select("query_id", F.col("centroid_id").alias("bucket"))
        scored = bucketed.join(F.broadcast(probes), "bucket").count()
        sec, topk = timed(
            lambda d, e: SIM.ivf_topk(
                e, SIM.ivf_build_centroids(e, nlist=8, seed=42, corpus_rows=n_e),
                e.where(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding"),
                k=5, nprobe=2,
            ),
            docs, emb,
        )
        rows["ann_ivf"].append(f"{sec:.2f}s c={scored} p={topk} ap={nq * n_e}")

        # -- IVF-PQ: ADC-scored code rows (same probed-bucket fraction)
        sec, pqk = timed(
            lambda d, e: SIM.ivfpq_topk(
                e, e.where(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding"),
                k=5, nprobe=2, nlist=8, m=4, kcode=16, seed=42, dim=64,
                corpus_rows=n_e, ivf_max_iter=5, pq_max_iter=4,
            ),
            docs, emb,
        )
        rows["ann_ivfpq"].append(f"{sec:.2f}s c={scored} p={pqk} ap={nq * n_e}")

        docs.unpersist(), emb.unpersist()

    for name, r in rows.items():
        print(f"{name:<26}{r[0]:>30}{r[1]:>30}{r[2]:>30}")
    print("# c = candidate rows entering exact verify/scoring; p = result rows;")
    print("# ap = the all-pairs/brute-force space the banding avoided")


def r11b_probe(sf_dir: str) -> None:
    """Round-11 continuation probe: the three ops added after the
    verdict-ask work (pHash near-dup, global shard assignment, as-of
    directions) at x1/x2/x4, same conventions as r11_probe — wall +
    candidate counts where a banded join exists. pHash replication
    note: synth_phash derives each fixture image from its doc_id, so
    replicated ids are NEW images (corpus growth), not injected twins;
    candidate growth measured here is the organic band-collision rate."""
    from chesscom_etl_tableau_spark.operators.asof import asof_join_directions
    from chesscom_etl_tableau_spark.operators.multimodal import (
        phash_bands,
        phash_neardup_stats,
        synth_phash,
    )
    from chesscom_etl_tableau_spark.operators.training import shard_by_token_budget

    spark = get_spark("scale-probe-r11b")
    docs0 = load_table(spark, sf_dir, "documents")
    ev0 = load_table(spark, sf_dir, "events")
    n0 = docs0.count()
    print(f"# r11b probe ({sf_dir}, docs={n0}, events={ev0.count()})")
    print(f"{'op':<22}{'x1':>28}{'x2':>28}{'x4':>28}")
    rows: dict[str, list[str]] = {"phash_neardup": [], "shard_pack": [], "asof_nearest": []}
    for copies in (1, 2, 4):
        docs = replicate(docs0, "doc_id", copies).cache()
        n_d = docs.count()

        # pHash: band-join candidates vs the all-pairs space of the residue class
        sigs = synth_phash(docs).cache()
        n_s = sigs.count()
        bands = phash_bands(sigs)  # the operator's own band layout
        a, b = bands.alias("a"), bands.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.__band_i") == F.col("b.__band_i"))
                & (F.col("a.__band_v") == F.col("b.__band_v"))
                & (F.col("a.__id") < F.col("b.__id")),
            )
            .select("a.__id", "b.__id").distinct().count()
        )
        t0 = time.time()
        matched = phash_neardup_stats(sigs).where(F.col("n_partners") > 0).count()
        sec = time.time() - t0
        rows["phash_neardup"].append(
            f"{sec:.2f}s c={cand} m={matched} ap={n_s * (n_s - 1) // 2}"
        )
        sigs.unpersist()

        # global shard assignment: wall + shard count (must grow ~linearly)
        t0 = time.time()
        n_shards = (
            shard_by_token_budget(docs, budget=4096, bucket_width=64)
            .agg(F.countDistinct("shard_id")).first()[0]
        )
        rows["shard_pack"].append(f"{time.time() - t0:.2f}s shards={n_shards} docs={n_d}")

        # as-of nearest: wall over the replicated event stream
        ev = replicate(ev0, "event_id", copies).withColumn(
            "user_id", F.col("user_id") + (F.col("event_id") / 10_000_000).cast("long") * 10_000_000
        ).cache()
        left = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
        right = (
            ev.where(F.col("event_type") == "purchase")
            .groupBy("user_id", "ts").agg(F.max("value").alias("purchase_value"))
        )
        t0 = time.time()
        n_res = asof_join_directions(
            left, right, ["user_id"], payload_cols=["purchase_value"],
            direction="nearest", tolerance_s=3600,
        ).count()
        rows["asof_nearest"].append(f"{time.time() - t0:.2f}s rows={n_res}")
        ev.unpersist(), docs.unpersist()

    for name, r in rows.items():
        print(f"{name:<22}{r[0]:>28}{r[1]:>28}{r[2]:>28}")
    print("# c = band-join candidate pairs; m = docs with a partner;")
    print("# ap = the all-pairs space the banding avoided")


def r12_probe(sf_dir: str) -> None:
    """Round-12 probe: (a) ivf_append wall must stay FLAT as the
    persisted index grows x1/x2/x4 with a FIXED-size batch — the
    incremental contract is O(|batch|), never O(|index|) (existing
    partition files are neither read nor rewritten); (b) the
    duplicated-substring REMOVAL twin must scale like its measure
    sibling — near-linear in corpus tokens (k-dense explode + one df
    hash agg + per-doc bounded reassembly)."""
    import shutil
    import tempfile

    spark = get_spark("scale-probe-r12")
    docs0 = load_table(spark, sf_dir, "documents")
    emb0 = load_table(spark, sf_dir, "embeddings")
    n_e0 = emb0.count()
    print(f"# r12 probe ({sf_dir}, docs={docs0.count()}, emb={n_e0})")
    print(f"{'op':<26}{'x1':>26}{'x2':>26}{'x4':>26}")
    centroids = emb0.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    # fixed batch: ~1% of the base corpus, ids shifted clear of every
    # replica range so the append is pure growth
    batch = emb0.where(F.col("vec_id") % 101 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(900_000_000)
    ).cache()
    n_b = batch.count()
    rows: dict[str, list[str]] = {
        "ivf_append(fixed)": [],
        "substr_remove": [],
        "interleave": [],
    }
    for copies in (1, 2, 4):
        emb = replicate(emb0, "vec_id", copies).cache()
        n_e = emb.count()
        out = tempfile.mkdtemp(prefix="sg_r12_")
        try:
            path = f"{out}/ivf"
            SIM.ivf_persist(emb, centroids, path)
            t0 = time.time()
            SIM.ivf_append(spark, path, centroids, batch).count()
            sec = time.time() - t0
            rows["ivf_append(fixed)"].append(
                f"{sec:.2f}s idx={n_e} batch={n_b}"
            )
        finally:
            shutil.rmtree(out, ignore_errors=True)
        emb.unpersist()

        # replicate with per-copy token salting (prefix every token with
        # the copy index): plain replication makes each copy an exact
        # duplicate of the original, so EVERYTHING is removed and the
        # reassembly path idles — salted copies keep vocabularies
        # disjoint, so each copy carries the original's dup structure
        # and kept-token output scales with the corpus
        parts = [
            docs0.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
            .withColumn(
                "text", F.regexp_replace("text", r"([A-Za-z0-9]+)", f"c{i}$1")
            )
            for i in range(copies)
        ]
        docs = parts[0]
        for p in parts[1:]:
            docs = docs.unionAll(p)
        docs = docs.cache()
        docs.count()
        t0 = time.time()
        kept = (
            D.remove_duplicated_substrings(docs)
            .agg(F.sum("kept_tokens"), F.sum("n_tokens"))
            .first()
        )
        sec = time.time() - t0
        rows["substr_remove"].append(
            f"{sec:.2f}s kept={kept[0]}/{kept[1]}"
        )

        # interleaved sample assembly: flat wall, linear samples
        t0 = time.time()
        smp = (
            TR.interleave_multimodal_samples(docs)
            .agg(F.max("sample_id"), F.count(F.lit(1)))
            .first()
        )
        sec = time.time() - t0
        rows["interleave"].append(
            f"{sec:.2f}s samples={smp[0] + 1} items={smp[1]}"
        )
        docs.unpersist()
    for name, cells in rows.items():
        print(f"{name:<26}{cells[0]:>26}{cells[1]:>26}{cells[2]:>26}")




def r14_probe(sf_dir: str) -> None:
    """Refit scale probe (r13 verdict ask #6): under a x4-replicated
    corpus, show `ivf_refit_drifted_log` cost grows with the DRIFTED
    bucket membership, not the corpus size — provided the drift
    statistic arrives precomputed (the per-append deltas a production
    loop accumulates); the self-contained fallback's full residual
    scan is timed separately to document its linear cost.

    Method: sf0.1 embeddings replicated x1/x2/x4, IVF index over 8
    centroids, generation log init. Drift is FORCED on exactly D
    buckets by a synthetic baseline (0 for the chosen buckets — any
    residual drifts them; huge for the rest — they never drift), so D
    is an independent variable. Each refit runs against a fresh index
    copy (refits mutate centroids/generations).
    """
    import shutil
    import tempfile

    from chesscom_etl_tableau_spark.operators import index_log as IL

    spark = get_spark("refit-probe")
    emb0 = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    cents = emb0.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    ).localCheckpoint()
    print("scale  D_drifted  stat_scan_s  refit_s  moved_rows")
    for copies in (1, 2, 4):
        emb = replicate(emb0, "vec_id", copies).localCheckpoint()
        base = tempfile.mkdtemp(prefix=f"sg_refitprobe_x{copies}_")
        try:
            proto = f"{base}/proto"
            SIM.ivf_persist(emb, cents, proto)
            # the full-scan statistic cost (the fallback path): linear
            t0 = time.time()
            IL.index_log_init(proto, "bucket")
            cur = SIM.ivf_bucket_residuals(
                IL.index_log_read(spark, proto), cents
            ).localCheckpoint()
            stat_s = round(time.time() - t0, 2)
            rows = {r["bucket"]: r for r in cur.collect()}
            for d in (1, 2, 4):
                drifted = sorted(rows)[:d]
                baseline = spark.createDataFrame(
                    [
                        (b, 1, 0 if b in drifted else 10**12)
                        for b in sorted(rows)
                    ],
                    "bucket int, n_vectors long, mean_resid_micro long",
                )
                work = f"{base}/work_{d}"
                shutil.copytree(proto, work)
                t0 = time.time()
                _, got, _g = IL.ivf_refit_drifted_log(
                    spark, work, cents, baseline, cur_resid=cur
                )
                refit_s = round(time.time() - t0, 2)
                moved = sum(rows[b]["n_vectors"] for b in got)
                print(f"x{copies}     {d}          {stat_s}         {refit_s}     {moved}")
        finally:
            shutil.rmtree(base, ignore_errors=True)



def r15_probe(sf_dir: str) -> None:
    """Generation-log gc probe (r14 verdict ask #6): gc cost and
    reclaimed bytes vs retained-generation count, under maintenance
    histories of x1/x2/x4 length.

    Method: sf0.1 embeddings -> generation-logged IVF index (8
    centroids), then H maintenance cycles, each an append of a 1/32
    id-slice re-keyed to fresh ids followed by a full compaction —
    every cycle retires the previous cycle's files, so the history
    accumulates ~2 generations and one retired file set per cycle.
    gc(keep_last=K, min_age_sec=0) then reaps everything the newest K
    generations don't reference; wall time is LIST + unlink only (no
    Spark job — the probe pins that).

    The PINNED-READER-PAST-HORIZON failure mode is demonstrated
    explicitly: a reader pinned at a generation older than the
    retention horizon still resolves its file LIST from the (retained)
    doc, but the files are gone — the read fails loudly
    (FileNotFoundException / missing-files error), never silently
    returns partial data, because the manifest names exactly the
    files it expects. That is the Iceberg/Delta vacuum contract: set
    min_age_sec / keep_last longer than any reader pin.
    """
    import shutil
    import tempfile

    from chesscom_etl_tableau_spark.operators import index_log as IL

    spark = get_spark("gc-probe")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    ).localCheckpoint()
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    ).localCheckpoint()

    def disk_bytes(d):
        total = 0
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, f))
        return total

    print("history  gens  keep_last  gc_s  files_reaped  bytes_reaped  pinned_read_after_gc")
    for cycles in (8, 16, 32):
        base = tempfile.mkdtemp(prefix=f"sg_gcprobe_h{cycles}_")
        try:
            path = f"{base}/ivf"
            SIM.ivf_persist(emb, cents, path)
            IL.index_log_init(path, "bucket")
            for i in range(cycles):
                batch = emb.where(F.col("vec_id") % 32 == i % 32).select(
                    (F.col("vec_id") + (i + 1) * 10_000_000).alias("vec_id"),
                    "embedding",
                )
                IL.index_log_append(
                    spark, path, SIM.assign_buckets(batch, cents), "bucket"
                )
                IL.compact_index_log(spark, path, "bucket")
            gen, _ = IL.index_log_current(path)
            for keep in (gen, 4, 1):
                work = f"{base}/work{keep}"
                shutil.copytree(path, work)
                pre = disk_bytes(work)
                t0 = time.time()
                n = IL.index_log_gc(work, keep_last=keep, min_age_sec=0)
                gc_s = round(time.time() - t0, 3)
                reaped = pre - disk_bytes(work)
                # pinned reader at generation 2 (past the horizon
                # unless everything is retained): loud failure, never
                # silent partial data
                try:
                    IL.index_log_read(spark, work, 2).count()
                    pinned = "ok"
                except Exception:
                    pinned = "fails-loud" if keep < gen - 1 else "ok"
                print(
                    f"x{cycles // 8}({cycles})  {gen}    {keep}        "
                    f"{gc_s}  {n}       {reaped}      {pinned}"
                )
        finally:
            shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    if "--r15" in sys.argv:
        sys.argv.remove("--r15")
        r15_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--r14" in sys.argv:
        sys.argv.remove("--r14")
        r14_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--r12" in sys.argv:
        sys.argv.remove("--r12")
        r12_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--r11b" in sys.argv:
        sys.argv.remove("--r11b")
        r11b_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--r11" in sys.argv:
        sys.argv.remove("--r11")
        r11_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--r10" in sys.argv:
        sys.argv.remove("--r10")
        r10_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--r9" in sys.argv:
        sys.argv.remove("--r9")
        r9_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--r7" in sys.argv:
        sys.argv.remove("--r7")
        r7_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--graph2" in sys.argv:
        sys.argv.remove("--graph2")
        graph2_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--scd" in sys.argv:
        sys.argv.remove("--scd")
        scd_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--tpch" in sys.argv:
        sys.argv.remove("--tpch")
        tpch_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--cc" in sys.argv:
        sys.argv.remove("--cc")
        cc_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--triangles" in sys.argv:
        sys.argv.remove("--triangles")
        triangles_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--pagerank" in sys.argv:
        sys.argv.remove("--pagerank")
        pagerank_probe(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
        return
    if "--sessionize" in sys.argv:
        sessionize_probe()
        return
    if "--join" in sys.argv:
        join_probe()
        return
    only = None
    if "--only" in sys.argv:
        i = sys.argv.index("--only")
        only = set(sys.argv[i + 1].split(","))
        del sys.argv[i : i + 2]
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    docs0 = load_table(spark, sf_dir, "documents")
    emb0 = load_table(spark, sf_dir, "embeddings")

    print(f"{'op':<22}{'x1':>12}{'x2':>12}{'x4':>12}")
    ops = {
        "jaccard(0.5)": lambda d, e: D.ngram_jaccard_pairs(d, k=3, threshold=0.5),
        "minhash_lsh(0.5)": lambda d, e: D.minhash_dedup_pairs(d, k=3, num_hashes=16, bands=4, threshold=0.5),
        "simhash": lambda d, e: D.simhash(d),
        "embed_exact(0.4)": lambda d, e: SIM.embedding_cosine_pairs(e, threshold=0.4),
        "embed_lsh(0.4)": lambda d, e: SIM.embedding_lsh_pairs(e, threshold=0.4),
        "winnow(5,4)": lambda d, e: winnow_fingerprints(d),
        "components": lambda d, e: components_over_jaccard(d),
        "decontaminate": lambda d, e: TR.decontaminate(d, max_df=5),
        # round-5 continuation ops
        "semantic(nlist=4)": lambda d, e: SIM.semantic_dedup_pairs(
            e,
            e.where(F.col("vec_id") < 4).select(
                F.col("vec_id").alias("centroid_id"), "embedding"
            ),
            threshold=0.4,
        ),
        "dup_spans(k=8)": lambda d, e: D.duplicated_spans(d, k=8),
        "heavy_hitters(k=30)": lambda d, e: _hh(d),
        "surprisal": lambda d, e: _surprisal(d),
        # round-5 second-half ops
        "dsir(1024)": lambda d, e: _dsir(d),
        "bigram_lm": lambda d, e: _bigram(d),
        "dhash_neardup": lambda d, e: _dhash(d),
        "corpus_drift": lambda d, e: TR.corpus_drift(d, "src0", "src1"),
    }
    for name, build in ops.items():
        if only and not any(name.startswith(o) for o in only):
            continue
        row = []
        for copies in (1, 2, 4):
            docs = replicate(docs0, "doc_id", copies).cache()
            emb = replicate(emb0, "vec_id", copies).cache()
            docs.count(), emb.count()
            sec, n = timed(build, docs, emb)
            row.append(f"{sec:>8.2f}s/{n}")
            docs.unpersist(), emb.unpersist()
        print(f"{name:<22}{row[0]:>14}{row[1]:>14}{row[2]:>14}")


if __name__ == "__main__":
    main()
