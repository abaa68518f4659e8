"""Scratch probe (round 5): measure empirical recall/contract values for
the 8 rows-only queries before fixing their oracle contract floors."""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

import __spark_entry__ as E
from chesscom_etl_tableau_spark.operators import dedup as D
from chesscom_etl_tableau_spark.operators import similarity as SIM
from chesscom_etl_tableau_spark.session import get_spark

spark = get_spark("probe")

for sf in ["sf0.001", "sf0.01", "sf0.1"]:
    sf_dir = f"/root/testdata/{sf}"
    docs = E._t(spark, sf_dir, "documents")
    emb = E._t(spark, sf_dir, "embeddings")
    print(f"=== {sf} ===", flush=True)

    # minhash vs capped-exact ngram pairs
    exact = D.ngram_jaccard_pairs(docs, k=3, threshold=0.5).select(
        "doc_a", "doc_b", "jaccard"
    )
    lsh = D.minhash_dedup_pairs(docs, k=3, num_hashes=16, bands=4, threshold=0.5)
    j = exact.join(
        lsh.select("doc_a", "doc_b", F.lit(1).alias("f")), ["doc_a", "doc_b"], "left"
    )
    r = j.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("f").alias("n_found"),
        F.sum(F.when((F.col("jaccard") >= 1.0) & F.col("f").isNull(), 1).otherwise(0)).alias("ident_missed"),
    ).first()
    print(f"minhash: exact={r.n_exact} found={r.n_found} "
          f"recall={r.n_found / max(r.n_exact, 1):.3f} ident_missed={r.ident_missed}", flush=True)

    # embed lsh vs exact cosine pairs
    ce = SIM.embedding_cosine_pairs(emb, threshold=0.4)
    n, dim = E._emb_stats(sf_dir)
    el = SIM.embedding_lsh_pairs(emb, threshold=0.4, n_planes=SIM.lsh_planes_for(n), dim=dim)
    j2 = ce.join(el.select("id_a", "id_b", F.lit(1).alias("f")), ["id_a", "id_b"], "left")
    r2 = j2.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("f").alias("n_found"),
        F.sum(F.when((F.col("cosine_sim") >= 1.0) & F.col("f").isNull(), 1).otherwise(0)).alias("ident_missed"),
        F.sum(F.when(F.col("cosine_sim") >= 1.0, 1).otherwise(0)).alias("n_ident"),
    ).first()
    print(f"embed_lsh: exact={r2.n_exact} found={r2.n_found} "
          f"recall={r2.n_found / max(r2.n_exact, 1):.3f} ident={r2.n_ident} ident_missed={r2.ident_missed}", flush=True)

    # ivf recall per query (fixed + kmeans centroids)
    queries = emb.where(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    ex_tk = SIM.cosine_topk(emb, queries, k=5).select("query_id", "vec_id")
    for label, cents in [
        ("ivf_fixed", emb.where(F.col("vec_id") < 8).select(F.col("vec_id").alias("centroid_id"), "embedding")),
        ("ivf_kmeans", SIM.ivf_build_centroids(emb, nlist=8, seed=42)),
    ]:
        ap = SIM.ivf_topk(emb, cents, queries, k=5, nprobe=2).select("query_id", "vec_id", F.lit(1).alias("f"))
        rec = (
            ex_tk.join(ap, ["query_id", "vec_id"], "left")
            .groupBy("query_id")
            .agg((F.count("f") / F.count(F.lit(1))).alias("recall"))
            .orderBy("query_id")
            .collect()
        )
        print(f"{label}: " + " ".join(f"q{row.query_id}={row.recall:.2f}" for row in rec), flush=True)

    # pq recall + reconstruction error vs mean baseline
    books = SIM.pq_train(emb, m=8, k=16, seed=42)
    ap = SIM.pq_topk(emb, books, queries, k=5).select("query_id", "vec_id", F.lit(1).alias("f"))
    rec = (
        ex_tk.join(ap, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg((F.count("f") / F.count(F.lit(1))).alias("recall"))
        .orderBy("query_id")
        .collect()
    )
    print("pq_topk: " + " ".join(f"q{row.query_id}={row.recall:.2f}" for row in rec), flush=True)
    err = SIM.pq_reconstruction_error(emb, books).agg(F.avg("sq_error")).first()[0]
    dims = emb.select(F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"))
    base = dims.groupBy("pos").agg(F.var_pop("v").alias("vp")).agg(F.sum("vp")).first()[0]
    print(f"pq_error: mean_sq={err:.4f} mean_baseline={base:.4f} beats={err <= base}", flush=True)

    # incremental near: exact cross-set pairs (uncapped) vs lsh-found
    corpus = docs.where(F.col("doc_id") % 5 != 4)
    batch = docs.where(F.col("doc_id") % 5 == 4)
    index = D.dedup_index_frame(corpus)
    got = D.incremental_near_dup_pairs(batch, corpus, index, threshold=0.5)
    bsh = D._doc_shingles(batch, "text", "doc_id", 3)
    csh = D._doc_shingles(corpus, "text", "doc_id", 3)
    bs = bsh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_b"))
    cs = csh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_c"))
    inter = (
        bsh.select(F.col("doc").alias("batch_id"), "shingle")
        .join(csh.select(F.col("doc").alias("corpus_id"), "shingle"), "shingle")
        .groupBy("batch_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    exact_cross = (
        inter.join(bs.select(F.col("doc").alias("batch_id"), "n_b"), "batch_id")
        .join(cs.select(F.col("doc").alias("corpus_id"), "n_c"), "corpus_id")
        .withColumn("jaccard", F.round(F.try_divide(F.col("n_common") * F.lit(1.0), F.col("n_b") + F.col("n_c") - F.col("n_common")), 6))
        .where(F.col("jaccard") >= 0.5)
    )
    j3 = exact_cross.join(got.select("batch_id", "corpus_id", F.lit(1).alias("f")), ["batch_id", "corpus_id"], "left")
    r3 = j3.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("f").alias("n_found"),
        F.sum(F.when((F.col("jaccard") >= 1.0) & F.col("f").isNull(), 1).otherwise(0)).alias("ident_missed"),
    ).first()
    print(f"incr_near: exact={r3.n_exact} found={r3.n_found} "
          f"recall={r3.n_found / max(r3.n_exact, 1):.3f} ident_missed={r3.ident_missed}", flush=True)

    # simhash: identical-text pairs -> equal simhash + candidate found
    from chesscom_etl_tableau_spark.operators.text import word_tokens

    d2 = docs.where(F.size(word_tokens(F.col("text"))) > 0)
    m = d2.groupBy("text").agg(F.min("doc_id").alias("doc_a"))
    pairs = (
        d2.join(m, "text").where(F.col("doc_id") > F.col("doc_a"))
        .select("doc_a", F.col("doc_id").alias("doc_b"))
    )
    sim = D.simhash(docs)
    cands = D.simhash_candidates(sim).select("doc_a", "doc_b", F.lit(1).alias("f"))
    chk = (
        pairs.join(sim.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sa")), "doc_a")
        .join(sim.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sb")), "doc_b")
        .join(cands, ["doc_a", "doc_b"], "left")
    )
    r4 = chk.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("sa") == F.col("sb"), 1).otherwise(0)).alias("n_equal"),
        F.count("f").alias("n_cand"),
    ).first()
    print(f"simhash: pairs={r4.n_pairs} equal={r4.n_equal} cand={r4.n_cand}", flush=True)
print("DONE", flush=True)
