"""Product quantization (operators/pq.py): lossless round-trip in the
exact-codebook configuration, code-shape invariants, Lloyd-codebook
determinism, and refined-search recall vs exact brute force."""

from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators import pq as PQ
from data_eng_taxi_ibis_dagster_spark.operators.similarity import (
    as_double,
    cosine_topk,
)
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


def test_exact_codebook_roundtrip_is_lossless(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    book = PQ.train_codebooks_exact(emb, m=8, dim=64)
    codes = PQ.pq_encode(emb, book, m=8, dim=64)
    recon = PQ.pq_reconstruct(codes, book)
    orig = emb.select(F.col("vec_id").alias("_id"),
                      as_double("embedding").alias("orig"))
    joined = recon.join(orig, "_id").select(
        "_id", (F.col("recon") == F.col("orig")).alias("same"))
    rows = joined.collect()
    assert len(rows) == 100
    assert all(r["same"] for r in rows)


def test_encode_shape_and_code_range(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    book = PQ.train_codebooks_lloyd(emb, m=8, dim=64, k=4, iters=1)
    assert book.count() == 8 * 4
    codes = PQ.pq_encode(emb, book, m=8, dim=64).toPandas()
    assert len(codes) == 50
    assert codes["codes"].map(len).eq(8).all()
    assert codes["codes"].map(lambda cs: all(0 <= c < 4 for c in cs)).all()


def test_lloyd_codebook_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(80)
    b1 = PQ.train_codebooks_lloyd(emb, m=4, dim=64, k=4, iters=2) \
        .orderBy("sub", "code").collect()
    b2 = PQ.train_codebooks_lloyd(emb, m=4, dim=64, k=4, iters=2) \
        .orderBy("sub", "code").collect()
    assert [tuple(r) for r in b1] == [tuple(r) for r in b2]


def test_pq_refined_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(queries, emb, k=10).toPandas()
    book = PQ.train_codebooks_lloyd(emb, m=8, dim=64, k=16, iters=2)
    approx = PQ.pq_topk(queries, emb, book, k=10, m=8, dim=64,
                        refine=8).toPandas()
    e = set(zip(exact["query_id"], exact["match_id"]))
    p = set(zip(approx["query_id"], approx["match_id"]))
    recall = len(e & p) / len(e)
    # uniform-random embeddings are PQ-hostile (no cluster structure);
    # the bar asserts shortlist+refine is functioning, not
    # vector-db-grade recall (0.86 observed at sf0.01)
    assert recall >= 0.6, f"PQ refined recall@10 = {recall:.2f}"
    # refined similarities are exact cosines of the original vectors
    merged = approx.merge(exact, on=["query_id", "match_id"],
                          suffixes=("_a", "_e"))
    assert (merged["cosine_sim_a"] == merged["cosine_sim_e"]).all()


def test_pq_exact_config_equals_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    book = PQ.train_codebooks_exact(emb, m=8, dim=64)
    pq = PQ.pq_topk(queries, emb, book, k=5, m=8, dim=64) \
        .orderBy("query_id", "rnk").toPandas()
    bf = cosine_topk(queries, emb, k=5) \
        .orderBy("query_id", "rnk").toPandas()
    assert pq[["query_id", "match_id", "rnk"]].values.tolist() == \
        bf[["query_id", "match_id", "rnk"]].values.tolist()
    assert (pq["cosine_sim"] == bf["cosine_sim"]).all()


def test_ivfpq_exact_config_equals_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    book = PQ.train_codebooks_exact(emb, m=8, dim=64)
    res = PQ.ivfpq_topk(queries, emb, book, n_centroids=4, nprobe=4,
                        k=5, m=8, dim=64) \
        .orderBy("query_id", "rnk").toPandas()
    bf = cosine_topk(queries, emb, k=5) \
        .orderBy("query_id", "rnk").toPandas()
    assert res[["query_id", "match_id", "rnk"]].values.tolist() == \
        bf[["query_id", "match_id", "rnk"]].values.tolist()
    assert (res["cosine_sim"] == bf["cosine_sim"]).all()


def test_ivfpq_index_partition_pruning(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    book = PQ.train_codebooks_exact(emb, m=8, dim=64)
    path = str(tmp_path / "ivfpq")
    PQ.write_ivfpq_index(emb, book, path, n_centroids=4)
    queries = emb.filter(F.col("vec_id") < 2)
    res = PQ.search_ivfpq_index(spark, path, queries, nprobe=1, k=5)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the probed list ids must reach the lists scan as a partition
    # filter — unprobed partitions are never read
    assert "PartitionFilters: [centroid_id" in plan.replace("#", " #") or \
        "centroid_id IN" in plan, plan[:2000]
    out = res.toPandas()
    assert set(out["query_id"]) == {0, 1}
    assert (out.groupby("query_id").size() == 5).all()


def test_ivfpq_index_search_matches_inmemory_exact_config(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").limit(150)
    book = PQ.train_codebooks_exact(emb, m=8, dim=64)
    path = str(tmp_path / "ivfpq2")
    PQ.write_ivfpq_index(emb, book, path, n_centroids=4)
    queries = emb.filter(F.col("vec_id") < 3)
    idx = PQ.search_ivfpq_index(spark, path, queries, nprobe=4, k=5) \
        .orderBy("query_id", "rnk").toPandas()
    mem = PQ.ivfpq_topk(queries, emb, book, n_centroids=4, nprobe=4,
                        k=5, m=8, dim=64) \
        .orderBy("query_id", "rnk").toPandas()
    assert idx[["query_id", "match_id", "rnk"]].values.tolist() == \
        mem[["query_id", "match_id", "rnk"]].values.tolist()


def test_pq_encode_plan_shape(spark, sf_dir):
    """The encode plan must move the corpus through a BROADCAST join
    against the codebook (never a shuffled join — the codebook is m·k
    rows) and reassemble with hash aggregates; the corpus-side
    exchanges carry only (id, sub, code) ints."""
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    book = PQ.train_codebooks_exact(emb, m=8, dim=64)
    codes = PQ.pq_encode(emb, book, m=8, dim=64)
    codes.collect()
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the codebook must never arrive via a shuffled (sort-merge) join
    assert "SortMergeJoin" not in plan


def test_ivfpq_search_reads_codes_not_vectors(spark, sf_dir, tmp_path):
    """The materialized-index search scan must read the code relation
    (match_id, codes) — the raw embedding column never appears in the
    lists scan's ReadSchema, which is the 32x I/O claim."""
    emb = load_table(spark, sf_dir, "embeddings").limit(150)
    book = PQ.train_codebooks_exact(emb, m=8, dim=64)
    path = str(tmp_path / "ivfpq3")
    PQ.write_ivfpq_index(emb, book, path, n_centroids=4)
    res = PQ.search_ivfpq_index(spark, path, emb.filter(F.col("vec_id") < 2),
                                nprobe=1, k=5)
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    code_scans = [ln for ln in plan.splitlines()
                  if "FileScan parquet" in ln and "codes" in ln]
    assert code_scans, plan[:1500]
    assert all("embedding" not in ln for ln in code_scans)


def test_lloyd_codebook_small_corpus_shrinks_k(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(3)
    book = PQ.train_codebooks_lloyd(emb, m=4, dim=64, k=16, iters=1)
    # only 3 seed vectors exist, so each subspace gets 3 centroids
    assert book.count() == 4 * 3


def test_adc_kernel_exact_config_equals_brute_force(spark, sf_dir):
    """The numpy lookup-table ADC backend with the lossless codebook
    and exact refinement must reproduce brute force exactly (final
    cosines come from the exact re-rank)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    book = PQ.train_codebooks_exact(emb, m=8, dim=64)
    adc = PQ.pq_topk_adc(queries, emb, book, k=5, m=8, dim=64,
                         refine=2).orderBy("query_id", "rnk").toPandas()
    bf = cosine_topk(queries, emb, k=5) \
        .orderBy("query_id", "rnk").toPandas()
    assert adc[["query_id", "match_id", "rnk"]].values.tolist() == \
        bf[["query_id", "match_id", "rnk"]].values.tolist()
    assert (adc["cosine_sim"] == bf["cosine_sim"]).all()


def test_adc_kernel_matches_join_backend_lloyd(spark, sf_dir):
    """Both PQ search backends implement the same semantics: with the
    same Lloyd codebook and refinement they must pick the same final
    top-k (exact re-rank makes the survivors' scores identical)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    book = PQ.train_codebooks_lloyd(emb, m=8, dim=64, k=16, iters=2)
    a = PQ.pq_topk_adc(queries, emb, book, k=10, m=8, dim=64,
                       refine=8).orderBy("query_id", "rnk").toPandas()
    j = PQ.pq_topk(queries, emb, book, k=10, m=8, dim=64,
                   refine=8).orderBy("query_id", "rnk").toPandas()
    assert a[["query_id", "match_id", "rnk"]].values.tolist() == \
        j[["query_id", "match_id", "rnk"]].values.tolist()
    assert (a["cosine_sim"] == j["cosine_sim"]).all()


def test_retrieval_stack_audit_equals_exact_composition(spark, sf_dir):
    """Identity-codebook stack ≡ the same composition with stage 2 as
    a plain full-precision re-rank (the PQ stage is provably lossless,
    so swapping it for exact cosine must not change a single row)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    book = PQ.train_codebooks_exact(emb, m=8, dim=64)
    got = PQ.retrieval_stack(queries, emb, book, m=8, dim=64,
                             shortlist=50, pq_keep=15, k=5).toPandas()
    assert set(got.columns) == {"query_id", "match_id", "maxsim", "rnk"}
    assert (got.groupby("query_id").size() <= 5).all()
    # stage-3 survivors must come from stage-1's prefix shortlist
    pre = cosine_topk(
        queries.select(
            "vec_id", F.slice(F.col("embedding"), 1, 16).alias("embedding")),
        emb.select(
            "vec_id", F.slice(F.col("embedding"), 1, 16).alias("embedding")),
        k=50).toPandas()
    short = set(zip(pre["query_id"], pre["match_id"]))
    assert set(zip(got["query_id"], got["match_id"])) <= short


def test_retrieval_stack_lloyd_recall_vs_lossless_stack(spark, sf_dir):
    """Production (Lloyd) stack vs the identity-codebook stack: the
    two differ ONLY in stage 2's quantization, so their top-5 overlap
    measures exactly the recall cost of the PQ approximation. (Recall
    vs the UNWINNOWED MaxSim answer is not asserted: on uniform-random
    fixtures single-vector cosine winnowing is near-uncorrelated with
    late-interaction ordering — measured 0.2 even with the lossless
    codebook — which is a property of structureless data, not of the
    pipeline; real embedding corpora have the cluster structure the
    winnow relies on.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    lloyd = PQ.train_codebooks_lloyd(emb, m=8, dim=64, k=16, iters=2)
    ident = PQ.train_codebooks_exact(emb, m=8, dim=64)
    got = PQ.retrieval_stack(queries, emb, lloyd, m=8, dim=64,
                             shortlist=50, pq_keep=15, k=5).toPandas()
    ref = PQ.retrieval_stack(queries, emb, ident, m=8, dim=64,
                             shortlist=50, pq_keep=15, k=5).toPandas()
    e = set(zip(ref["query_id"], ref["match_id"]))
    p = set(zip(got["query_id"], got["match_id"]))
    recall = len(e & p) / len(e)
    assert recall >= 0.6, f"stack Lloyd-vs-lossless recall@5 = {recall:.2f}"
    # stage 3 re-scores survivors in full precision, so scores of
    # common pairs are exact and identical across the two stacks
    merged = got.merge(ref, on=["query_id", "match_id"],
                       suffixes=("_l", "_e"))
    assert (merged["maxsim_l"] == merged["maxsim_e"]).all()
