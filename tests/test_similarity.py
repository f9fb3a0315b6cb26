"""E11 operator behavior: exact top-k sanity and SRP-LSH recall."""

from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators.similarity import (
    ann_topk_srp,
    cosine_topk,
)
from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table


def test_cosine_topk_shape_and_order(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    res = cosine_topk(emb.filter(F.col("vec_id") < 3), emb, k=5).toPandas()
    assert set(res["query_id"]) == {0, 1, 2}
    for qid, grp in res.groupby("query_id"):
        grp = grp.sort_values("rnk")
        assert list(grp["rnk"]) == [1, 2, 3, 4, 5]
        assert grp["cosine_sim"].is_monotonic_decreasing
        assert (grp["match_id"] != qid).all()
        assert (grp["cosine_sim"].abs() <= 1.0 + 1e-12).all()


def test_self_similarity_is_one(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    res = cosine_topk(emb.filter(F.col("vec_id") < 3),
                      emb.withColumn("vec_id", F.col("vec_id") + 100000), k=1)
    # corpus contains the same vectors under shifted ids → top-1 sim ≈ 1
    top = res.toPandas()
    assert (top["cosine_sim"] > 0.999999).all()


def test_ann_srp_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(queries, emb, k=10).toPandas()
    approx = ann_topk_srp(queries, emb, k=10).toPandas()
    exact_pairs = set(zip(exact["query_id"], exact["match_id"]))
    approx_pairs = set(zip(approx["query_id"], approx["match_id"]))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # random uniform embeddings are ANN-hostile; the bar asserts the
    # bucketing is functioning (4 planes × 8 tables ⇒ ~0.55 here), not
    # vector-db-grade recall
    assert recall >= 0.35, f"SRP ANN recall@10 = {recall:.2f}"
    # every reported similarity must be exact (re-ranking is exact cosine)
    merged = approx.merge(exact, on=["query_id", "match_id"],
                          suffixes=("_a", "_e"))
    assert (merged["cosine_sim_a"] == merged["cosine_sim_e"]).all()


def test_pca_spectral_properties(spark, sf_dir):
    """Power iteration must recover genuine eigenpairs of the exact
    covariance: Cv ≈ λv, components orthonormal, λ1 ≥ λ2 ≥ max
    diagonal-variance-after-deflation, and the projected scores'
    population variance equals the eigenvalue."""
    import numpy as np

    from data_eng_taxi_ibis_dagster_spark.operators.similarity import (
        covariance_sums,
        pca_top_components,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    comps, eigs, mean = pca_top_components(emb, n_components=2)
    v1, v2 = np.array(comps[0]), np.array(comps[1])
    assert abs(np.linalg.norm(v1) - 1) < 1e-9
    assert abs(np.linalg.norm(v2) - 1) < 1e-9
    assert abs(v1 @ v2) < 1e-6
    assert eigs[0] >= eigs[1] > 0

    # rebuild the covariance matrix the same way the operator does
    pairs, dims = covariance_sums(emb)
    drows = dims.collect()
    d, n = len(drows), int(drows[0]["n_vec"])
    s = np.zeros(d)
    for r in drows:
        s[r["i"] - 1] = float(r["si"])
    cov = np.zeros((d, d))
    for r in pairs.collect():
        i, j = r["i"] - 1, r["j"] - 1
        cov[i, j] = cov[j, i] = (
            (n * float(r["sij"]) - s[i] * s[j]) / (n * n) / 1e12)
    # eigenpair residual
    assert np.linalg.norm(cov @ v1 - eigs[0] * v1) < 1e-6 * max(eigs[0], 1)
    # top eigenvalue dominates every single-dimension variance
    assert eigs[0] >= cov.diagonal().max() - 1e-12

    # projected population variance == eigenvalue (PCA's defining prop)
    from data_eng_taxi_ibis_dagster_spark.plans.llm13 import (
        embedding_pca_project,
    )
    proj = embedding_pca_project(spark, sf_dir).toPandas()
    assert abs(proj["pc1"].var(ddof=0) - eigs[0]) < 1e-6 * eigs[0] + 1e-9
    assert abs(proj["pc2"].var(ddof=0) - eigs[1]) < 1e-6 * eigs[1] + 1e-9
    # deterministic: a second build must produce identical components
    comps2, eigs2, _ = pca_top_components(emb, n_components=2)
    assert comps2 == comps and eigs2 == eigs


def test_semdedup_flags_exact_copies(spark, sf_dir):
    """Every id-shifted exact copy must be flagged as a duplicate of a
    lower-id vector in its cluster (identical vectors always co-cluster
    under the deterministic argmin), and no keeper may have a flagged
    lower-id twin it missed at cosine 1.0."""
    from data_eng_taxi_ibis_dagster_spark.operators.similarity import semdedup

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    doubled = emb.unionByName(
        emb.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"))
    res = semdedup(doubled, threshold=0.95, k=4, iters=2).toPandas()

    n = emb.count()
    assert len(res) == 2 * n
    copies = res[res["vec_id"] >= 1_000_000]
    # exact copies have a cosine-1.0 lower-id twin in the same cluster
    assert copies["is_dup"].all()
    # dup_of must point at a strictly lower id
    dups = res[res["is_dup"]]
    assert (dups["dup_of"] < dups["vec_id"]).all()
    # every copy is flagged, so keepers can only be original-range ids
    keepers = res[~res["is_dup"]]
    assert len(keepers) > 0
    assert (keepers["vec_id"] < 1_000_000).all()


def test_semdedup_deterministic(spark, sf_dir):
    from data_eng_taxi_ibis_dagster_spark.operators.similarity import semdedup

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = semdedup(emb, threshold=0.9, k=4, iters=2).orderBy("vec_id").toPandas()
    b = semdedup(emb, threshold=0.9, k=4, iters=2).orderBy("vec_id").toPandas()
    assert a.equals(b)


def test_semdedup_threshold_monotone(spark, sf_dir):
    """A looser threshold can only flag a superset of vectors."""
    from data_eng_taxi_ibis_dagster_spark.operators.similarity import semdedup

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    doubled = emb.unionByName(
        emb.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"))
    tight = semdedup(doubled, threshold=0.99, k=4, iters=2).toPandas()
    loose = semdedup(doubled, threshold=0.80, k=4, iters=2).toPandas()
    tight_dups = set(tight[tight["is_dup"]]["vec_id"])
    loose_dups = set(loose[loose["is_dup"]]["vec_id"])
    assert tight_dups <= loose_dups


def test_srp_plane_literal_matches_expression(spark):
    """The SRP plane family is inlined as evaluated array literals for
    analysis speed (operators/similarity._plane_array); the inlining
    is only sound if the cached values equal the original
    xxhash64-expression components exactly — pin that equivalence for
    a sample of planes, including ones the registered configs use."""
    from data_eng_taxi_ibis_dagster_spark.operators import similarity as S

    for plane in (0, 7, 31):
        lit_vals = spark.range(1).select(
            S._plane_array(plane, 64).alias("a")).collect()[0]["a"]
        expr_vals = spark.range(1).select(
            F.array(*[S._plane_component(plane, d) for d in range(64)])
            .alias("a")).collect()[0]["a"]
        assert lit_vals == expr_vals


def test_cosine_total_on_zero_and_subnormal_vectors(spark):
    """Round-12 adversarial class pinned in-repo: a zero-norm side
    (all-zero vector, or all-subnormal whose squares underflow to 0)
    yields cosine 0.0 on BOTH engines instead of an ANSI
    DIVIDE_BY_ZERO / engine-dependent NaN — one poison row must not
    kill a trillion-row ANN job, and both renderings must agree."""
    import duckdb

    from pyspark.sql import functions as F

    from data_eng_taxi_ibis_dagster_spark.operators.similarity import (
        as_double, cosine, cosine_with_norms, l2_norm, sql_cosine,
    )

    rows = [
        (1, [0.0] * 4),          # zero vector
        (2, [5e-324] * 4),       # squares underflow -> norm 0
        (3, [-0.0, 0.0, -0.0, 0.0]),
        (4, [1.0, 2.0, 3.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    q = [1.0, 1.0, 1.0, 1.0]
    got = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id",
            cosine(as_double("v"), F.lit(q)).alias("c")).collect()
    }
    assert got[1] == 0.0 and got[2] == 0.0 and got[3] == 0.0
    assert abs(got[4] - 0.9128709291752769) < 1e-15
    # precomputed-norm variant agrees
    got2 = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id",
            cosine_with_norms(as_double("v"), F.lit(q),
                              l2_norm(as_double("v")),
                              l2_norm(F.lit(q))).alias("c")).collect()
    }
    assert got == got2
    # DuckDB rendering agrees bit-for-bit on every case
    con = duckdb.connect()
    for vid, v in rows:
        want = con.execute(
            f"SELECT {sql_cosine('a', 'b')} FROM (SELECT "
            f"{list(v)}::DOUBLE[] AS a, {q}::DOUBLE[] AS b)"
        ).fetchone()[0]
        assert got[vid] == want, (vid, got[vid], want)
