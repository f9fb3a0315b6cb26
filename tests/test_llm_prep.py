"""Behavioral tests for the last-mile LLM-prep operators
(plans/llm3.py): sequence packing, stratified sampling, hash split.
Value-level parity vs DuckDB is the driver harness's job; these assert
the operator *semantics* the oracle can't express (invariants over
packs/strata/splits)."""

import math

from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.plans.registry import get

BUDGET = 4096


def test_pack_sequences_invariants(spark, sf_dir):
    pdf = get("pack_sequences").builder(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf.n_tokens >= 1).all()
    # every document starts inside its pack's budget window
    assert (pdf.pack_offset >= 0).all() and (pdf.pack_offset < BUDGET).all()
    for lang, grp in pdf.groupby("lang"):
        grp = grp.sort_values("doc_id")
        # pack ids start at 0, never decrease, and never skip
        ids = grp.pack_id.tolist()
        assert ids[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(ids, ids[1:]))
        # cumulative-offset chunking: offset is cumsum of prior tokens mod budget
        cum = 0
        for _, row in grp.iterrows():
            assert row.pack_offset == cum % BUDGET
            assert row.pack_id == cum // BUDGET
            cum += row.n_tokens


def test_stratified_sample_exact_rate(spark, sf_dir):
    from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table

    sample = get("stratified_sample_label").builder(spark, sf_dir).toPandas()
    full = (load_table(spark, sf_dir, "embeddings")
            .groupBy("label").count().toPandas().set_index("label"))
    got = sample.groupby("label").size()
    for label, n in full["count"].items():
        # systematic every-10th starting at rank 1 → exactly ceil(n/10)
        assert got.get(label, 0) == math.ceil(n / 10), label


def test_train_test_split_deterministic_and_complete(spark, sf_dir):
    from data_eng_taxi_ibis_dagster_spark.sources.tables import load_table

    pdf = (get("train_test_split").builder(spark, sf_dir).toPandas()
           .set_index("split"))
    total = load_table(spark, sf_dir, "embeddings").sparkSession.read.parquet(
        f"{sf_dir}/documents.parquet").count()
    assert pdf.n_docs.sum() == total
    # split is a hash of doc_id → rerun is bit-identical
    pdf2 = (get("train_test_split").builder(spark, sf_dir).toPandas()
            .set_index("split"))
    assert pdf.equals(pdf2)
    # 90/10 intent: train strictly dominates (tiny fixtures wobble, the
    # multiplicative hash keeps it near 0.9 even at n≈50)
    if "test" in pdf.index:
        assert pdf.loc["train", "n_docs"] > pdf.loc["test", "n_docs"]
