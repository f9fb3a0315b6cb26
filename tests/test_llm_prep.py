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


def test_bpe_empty_word_segments_to_sentinel_only(spark):
    """Round-12 adversarial class pinned in-repo: consecutive-space
    text tokenizes to EMPTY words; the empty word must segment to just
    [EOW] (no phantom "" symbol) in both training state and apply —
    otherwise a ("", EOW) adjacency leaks into merge counting and the
    unit counts drift from the oracle's separator-replace twin."""
    from pyspark.sql import functions as F

    from data_eng_taxi_ibis_dagster_spark.operators import bpe as B
    from data_eng_taxi_ibis_dagster_spark.operators.text import tokens

    docs = spark.createDataFrame(
        [(1, "gap  gap   gap ab"), (2, "ab gap")], "doc_id int, text string")
    seg = B.segment_words(docs, tokens("text"), merges=[])
    by_w = {r["w"]: (r["syms"], r["n_units"]) for r in seg.collect()}
    assert by_w[""][0] == [B.EOW] and by_w[""][1] == 1
    assert by_w["ab"][0] == ["a", "b", B.EOW]
    # trainer state sees no ("", EOW) adjacency: the best merge over
    # this corpus must be a real character pair
    merges = B.learn_bpe_merges(docs, tokens("text"), n_merges=1)
    assert merges and merges[0][1] != ""


def test_mixture_resample_unknown_source_keeps_all(spark):
    """Round-12 adversarial class pinned in-repo: a source name with
    no numeric suffix is an unknown mixture key and keeps frac 1.0 —
    it must not ANSI-crash the job (poison-pill robustness)."""
    import pandas as pd

    from data_eng_taxi_ibis_dagster_spark.plans.registry import all_specs
    import tempfile, os
    d = tempfile.mkdtemp()
    pdf = pd.DataFrame({
        "doc_id": range(8),
        "text": ["t"] * 8,
        "lang": ["en"] * 8,
        "source": ["adv"] * 4 + ["src4"] * 4,
        "n_chars": [1] * 8,
    })
    pdf.to_parquet(os.path.join(d, "documents.parquet"))
    out = all_specs()["data_mixture_resample"].builder(spark, d).toPandas()
    row = out[out["source"] == "adv"].iloc[0]
    assert row["n_kept"] == 4  # frac 1.0: every unknown-source row kept
