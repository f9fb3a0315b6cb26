"""BPE merge learning: classic-example correctness, greedy merge
semantics, early stop, and train/apply consistency."""

from pyspark.sql import functions as F

from data_eng_taxi_ibis_dagster_spark.operators.bpe import (
    EOW,
    _merge_pair,
    learn_bpe_merges,
    segment_words,
)


def _toks():
    return F.split(F.col("text"), " ")


def test_bpe_learns_classic_merges(spark):
    docs = spark.createDataFrame(
        [(1, "low low low lower lowest new newer newest"),
         (2, "low lower newer newer")], ["doc_id", "text"])
    merges = learn_bpe_merges(docs, _toks(), n_merges=8)
    assert [m[:1] + m[1:4] for m in merges][0] == (0, "l", "o", "lo")
    # 'low' appears 4+... 'lo'(7) then 'low'(7) must be the top merges
    assert (merges[0][1], merges[0][2]) == ("l", "o")
    assert (merges[1][1], merges[1][2]) == ("lo", "w")
    # counts are total corpus frequencies
    assert merges[0][4] == 7
    seg = {r["w"]: (list(r["syms"]), r["n_units"])
           for r in segment_words(docs, _toks(), merges).collect()}
    # fully-merged frequent words collapse to few units
    assert seg["low"][1] <= 2
    assert seg["lowest"][0][0] == "low"  # shares the learned stem


def test_bpe_greedy_left_to_right(spark):
    df = spark.createDataFrame([(["a", "a", "a", EOW],)], ["syms"])
    got = df.select(_merge_pair(F.col("syms"), "a", "a").alias("m")).first()["m"]
    assert got == ["aa", "a", EOW]  # not ["a","aa",...] and no double merge


def test_bpe_stops_when_exhausted(spark):
    docs = spark.createDataFrame([(1, "ab")], ["doc_id", "text"])
    merges = learn_bpe_merges(docs, _toks(), n_merges=50)
    # every pair occurs once (< 2) → nothing learned
    assert merges == []


def test_bpe_sentinel_unreconstructible(spark):
    """Markup-heavy corpora ('</w>' as real characters) must not
    corrupt word boundaries: the sentinel is an alphabet-external
    private-use char, so merges can never rebuild it, and every word's
    symbol list ends with exactly one sentinel."""
    docs = spark.createDataFrame(
        [(1, "</w> </w> </w> a</w>b a</w>b a</w>b")], ["doc_id", "text"])
    merges = learn_bpe_merges(docs, _toks(), n_merges=12)
    seg = segment_words(docs, _toks(), merges).collect()
    for r in seg:
        syms = list(r["syms"])
        assert syms[-1].endswith(EOW)
        assert sum(s.count(EOW) for s in syms) == 1, syms
    # learned symbols never equal the bare sentinel
    for _, left, right, merged, _ in merges:
        assert EOW not in (left, right) or merged.endswith(EOW)


def test_bpe_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} shared shared") for i in range(40)],
        ["doc_id", "text"])
    a = learn_bpe_merges(docs, _toks(), n_merges=6)
    b = learn_bpe_merges(docs.repartition(13), _toks(), n_merges=6)
    assert a == b


def test_bpe_encode_corpus_invariants(spark, sf_dir):
    """The registered encode query: every doc appears once, unit counts
    bound below by token counts (each word ≥ 1 unit) and above by the
    unmerged character+sentinel count, and the ratio column is exactly
    units/tokens."""
    from data_eng_taxi_ibis_dagster_spark.plans.registry import get

    pdf = get("bpe_encode_corpus").builder(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(pdf) == docs
    assert pdf["doc_id"].is_unique
    assert (pdf["n_bpe_units"] >= pdf["n_tokens"]).all()
    assert (pdf["units_per_token"]
            == pdf["n_bpe_units"] / pdf["n_tokens"]).all()
    # merges actually fired: compression beats the char+sentinel ceiling
    chars = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .select((F.length("w") + 1).alias("c"))
        .agg(F.sum("c")).collect()[0][0]
    )
    assert pdf["n_bpe_units"].sum() < chars
