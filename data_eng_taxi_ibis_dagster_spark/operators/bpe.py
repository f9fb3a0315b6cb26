"""BPE tokenizer training (byte-pair-encoding merge learning) as
DataFrame rounds — the canonical LLM-data operator this family was
missing alongside token *counting* (operators/text.py).

Scale shape (how real trainers work too): the corpus is touched ONCE —
a token-frequency aggregate whose output is vocabulary-sized — and the
iterative merge learning runs entirely on that bounded (word, count)
relation. At 100 TB the corpus scan/shuffle dominates and happens once;
each merge round costs one explode + one aggregate over the vocab
(thousands-to-millions of rows, never the corpus), plus a 1-row argmax
to the driver (the merge rule itself — the trained artifact is
intrinsically driver-sized).

Determinism: pair selection breaks ties by (count desc, left asc,
right asc); counts are integer. Same corpus ⇒ identical merge table,
run after run, any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: End-of-word sentinel (classic BPE role of "</w>"). A PRIVATE-USE
#: character rather than the classic markup string: merged symbols are
#: concatenations of corpus characters, so a corpus containing
#: '<','/','w','>' could literally rebuild "</w>" and silently corrupt
#: boundary statistics — an alphabet-external character cannot be
#: reconstructed. It is also stripped from input words defensively.
EOW = ""


def _merge_pair(symbols: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbol
    pairs inside one symbol array — a single fold, no UDF. 'aaa' under
    (a,a) becomes ('aa','a'), matching reference BPE."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.lit(None).cast("array<string>"),
        lambda acc, x: F.when(acc.isNull(), F.array(x)).otherwise(
            F.when(
                (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(merged))),
            ).otherwise(F.concat(acc, F.array(x)))
        ),
    )


def word_freq(docs: DataFrame, tokens_col) -> DataFrame:
    """The single corpus-scale step: (word, count) via explode+agg."""
    return (
        docs.select(F.explode(tokens_col).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_state(docs: DataFrame, tokens_col) -> DataFrame:
    vocab = word_freq(docs, tokens_col)
    return vocab.select(
        "cnt",
        F.concat(
            # defensive sentinel strip (see EOW), then characters;
            # array_remove drops the phantom "" symbol Spark's split
            # yields for an EMPTY word (consecutive-space tokenization,
            # round-12 adversarial fixture) — the empty word segments
            # to just the sentinel, so it can never feed a ("", EOW)
            # adjacency into merge training
            F.array_remove(
                F.split(F.regexp_replace(F.col("w"), EOW, ""), ""), ""),
            F.array(F.lit(EOW)),
        ).alias("syms"),
    )


def learn_bpe_merges(docs: DataFrame, tokens_col, *,
                     n_merges: int = 10,
                     checkpoint_every: int = 4,
                     return_state: bool = False):
    """Learn ``n_merges`` BPE merge rules. Returns
    ``[(rank, left, right, merged, pair_count), …]`` — the trained
    artifact (driver-sized by nature, like k-means centroids) — or,
    with ``return_state``, ``(merges, state)`` where ``state`` is the
    final vocabulary-sized ``(cnt, syms)`` relation (saves consumers a
    corpus re-scan + merge replay when they need segmentations).
    """
    # materialize the vocab-sized state ONCE: this is the single
    # corpus-scale action; every merge round's lineage is rooted here,
    # not at the parquet scan (lazy checkpoint would leave rounds
    # before the first truncation re-scanning the corpus)
    state = _initial_state(docs, tokens_col).localCheckpoint(eager=True)
    merges: list[tuple] = []
    for rank in range(n_merges):
        pairs = state.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.col("syms"),
                    F.slice(F.col("syms"), 2,
                            F.greatest(F.size("syms") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        ).filter(F.col("p.r").isNotNull())
        best = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc())
            .first()
        )
        if best is None or best["n"] < 2:
            break  # vocabulary exhausted — nothing left worth merging
        merges.append((rank, best["l"], best["r"],
                       best["l"] + best["r"], best["n"]))
        state = state.withColumn(
            "syms", _merge_pair(F.col("syms"), best["l"], best["r"]))
        if (rank + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=False)
    return (merges, state) if return_state else merges


def segment_words(docs: DataFrame, tokens_col,
                  merges: list[tuple]) -> DataFrame:
    """Apply a learned merge table: per distinct word, its BPE symbol
    segmentation (merges replayed in rank order — the same fold the
    trainer used, so train/apply can never disagree). Vocabulary-sized
    output; joining it back to a corpus is a broadcast join on the
    word."""
    out = docs.select(F.explode(tokens_col).alias("w")).distinct().select(
        "w",
        F.concat(
            # same phantom-"" drop as _initial_state: train/apply must
            # share one segmentation function
            F.array_remove(
                F.split(F.regexp_replace(F.col("w"), EOW, ""), ""), ""),
            F.array(F.lit(EOW)),
        ).alias("syms"),
    )
    for _, left, right, _, _ in merges:
        out = out.withColumn("syms", _merge_pair(F.col("syms"), left, right))
    return out.select("w", "syms", F.size("syms").alias("n_units"))
