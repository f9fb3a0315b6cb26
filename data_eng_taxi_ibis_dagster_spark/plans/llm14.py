"""The curation funnel: one declarative query that joins the per-doc
quality signals the registry already computes — Gopher rule flags,
heuristic quality score, exact substring-duplication fraction, bigram-
LM familiarity — into a final keep/drop verdict with the first failing
rule as the reason. This is the decision layer of a training-data
pipeline expressed as composition: the Spark side reuses the
registered builders as sub-plans, and the ORACLE side reuses their
oracle SQL as subqueries, so the funnel inherits the strict
verification of every signal it consumes.

Scale shape: every input is a per-doc relation keyed on doc_id; the
joins co-partition on that one key (at 100 TB the signals would be
computed in one multi-output pass or bucketed on doc_id — here
Catalyst arranges the shuffles and AQE coalesces), and the verdict is
row-local CASE logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Side-effect imports: register the signal queries so their specs are
# resolvable at module import time regardless of import order.
from data_eng_taxi_ibis_dagster_spark.plans import llm as _llm  # noqa: F401
from data_eng_taxi_ibis_dagster_spark.plans import llm4 as _llm4  # noqa: F401
from data_eng_taxi_ibis_dagster_spark.plans import llm13 as _llm13  # noqa: F401
from data_eng_taxi_ibis_dagster_spark.plans.registry import _REGISTRY, query

#: Documents whose duplicated-window fraction exceeds this are dropped.
_MAX_DUP_FRACTION = 0.5


def _sig(name: str) -> str:
    """The registered oracle SQL of a signal query, as a subquery."""
    return f"({_REGISTRY[name].oracle})"


@query(
    "curation_funnel",
    oracle=f"""
        SELECT g.doc_id,
               (g.keep AND q.verdict = 'keep'
                AND s.dup_fraction <= {_MAX_DUP_FRACTION}) AS keep_final,
               CASE WHEN NOT g.keep THEN 'gopher_rules'
                    WHEN q.verdict <> 'keep' THEN 'quality_score'
                    WHEN s.dup_fraction > {_MAX_DUP_FRACTION}
                        THEN 'duplication'
                    ELSE 'ok' END AS reason,
               q.quality, s.dup_fraction, f.familiarity
        FROM {_sig("quality_gopher_rules")} g
        JOIN {_sig("text_quality")} q USING (doc_id)
        JOIN {_sig("dedup_span_windows")} s USING (doc_id)
        JOIN {_sig("lm_bigram_familiarity")} f USING (doc_id)
    """,
    tags=("E12", "EXT"),
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final keep/drop curation decision per document, as the join of
    four independently-verified signal queries (Gopher rules, quality
    score, span-duplication fraction, LM familiarity) plus row-local
    verdict logic — the composition property the reference builds its
    whole pipeline story on (assets consuming assets), rendered as one
    Catalyst plan instead of materialized hops."""
    g = _REGISTRY["quality_gopher_rules"].builder(spark, sf_dir) \
        .select("doc_id", "keep")
    q = _REGISTRY["text_quality"].builder(spark, sf_dir) \
        .select("doc_id", "quality", "verdict")
    s = _REGISTRY["dedup_span_windows"].builder(spark, sf_dir) \
        .select("doc_id", "dup_fraction")
    f = _REGISTRY["lm_bigram_familiarity"].builder(spark, sf_dir) \
        .select("doc_id", "familiarity")
    keep_final = (F.col("keep") & (F.col("verdict") == "keep")
                  & (F.col("dup_fraction") <= _MAX_DUP_FRACTION))
    reason = (
        F.when(~F.col("keep"), "gopher_rules")
        .when(F.col("verdict") != "keep", "quality_score")
        .when(F.col("dup_fraction") > _MAX_DUP_FRACTION, "duplication")
        .otherwise("ok")
    )
    return (
        g.join(q, "doc_id").join(s, "doc_id").join(f, "doc_id")
        .select("doc_id", keep_final.alias("keep_final"),
                reason.alias("reason"), "quality", "dup_fraction",
                "familiarity")
    )
