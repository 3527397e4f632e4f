"""Composed training-data curation pipeline — the end-to-end shape a
100 TB corpus actually runs: exact dedup → quality gate → language
filter, as ONE declarative DAG.

Catalyst shares the scan across stages; the only shuffles are the
dedup's single hash-groupBy and the final semi-join of keepers back to
the corpus. Every stage is an operator already oracle-verified in
isolation (q30/q32/q33), so the composition's oracle is their SQL
composition — no new semantics, just the plumbing a real pipeline
needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphsense_blocksci_spark.operators.text_analysis import (
    language_id,
    quality_score,
)
from graphsense_blocksci_spark.operators.text_dedup import exact_dedup


def curate(
    docs: DataFrame,
    keep_langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The kept corpus: one surviving doc per exact-content class
    (lowest id wins), passing the quality gate, in an accepted
    language. Returns (doc_id, lang_pred, n_tokens, n_dups)."""
    keepers = exact_dedup(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col), "n_dups"
    )
    quality = quality_score(docs, text_col, id_col).filter(F.col("quality_ok"))
    lang = language_id(docs, text_col, id_col).filter(
        F.col("lang_pred").isin(*keep_langs)
    )
    return (
        keepers.join(quality.select(id_col, "n_tokens"), id_col)
        .join(lang.select(id_col, "lang_pred"), id_col)
        .select(id_col, "lang_pred", "n_tokens", "n_dups")
    )


def curation_report(
    docs: DataFrame,
    keep_langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Funnel counts per language for the kept corpus — the summary a
    curation run reports."""
    kept = curate(docs, keep_langs, text_col, id_col)
    return kept.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_dups").alias("dups_absorbed"),
    )
