"""Composable corpus-curation pipeline: chain the engine's filter /
dedup / select / transform operators declaratively and (optionally) get
a per-stage attrition report.

This is the user-facing shape of the LLM-data surface: instead of
hand-wiring ``gopher_quality`` into ``line_dedup`` into
``quality_select_top``, declare the stages and run them::

    from sales_data_warehouse_spark import pipeline as P

    clean, report = P.run_pipeline(
        docs,
        [
            P.gopher_filter(),
            P.line_dedup_stage(),
            P.exact_dedup_stage(),
            P.quality_top_stage(keep_permille=500),
        ],
        report=True,
    )

Design notes (scale-first):

* A stage is ``(name, DataFrame -> DataFrame)`` — pure plan
  transformations. With ``report=False`` (default) the whole pipeline
  stays ONE lazy Catalyst plan: no counts, no materialization, stages
  fuse across whole-stage codegen exactly as if hand-written.
* ``report=True`` persists each stage boundary and counts it — one
  action per stage. That is the debugging/curation-audit mode; the
  counts are real (not estimates), the cache keeps each stage from
  re-executing its upstream per count, and each boundary's cache is
  unpersisted as soon as the next stage materializes, so live copies
  stay bounded at two regardless of pipeline length.
* Stages must preserve the document contract: a ``doc_id`` column and
  a ``text`` column survive every stage (enforced loudly), extra
  columns may come and go.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

Stage = tuple[str, Callable[[DataFrame], DataFrame]]


def gopher_filter() -> Stage:
    """Keep only documents passing the Gopher rule set."""
    from sales_data_warehouse_spark.operators.text import gopher_quality

    def apply(docs: DataFrame) -> DataFrame:
        # left_semi on ids (same pattern as every filter stage): an
        # inner join would leak/clash the verdict columns when the
        # input already carries one with the same name
        keep = (
            gopher_quality(docs)
            .filter(F.col("passes"))
            .select("doc_id")
        )
        return docs.join(keep, "doc_id", "left_semi")

    return ("gopher_filter", apply)


def quality_logit_filter(threshold_milli: int = 0) -> Stage:
    """Keep documents whose integer quality logit clears a threshold."""
    from sales_data_warehouse_spark.operators.text import quality_logit

    def apply(docs: DataFrame) -> DataFrame:
        keep = (
            quality_logit(docs)
            .filter(F.col("logit_milli") >= threshold_milli)
            .select("doc_id")
        )
        return docs.join(keep, "doc_id", "left_semi")

    return ("quality_logit_filter", apply)


def _rewrite_text(
    docs: DataFrame, rewritten: DataFrame, text_col: str
) -> DataFrame:
    """Swap the text column for an operator's rewritten version
    ((doc_id, <text_col>) frame), drop docs the rewrite emptied, and
    refresh n_chars when present — the one definition of the
    rewrite-stage plumbing (line dedup + span mask share it)."""
    out = (
        docs.drop("text")
        .join(rewritten.select("doc_id", text_col), "doc_id")
        .withColumnRenamed(text_col, "text")
        .filter(F.length("text") > 0)
    )
    if "n_chars" in out.columns:
        out = out.withColumn("n_chars", F.length("text").cast("bigint"))
    return out


def line_dedup_stage(
    max_doc_freq: int = 1, min_line_chars: int = 10
) -> Stage:
    """Strip boilerplate lines; text is REWRITTEN (n_chars refreshed),
    documents left empty by the strip are dropped."""
    from sales_data_warehouse_spark.operators.dedup import line_dedup

    def apply(docs: DataFrame) -> DataFrame:
        cleaned = line_dedup(
            docs, max_doc_freq=max_doc_freq,
            min_line_chars=min_line_chars,
        )
        return _rewrite_text(docs, cleaned, "text_clean")

    return ("line_dedup", apply)


def span_mask_stage(k: int = 10, min_count: int = 2) -> Stage:
    """Mask repeated k-token spans; text is REWRITTEN, emptied docs
    dropped."""
    from sales_data_warehouse_spark.operators.dedup import (
        repeated_span_mask,
    )

    def apply(docs: DataFrame) -> DataFrame:
        masked = repeated_span_mask(docs, k=k, min_count=min_count)
        return _rewrite_text(docs, masked, "text_masked")

    return ("span_mask", apply)


def exact_dedup_stage() -> Stage:
    """Keep one canonical copy (lowest id) per exact text duplicate."""
    from sales_data_warehouse_spark.operators.dedup import exact_duplicates

    def apply(docs: DataFrame) -> DataFrame:
        keep = exact_duplicates(docs).select(
            F.col("canonical_id").alias("doc_id")
        )
        return docs.join(keep, "doc_id", "left_semi")

    return ("exact_dedup", apply)


def quality_top_stage(keep_permille: int = 300) -> Stage:
    """Keep the top keep_permille/1000 by quality logit (histogram
    threshold — see ``sampling.quality_select_top``)."""
    from sales_data_warehouse_spark.operators.sampling import (
        quality_select_top,
    )

    def apply(docs: DataFrame) -> DataFrame:
        keep = quality_select_top(
            docs, keep_permille=keep_permille
        ).select("doc_id")
        return docs.join(keep, "doc_id", "left_semi")

    return ("quality_top", apply)


def run_pipeline(
    docs: DataFrame,
    stages: list[Stage],
    report: bool = False,
) -> tuple[DataFrame, list[dict]]:
    """Apply ``stages`` in order. Returns ``(result, stage_report)``;
    the report is empty unless ``report=True`` (each entry:
    {stage, docs_in, docs_out, dropped}). Stages must preserve the
    ``doc_id``/``text`` contract — violations fail immediately with
    the offending stage named.
    """
    out = docs
    rows: list[dict] = []
    n_in = None
    if report:
        # ONE materialization of the input via persist+count. persist
        # goes through the CacheManager, so each stage boundary can be
        # RELEASED with unpersist() once the next stage is
        # materialized — localCheckpoint blocks live on the RDD outside
        # the CacheManager and unpersist() on the DataFrame is a no-op
        # there (blocks only free via ContextCleaner after GC).
        # `.select("*")` gives the pipeline its own plan node, so
        # unpersisting it can never drop a cache the CALLER placed on
        # `docs`.
        out = docs.select("*").persist(StorageLevel.MEMORY_AND_DISK)
        n_in = out.count()
    for name, apply in stages:
        nxt = apply(out)
        missing = {"doc_id", "text"} - set(nxt.columns)
        if missing:
            raise ValueError(
                f"pipeline stage {name!r} dropped required "
                f"column(s) {sorted(missing)}"
            )
        if report:
            nxt = nxt.persist(StorageLevel.MEMORY_AND_DISK)
            n_out = nxt.count()
            # nxt is materialized: the previous stage's cache is no
            # longer needed — release it so live copies stay bounded
            # at two however many stages run.  (`out` is always this
            # function's own persisted frame here, never the caller's
            # input.)  If an evicted nxt partition is ever recomputed
            # it re-runs the stage lineage — standard cache semantics.
            out.unpersist()
            rows.append(
                {
                    "stage": name,
                    "docs_in": n_in,
                    "docs_out": n_out,
                    "dropped": n_in - n_out,
                }
            )
            n_in = n_out
        out = nxt
    return out, rows
