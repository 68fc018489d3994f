"""Structured Streaming layer (SURVEY.md §2.9 extension).

The reference is strictly batch (one ``COPY`` then full rebuild,
``MotherProcedure.sql:2-25``); this package is the streaming-native
re-expression of the same stages plus the event-analytics operators a
warehouse at 100 TB/day ingest actually needs:

* ``ingest``   — file-source landing stream + the reject-routing cleanse
  as a stateless streaming transformation (same semantics as the batch
  ``operators.cleansing.cleanse``, minus the global steps that require a
  finite input: max-id assignment and full-corpus distinct).
* ``events``   — watermarked tumbling / sliding / session windows over an
  event stream.
* ``stateful`` — custom per-key state via ``applyInPandasWithState``
  (running totals with inactivity timeout), for semantics windowed
  aggregation can't express.
* ``embeddings`` — drop-dir embedding stream → persisted-IVF append
  with the cell-size drift monitor in the micro-batch loop (the
  rebuild signal fires where the appends happen).
* ``sampling`` — drop-dir document stream → persisted ≤k-row weighted
  A-ES reservoir (fold per micro-batch, replay-idempotent by id,
  corpus never rescanned).

Every transformation here also runs unchanged on a *batch* DataFrame of
the same schema — the corpus' oracle checks exploit that (Spark's
unified batch/streaming semantics make the batch run the ground truth
for the streaming run).
"""

from sales_data_warehouse_spark.streaming.events import (
    EVENTS_SCHEMA,
    enrich_stream,
    interval_join_streams,
    read_events_stream,
    session_windows,
    sliding_event_rate,
    tumbling_event_agg,
)
from sales_data_warehouse_spark.streaming.ingest import (
    cleanse_stream,
    dedupe_within,
    read_sales_csv_stream,
    start_streaming_etl,
)
from sales_data_warehouse_spark.streaming.documents import (
    compact_band_state,
    compact_dedup_state,
    dedup_documents_batch,
    near_dedup_documents_batch,
    read_band_state,
    read_dedup_state,
    read_documents_stream,
    start_streaming_doc_dedup,
    start_streaming_near_dedup,
    start_streaming_ngram_quality_scores,
    start_streaming_quality_scores,
)
from sales_data_warehouse_spark.streaming.embeddings import (
    EMBEDDINGS_SCHEMA,
    ivf_append_batch,
    read_embeddings_stream,
    start_streaming_ivf_append,
)
from sales_data_warehouse_spark.streaming.sampling import (
    reservoir_fold_batch,
    score_documents_batch,
    start_streaming_importance_scores,
    start_streaming_weighted_sample,
)
from sales_data_warehouse_spark.streaming.stateful import (
    running_user_totals,
)

__all__ = [
    "EVENTS_SCHEMA",
    "enrich_stream",
    "interval_join_streams",
    "read_events_stream",
    "tumbling_event_agg",
    "sliding_event_rate",
    "session_windows",
    "read_sales_csv_stream",
    "cleanse_stream",
    "dedupe_within",
    "start_streaming_etl",
    "running_user_totals",
    "read_band_state",
    "read_dedup_state",
    "read_documents_stream",
    "compact_band_state",
    "compact_dedup_state",
    "dedup_documents_batch",
    "start_streaming_doc_dedup",
    "near_dedup_documents_batch",
    "start_streaming_near_dedup",
    "start_streaming_ngram_quality_scores",
    "start_streaming_quality_scores",
    "EMBEDDINGS_SCHEMA",
    "read_embeddings_stream",
    "ivf_append_batch",
    "start_streaming_ivf_append",
    "reservoir_fold_batch",
    "start_streaming_weighted_sample",
    "score_documents_batch",
    "start_streaming_importance_scores",
]
