"""Structured Streaming surface: continuous ingest + streaming analytics.

The reference is a batch pipeline over static dump files (SURVEY §2.7 —
its "streaming" is IO-streaming for memory reasons only,
``keyword_search/functions/file_stream_readers.py:1-33``), but the
engine's canonical input is a continuously-crawled web corpus, so the
Spark-native continuous counterparts live here:

* **Incremental index ingest** — ``stream_index_ingest``: a document
  stream drives ``foreachBatch`` → :func:`sparksearch.index.upsert
  .upsert_index` (first batch builds, later batches upsert).  This is
  the streaming twin of the reference's long-running bulk-upsert loop
  (``output_functions.py:93-149``), with exactly-once batch boundaries
  from the streaming checkpoint instead of retry-and-hope.
* **Windowed aggregation** — ``windowed_event_stats``: tumbling-window
  counts/sums over an event stream.  The SAME DataFrame expression
  serves batch and streaming (tested equal); streaming adds a watermark
  for state cleanup.
* **Session windows** — ``user_sessions``: per-user gap-based sessions
  via ``F.session_window`` (batch + streaming-stateful capable).

All aggregations have DuckDB SQL twins (`*_sql`) for the correctness
gate; the streaming paths are pytest-verified to produce exactly the
batch results via ``availableNow`` triggers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------

def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source event stream (new parquet files under ``path``)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def read_docs_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Document stream: (doc_id, text) parquet drops — the continuous
    version of the canonical corpus table."""
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# windowed aggregation (tumbling)
# ---------------------------------------------------------------------------

def windowed_event_stats(
    events: DataFrame, window: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Per-(tumbling window, event_type) count + value sum.

    Works unchanged on a batch OR streaming DataFrame; pass ``watermark``
    on streams so window state is dropped once late data can no longer
    arrive (append-mode emission + bounded state at scale).
    Output: (window_start, event_type, n, sum_value).
    """
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )


def windowed_event_stats_sql(window_minutes: int = 60, table: str = "events") -> str:
    """DuckDB twin (1-hour buckets align identically: both engines bucket
    on epoch-aligned interval multiples for sub-day intervals)."""
    return f"""
SELECT time_bucket(INTERVAL '{window_minutes} minutes', ts) AS window_start,
       event_type,
       count(*)::BIGINT AS n,
       round(sum(value), 4) AS sum_value
FROM {table} WHERE ts IS NOT NULL
GROUP BY 1, 2
""".strip()


# ---------------------------------------------------------------------------
# session windows (gap-based)
# ---------------------------------------------------------------------------

def user_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions: events closer than ``gap`` merge into one
    session (Spark ``session_window``; streaming-stateful capable).
    Output: (user_id, session_start, n_events)."""
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def user_sessions_sql(gap_minutes: int = 30, table: str = "events") -> str:
    """DuckDB twin: classic gaps-and-islands.  A new session starts when
    the gap to the previous event is >= the session gap (mirrors Spark's
    session_window semantics: an event extends the session to
    ``ts + gap`` exclusive)."""
    return f"""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '{gap_minutes} minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM {table} WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS session_start, count(*)::BIGINT AS n_events
FROM sess GROUP BY user_id, sid
""".strip()


# ---------------------------------------------------------------------------
# runners
# ---------------------------------------------------------------------------

def run_available_now(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming aggregation over all currently-available input and
    return the result as a batch DataFrame (memory sink)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def stream_index_ingest(
    spark: SparkSession,
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str | None = None,
    **build_kw,
) -> dict:
    """Maintain the inverted index from a document stream.

    ``foreachBatch``: the first micro-batch builds the index, every
    later one upserts (last-write-wins by doc_id).  Rows whose text
    column is NULL are **tombstones** (CDC convention: a refreshing web
    corpus emits deletions as null-bodied records); their doc_ids are
    removed in the same batch transaction as the batch's upserts, after
    them — so an add+delete of the same id within one batch deletes.
    Tombstones for ids the index never saw are no-ops.  The streaming
    checkpoint gives exact batch boundaries across restarts; a crash
    mid-upsert leaves an intent journal that the replayed batch (or any
    handle open) completes with the journal's exact pre-swap counters
    (``index/upsert.py``), so replay converges to the same index.
    Query results equal a batch build over the union of all drops minus
    tombstoned ids; posting BYTES carry v3 ordinal history until
    ``compact_index``
    (``tests/test_streaming.py::test_stream_index_ingest_converges``).
    Returns the final meta dict.
    """
    from pyspark.sql import functions as F

    from sparksearch.index.build import build_index
    from sparksearch.index.manifest import read_meta
    from sparksearch.index.upsert import delete_docs, upsert_index

    id_col = build_kw.get("id_col", "doc_id")
    text_col = build_kw.get("text_col", "text")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        live = batch_df.filter(F.col(text_col).isNotNull())
        dead = batch_df.filter(F.col(text_col).isNull()).select(id_col).distinct()
        # an id appearing both live and tombstoned in one batch: the
        # tombstone wins (upsert_index would otherwise re-insert the
        # delta rows after removing the id)
        live = live.join(dead, id_col, "anti")
        if not os.path.exists(os.path.join(index_dir, "meta.json")):
            if live.isEmpty():  # tombstone-only first batch: nothing to build
                return
            build_index(spark, live, index_dir, **build_kw)
            if not dead.isEmpty():  # same-batch add+delete → delete wins
                delete_docs(spark, index_dir, dead)
        else:
            upsert_index(
                spark,
                live,
                index_dir,
                delete_ids=dead if not dead.isEmpty() else None,
            )

    q = (
        docs_stream.writeStream.foreachBatch(handle)
        .option(
            # sibling of index_dir: the first batch's build_index clears
            # index_dir itself (overwrite), which must not eat the
            # stream's commit log
            "checkpointLocation",
            checkpoint_dir or index_dir.rstrip("/") + "_stream_checkpoint",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_meta(index_dir)
