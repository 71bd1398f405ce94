"""Event-time windowed aggregation over the events table (batch + stream).

The reference has no event-time processing (SURVEY.md §2.10 — its
"streaming" is chunked file I/O, census/infrastructure/streaming.py), so
this operator is part of the training-data-pipeline extension surface:
tumbling-window rollups of an event stream, expressed once as a batch
DataFrame plan and once as Structured Streaming with a watermark. Both
produce identical rows on a finite input (tested), which is the Spark
unification guarantee the engine leans on: the batch twin IS the oracle
for the streaming path.

Scale notes: the batch plan is a single hash aggregate on
(window, event_type) — partial aggregation map-side, shuffle carries one
row per (hour, type) per task. The streaming plan keeps state per open
window only; the 1-hour watermark bounds state size regardless of input
length.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from socialmapper_spark.operators.census import dsum


def window_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour rollup: (hour, event_type) → count, exact sum(value).

    Hour boundaries are epoch-aligned (`date_trunc`), so the DuckDB twin
    (`date_trunc('hour', ts)`) buckets identically. The hour is emitted as
    a formatted string to keep the cross-engine value hash free of
    timestamp-type representation differences.
    """
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def window_rollup_stream(
    spark: SparkSession, events_dir: str, file_glob: str = "events.parquet"
) -> DataFrame:
    """Structured Streaming twin of :func:`window_rollup`.

    Reads the same parquet through ``readStream`` with a 1-hour watermark
    and a tumbling ``F.window``, drains it with an availableNow trigger
    into a memory sink, and returns the finished result re-projected to
    the batch schema. Complete output mode is used so the finite test
    input yields every window (append mode would hold back windows newer
    than the final watermark); a production deployment of this operator
    runs append mode with the same watermark into a parquet/Iceberg sink.
    """
    schema = spark.read.option("pathGlobFilter", file_glob).parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", file_glob)
        .parquet(events_dir)
    )
    # watermarks require TIMESTAMP (tz-aware); parquet NTZ → UTC instant.
    # The session timezone is UTC, so window starts match the batch
    # date_trunc on the NTZ column exactly. Streaming forbids
    # countDistinct, so the distinct-user dimension is handled the
    # production way: the STATEFUL level aggregates per
    # (window, event_type, user_id) — bounded state, watermark-evictable —
    # and the cheap final rollup over the materialized sink collapses the
    # user dimension (n_users = row count, exact).
    per_user = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "1 hour").alias("win"),
            F.col("event_type"),
            F.col("user_id"),
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )
    sink = f"events_rollup_{uuid.uuid4().hex[:12]}"
    q = (
        per_user.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .groupBy(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            dsum("total_value").alias("total_value"),
            F.count("*").alias("n_users"),
        )
    )


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    gap_minutes: int = 30,
    file_glob: str = "events.parquet",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (build mandate): per-user streaming sessionization.

    Each user's events are processed by a stateful grouped-map function
    keyed on user_id; open-session state (last event time, running
    aggregates) persists in the state store between micro-batches, and a
    session is emitted when the gap closes it. On the finite test input
    (one availableNow drain, single micro-batch) every session closes at
    end of batch, so the output equals the batch :func:`sessionize` plan
    row-for-row — the parity the tests pin. Aggregation uses the same
    decimal quantization as ``dsum`` so values are bit-identical.
    """
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = (
        "user_id long, session_seq long, session_start string, "
        "session_end string, n_events long, total_value double"
    )
    state_schema = "last_us long, session_seq long"

    def proc(key, pdf_iter, state: GroupState):
        import pandas as pd  # noqa: F811

        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        (user_id,) = key
        last_us, seq = state.get if state.exists else (None, 0)
        out = []
        cur = None  # [start_ts, end_ts, n, Decimal total]
        q6 = Decimal("0.000001")

        def flush():
            out.append(
                (
                    user_id,
                    seq,
                    cur[0].strftime("%Y-%m-%d %H:%M:%S.%f"),
                    cur[1].strftime("%Y-%m-%d %H:%M:%S.%f"),
                    cur[2],
                    float(cur[3]),
                )
            )

        for ts, val in zip(rows["ts"], rows["value"]):
            us = ts.value // 1000  # pandas ns → µs
            if last_us is None or us - last_us > gap_us:
                if cur is not None:
                    flush()
                seq += 1
                cur = [ts, ts, 0, Decimal(0)]
            cur[1] = ts
            cur[2] += 1
            cur[3] += Decimal(repr(float(val))).quantize(q6, ROUND_HALF_UP)
            last_us = us
        if cur is not None:
            # finite-input drain: the batch ends the stream, so the open
            # session closes here; a continuous deployment would instead
            # state.update() and emit on timeout
            flush()
        state.update((last_us, seq))
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "session_seq", "session_start",
                "session_end", "n_events", "total_value",
            ],
        )

    schema = spark.read.option("pathGlobFilter", file_glob).parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", file_glob)
        .parquet(events_dir)
        .select("user_id", "event_id", "ts", "value")
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        proc, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    sink = f"events_sessions_{uuid.uuid4().hex[:12]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessionization: a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Pure window functions (lag +
    running sum), no UDF — the standard scalable sessionization plan: one
    shuffle on user_id, all session logic inside the sorted partition.

    Output: one row per session with start/end, event count, exact value
    sum.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lit(gap_minutes * 60 * 1_000_000)  # microseconds, exact
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    with_flag = events.withColumn(
        "__new_session",
        (ts_us - F.lag(ts_us, 1).over(w) > gap).cast("int"),
    ).withColumn(
        "session_seq",
        F.sum(F.coalesce(F.col("__new_session"), F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_flag.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )
