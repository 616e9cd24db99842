"""Streaming analogues of the batch operators.

Each function takes a (possibly streaming) DataFrame and returns a
transformed one — callers attach ``readStream`` sources and ``writeStream``
sinks. All operators also work on batch DataFrames (Spark's unified API), so
the batch oracle checks double as semantics tests for the streaming
transformations.

Watermark discipline: every stateful operator requires an event-time
watermark so state is bounded — late rows beyond the watermark drop instead
of growing state forever (the 100 TB concern: unbounded state OOMs
executors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ensure_watermark(df: DataFrame, ts: str, watermark: str | None) -> DataFrame:
    """Attach an event-time watermark unless the stream already carries one.

    Operators compose (dedup → session window, etc.); Spark disallows
    redefining a watermark downstream, so only the FIRST stateful operator in
    a chain sets it and later ones inherit.
    """
    if watermark is None or not df.isStreaming:
        return df
    # Public-API plan sniff (no JVM internals): the extended explain output
    # includes the analyzed plan, where an existing watermark shows up as an
    # EventTimeWatermark node.
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(extended=True)
    if "EventTimeWatermark" in buf.getvalue():
        return df
    return df.withWatermark(ts, watermark)


def session_window_stream(
    df: DataFrame,
    keys: list[str],
    ts: str,
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """W7 as a native session window: events within ``gap`` of each other
    merge into one session per key. Streaming state closes when the
    watermark passes a session's end.

    Equivalent batch semantics to ``operators.windows.sessionize`` with the
    same gap (sessionize numbers sessions, this aggregates them).
    """
    df = _ensure_watermark(df, ts, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts), gap).alias("session"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
        )
        .select(
            *keys,
            F.col("session.start").alias("window_start"),
            F.col("session.end").alias("window_end"),
            "n_events",
            "session_start",
            "session_end",
        )
    )


def hourly_rollup_stream(
    df: DataFrame,
    keys: list[str],
    ts: str,
    value: str,
    watermark: str | None = "2 hours",
) -> DataFrame:
    """A2 as a tumbling 1-hour window aggregate: earliest timestamp + mean
    value per (keys, hour). Streaming emits finalized windows once the
    watermark passes."""
    df = _ensure_watermark(df, ts, watermark)
    return (
        df.groupBy(F.window(F.col(ts), "1 hour").alias("w"), *keys)
        .agg(
            F.min(ts).alias("first_ts"),
            F.avg(value).alias("mean_value"),
            F.count(value).alias("n"),
        )
        .select(
            *keys,
            F.col("w.start").alias("bucket_start"),
            "first_ts",
            "mean_value",
            "n",
        )
    )


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """U5 on a stream: exact dedup by key with bounded state —
    ``dropDuplicatesWithinWatermark`` keeps each key's state only until the
    watermark passes (plain ``dropDuplicates`` on a stream grows state
    forever)."""
    if df.isStreaming:
        return _ensure_watermark(df, ts, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def running_key_stats_stream(
    df: DataFrame,
    keys: list[str],
    ts: str,
    value: str,
    watermark: str = "1 hour",
    state_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running (count, sum, max-timestamp) carried across micro-batches, emitting
    the updated totals every batch the key appears in.

    This is the escape hatch for semantics the built-in windowed aggregates
    can't express (cross-batch running state with custom update logic). State
    is bounded two ways: the watermark drops late rows, and idle keys time
    out after ``state_timeout_ms`` (GroupStateTimeout.ProcessingTimeTimeout),
    so state size tracks the active-key working set — not the full 100 TB key
    history.

    On a batch DataFrame, falls back to the equivalent groupBy aggregate
    (identical output for a single batch: running totals == final totals).
    """
    import pandas as pd

    out_schema = T.StructType(
        [T.StructField(k, df.schema[k].dataType) for k in keys]
        + [
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
            T.StructField("last_ts", T.TimestampType()),
        ]
    )
    if not df.isStreaming:
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value).cast("double").alias("sum_value"),
            F.max(ts).alias("last_ts"),
        )

    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.DoubleType()),
            T.StructField("last", T.TimestampType()),
        ]
    )

    def update(key, pdfs, state):
        n, s, last = (state.get if state.exists else (lambda: (0, 0.0, None)))()
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value].sum())
            batch_max = pdf[ts].max()
            last = batch_max if last is None else max(last, batch_max)
        state.update((n, s, last))
        state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(
            [list(key) + [n, s, last]],
            columns=[*keys, "n_events", "sum_value", "last_ts"],
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        _ensure_watermark(df, ts, watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
