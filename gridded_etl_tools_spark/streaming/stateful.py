"""Custom stateful streaming operators (north-star streaming additions).

The reference has no streaming, but its incremental-update semantics map
onto Structured Streaming state (SURVEY §2.6): here we add the two
stateful shapes a large-scale pipeline needs beyond tumbling windows —

* :func:`streaming_sessionize` — built-in ``session_window`` (gap-based
  sessions, state managed by Spark; the streaming twin of
  ``operators.gaps.sessionize``, whose batch results the oracle checks).
* :func:`running_extremes` — ``applyInPandasWithState``: per-key custom
  state (running min/max/count of a value column) emitted per
  micro-batch, with event-time timeout for state expiry.  The template
  for arbitrary per-cell accumulators (e.g. climatology normals) that
  the built-in aggregations can't express incrementally.

Both group by the entity key, so state is partitioned exactly like the
shuffle — no single-node state bottleneck at 1000 executors.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType, TimestampType,
)


def streaming_sessionize(
    stream: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = None,
    gap_sql: str = "30 minutes",
    watermark_sql: str | None = "1 hour",
) -> DataFrame:
    """Gap-based sessions over a live stream with ``session_window``.
    Emits one row per closed session (watermark advances past the gap):
    (entity, session start/end, n_events[, sum_value]).

    ``watermark_sql=None`` skips the watermark for complete-mode replay
    (finite backfills / oracle readback), where state is retained for the
    whole run and every session — including still-open ones — is in the
    sink table."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    if watermark_sql is not None:
        stream = stream.withWatermark(ts_col, watermark_sql)
    return (
        stream
        .groupBy(F.session_window(F.col(ts_col), gap_sql).alias("session"), F.col(entity_col))
        .agg(*aggs)
        .select(
            entity_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            *[c for c in ("n_events", f"sum_{value_col}") if value_col or c == "n_events"],
        )
    )


#: output schema of running_extremes
_EXTREMES_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("n_seen", LongType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

#: idle-key state retention past the watermark before timeout removal
_STATE_RETENTION_MS = 3_600_000

#: state tuple: (n_seen, min, max, last_ts_epoch_us)
_STATE_SCHEMA = StructType(
    [
        StructField("n_seen", LongType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
        StructField("last_us", LongType()),
    ]
)


def _extremes_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for one key into (n, min, max);
    emits the updated accumulator once per batch."""
    if state.hasTimedOut:
        state.remove()
        return
    n, mn, mx, last_us = state.get if state.exists else (0, None, None, 0)
    for pdf in pdfs:
        if pdf.empty:
            continue
        vals = pdf["value"].astype(float)
        n += len(pdf)
        bmn, bmx = float(vals.min()), float(vals.max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
        last_us = max(last_us, int(pdf["ts"].max().value // 1_000))
    state.update((n, mn, mx, last_us))
    # Arm the event-time timeout: once the watermark passes this point the
    # hasTimedOut branch above fires and the idle key's state is removed.
    # Without this call EventTimeTimeout never triggers and state grows
    # without bound.  Must be strictly greater than the current watermark.
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + _STATE_RETENTION_MS)
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n_seen": [n],
            "min_value": [mn],
            "max_value": [mx],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_extremes(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark_sql: str = "1 hour",
) -> DataFrame:
    """Per-key running (count, min, max) via ``applyInPandasWithState``
    — the custom-accumulator template.  State lives per group in the
    state store (RocksDB at scale), emitted each micro-batch in Update
    mode."""
    prepared = stream.withWatermark(ts_col, watermark_sql).select(
        F.col(key_col).alias("key").cast("long"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value").cast("double"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _extremes_fn,
        outputStructType=_EXTREMES_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- transformWithState (Spark 4 state-v2 API) -------------------------------

try:  # Spark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningNormalsProcessor(StatefulProcessor):
        """Per-key running climatology normals (count/sum/min/max →
        mean) via the state-v2 ``transformWithState`` API — the
        arbitrary-accumulator shape ``applyInPandasWithState`` covers on
        the old API, on the engine's current recommended one (typed
        ValueState, composable with timers/TTL)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType(
                [
                    StructField("n", LongType()),
                    StructField("total", DoubleType()),
                    StructField("vmin", DoubleType()),
                    StructField("vmax", DoubleType()),
                ]
            )
            self._acc = handle.getValueState("acc", schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total, vmin, vmax = 0, 0.0, float("inf"), float("-inf")
            if self._acc.exists():
                n, total, vmin, vmax = self._acc.get()
            for pdf in rows:
                v = pdf["value"].astype("float64")
                n += int(v.size)
                total += float(v.sum())
                vmin = min(vmin, float(v.min()))
                vmax = max(vmax, float(v.max()))
            self._acc.update((n, total, vmin, vmax))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n_seen": [n],
                    "mean_value": [total / n],
                    "min_value": [vmin],
                    "max_value": [vmax],
                }
            )

        def close(self) -> None:
            pass

    def running_normals(
        stream: DataFrame,
        entity_col: str = "user_id",
        ts_col: str = "ts",
        watermark_sql: str = "1 hour",
    ) -> DataFrame:
        """Running per-entity normals over a stream using
        ``transformWithStateInPandas`` — state partitions with the
        groupBy key, updates emit per micro-batch."""
        out_schema = StructType(
            [
                StructField("key", LongType()),
                StructField("n_seen", LongType()),
                StructField("mean_value", DoubleType()),
                StructField("min_value", DoubleType()),
                StructField("max_value", DoubleType()),
            ]
        )
        return (
            stream.withWatermark(ts_col, watermark_sql)
            .groupBy(entity_col)
            .transformWithStateInPandas(
                statefulProcessor=RunningNormalsProcessor(),
                outputStructType=out_schema,
                outputMode="Update",
                timeMode="EventTime",
            )
        )

except ImportError:  # pragma: no cover - Spark < 4 fallback documented
    RunningNormalsProcessor = None

    def running_normals(*args, **kwargs):
        raise NotImplementedError(
            "transformWithState requires Spark >= 4.0; use "
            "running_extremes (applyInPandasWithState) instead"
        )
