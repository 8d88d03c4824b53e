"""Custom stateful streaming operators via applyInPandasWithState.

The built-in ``session_window`` (streaming/events.py) covers plain gap
sessionization; this module shows the engine's escape hatch for operator
semantics Spark lacks entirely — arbitrary per-key state machines. The
example operator is a *value-threshold alerter with decay*: per user, track a
running score that accumulates event values and decays per event; emit one
row whenever the score crosses a threshold. Not expressible with windows
(state is data-dependent, not time-bounded).

Scale notes: state lives in the state store keyed by user; timeouts
(ProcessingTimeTimeout) garbage-collect idle keys, so state size tracks
*active* keys only. Arrow batches cross the Python boundary per key-group,
not per row.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("alert_ts", T.LongType()),  # epoch micros of crossing event
        T.StructField("score", T.DoubleType()),
        T.StructField("n_events_in_state", T.IntegerType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("score", T.DoubleType()),
        T.StructField("n_events", T.IntegerType()),
    ]
)


def threshold_alerts(
    events: DataFrame,
    threshold: float = 500.0,
    decay: float = 0.9,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Stateful alert stream: score = score*decay + value per event (in ts
    order within the micro-batch); emit (user, ts, score) on each upward
    threshold crossing, then reset. Streaming only (Spark restriction);
    a single availableNow micro-batch reproduces batch semantics exactly.

    ``timeout_ms``: idle-key state GC for long-running continuous streams.
    Default None = NoTimeout — REQUIRED for availableNow/one-shot runs:
    ProcessingTimeTimeout makes an availableNow query keep scheduling
    timeout-service batches and never terminate (measured, Spark 4.1)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            score, n_events = state.get
        else:
            score, n_events = 0.0, 0
        alerts = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                score = score * decay + float(value)
                n_events += 1
                if score >= threshold:
                    alerts.append((user_id, int(ts), round(score, 6), n_events))
                    score, n_events = 0.0, 0
        state.update((score, n_events))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if alerts:
            yield pd.DataFrame(
                alerts, columns=["user_id", "alert_ts", "score", "n_events_in_state"]
            )

    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=ALERT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )


SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),  # epoch micros
        T.StructField("session_end", T.LongType()),    # last event's ts
        T.StructField("n_events", T.IntegerType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("n", T.IntegerType()),
    ]
)


def sessionize_stateful(events: DataFrame, gap_us: int) -> DataFrame:
    """Gap sessionization as a custom per-key state machine
    (applyInPandasWithState) — the Python-stateful twin of
    ``streaming/events.sessionize`` (built-in session_window).

    Semantics match session_window's split rule: an event exactly ``gap_us``
    after the previous one opens a NEW session (diff >= gap closes).
    Emitted ``session_start``/``session_end`` are the first/last event's
    epoch-micros ts, same shape the batch twin aggregates with min/max.

    State is O(1) per key: exactly one open (start, end, n) triple; a
    session is emitted the moment an in-gap-violating event arrives, and
    the trailing session per key stays open in state (drain a finite
    replay by appending one sentinel event per key at
    ``max_ts + gap_us``, which closes every real session and itself
    remains the never-emitted open session — the standard cutover flush).

    REQUIRES per-key ts-ordered arrival across micro-batches (e.g. a
    date-partitioned replay with maxFilesPerTrigger=1); events within one
    batch are sorted here, but a later batch carrying earlier timestamps
    would mis-split. For out-of-order streams use
    ``streaming/events.sessionize`` (session_window + watermark), which
    merges late events server-side."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout below
            state.remove()
            return
        cur = state.get if state.exists else None  # (start, end, n)
        closed = []
        # a key's rows can arrive as several Arrow chunks within one
        # micro-batch; order is only guaranteed after a global batch sort
        for ts in sorted(int(t) for pdf in pdfs for t in pdf["ts"]):
            if cur is None:
                cur = (ts, ts, 1)
            elif ts - cur[1] >= gap_us:
                closed.append((user_id, cur[0], cur[1], cur[2]))
                cur = (ts, ts, 1)
            else:
                cur = (cur[0], max(cur[1], ts), cur[2] + 1)
        if cur is not None:
            state.update(cur)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage_ts", T.ArrayType(T.LongType())),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("stage_ts", T.ArrayType(T.LongType())),
        T.StructField("emitted", T.BooleanType()),
    ]
)


def funnel_stateful(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """N-stage ordered conversion funnel as a per-user streaming state
    machine (applyInPandasWithState) — the streaming twin of the
    ``w10_funnel`` batch gate: per user, the first stage-1 event, the
    first stage-2 event STRICTLY AFTER it, ... ; one row is emitted the
    moment the final stage completes (append mode — the row is
    immutable once emitted, so no update-mode contortions), carrying
    every stage's epoch-micros ts as an array.

    Greedy-sequential processing in ts order is EXACTLY the batch
    min-after-previous semantics (first qualifying event in order = the
    minimum qualifying ts), which the batch-equivalence test pins
    against the same three-stage aggregate plan the gate runs.

    State is O(#stages) per user and stops changing once emitted —
    completed or abandoned funnels cost one tuple each; use a
    processing-time timeout upstream if key cardinality is unbounded.
    Same in-order-arrival contract as :func:`sessionize_stateful`
    (per-key ts-ordered across micro-batches; in-batch rows are
    sorted here)."""
    if len(stages) < 2:
        raise ValueError("funnel needs >= 2 stages")
    stage_idx = {s: i for i, s in enumerate(stages)}
    n = len(stages)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout below
            state.remove()
            return
        if state.exists:
            ts_list, emitted = state.get
            ts_list = list(ts_list)
        else:
            ts_list, emitted = [0] * n, False
        rows = sorted(
            (int(t), str(e))
            for pdf in pdfs
            for t, e in zip(pdf["ts"], pdf["event_type"])
            if e in stage_idx
        )
        for ts, etype in rows:
            if emitted:
                break
            i = stage_idx[etype]
            if ts_list[i] != 0:
                continue
            if i == 0 or (ts_list[i - 1] != 0 and ts > ts_list[i - 1]):
                ts_list[i] = ts
                if i == n - 1:
                    emitted = True
                    yield pd.DataFrame(
                        {"user_id": [user_id], "stage_ts": [list(ts_list)]}
                    )
        state.update((ts_list, emitted))

    return (
        events.select("user_id", "ts", "event_type")
        .filter(events.event_type.isin(*stages))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ANOMALY_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("bucket_ts", T.LongType()),
        T.StructField("observed", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

ANOMALY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType())),
        T.StructField("sums", T.ArrayType(T.DoubleType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("max_bucket", T.LongType()),
        T.StructField("emitted_up_to", T.LongType()),
    ]
)


def anomaly_stateful(
    events: DataFrame,
    step_us: int = 86_400_000_000,
    window: int = 7,
    min_periods: int = 3,
    z_threshold: float = 2.0,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of operators/timeseries.rolling_anomaly_flags: per
    key, per ``step_us`` bucket, score the bucket's mean value against
    the trailing ``window`` buckets' statistics the moment the bucket
    CLOSES (a strictly later bucket's event arrives) — alerts fire one
    bucket-step behind real time, never on half-filled buckets.

    State per key is the trailing window+1 bucket aggregates (sum,
    count) — O(window), independent of event volume. Late events folding
    into a still-retained closed bucket update future frames but never
    re-emit; events older than ``max_bucket - window`` steps are dropped
    (the state-pruning horizon, the stateful analog of a watermark). The
    per-key FINAL bucket never closes, so a drained availableNow run
    emits exactly the batch operator's rows minus each key's last
    observed bucket (pytest-pinned equivalence)."""

    def _score(hist: dict, bc: int) -> tuple:
        frame = [
            hist[bh][0] / hist[bh][1]
            for bh in hist
            if bc - window <= bh <= bc - 1
        ]
        obs = hist[bc][0] / hist[bc][1]
        n = len(frame)
        z = None
        if n >= min_periods:
            mean = sum(frame) / n
            msq = sum(v * v for v in frame) / n
            var = max(msq - mean * mean, 0.0)
            if var > 0:
                z = round((obs - mean) / (var ** 0.5), 4)
        return (
            int(bc * step_us),
            round(obs, 6),
            z,
            None if z is None else abs(z) >= z_threshold,
        )

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        if state.exists:
            bs, ss, cs, max_b, emitted = state.get
            hist = {int(b): [float(s), int(c)] for b, s, c in zip(bs, ss, cs)}
        else:
            hist, max_b, emitted = {}, None, None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                b = int(ts) // step_us
                if max_b is not None and b < max_b - window:
                    continue  # past the pruning horizon: dropped
                if max_b is None or b > max_b:
                    for bc in sorted(hist):
                        if bc < b and (emitted is None or bc > emitted):
                            out.append((uid,) + _score(hist, bc))
                            emitted = bc
                    max_b = b if max_b is None else max(max_b, b)
                    # prune buckets no future frame can reference
                    hist = {
                        bh: sc for bh, sc in hist.items()
                        if bh >= max_b - window
                    }
                cur = hist.setdefault(b, [0.0, 0])
                cur[0] += float(v)
                cur[1] += 1
        bs = sorted(hist)
        state.update(
            (
                bs,
                [hist[b][0] for b in bs],
                [hist[b][1] for b in bs],
                max_b,
                emitted,
            )
        )
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "bucket_ts", "observed", "zscore",
                         "is_anomaly"],
            )

    return (
        events.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=ANOMALY_OUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
