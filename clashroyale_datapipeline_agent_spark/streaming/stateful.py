"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10 design target; the brief's custom-stateful-operator slot).

The Phase-0 stopping rule is a *stateful trigger*: accumulate per-archetype
counters until every floor is met. The reference runs it as a driver loop;
here it is also available as a true streaming operator — per-key state
lives in the state store, survives restarts via checkpoints, and emits a
row only when a key's floor is first crossed.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

THRESHOLD_OUT_SCHEMA = "deck_type string, games bigint, crossed boolean"
STATE_SCHEMA = "games bigint"


def archetype_floor_monitor(
    participants: DataFrame,
    *,
    min_games_per_type: int = 200,
) -> DataFrame:
    """Streaming per-archetype counter with floor detection.

    Input: a *streaming* participant table (deck_type column). For each
    archetype, keeps a running game count in state; emits (deck_type,
    games, crossed=True) exactly once when the count first reaches
    ``min_games_per_type``, and (deck_type, games, crossed=False) progress
    rows otherwise. The Phase-0 driver loop's stopping predicate, as an
    incremental operator — no per-batch full recompute.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        new_rows = sum(len(p) for p in pdfs)
        (prev,) = state.get if state.exists else (0,)
        total = prev + new_rows
        crossed_now = prev < min_games_per_type <= total
        state.update((total,))
        yield pd.DataFrame(
            {
                "deck_type": [key[0]],
                "games": [total],
                "crossed": [bool(crossed_now)],
            }
        )

    return participants.groupBy("deck_type").applyInPandasWithState(
        update,
        outputStructType=THRESHOLD_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, closed boolean"
)
SESSION_STATE_SCHEMA = "start_ms bigint, last_ms bigint, n bigint"


def session_aggregator(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
) -> DataFrame:
    """Custom sessionizer with explicit state + processing-time timeout —
    the hand-rolled twin of ``session_window`` for semantics Spark's
    built-in can't express (e.g. emitting in-progress session snapshots).

    Emits a closed-session row when a batch's events jump past the gap, and
    a timeout-closed row when a key goes quiet (state evicted). Shows the
    full state lifecycle: get/update/timeout/remove.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows: list[dict] = []
        if state.hasTimedOut:
            if state.exists:
                start_ms, last_ms, n = state.get
                rows.append(
                    {
                        "user_id": key[0],
                        "session_start": pd.Timestamp(start_ms, unit="ms"),
                        "session_end": pd.Timestamp(last_ms, unit="ms"),
                        "n_events": n,
                        "closed": True,
                    }
                )
                state.remove()
        else:
            ts_all = (
                pd.concat(list(pdfs))[ts_col]
                .sort_values()
                .astype("datetime64[ms]")
            )
            start_ms, last_ms, n = (
                state.get if state.exists else (None, None, 0)
            )
            for t in ts_all:
                ms = int(t.value // 1_000_000)
                if start_ms is None:
                    start_ms, last_ms, n = ms, ms, 1
                elif ms - last_ms > gap_seconds * 1000:
                    rows.append(
                        {
                            "user_id": key[0],
                            "session_start": pd.Timestamp(start_ms, unit="ms"),
                            "session_end": pd.Timestamp(last_ms, unit="ms"),
                            "n_events": n,
                            "closed": True,
                        }
                    )
                    start_ms, last_ms, n = ms, ms, 1
                else:
                    last_ms = ms
                    n += 1
            state.update((start_ms, last_ms, n))
            state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(
            rows,
            columns=["user_id", "session_start", "session_end", "n_events", "closed"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


TRANSITION_OUT_SCHEMA = "user_id bigint, prev_type string, next_type string"
TRANSITION_STATE_SCHEMA = "last_ms bigint, last_id bigint, last_type string"


def transition_emitter(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    on_late: str = "error",
) -> DataFrame:
    """Per-user event-bigram emitter — the streaming twin of
    ``events_markov_transitions``'s lag window (which cannot stream:
    ``lag`` needs the whole partition). Each user's LAST
    (ts, event_id, event_type) lives in the state store; every
    micro-batch sorts the user's new events by (ts, event_id), stitches
    the stored last event in front, and emits one
    (user_id, prev_type, next_type) row per adjacency. Downstream, an
    ordinary streaming ``groupBy(prev, next).count`` (or a foreachBatch
    counter merge — bigram counts are trivially mergeable) maintains the
    transition matrix incrementally.

    State is ONE row per user (three scalars), not a buffer — bounded by
    the user population regardless of event volume. Cross-batch
    correctness needs per-user event-time-ordered arrival (the landed
    raw zone's contract, same as the interval-join composition); within
    a batch any order is fine because the batch is sorted before
    stitching. The stored (last_ms, last_id) ENFORCES that contract
    (round-5 ADVICE — it was documented but unchecked): any batch row at
    or behind the stored last event is a violation, and ``on_late``
    picks the response — ``'error'`` (default) fails the stage loudly,
    ``'drop'`` discards the late rows and stitches the rest. Exact
    replays of the stored event count as late too (stitching them would
    fabricate a self-transition). Equivalence to the batch lag window is
    pinned in ``tests/test_streaming.py`` over multiple micro-batches,
    as are both violation responses."""
    if on_late not in ("error", "drop"):
        raise ValueError(f"on_late must be 'error' or 'drop', got {on_late!r}")

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # NoTimeout configured; defensive
            return
        df = pd.concat(list(pdfs))
        if df.empty:
            return
        df = df.sort_values([ts_col, "event_id"])
        if state.exists:
            stored_ms, stored_id, last_type = state.get
            ms_vec = (
                pd.to_datetime(df[ts_col])
                .values.astype("datetime64[ms]")
                .astype("int64")
            )
            late = (ms_vec < stored_ms) | (
                (ms_vec == stored_ms) & (df["event_id"].values <= stored_id)
            )
            if late.any():
                if on_late == "error":
                    raise ValueError(
                        f"transition_emitter: {int(late.sum())} event(s) for "
                        f"user {key[0]} at or behind the stored last event "
                        f"(ms={stored_ms}, id={stored_id}) — per-user ordered "
                        "arrival contract violated"
                    )
                df = df[~late]
                if df.empty:
                    return
        else:
            last_type = None
        rows: list[dict] = []
        last_ms = last_id = 0
        for t, eid, et in zip(df[ts_col], df["event_id"], df["event_type"]):
            if last_type is not None:
                rows.append(
                    {
                        "user_id": key[0],
                        "prev_type": last_type,
                        "next_type": et,
                    }
                )
            last_type = et
            last_ms = int(pd.Timestamp(t).value // 1_000_000)
            last_id = int(eid)
        state.update((last_ms, last_id, last_type))
        if rows:
            yield pd.DataFrame(rows)

    return events.select("user_id", ts_col, "event_id", "event_type").groupBy(
        "user_id"
    ).applyInPandasWithState(
        update,
        outputStructType=TRANSITION_OUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
