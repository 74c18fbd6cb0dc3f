"""Arbitrary stateful streaming via ``transformWithStateInPandas``
(the Spark 4.x successor to ``applyInPandasWithState``; SPARK-49564
"State V2"). Complements ``streaming/events.py::stateful_user_totals``,
which covers the V1 ``GroupState`` API — together the engine exercises
both custom-state surfaces Structured Streaming offers.

What V2 adds over V1 (and why a 100 TB pipeline cares):
- typed, composable state primitives (ValueState / ListState / MapState)
  instead of one opaque tuple — state schema evolves per-variable;
- state lives in the RocksDB state store (disk-backed, changelog-
  checkpointed) rather than an in-memory map — per-key state can exceed
  executor memory;
- first-class timers for timeout/eviction logic.

The operator here is a per-user running profile (event count, value-cents
total, max single value) — the integer-cents discipline matches the batch
engine so stream-vs-batch equality is exact, which is how the test pins
correctness (same oracle pattern as ``streaming/scd2.py``).

Environment note: the V2 state protocol speaks protobuf between the JVM
and the Python state server; this sandbox ships no ``google.protobuf``,
so the JVM-side driver worker crashes at state-schema validation
(``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE`` wrapping the
ImportError — reproduced and recorded in ``tests/test_stateful_v2.py``,
which auto-skips until the dependency exists; same class of gap as the
Delta jar, ``tests/test_delta_probe.py``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StructField, StructType

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
        StructField("max_cents", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("cents", LongType()),
        StructField("mx", LongType()),
        # whether any non-null value was ever seen: lets the emitted max
        # be NULL (matching F.max's null-skipping) without storing a
        # null in fixed-typed state
        StructField("saw", LongType()),
    ]
)


class UserProfileProcessor(StatefulProcessor):
    """Keeps (count, cents-total, max-cents) per user in a ValueState and
    emits the updated profile for every user seen in a micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if self._state.exists():
            n, cents, mx, saw = self._state.get()
            mx = mx if saw else None
        else:
            n, cents, mx = 0, 0, None
        for pdf in rows:
            n += len(pdf)
            nonnull = pdf["value"].dropna()
            if len(nonnull):
                # HALF_UP (round half away from zero), matching Spark's
                # F.round — pandas .round() is banker's half-to-even and
                # diverges on exact .5 cents (e.g. 0.125 -> 12 vs 13)
                scaled = nonnull.mul(100).to_numpy()
                vals = (
                    np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
                ).astype("int64")
                # nulls excluded from sum AND max, matching F.sum/F.max
                # null-skipping (fillna(0) would pull a negative max to 0)
                cents += int(vals.sum())
                batch_max = int(vals.max())
                mx = batch_max if mx is None else max(mx, batch_max)
        self._state.update(
            (n, cents, mx if mx is not None else 0,
             1 if mx is not None else 0)
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_cents": [cents],
                "max_cents": [mx],  # None == no non-null value yet
            }
        )

    def close(self) -> None:
        pass


def stateful_user_profiles(events: DataFrame) -> DataFrame:
    """Per-user running profiles over a stream of events
    (``user_id``, ``value`` columns required). Requires the RocksDB
    state store provider (set by the caller/session conf)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
