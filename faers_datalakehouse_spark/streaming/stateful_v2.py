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
        n, cents, mx = (
            self._state.get() if self._state.exists() else (0, 0, None)
        )
        for pdf in rows:
            vals = (
                pdf["value"].fillna(0.0).mul(100).round().astype("int64")
            )
            n += len(pdf)
            cents += int(vals.sum())
            if len(vals):
                batch_max = int(vals.max())
                mx = batch_max if mx is None else max(mx, batch_max)
        self._state.update((n, cents, mx if mx is not None else 0))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_cents": [cents],
                "max_cents": [mx if mx is not None else 0],
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
