"""CDC materialization: changelog → current table state.

The reference only *streams* changes (`/root/reference/server.go:
249-315`); any consumer that wants current state must fold the stream
itself. This operator does that fold in the engine — the capability a
user switching from the reference most often rebuilds by hand:

    INSERT/UPDATE → row exists with the latest payload
    DELETE        → row absent

Batch form: one window (`row_number` over seq DESC per key) — a single
shuffle on the key, no driver-side state. At 100 TB this partitions by
(table, id) and scales linearly; with a date-partitioned changelog,
compaction runs per partition and merges with the previous snapshot
(classic incremental-materialization shape).

Streaming form: applyInPandasWithState keeps {key → (seq, payload)} in
the state store, emitting the new current row per key per micro-batch
— bounded state (one row per live key), exactly the operator Spark's
built-ins lack (dropDuplicates keeps the FIRST seen, we need the
LATEST by seq with DELETE tombstones).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CURRENT_STATE_SCHEMA = (
    "table_name string, id string, seq long, op string, payload_json string"
)


def materialize_current_state(changelog: DataFrame) -> DataFrame:
    """Batch fold: latest event per (table, id); DELETE removes the row."""
    w = Window.partitionBy("table_name", "id").orderBy(F.col("seq").desc())
    return (
        changelog.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "DELETE"))
        .select("table_name", "id", "seq", "op", "payload_json")
    )


def materialize_current_state_stream(changelog: DataFrame) -> DataFrame:
    """Streaming fold with explicit state: one state entry per live key.

    Emits the key's current row after each micro-batch that touches it
    (update-mode semantics); a DELETE clears the state and emits a
    tombstone row with op='DELETE', payload NULL — so a downstream sink
    can apply removals too."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        table_name, id_ = key
        if state.exists:
            seq, op, payload = state.get
        else:
            seq, op, payload = -1, None, None
        for pdf in pdfs:
            pdf = pdf.sort_values("seq")
            for row in pdf.itertuples(index=False):
                if row.seq <= seq:
                    continue  # replayed / out-of-order older event
                seq = int(row.seq)
                op = row.op
                payload = None if row.op == "DELETE" else row.payload_json
        if op == "DELETE":
            state.remove()
        else:
            state.update((seq, op, payload))
        yield pd.DataFrame(
            {
                "table_name": [table_name],
                "id": [id_],
                "seq": [seq],
                "op": [op],
                "payload_json": [payload],
            }
        )

    return (
        changelog.select("table_name", "id", "seq", "op", "payload_json")
        .groupBy("table_name", "id")
        .applyInPandasWithState(
            fold,
            outputStructType=CURRENT_STATE_SCHEMA,
            stateStructType="seq long, op string, payload_json string",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
