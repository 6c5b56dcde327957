"""Event data model — the engine's single stream abstraction.

Mirrors the reference's wire model (`/root/reference/pqstream.proto:18-47`):
an unbounded stream of row-mutation events with a fixed envelope and a
dynamic-JSON row payload. We add `seq` (monotonic commit order) and `ts`
(capture time) so that ordering — which the reference gets implicitly
from its single event-loop goroutine (`/root/reference/server.go:258-281`)
— is explicit data, not an execution-mode accident. At 100 TB this is the
only ordering strategy that survives: events are totally ordered by `seq`
but processed in parallel; sinks that need order sort-within-partition or
single-partition only at the final hop.

`payload`/`previous`/`changes` are `map<string,string>` for the flat-row
common case (Postgres `row_to_json` of a relational row is one level
deep) plus `payload_json` preserving exact JSON for nested/typed
fidelity — see SURVEY.md §1.3.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Operation enum — pqstream.proto:18-24. UNKNOWN exists in the
# reference enum but is never produced (SURVEY.md §1.1). TRUNCATE is
# dead in the reference too (its row-level trigger cannot fire on
# TRUNCATE, queries.go:58-60) — this engine makes it live via
# statement-level AFTER TRUNCATE triggers (sources/outbox.py, round 8):
# one envelope per truncated table, id/payload/previous all NULL;
# materialization folds it as delete-all (operators/materialize.py).
OP_INSERT = "INSERT"
OP_UPDATE = "UPDATE"
OP_DELETE = "DELETE"
OP_TRUNCATE = "TRUNCATE"
OPERATIONS = [OP_INSERT, OP_UPDATE, OP_DELETE, OP_TRUNCATE]

# NOTIFY payload cap driving 2-tier degradation — queries.go:33,41.
PAYLOAD_SIZE_CAP = 8000

MAP_SS = T.MapType(T.StringType(), T.StringType())

# RawEvent: internal, pre-transform (pqstream.proto:27-34 + seq/ts).
RAW_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("schema_name", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("id", T.StringType(), True),
        T.StructField("payload", MAP_SS, True),
        T.StructField("previous", MAP_SS, True),
        T.StructField("payload_json", T.StringType(), True),
        T.StructField("previous_json", T.StringType(), True),
    ]
)

# Event: public, post-transform (pqstream.proto:37-47 + seq/ts);
# `previous` replaced by `changes` (RFC-7386 merge patch NEW→OLD).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("schema_name", T.StringType(), False),
        T.StructField("table_name", T.StringType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("id", T.StringType(), True),
        T.StructField("payload", MAP_SS, True),
        T.StructField("changes", MAP_SS, True),
    ]
)
