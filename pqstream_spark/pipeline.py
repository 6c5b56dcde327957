"""The reference's handleEvent transform chain as one declarative plan.

`/root/reference/server.go:214-255` per event: parse → redact →
build public Event → merge patch (UPDATE) → fallback lookup → fan-out.
Here the whole chain is a single narrow DataFrame pipeline: Catalyst
fuses it into one whole-stage-codegen span over the scan, and the same
function works identically on a batch DataFrame and a streaming one
(the Structured Streaming model — batch/stream unification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .operators.merge_patch import with_changes
from .operators.redact import FieldRedactions, redact_fields
from .operators.filters import filter_tables


def handle_events(
    raw: DataFrame,
    redactions: FieldRedactions | None = None,
    table_regexp: str | None = None,
    typed_wire: bool = False,
) -> DataFrame:
    """RawEvent stream → public Event stream.

    Order of stages matches the reference: redaction runs once upstream
    of every subscriber (server.go:225), the patch is computed from the
    already-redacted payload/previous (server.go:235), and the
    per-client table filter applies last (server.go:293-295) — though
    Catalyst will push the filter to the scan anyway.
    """
    df = raw
    if redactions:
        df = redact_fields(df, redactions)
    df = with_changes(df, typed_wire=typed_wire)
    if table_regexp:
        df = filter_tables(df, table_regexp)
    return df
