"""Logical-replication capture backend — S5 rebuilt on the mechanism
PostgreSQL actually provides for it (SURVEY.md §2 S1/S5; reference
anchor `/root/reference/server.go:258-281`, the LISTEN loop).

Why this backend exists (round-9 lead item): the trigger outbox costs a
measured ~6.9x write amplification on the source database (bench_pg.py)
and its BIGSERIAL seq order != commit order, which forced the PgSeqFence
watermark machinery. A logical replication slot inverts every one of
those costs:

- ~zero write-side overhead: changes are decoded from WAL the writer
  already produced; no trigger, no second table, no extra WAL.
- commit order BY CONSTRUCTION: decoding emits whole transactions in
  commit order (verified live: a writer that starts first but commits
  last is delivered last) — there is NO fence on this path because the
  race the fence exists for cannot occur.
- transaction atomicity: `pg_logical_slot_peek_changes(upto_nchanges)`
  only stops at transaction boundaries, so a micro-batch never tears a
  transaction (the outbox path needs envelope xids for this).
- durable restart: the slot's `confirmed_flush_lsn` IS the offset,
  crash-safe inside the server; the poller layers a replay-stable seq
  numbering on top (see PgLogicalPoller).
- TRUNCATE: decoded natively (the reference's dead enum quadrant,
  pqstream.proto:23, again covered without trigger tricks).

Transport: the SQL decoding interface (`pg_logical_slot_peek_changes` +
`pg_replication_slot_advance`) over the same PsqlRunner psql transport
the rest of the live-PG layer rides. The walsender wire protocol
(START_REPLICATION via `pg_recvlogical --start --endpos`) is also
implemented (`recv_changes_walsender`) and parity-tested; the SQL
interface is the default because a micro-batch engine wants bounded
pull-based batches, not a long-lived push stream — and peek/advance
separates delivery from confirmation exactly like the outbox poller's
read/advance, which keeps the at-least-once + idempotent-sink story
identical across backends.

Plugin: `test_decoding` (in-core, PG 9.4+, present everywhere PG is).
The envelope parser below normalizes its text format into the same
(seq, ts, schema, table, op, id, payload, previous) envelope the outbox
emits, so every downstream operator (P1 parse, R1 redact, S2 degrade,
CDC materialization) is backend-agnostic. `pgoutput` (the built-in
publication protocol) emits binary protobuf-ish messages psql cannot
carry; test_decoding is the right plugin for a text transport, and the
parser is ~100 lines, not a protocol stack.

Scale notes: one slot = one ordered changelog = one driver-side psql
read per poll. That is the correct shape — WAL decode order is
inherently serial (it IS the definition of the changelog) — and the
bounded batch (`max_changes`, transaction-aligned) caps driver memory;
downstream parallelism comes from Spark repartitioning the parsed
envelopes, and multiple independent consumers get their own slots
(slots are named; `consumer` maps 1:1 to a slot). REPLICA IDENTITY FULL
is set on captured tables so UPDATE carries the full OLD row
(`previous`) and DELETE the full OLD payload — parity with the
reference trigger's OLD/NEW selection (queries.go:17-24)."""

from __future__ import annotations

import json
import re
import shutil
import subprocess
from dataclasses import dataclass, field

from .outbox import DISCOVER_TABLES_SQL, _check_ident, filter_tables
from .outbox_local import OUTBOX_BATCH_SCHEMA
from .outbox_pg import PG_OFFSET_TABLE, PsqlError, PsqlRunner, _parse_pg_ts, _quote_lit

DEFAULT_SLOT = "pqstream_logical"
DECODING_PLUGIN = "test_decoding"

# types whose test_decoding rendering is already a valid JSON scalar;
# everything else is JSON-string-quoted. numeric stays a JSON number
# (exact digits preserved — json.loads parses it as float downstream,
# same as the outbox's row_to_json rendering).
_JSON_BARE_TYPES = {
    "smallint", "integer", "bigint", "numeric", "real",
    "double precision", "boolean", "oid",
}

# test_decoding renders timestamps as '2021-05-06 07:08:09[+00]' while
# row_to_json (the outbox/reference envelope) renders ISO-8601
# '2021-05-06T07:08:09[+00:00]' — normalized here so the logical
# envelope is byte-compatible with the trigger envelope's payload JSON
_TS_TYPES = {"timestamp without time zone", "timestamp with time zone"}
_TS_VAL_RE = re.compile(
    r"^(\d{4}-\d{2}-\d{2}) (\d{2}:\d{2}:\d{2}(?:\.\d+)?)([+-]\d{2}(?::\d{2})?)?$"
)


def _normalize_ts(val: str) -> str:
    m = _TS_VAL_RE.match(val)
    if not m:
        return val
    date, time_, off = m.group(1), m.group(2), m.group(3)
    if off and ":" not in off:
        off += ":00"
    return f"{date}T{time_}{off or ''}"

_CHANGE_RE = re.compile(
    r"^table ([^:]+): (INSERT|UPDATE|DELETE|TRUNCATE):\s?(.*)$", re.S
)

# test_decoding renders an UPDATE's unchanged out-of-line TOAST columns
# as the UNQUOTED token `col[text]:unchanged-toast-datum` — the value
# was not re-logged because the new tuple reuses the old toast pointer.
# Detection is unambiguous: a genuine user string that happens to BE
# this text always renders single-quoted ('unchanged-toast-datum'),
# the marker never does (round-10 lead fix; the naive parse emitted the
# literal marker string as the column value — silent corruption for
# any >2 KB column an UPDATE didn't touch, i.e. the NORMAL case for a
# documents table).
_TOAST_TOKEN = "unchanged-toast-datum"

# In-flight placeholder for an unchanged-toast column that could NOT be
# filled from the old tuple (replica identity not FULL). PostgreSQL
# text values can never contain NUL, so the NUL framing makes collision
# with real data impossible; the poller resolves it via the P3
# re-select before any row leaves read_rows — it never reaches a sink.
UNCHANGED_TOAST_MARKER = "\x00pqstream:unchanged-toast\x00"
_MARKER_JSON = json.dumps(UNCHANGED_TOAST_MARKER)  # NULs escaped as \u0000
_COMMIT_TS_RE = re.compile(r"^COMMIT \d+(?: \(at (.+)\))?$")
# the type part is non-greedy up to the first `]:`: array types render
# with nested brackets (`tags[integer[]]:`), which a [^\]]+ class would
# truncate — silently dropping the column AND everything after it
# (review finding, verified live)
_COL_RE = re.compile(r'("[^"]+"|[A-Za-z_][A-Za-z0-9_$]*)\[(.+?)\]:')


def _parse_tuple(s: str, start: int = 0) -> tuple[list[tuple[str, str, str, bool]], int]:
    """Parse a test_decoding column list `name[type]:value ...` from
    position `start`; returns (columns, end_pos). A column value is
    either a single-quoted string with '' escaping (may contain spaces,
    brackets, section markers — anything) or a bare space-free token
    (numbers, true/false, null). Stops at a section marker
    (`new-tuple:`) or anything that is not a column head."""
    cols: list[tuple[str, str, str, bool]] = []
    i, n = start, len(s)
    while i < n:
        m = _COL_RE.match(s, i)
        if not m:
            break
        name = m.group(1).strip('"')
        typ = m.group(2)
        i = m.end()
        if i < n and s[i] == "'":
            j = i + 1
            buf: list[str] = []
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    j += 1
                    break
                buf.append(s[j])
                j += 1
            val, quoted, i = "".join(buf), True, j
        else:
            j = s.find(" ", i)
            if j == -1:
                j = n
            val, quoted, i = s[i:j], False, j
        if i < n and s[i] == " ":
            i += 1
        cols.append((name, typ, val, quoted))
    return cols, i


def _row_json(cols: list[tuple[str, str, str, bool]]) -> str | None:
    """Columns → compact JSON object, column order preserved (the
    outbox/reference convention: row_to_json keeps table column order).
    Returns None for an empty column list (no-tuple-data)."""
    if not cols:
        return None
    parts = []
    for name, typ, val, quoted in cols:
        if not quoted and val == "null":
            rendered = "null"
        elif not quoted and typ in _JSON_BARE_TYPES:
            rendered = val
        else:
            if typ in _TS_TYPES:
                val = _normalize_ts(val)
            rendered = json.dumps(val, ensure_ascii=False)
        parts.append(f"{json.dumps(name, ensure_ascii=False)}:{rendered}")
    return "{" + ",".join(parts) + "}"


def iter_logical_records(lines) -> "iter":
    """Reassemble pg_recvlogical/test_decoding PHYSICAL lines into
    LOGICAL records (ADVICE r10 high): test_decoding escapes single
    quotes by doubling ('') but does NOT escape newlines inside quoted
    values, so a text value containing '\\n' spans physical lines — a
    line-by-line parse silently truncates the value, drops the
    continuation lines, and a continuation that happens to look like
    `COMMIT <n>` falsely closes the transaction. Reassembly is
    unambiguous by QUOTE PARITY: every single quote in a complete
    record is either a value delimiter (2 per quoted value) or half of
    a doubled escape (2), so a complete record contains an EVEN number
    of quotes; odd parity after a physical line means the scan is
    inside a quoted value and the next physical line (even an empty
    one) is its continuation. BEGIN/COMMIT/message lines contain no
    single quotes, so they can never be mis-joined — only a genuinely
    torn value absorbs them, which is exactly right.

    `lines` yields physical lines WITHOUT their trailing newline; a
    torn tail (odd parity at EOF — crash mid-record) is yielded as-is:
    its transaction has no COMMIT and the spool assembly drops it, the
    same contract as a torn segment tail."""
    buf: str | None = None
    parity = 0
    for line in lines:
        if buf is None:
            buf = line
            parity = line.count("'") & 1
        else:
            buf = f"{buf}\n{line}"
            parity ^= line.count("'") & 1
        if parity == 0:
            yield buf
            buf = None
    if buf is not None:
        yield buf


def _split_idents(ident: str) -> list[str]:
    """Split a test_decoding ident list (`public.a, public.b,
    public."c, d"`) on top-level commas — multi-table TRUNCATE emits
    ONE line naming every table (review finding: a naive split('.')
    mangled the names and the delete-all markers never fired)."""
    parts: list[str] = []
    buf: list[str] = []
    in_quotes = False
    i = 0
    while i < len(ident):
        c = ident[i]
        if c == '"':
            in_quotes = not in_quotes
            buf.append(c)
        elif not in_quotes and ident.startswith(", ", i):
            parts.append("".join(buf))
            buf = []
            i += 2
            continue
        else:
            buf.append(c)
        i += 1
    if buf:
        parts.append("".join(buf))
    return parts


def _split_schema_table(ident: str) -> tuple[str, str]:
    if "." in ident:
        schema, table = ident.split(".", 1)
    else:
        schema, table = "public", ident
    return schema.strip('"'), table.strip('"')


def parse_change_line(data: str) -> list[tuple[str, str, str, str | None, str | None, str | None]]:
    """One test_decoding data line → envelope tuples (schema, table,
    op, id, payload, previous) — a LIST because a multi-table TRUNCATE
    statement decodes as one line naming every table; empty for
    non-change lines (messages etc.).

    OLD/NEW selection parity with the reference trigger
    (queries.go:17-24): INSERT/UPDATE payload = NEW, DELETE payload =
    OLD, previous = OLD only for UPDATE; id = the row's `id` field as
    text when present. TRUNCATE: idents only, everything row-scoped
    NULL (the statement-trigger envelope shape).

    Known rendering difference vs row_to_json (verified live, pinned in
    tests): test_decoding prints NULL columns in NEW tuples
    (`col[type]:null`) but OMITS them from OLD tuples (DELETE payload,
    UPDATE previous). Functionally equivalent for every downstream
    operator — envelopes are read as maps where an absent key and a
    null value both surface as NULL (`element_at`) — but not
    byte-identical to the trigger envelope for OLD rows with NULLs."""
    m = _CHANGE_RE.match(data)
    if not m:
        return []
    ident, op, rest = m.group(1), m.group(2), m.group(3)
    if op == "TRUNCATE":
        return [
            (*_split_schema_table(one), op, None, None, None)
            for one in _split_idents(ident)
        ]
    schema, table = _split_schema_table(ident)
    payload_cols: list = []
    prev_cols: list = []
    if op == "UPDATE":
        # sections: optional `old-key: <cols>` then `new-tuple: <cols>`.
        # Markers are only honored at the scan position — a quoted
        # value containing the literal text never splits the line.
        i = 0
        if rest.startswith("old-key: "):
            prev_cols, i = _parse_tuple(rest, len("old-key: "))
        if rest.startswith("new-tuple: ", i):
            i += len("new-tuple: ")
        payload_cols, _ = _parse_tuple(rest, i)
        # Unchanged-TOAST backfill (round-10 lead fix, VERDICT r9 #1):
        # an out-of-line TOASTed column the UPDATE didn't touch renders
        # as the UNQUOTED `unchanged-toast-datum` token — the new tuple
        # reuses the old toast pointer, so the true value is BY
        # DEFINITION the old tuple's (REPLICA IDENTITY FULL, which
        # install() sets, logs it there — toast included). A quoted
        # occurrence is a genuine user string and passes through.
        # When the old tuple lacks the column (identity not FULL) the
        # NUL-framed marker goes in; PgLogicalPoller resolves it via
        # the P3 re-select before the row leaves read_rows.
        if any(not q and v == _TOAST_TOKEN for _, _, v, q in payload_cols):
            old_by_name = {c[0]: c for c in prev_cols}
            payload_cols = [
                (
                    (name, typ, old_by_name[name][2], old_by_name[name][3])
                    if name in old_by_name
                    else (name, typ, UNCHANGED_TOAST_MARKER, True)
                )
                if (not quoted and val == _TOAST_TOKEN)
                else (name, typ, val, quoted)
                for (name, typ, val, quoted) in payload_cols
            ]
    else:
        payload_cols, _ = _parse_tuple(rest)
    payload = _row_json(payload_cols)
    previous = _row_json(prev_cols) if op == "UPDATE" else None
    row_id = None
    for name, _typ, val, _quoted in payload_cols:
        if name == "id":
            row_id = None if (not _quoted and val == "null") else val
            break
    return [(schema, table, op, row_id, payload, previous)]


def assemble_spool_txns(seg_dir: str, table_regexp: str | None):
    """Stream the spool directory's segments into complete transactions
    — a GENERATOR of (commit_ts_text, changes) so the caller bounds its
    own memory (one transaction at a time). Shared by the driver-side
    spool assembly (`_rows_from_spool`) and the executor-side
    continuous-ingest scan (`spool_scan`), so both parse the SAME
    bytes with the SAME state machine: quote-parity record reassembly,
    BEGIN/COMMIT framing, keep-first xid dedup across segments (crash
    redelivery repeats WHOLE transactions), torn-tail drop, engine
    table + table_regexp filtering."""
    import os

    pat = re.compile(table_regexp) if table_regexp else None
    seen_xids: set[str] = set()
    begin_re = re.compile(r"^BEGIN (\d+)$")
    commit_re = re.compile(r"^COMMIT (\d+)(?: \(at (.+)\))?$")
    for f in sorted(os.listdir(seg_dir)):
        if not f.startswith("seg-"):
            continue
        cur_xid: str | None = None
        cur: list = []
        with open(os.path.join(seg_dir, f)) as fh:
            # quote-parity reassembly of multi-line records (ADVICE
            # r10 high): a newline INSIDE a quoted value must not be
            # read as a record boundary — see iter_logical_records
            for line in iter_logical_records(
                l.rstrip("\n") for l in fh
            ):
                m = begin_re.match(line)
                if m:
                    cur_xid, cur = m.group(1), []
                    continue
                m = commit_re.match(line)
                if m:
                    # complete block; dedup by xid keep-first
                    if cur_xid is not None and cur_xid not in seen_xids:
                        seen_xids.add(cur_xid)
                        yield (m.group(2), cur)
                    cur_xid, cur = None, []
                    continue
                if cur_xid is None:
                    continue  # messages outside any txn
                for ch in parse_change_line(line):
                    table = ch[1]
                    if table.startswith("pqstream_"):
                        continue
                    if pat is not None and not pat.search(table):
                        continue
                    cur.append(ch)
            # torn tail (no COMMIT before EOF): dropped — its txn
            # redelivers whole in the resumed segment or the peek


def resolve_unchanged_toast(runner: PsqlRunner, txns: list["_Txn"]) -> None:
    """Resolve any UNCHANGED_TOAST_MARKER placeholders left by the
    parse (an UPDATE's untouched TOAST column whose old tuple did
    not carry it — replica identity not FULL). Resolution order,
    per VERDICT r9 #1: (1) the P3 re-select by id
    (`pg_fetch_row_by_id`, the reference's fallbackLookup,
    server.go:194-212 — current-value semantics, same as the
    reference's own degradation recovery); (2) when the row is
    gone or has no id, degrade the payload to None — the S2 tier-2
    shape downstream already handles (queries.go:41-47) — NEVER a
    plausible-looking wrong value. The marker itself is NUL-framed
    so it cannot collide with any PostgreSQL text value; it never
    leaves this function. Module-level (round 11) so the executor-side
    spool scan resolves with ITS OWN runner — markers must never
    survive into a sink regardless of where the parse runs."""
    from .outbox_pg import pg_fetch_row_by_id

    sub = _MARKER_JSON[1:-1]  # escaped marker, sans the JSON quotes
    cache: dict[tuple[str, str, str], dict | None] = {}
    for t in txns:
        for idx, ch in enumerate(t.changes):
            schema, table, op, row_id, payload, previous = ch
            if not payload or sub not in payload:
                continue
            obj = json.loads(payload)
            marked = [k for k, v in obj.items()
                      if v == UNCHANGED_TOAST_MARKER]
            if not marked:
                continue  # escaped lookalike in user data — leave it
            fetched = None
            if row_id is not None and "\x00" not in row_id:
                # keyed on (schema, table, row_id) and the lookup is
                # SCHEMA-QUALIFIED (ADVICE r10): a search_path
                # resolution could splice a SAME-NAMED table's value
                # from another schema into the payload
                key = (schema, table, row_id)
                if key not in cache:
                    raw = None
                    # integer first (the reference's hardcoded cast,
                    # server.go:26), text second — a TEXT primary key
                    # fails the ::integer cast, not the lookup
                    for id_type in ("integer", "text"):
                        try:
                            raw = pg_fetch_row_by_id(
                                runner, table, row_id,
                                id_type=id_type, schema=schema)
                            break
                        except (PsqlError, ValueError):
                            continue
                    cache[key] = json.loads(raw) if raw else None
                fetched = cache[key]
            if fetched is not None and all(k in fetched for k in marked):
                # splice the fetched values in by string surgery so
                # every OTHER column keeps its exact wire rendering
                # (a loads/dumps round-trip would rewrite numeric
                # digits, e.g. 1.50 -> 1.5)
                for k in marked:
                    kj = json.dumps(k, ensure_ascii=False)
                    payload = payload.replace(
                        f"{kj}:{_MARKER_JSON}",
                        f"{kj}:{json.dumps(fetched[k], ensure_ascii=False)}",
                    )
            else:
                payload = None
            t.changes[idx] = (schema, table, op, row_id, payload,
                              previous)


def spool_scan(spark, poller, seg_dir: str, start_seq: int):
    """Executor-side spool parse (round 11, VERDICT r10 #2): one
    mapInPandas task walks the spool directory's segments through the
    SAME plugin-specific assembly as the driver path (the pickled
    poller's `_spool_txns_iter` — test_decoding's streaming text
    assembler, or pgoutput's structural binary reframing) and emits
    OUTBOX_BATCH_SCHEMA rows in Arrow batches — segment bytes are read
    and parsed WHERE THE TASK RUNS, never materialized in driver
    Python. One task per batch is the honest shape: seq numbering and
    cross-segment xid dedup are sequential by definition (they ARE the
    changelog order); intra-batch parallelism would need per-segment
    seq offsets that only a full parse yields. Parallel ingest across
    SLOTS is the sharded capture's job. Unresolved unchanged-TOAST
    markers are P3-resolved in the task against the poller's conninfo
    (executors need database reachability for that rare path)."""
    _CHUNK = 10_000

    def _parse(iterator):
        import pandas as pd

        from .outbox_pg import PsqlRunner

        cols = [f.name for f in OUTBOX_BATCH_SCHEMA.fields]

        def _flush(buf):
            pdf = pd.DataFrame(buf, columns=cols)
            pdf["ts"] = pd.to_datetime(pdf["ts"])
            return pdf

        for pdf_in in iterator:
            for seg_d, base in pdf_in.itertuples(index=False):
                runner = PsqlRunner(poller.runner.conninfo)
                seq = int(base)
                buf: list[tuple] = []
                for ts_text, changes in poller._spool_txns_iter(seg_d):
                    t = _Txn("", 0, ts_text, changes)
                    resolve_unchanged_toast(runner, [t])
                    ts = (_parse_pg_ts(t.commit_ts)
                          if t.commit_ts else None)
                    for (schema, table, op, row_id, payload,
                         previous) in t.changes:
                        seq += 1
                        buf.append((seq, ts, schema, table, op,
                                    row_id, payload, previous))
                    if len(buf) >= _CHUNK:
                        yield _flush(buf)
                        buf = []
                if buf:
                    yield _flush(buf)

    src = spark.createDataFrame(
        [(seg_dir, int(start_seq))], "seg_dir string, start_seq long",
    )
    return src.mapInPandas(_parse, OUTBOX_BATCH_SCHEMA)


class GiantTxnError(PsqlError):
    """One transaction exceeds the peek window cap (max_peek). Without
    a spill_dir this is a hard, loud error (the LSH-cap philosophy);
    with one, PgLogicalPoller switches to the spill-to-disk drain."""


class PgLogicalCaptureManager:
    """Slot + replica-identity lifecycle — the logical analog of
    PgCaptureManager's remove-then-install contract
    (cmd/pqsd/main.go:95-102). install() is idempotent; remove() drops
    the slot (releasing WAL retention) and resets replica identity."""

    def __init__(self, runner: PsqlRunner, slot: str = DEFAULT_SLOT,
                 table_regexp: str | None = None) -> None:
        _check_ident(slot)
        self.runner = runner
        self.slot = slot
        self.table_regexp = table_regexp

    def discover_tables(self) -> list[str]:
        rows = self.runner.query_csv(DISCOVER_TABLES_SQL)
        return filter_tables([r["table_name"] for r in rows],
                             self.table_regexp)

    def _slot_exists(self) -> bool:
        """Slot names are CLUSTER-global but each slot decodes exactly
        the database it was created in — an existing same-name slot in
        another database would silently shadow this one's creation, so
        that case fails loudly instead."""
        rows = self.runner.query_csv(
            "SELECT database = current_database() AS here "
            "FROM pg_replication_slots "
            f"WHERE slot_name = {_quote_lit(self.slot)}"
        )
        if not rows:
            return False
        if rows[0]["here"] != "t":
            raise RuntimeError(
                f"replication slot {self.slot!r} already exists in another "
                "database of this cluster (slot names are cluster-global); "
                "pick a distinct slot name"
            )
        return True

    def install(self, create_slot: bool = True) -> list[str]:
        """`create_slot=False` applies everything EXCEPT slot creation
        (replica identity, validation): the exactly-once bootstrap
        creates the slot itself via SlotSnapshotSession (walsender,
        exported snapshot) and wants identity-FULL applied BEFORE the
        slot exists so the very first decoded UPDATE already carries
        the complete old tuple."""
        tables = self.discover_tables()
        if not tables:
            raise RuntimeError("no tables match the table regexp")
        wal_level = self.runner.scalar("SHOW wal_level")
        if wal_level != "logical":
            raise RuntimeError(
                f"wal_level is {wal_level!r}; the logical transport needs "
                "wal_level=logical (postgresql.conf + restart)"
            )
        # FULL replica identity: UPDATE carries the complete OLD row and
        # DELETE the complete OLD payload — without it test_decoding
        # emits only key columns (or no old tuple at all), losing the
        # reference's `previous` semantics
        stmts = [
            f'ALTER TABLE "{_check_ident(t)}" REPLICA IDENTITY FULL'
            for t in tables
        ]
        self.runner.sql(";\n".join(stmts) + ";")
        if create_slot and not self._slot_exists():
            self.runner.scalar(
                "SELECT pg_create_logical_replication_slot("
                f"{_quote_lit(self.slot)}, {_quote_lit(DECODING_PLUGIN)})"
            )
        return tables

    def remove(self) -> list[str]:
        tables = self.discover_tables()
        if tables:
            stmts = [
                f'ALTER TABLE "{_check_ident(t)}" REPLICA IDENTITY DEFAULT'
                for t in tables
            ]
            self.runner.sql(";\n".join(stmts) + ";")
        if self._slot_exists():
            # returns void — .sql, not .scalar (void rows CSV-parse empty)
            self.runner.sql(
                f"SELECT pg_drop_replication_slot({_quote_lit(self.slot)});"
            )
        return tables


@dataclass
class _Txn:
    commit_lsn_text: str
    commit_lsn: int
    commit_ts: str | None
    changes: list  # parse_change_line tuples
    # transaction id, when the parser tracked it (pgoutput does; the
    # test_decoding peek path doesn't need it) — spool assembly dedups
    # crash-redelivered complete transactions by this key
    xid: str | None = None


@dataclass
class PgLogicalPoller:
    """Bounded transaction-aligned reads of the logical slot.

    Contract-identical to PgOutboxPoller: `read_batch(spark)` returns a
    DataFrame in OUTBOX_BATCH_SCHEMA; `advance()` after the downstream
    commit makes the batch durable. At-least-once with replay: a crash
    between sink and advance() re-reads the same transactions with the
    SAME seqs, so the seq-named idempotent sink collapses the replay.

    Durable state, two layers:
    - the slot's confirmed_flush_lsn (server-side, crash-safe) — the
      actual resume cursor; pg_replication_slot_advance moves it only
      in advance().
    - a replay-stable dense seq numbering over delivered changes,
      persisted as two PG_OFFSET_TABLE rows: `{consumer}` (seqs
      delivered, = the envelope high-water) and `{consumer}#lsn` (the
      commit LSN those seqs end at, as a bigint byte offset).

    Why a stored numbering instead of deriving seq from the LSN: change
    LSNs are NOT monotone in delivery order (decoding is commit-ordered;
    a late-committing transaction's row LSNs precede an earlier commit's
    — verified live), and CDC materialization requires seq order =
    commit order for its replay guard. The numbering is crash-consistent
    by construction: the offset rows commit in one transaction BEFORE
    the slot advances, and read_batch re-anchors on them — transactions
    whose commit LSN <= the stored LSN are replays and are numbered
    backwards from the stored base (they re-peek in identical WAL order,
    so they get their previous seqs), fresh transactions continue from
    the base. A crash in either window (before the offset write, or
    between it and the slot advance) therefore replays with byte-stable
    seqs.

    Batch boundaries: pg_logical_slot_peek_changes(upto_nchanges) only
    stops after completing a transaction, so batches never tear one —
    and only complete transactions (COMMIT line inside the peeked
    window) are emitted, so a window that truncates mid-transaction
    (giant txn) parks it for the escalated re-peek. The escalation
    doubles the window up to `max_peek` and fails loudly if one
    transaction exceeds it (the LSH_BUCKET_CAP philosophy: bounded,
    with a named knob, never silent)."""

    runner: PsqlRunner
    slot: str = DEFAULT_SLOT
    consumer: str = "logical"
    max_changes: int = 100_000
    max_peek: int = 1_600_000
    table_regexp: str | None = None
    last_seq: int = 0
    last_lsn: int = 0
    # giant-transaction escape hatch (round 10, VERDICT r9 #4): when a
    # transaction exceeds max_peek changes, drain it through
    # pg_recvlogical into on-disk spool segments under this directory
    # instead of failing (see _spool_drain); None keeps the loud error
    spill_dir: str | None = None
    _pending: tuple | None = field(default=None, repr=False)
    _pending_spool: bool = field(default=False, repr=False)

    @classmethod
    def open_durable(cls, runner: PsqlRunner, slot: str = DEFAULT_SLOT,
                     consumer: str = "logical", **kw) -> "PgLogicalPoller":
        p = cls(runner=runner, slot=slot, consumer=consumer, **kw)
        runner.sql(
            f"CREATE TABLE IF NOT EXISTS {PG_OFFSET_TABLE} ("
            "consumer TEXT PRIMARY KEY, last_seq BIGINT NOT NULL);"
            f"INSERT INTO {PG_OFFSET_TABLE} (consumer, last_seq) VALUES "
            f"({_quote_lit(p._seq_key)}, 0), ({_quote_lit(p._lsn_key)}, 0) "
            "ON CONFLICT (consumer) DO NOTHING;"
        )
        seq = runner.scalar(
            f"SELECT last_seq FROM {PG_OFFSET_TABLE} "
            f"WHERE consumer = {_quote_lit(p._seq_key)}"
        )
        lsn = runner.scalar(
            f"SELECT last_seq FROM {PG_OFFSET_TABLE} "
            f"WHERE consumer = {_quote_lit(p._lsn_key)}"
        )
        p.last_seq = int(seq or 0)
        p.last_lsn = int(lsn or 0)
        # Filter anchoring (ADVICE r9): the replay-stable numbering
        # counts only post-filter changes, so a crash-replay is only
        # byte-stable if table_regexp is IDENTICAL across restarts —
        # reopening with a different filter while an unconfirmed window
        # exists would silently renumber the replay (breaking the
        # idempotent-sink and CDC replay-guard invariants). The
        # filter's hash is persisted next to the (seq, LSN) anchors;
        # a mismatch is allowed only when the slot holds NO unconfirmed
        # numbered window (confirmed_flush has reached the anchor LSN),
        # and fails loudly otherwise.
        cur_hash = p._filter_hash()
        stored = runner.scalar(
            f"SELECT last_seq FROM {PG_OFFSET_TABLE} "
            f"WHERE consumer = {_quote_lit(p._filter_key)}"
        )
        if stored is None:
            runner.sql(
                f"INSERT INTO {PG_OFFSET_TABLE} (consumer, last_seq) "
                f"VALUES ({_quote_lit(p._filter_key)}, {cur_hash}) "
                "ON CONFLICT (consumer) DO NOTHING;"
            )
        elif int(stored) != cur_hash:
            confirmed = runner.scalar(
                "SELECT (confirmed_flush_lsn - '0/0'::pg_lsn)::bigint "
                "FROM pg_replication_slots "
                f"WHERE slot_name = {_quote_lit(p.slot)}"
            )
            if confirmed is not None and int(confirmed) < p.last_lsn:
                raise PsqlError(
                    f"tableRegexp changed for consumer {consumer!r} on "
                    f"slot {slot!r} while an unconfirmed window exists "
                    "— a replay under a different filter would renumber "
                    "silently. Drain and advance under the ORIGINAL "
                    "filter first, or use a new consumer+slot."
                )
            runner.sql(
                f"UPDATE {PG_OFFSET_TABLE} SET last_seq = {cur_hash} "
                f"WHERE consumer = {_quote_lit(p._filter_key)};"
            )
        return p

    # `#logical…` suffixes mark these rows as the LOGICAL transport's
    # numbering anchors: they share pqstream_consumer_offset with the
    # outbox transport, whose compact() keys retention on MIN(last_seq)
    # over plain consumer rows — an unsuffixed logical seq counter
    # (a different numbering domain entirely) would stall outbox
    # compaction forever. Both compact() implementations exclude
    # `%#logical%` (like `#bootstrap` / `#reportfloor` / `#lease`).
    @property
    def _seq_key(self) -> str:
        return f"{self.consumer}@{self.slot}#logicalseq"

    @property
    def _lsn_key(self) -> str:
        return f"{self.consumer}@{self.slot}#logicallsn"

    @property
    def _filter_key(self) -> str:
        return f"{self.consumer}@{self.slot}#logicalfilter"

    def _filter_hash(self) -> int:
        import hashlib

        digest = hashlib.sha256(
            (self.table_regexp or "").encode()).digest()
        return int.from_bytes(digest[:8], "big", signed=True)

    # -- peek ---------------------------------------------------------------
    # Flush barrier, folded into the peek's psql invocation: logical
    # decoding only sees FLUSHED WAL, and under asynchronous commit
    # (synchronous_commit=off — this sandbox's test clusters, and a
    # legitimate production setting) a transaction can be committed and
    # visible to queries while its WAL record is still unflushed — a
    # poll right after it would miss it (correct-but-laggy). One
    # synchronously-committed logical message forces the flush up to
    # NOW, so a poll delivers everything committed before it (the
    # NOTIFY-latency property the reference has) for one tiny WAL
    # record. SET and DO produce no result rows, so the invocation's
    # stdout stays a single clean CSV block — barrier + peek in ONE
    # psql spawn (per-poll fixed cost is process spawns, bench_pg.py).
    _BARRIER_SQL = (
        "SET synchronous_commit = on",
        "DO $$ BEGIN PERFORM pg_logical_emit_message("
        "true, 'pqstream_sync', ''); END $$",
    )

    def _peek(self, upto: int, barrier: bool = True) -> list[dict]:
        peek = (
            "SELECT lsn::text AS lsn, (lsn - '0/0'::pg_lsn)::bigint AS "
            "lsn_big, xid::text AS xid, data "
            f"FROM pg_logical_slot_peek_changes({_quote_lit(self.slot)}, "
            f"NULL, {int(upto)}, 'include-timestamp', 'on')"
        )
        pre = self._BARRIER_SQL if barrier else ()
        return self.runner.query_csv(peek, pre_statements=pre)

    def _slot_pending(self) -> bool:
        got = self.runner.scalar(
            "SELECT pg_current_wal_insert_lsn() > confirmed_flush_lsn "
            f"FROM pg_replication_slots WHERE slot_name = {_quote_lit(self.slot)}"
        )
        return got == "t"

    def _parse_txns(self, rows: list[dict]) -> list[_Txn]:
        """test_decoding has no table filter (pgoutput publications
        would), so filtering happens here: engine-internal pqstream_%
        tables are ALWAYS excluded — the slot decodes the poller's own
        offset-table writes, and delivering them would make every
        advance() breed the next batch (the logical analog of the
        outbox path's trigger-feedback exclusion, outbox.py
        DISCOVER_TABLES_SQL) — and `table_regexp` applies the
        server-level capture filter (server.go:149-166). A transaction
        whose changes are all filtered still surfaces (with zero
        changes) so advance() can move the slot past it."""
        import re as _re

        pat = _re.compile(self.table_regexp) if self.table_regexp else None
        txns: list[_Txn] = []
        cur: list = []
        for r in rows:
            data = r["data"] or ""
            if data.startswith("BEGIN"):
                cur = []
            elif data.startswith("COMMIT"):
                m = _COMMIT_TS_RE.match(data)
                ts = m.group(1) if m else None
                txns.append(_Txn(r["lsn"], int(r["lsn_big"]), ts, cur))
                cur = []
            else:
                for ch in parse_change_line(data):
                    table = ch[1]
                    if table.startswith("pqstream_"):
                        continue
                    if pat is not None and not pat.search(table):
                        continue
                    cur.append(ch)
        return txns

    def read_rows(
        self, upto: int | None = None
    ) -> tuple[list[tuple], list[tuple[int, str, int]]]:
        """The peek path, plus the giant-transaction spill drain when
        `spill_dir` is set: a leftover spool (crash recovery) is
        consumed first; a GiantTxnError from the peek escalation
        switches to `_spool_drain` (bounded memory on BOTH sides:
        the server's reorder buffer spills at logical_decoding_work_mem
        and the client streams to disk via pg_recvlogical)."""
        while True:
            if self.spill_dir is not None:
                import os

                if os.path.isdir(self._spool_dir()) and any(
                    f.startswith("seg-")
                    for f in os.listdir(self._spool_dir())
                ):
                    got = self._rows_from_spool()
                    if got is not None:
                        return got
            try:
                return self._read_rows_peek(upto)
            except GiantTxnError:
                if self.spill_dir is None:
                    raise
                self._spool_drain()
                got = self._rows_from_spool()
                if got is not None:
                    return got
                # fully-filtered spool: the slot advanced past it
                # (_rows_from_spool cleaned up) — loop back to the peek
                # for whatever follows. Terminates: every iteration
                # moves confirmed_flush strictly forward.

    def _read_rows_peek(
        self, upto: int | None = None
    ) -> tuple[list[tuple], list[tuple[int, str, int]]]:
        """Spark-free core of read_batch: one fenced-equivalent peek →
        (rows, txn_boundaries). `rows` are OUTBOX_BATCH_SCHEMA-shaped
        tuples with replay-stable seqs; `txn_boundaries` is
        [(end_seq_of_txn, commit_lsn_text, commit_lsn_big), ...] for
        every COMPLETE transaction in the window (including
        change-free engine/message transactions) — the offsets a
        streaming source may report and later advance to. Sets
        `_pending` to the window's last boundary (the advance()
        contract). `upto` overrides the initial window (the streaming
        source's progress-aware escalation)."""
        self._pending_spool = False
        upto = upto or self.max_changes
        rows = self._peek(upto)
        txns = self._parse_txns(rows)
        while not txns and upto < self.max_peek and (
            rows or self._slot_pending()
        ):
            # window truncated mid-transaction, or the decoder returned
            # nothing for a small window while WAL is pending — escalate
            # (barrier already flushed on the first peek)
            upto = min(upto * 4, self.max_peek)
            rows = self._peek(upto, barrier=False)
            txns = self._parse_txns(rows)
        if not txns:
            if rows:
                raise GiantTxnError(
                    f"one transaction exceeds max_peek={self.max_peek} "
                    "changes; raise max_peek for this drain, or set "
                    "spill_dir for the bounded-memory spill drain"
                )
            self._pending = None
            return [], []
        # The replay region must be WHOLLY inside the window before the
        # numbering is derivable (review finding): the stored anchor
        # says "seqs end at last_seq AT commit-LSN last_lsn" — if the
        # window ends BELOW that LSN it holds only a prefix of the
        # replayed changes, and `last_seq - n_replay` would tail-number
        # the prefix (e.g. original seqs 1-40 renumbered 61-100:
        # silent corruption). Escalate until the window reaches the
        # anchor; a window that cannot is a hard error, never a guess.
        while (txns[-1].commit_lsn < self.last_lsn
               and upto < self.max_peek):
            upto = min(upto * 4, self.max_peek)
            rows = self._peek(upto, barrier=False)
            txns = self._parse_txns(rows)
        if txns[-1].commit_lsn < self.last_lsn:
            raise GiantTxnError(
                f"peek window (max_peek={self.max_peek}) cannot cover "
                f"the replay region up to the stored anchor LSN "
                f"{self.last_lsn}; raise max_peek to renumber the "
                "replay consistently, or set spill_dir"
            )
        self._resolve_unchanged_toast(txns)
        # replay-stable numbering (class docstring): txns at or below
        # the stored LSN are replays of already-numbered changes
        n_replay = sum(
            len(t.changes) for t in txns if t.commit_lsn <= self.last_lsn
        )
        base = self.last_seq - n_replay
        data: list[tuple] = []
        boundaries: list[tuple[int, str, int]] = []
        seq = base
        for t in txns:
            ts = _parse_pg_ts(t.commit_ts) if t.commit_ts else None
            for (schema, table, op, row_id, payload, previous) in t.changes:
                seq += 1
                data.append(
                    (seq, ts, schema, table, op, row_id, payload, previous)
                )
            boundaries.append((seq, t.commit_lsn_text, t.commit_lsn))
        last = txns[-1]
        self._pending = (last.commit_lsn_text, last.commit_lsn, seq)
        return data, boundaries

    def _resolve_unchanged_toast(self, txns: list[_Txn]) -> None:
        """See module-level resolve_unchanged_toast (extracted in
        round 11 so the executor-side spool scan shares it)."""
        resolve_unchanged_toast(self.runner, txns)

    # -- giant-transaction spill drain (round 10, VERDICT r9 #4) -------------
    # A transaction larger than max_peek cannot be assembled through
    # pg_logical_slot_peek_changes windows (every peek re-decodes from
    # confirmed_flush and upto_nchanges must cover the whole txn to see
    # its COMMIT). The spill drain streams the backlog to DISK instead:
    # pg_recvlogical (walsender START_REPLICATION) writes decoded text
    # to a spool segment with -F 1, so the slot's confirmed_flush never
    # passes the segment's fsynced prefix — the file IS the durable
    # copy of everything the slot has released. Memory stays bounded on
    # both sides (the server's reorder buffer spills to its own disk at
    # logical_decoding_work_mem; the client writes sequentially).
    #
    # Crash contract: a `.done` marker (fsynced) records a clean drain
    # covering [start, endpos]. A crash mid-drain leaves a segment
    # without `.done`; recovery re-drains to a NEW segment with the
    # SAME endpos — logical decoding redelivers any txn whose COMMIT
    # was not confirmed WHOLE, so assembly dedups complete BEGIN..COMMIT
    # blocks by xid (keep-first preserves commit order) and drops torn
    # tails of non-final segments. Seqs number from the meta's
    # start_seq, so reassembly after any crash is byte-identical (the
    # files are fixed); after the sink, advance() writes the offset
    # rows, moves the slot forward to endpos (GREATEST-guarded: the
    # drain usually left it there already), and deletes the spool.

    def _spool_dir(self) -> str:
        import os

        return os.path.join(self.spill_dir, self.slot)

    def _spool_txns_iter(self, seg_dir: str):
        """Plugin hook: spool segment files → complete (commit_ts,
        changes) transactions, crash-redelivery-deduped, as a lazy
        iterator (the executor scan streams it). test_decoding rides
        the text assembler; PgOutputPoller overrides with the binary
        frame scanner (inherently materialized — streamed-chunk
        reassembly needs the full buffer)."""
        return assemble_spool_txns(seg_dir, self.table_regexp)

    def _spool_txns(self, seg_dir: str) -> list[tuple[str | None, list]]:
        return list(self._spool_txns_iter(seg_dir))

    def _recv_plugin_options(self) -> list[str]:
        """Plugin hook: extra pg_recvlogical `-o` options for the spool
        drain (plugin output options travel with the plugin)."""
        return ["-o", "include-timestamp=on"]

    def _spool_meta_path(self) -> str:
        import os

        return os.path.join(self._spool_dir(), "meta.json")

    def _spool_drain(self, start_seq: int | None = None) -> None:
        """Drain the slot's backlog into the next spool segment, up to
        a freshly-flushed endpos (resume-safe: reuses a leftover meta's
        endpos so recovery converges instead of chasing new WAL).
        `start_seq` overrides the meta's numbering base (default: the
        durable anchor) — the sharded DataSource chains spool
        GENERATIONS whose bases run ahead of the committed anchor."""
        import os

        bin_ = shutil.which("pg_recvlogical")
        if bin_ is None:
            raise PsqlError(
                "spill drain needs pg_recvlogical (not installed)"
            )
        d = self._spool_dir()
        os.makedirs(d, exist_ok=True)
        # torn-advance repair: when the stored anchor LSN is ahead of
        # the slot (crash between the offset write and the slot
        # advance), everything at or below it was already SUNK and
        # offset-anchored — advancing the slot forward to the anchor is
        # safe and required here: the spool has no per-line LSNs, so it
        # cannot renumber a replayed prefix the way the peek path does;
        # repairing first makes the spool cover exactly (anchor, endpos]
        # with fresh seqs from last_seq.
        if self.last_lsn > 0:
            self.runner.sql(
                "SELECT pg_replication_slot_advance(slot_name, "
                f"GREATEST(confirmed_flush_lsn, "
                f"'0/0'::pg_lsn + {int(self.last_lsn)})) "
                "FROM pg_replication_slots "
                f"WHERE slot_name = {_quote_lit(self.slot)} "
                f"AND confirmed_flush_lsn < '0/0'::pg_lsn + {int(self.last_lsn)};"
            )
        meta_path = self._spool_meta_path()
        if os.path.exists(meta_path):
            meta = json.load(open(meta_path))
        else:
            # flush barrier first: endpos must cover everything
            # committed before this drain (async commits included)
            self.runner.sql(
                "SET synchronous_commit = on;\n"
                "SELECT pg_logical_emit_message(true, 'pqstream_sync', '');"
            )
            endpos = self.runner.scalar("SELECT pg_current_wal_lsn()::text")
            endpos_big = int(self.runner.scalar(
                f"SELECT ('{endpos}'::pg_lsn - '0/0'::pg_lsn)::bigint"))
            meta = {"start_seq": (self.last_seq if start_seq is None
                                  else int(start_seq)),
                    "endpos": endpos, "endpos_big": endpos_big}
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, meta_path)
        segs = sorted(f for f in os.listdir(d) if f.startswith("seg-"))
        seg = os.path.join(d, f"seg-{len(segs):04d}.txt")
        proc = subprocess.run(
            [bin_, "-d", self.runner.conninfo, "--slot", self.slot,
             "--start", "--endpos", meta["endpos"], "-f", seg,
             "--no-loop", "-F", "1", *self._recv_plugin_options()],
            capture_output=True, text=True, cwd="/tmp",
        )
        if proc.returncode != 0:
            raise PsqlError(
                f"spill drain failed (rc={proc.returncode}): "
                f"{proc.stderr.strip()} — the spool segment holds the "
                "fsynced prefix; the next read_rows resumes the drain"
            )
        done = os.path.join(d, "done")
        with open(done, "w") as f:
            f.write(meta["endpos"])
            f.flush()
            os.fsync(f.fileno())

    def _rows_from_spool(self):
        """Assemble the spool into (rows, boundaries) with replay-stable
        seqs, or None when the spool is absent/already consumed (files
        then cleaned up). An un-`done` spool first resumes the drain."""
        import os

        d = self._spool_dir()
        meta_path = self._spool_meta_path()
        if not os.path.isdir(d) or not os.path.exists(meta_path):
            return None
        if not os.path.exists(os.path.join(d, "done")):
            self._spool_drain()  # crash recovery: finish the drain
        meta = json.load(open(meta_path))
        txns = self._spool_txns(d)
        base = int(meta["start_seq"])
        n_total = sum(len(c) for _, c in txns)
        if n_total == 0:
            # the WHOLE spooled window was filtered out (table_regexp /
            # engine tables): no seqs were assigned, so nothing needs
            # sinking — advance the slot past the window and resume the
            # peek path (ADVICE r10 medium: without this the consumed-
            # check never fires and a DataSource — which never calls
            # advance() — re-reads the empty spool forever, permanently
            # stalling the stream)
            self.advance_to(meta["endpos"], int(meta["endpos_big"]), base)
            self._spool_cleanup()
            return None
        if self.last_seq >= base + n_total:
            # consumed in a prior run (crash between offset write and
            # cleanup): drop the spool and let the peek path continue
            self._spool_cleanup()
            return None
        # spool rows go through the SAME unchanged-TOAST resolution as
        # the peek path (review fix: without it the NUL-framed marker
        # from a non-FULL-identity UPDATE would leak to the sink)
        txn_objs = [_Txn("", 0, ts_text, changes)
                    for ts_text, changes in txns]
        self._resolve_unchanged_toast(txn_objs)
        data: list[tuple] = []
        seq = base
        for t in txn_objs:
            ts = _parse_pg_ts(t.commit_ts) if t.commit_ts else None
            for (schema, table, op, row_id, payload, previous) in t.changes:
                seq += 1
                data.append(
                    (seq, ts, schema, table, op, row_id, payload, previous)
                )
        self._pending = (meta["endpos"], int(meta["endpos_big"]), seq)
        self._pending_spool = True
        return data, [(seq, meta["endpos"], int(meta["endpos_big"]))]

    def _spool_cleanup(self) -> None:
        import os

        d = self._spool_dir()
        if os.path.isdir(d):
            for f in os.listdir(d):
                os.unlink(os.path.join(d, f))
            os.rmdir(d)

    def _advance_spool(self, lsn_text: str, lsn_big: int,
                       end_seq: int) -> None:
        """Spool-batch advance: advance_to (its GREATEST guard absorbs
        the slot already sitting at the spool endpos — the drain moved
        it), then the spool is deleted. A crash before the delete is
        absorbed by _rows_from_spool's consumed-check."""
        self.advance_to(lsn_text, lsn_big, end_seq)
        self._pending_spool = False
        self._spool_cleanup()
        df = getattr(self, "_spool_df", None)
        if df is not None:
            df.unpersist()
            self._spool_df = None

    def read_batch(self, spark):
        data, _ = self.read_rows()
        return spark.createDataFrame(data, OUTBOX_BATCH_SCHEMA)

    # -- continuous executor-side spool ingest (round 11, VERDICT r10 #2) ----
    # The round-10 spill machinery generalized from a giant-txn
    # overflow path into an ALWAYS-ON ingest mode: every poll drains
    # the slot's backlog through pg_recvlogical into spool segments
    # (PG -> disk directly, never through driver Python), and the
    # segments are parsed ON AN EXECUTOR via mapInPandas — the driver
    # handles only the meta bookkeeping and the row COUNT. This removes
    # the driver-side createDataFrame of wide python tuples (the
    # dominant cost of the peek path on wide rows: every byte was
    # parsed AND pickled in the driver), replacing it with one Arrow
    # task per batch. WAL decode stays serial per slot (it IS the
    # changelog); cross-slot parallelism comes from sharded capture
    # (sharded_pg.py). Cluster note: local mode shares the filesystem;
    # on a real cluster spill_dir must be shared storage reachable from
    # executors, and conninfo reachable for the TOAST P3 resolution.

    def read_batch_spool_distributed(self, spark):
        """One continuous-mode poll: ensure a drained spool, scan it on
        an executor, return (DataFrame, n_rows). The DataFrame is
        persisted (parse once: the count here + the caller's sink reuse
        it); advance() unpersists and cleans the spool. Crash contract
        identical to the overflow spool: a crash between sink and
        advance re-parses the SAME files into byte-identical seqs; a
        crash between offset write and cleanup is absorbed by the
        consumed-check (spool dropped, fresh drain)."""
        import os

        if self.spill_dir is None:
            raise ValueError(
                "continuous spool ingest needs spill_dir (the spool "
                "directory is the durable copy of drained WAL)"
            )
        for _ in range(3):
            d = self._spool_dir()
            if not (os.path.isdir(d)
                    and os.path.exists(self._spool_meta_path())):
                self._spool_drain()
            elif not os.path.exists(os.path.join(d, "done")):
                self._spool_drain()  # crash recovery: resume the drain
            meta = json.load(open(self._spool_meta_path()))
            base = int(meta["start_seq"])
            df = spool_scan(spark, self, d, base).persist()
            n = df.count()
            if n == 0:
                # idle poll (barrier/engine txns only) or fully
                # filtered window: advance the slot, clean, report
                # empty — do NOT re-drain (each drain writes its own
                # barrier record; looping would churn forever)
                df.unpersist()
                self.advance_to(meta["endpos"], int(meta["endpos_big"]),
                                base)
                self._spool_cleanup()
                self._pending = None
                return spark.createDataFrame([], OUTBOX_BATCH_SCHEMA), 0
            if self.last_seq >= base + n:
                # consumed in a prior run (crash between offset write
                # and cleanup): drop and drain the fresh backlog
                df.unpersist()
                self._spool_cleanup()
                continue
            self._pending = (meta["endpos"], int(meta["endpos_big"]),
                             base + n)
            self._pending_spool = True
            self._spool_df = df
            return df, n
        raise PsqlError(
            "spool ingest could not converge on an unconsumed spool "
            "after 3 drains — is another consumer advancing this slot?"
        )

    def advance(self) -> None:
        """Durable commit of the last read_batch, AFTER the downstream
        sink: (1) offset rows in one transaction, (2) slot advance.
        Either crash window replays with identical seqs (class
        docstring)."""
        if not self._pending:
            return
        if self._pending_spool:
            self._advance_spool(*self._pending)
            return
        self.advance_to(*self._pending)

    def advance_to(self, lsn_text: str, lsn_big: int, end_seq: int) -> None:
        """Explicit-boundary advance (streaming DataSource commit path:
        the engine commits txn-aligned offsets from read_rows'
        boundaries, not necessarily the newest one read)."""
        stmts = []
        if end_seq > self.last_seq:
            # only a batch that DELIVERED something moves the offset
            # rows; an engine-only batch (the slot decoding this very
            # bookkeeping) advances the slot alone — a table write here
            # would breed the next batch forever
            stmts += [
                "BEGIN",
                f"INSERT INTO {PG_OFFSET_TABLE} (consumer, last_seq) VALUES "
                f"({_quote_lit(self._seq_key)}, {int(end_seq)}) "
                "ON CONFLICT (consumer) DO UPDATE SET last_seq = "
                f"GREATEST({PG_OFFSET_TABLE}.last_seq, excluded.last_seq)",
                f"INSERT INTO {PG_OFFSET_TABLE} (consumer, last_seq) VALUES "
                f"({_quote_lit(self._lsn_key)}, {int(lsn_big)}) "
                "ON CONFLICT (consumer) DO UPDATE SET last_seq = "
                f"GREATEST({PG_OFFSET_TABLE}.last_seq, excluded.last_seq)",
                "COMMIT",
            ]
        # one psql spawn: the offset transaction COMMITs strictly before
        # the slot advance in the same session — the same crash-window
        # ordering as two spawns, half the per-poll process cost.
        # GREATEST-guarded (round 10): pg_replication_slot_advance
        # refuses to move backwards, and a spool drain (pg_recvlogical)
        # leaves the slot already AT the boundary — the guard makes
        # advance_to idempotent for every caller (poller, DataSource
        # commit, spool batches) instead of erroring on a no-op.
        stmts.append(
            "SELECT pg_replication_slot_advance(slot_name, "
            f"GREATEST(confirmed_flush_lsn, {_quote_lit(lsn_text)}::pg_lsn)) "
            "FROM pg_replication_slots "
            f"WHERE slot_name = {_quote_lit(self.slot)} "
            f"AND confirmed_flush_lsn < {_quote_lit(lsn_text)}::pg_lsn"
        )
        self.runner.sql(";\n".join(stmts) + ";")
        # monotone like the SQL GREATEST merge — a late/duplicate
        # commit of an older boundary must not regress the numbering
        # anchor
        self.last_seq = max(self.last_seq, end_seq)
        self.last_lsn = max(self.last_lsn, lsn_big)
        self._pending = None

    def lag(self) -> dict:
        """Operational backlog: WAL bytes the slot has not confirmed,
        plus the retention-health columns (round 10): `wal_status`
        'unreserved'/'lost' means max_slot_wal_keep_size pressure is
        discarding WAL the slot still needs — the abandoned-slot
        footgun; `safe_wal_size` is the byte budget left before that
        happens (None when no limit is configured)."""
        rows = self.runner.query_csv(
            "SELECT (pg_current_wal_insert_lsn() - confirmed_flush_lsn)"
            "::bigint AS pending, wal_status, safe_wal_size "
            f"FROM pg_replication_slots WHERE slot_name = {_quote_lit(self.slot)}"
        )
        r = rows[0] if rows else {}
        return {
            "slot": self.slot,
            "consumer": self.consumer,
            "last_seq": self.last_seq,
            "wal_bytes_pending": int(r.get("pending") or 0),
            "wal_status": r.get("wal_status"),
            "safe_wal_size": (
                int(r["safe_wal_size"])
                if r.get("safe_wal_size") is not None else None
            ),
        }


class SlotSnapshotSession:
    """Create a logical replication slot over the REAL replication
    protocol (walsender `CREATE_REPLICATION_SLOT ... (SNAPSHOT
    'export')`) and hold the session open so the exported snapshot
    stays usable — the exactly-once bootstrap anchor (round 10, VERDICT
    r9 #2): the snapshot shows exactly the transactions that committed
    BEFORE the slot's consistent point, and the slot decodes exactly
    those after it, so snapshot ∪ changelog partitions history
    DISJOINTLY (no overlap window to absorb downstream). This is the
    same mechanism PostgreSQL's own CREATE SUBSCRIPTION copy_data uses.

    Transport: one long-lived psql on `conninfo + ' replication=
    database'` (walsender sessions accept both replication grammar and
    SQL); the result row lands in a temp file via \\o because psql's
    stdout is block-buffered on a pipe. Readers consume the snapshot
    from OTHER sessions via `SET TRANSACTION SNAPSHOT '<name>'` inside
    REPEATABLE READ (PsqlRunner.query_csv pre_statements); it stays
    valid until this session closes.

        with SlotSnapshotSession(conninfo, slot) as ss:
            df = pg_snapshot_batch(runner, spark, regexp,
                                   snapshot_name=ss.snapshot_name)
        # session closed: snapshot released, slot persists
    """

    def __init__(self, conninfo: str, slot: str,
                 plugin: str = DECODING_PLUGIN, timeout: float = 30.0):
        _check_ident(slot)
        self.conninfo = conninfo
        self.slot = slot
        self.plugin = plugin
        self.timeout = timeout
        self.snapshot_name: str | None = None
        self.consistent_point: str | None = None
        self._proc: subprocess.Popen | None = None
        self._out: str | None = None

    @staticmethod
    def create_slot_command(slot: str, plugin: str,
                            server_version_num: int) -> str:
        """The walsender CREATE_REPLICATION_SLOT grammar is version-
        gated (ADVICE r10 low): PG15+ takes the option-list form
        `(SNAPSHOT 'export')`; PG10-14 only accept the keyword form
        `EXPORT_SNAPSHOT` — emitting the new grammar there raises a
        syntax error and crashes the exactly-once bootstrap instead of
        exporting the snapshot."""
        if server_version_num >= 150000:
            return (f'CREATE_REPLICATION_SLOT "{slot}" LOGICAL '
                    f"{plugin} (SNAPSHOT 'export');")
        return (f'CREATE_REPLICATION_SLOT "{slot}" LOGICAL '
                f"{plugin} EXPORT_SNAPSHOT;")

    def __enter__(self) -> "SlotSnapshotSession":
        import os
        import tempfile
        import time

        version_num = int(
            PsqlRunner(self.conninfo).scalar("SHOW server_version_num")
            or 150000
        )
        fd, self._out = tempfile.mkstemp(prefix="pq_slot_snap_")
        os.close(fd)
        os.unlink(self._out)  # \o creates it; emptiness = not-ready
        self._proc = subprocess.Popen(
            ["psql", f"{self.conninfo} replication=database",
             "-X", "-A", "-t", "-f", "-"],
            stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE, text=True, cwd="/tmp",
        )
        self._proc.stdin.write(
            f"\\o {self._out}\n"
            + self.create_slot_command(self.slot, self.plugin, version_num)
            + "\n\\o\n"
        )
        self._proc.stdin.flush()
        deadline = time.time() + self.timeout
        line = ""
        while time.time() < deadline:
            if self._proc.poll() is not None:
                err = (self._proc.stderr.read() or "").strip()
                self.close()
                raise PsqlError(
                    f"CREATE_REPLICATION_SLOT failed for {self.slot!r}: {err}"
                )
            if os.path.exists(self._out) and os.path.getsize(self._out):
                line = open(self._out).read().strip()
                if line:
                    break
            time.sleep(0.05)
        if not line:
            self.close()
            raise PsqlError(
                f"CREATE_REPLICATION_SLOT timed out for {self.slot!r}"
            )
        parts = line.split("|")
        if len(parts) < 4 or parts[2] in ("", None):
            self.close()
            raise PsqlError(f"unexpected CREATE_REPLICATION_SLOT row: {line!r}")
        _, self.consistent_point, self.snapshot_name, _ = parts[:4]
        return self

    def close(self) -> None:
        import contextlib
        import os

        if self._proc is not None:
            with contextlib.suppress(Exception):
                self._proc.stdin.close()
            with contextlib.suppress(Exception):
                self._proc.wait(timeout=10)
            self._proc = None
        if self._out and os.path.exists(self._out):
            with contextlib.suppress(OSError):
                os.unlink(self._out)

    def __exit__(self, *exc) -> None:
        self.close()


def recv_changes_walsender(
    conninfo: str, slot: str, endpos: str, timeout: float = 60.0
) -> list[str]:
    """Bounded drain over the REAL replication protocol: one
    `pg_recvlogical --start --endpos` invocation (walsender
    START_REPLICATION under the hood), exiting at `endpos`. This is the
    wire a cluster-grade deployment would hold open per executor; here
    it parity-checks the SQL decoding interface (same plugin, same text
    format — tests assert multiset equality) and proves the walsender
    path works in this sandbox. NOTE: pg_recvlogical confirms receipt
    as it streams, so this CONSUMES from the slot — use a dedicated
    slot, not the poller's."""
    bin_ = shutil.which("pg_recvlogical")
    if bin_ is None:
        raise RuntimeError("pg_recvlogical not installed")
    proc = subprocess.run(
        [bin_, "-d", conninfo, "--slot", slot, "--start",
         "--endpos", endpos, "-f", "-", "--no-loop",
         "-o", "include-timestamp=on"],
        capture_output=True, text=True, timeout=timeout, cwd="/tmp",
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"pg_recvlogical failed (rc={proc.returncode}): "
            f"{proc.stderr.strip()}"
        )
    # quote-parity reassembly first (a value containing '\n' spans
    # physical lines — see iter_logical_records), THEN drop records
    # that are genuinely empty
    return [
        rec for rec in iter_logical_records(proc.stdout.splitlines())
        if rec.strip()
    ]
