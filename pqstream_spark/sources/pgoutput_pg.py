"""`pgoutput` capture backend — the REPLICATION-grade logical decoding
plugin (the one PostgreSQL's own publication/subscription system uses),
with SERVER-SIDE table filtering via publications (SURVEY §2 S1/S5;
round 9, second logical plugin).

Why a second plugin when test_decoding works: test_decoding has no
table filter, so a slot decodes EVERY table and the engine filters
client-side — at scale that pays decode CPU and transfer for unwanted
tables, including the engine's own offset-table writes (the feedback
problem `logical_pg._parse_txns` filters away). A PUBLICATION scopes
decoding to the captured tables ON THE SERVER: unpublished tables never
reach the wire at all, and the engine's bookkeeping writes produce
empty transactions (Begin/Commit only) instead of discarded changes.

The binary protocol rides the SAME peek/advance machinery as the
test_decoding poller — `pg_logical_slot_peek_binary_changes` returns
one MESSAGE per row (hex-decoded here), so `PgOutputPoller` subclasses
`PgLogicalPoller` overriding only the peek and the parse: bounded
transaction-aligned batches, replay-stable seq numbering anchored on
(consumer seq, commit LSN) offset rows, escalating windows, the flush
barrier, both torn-advance crash windows — all inherited and re-proven
by the parity tests.

Message formats parsed (public PostgreSQL docs, "Logical Streaming
Replication Protocol", protocol version 1): Begin 'B', Commit 'C',
Relation 'R' (column names + type OIDs — the registry that types the
envelope JSON), Insert 'I', Update 'U' (old tuple 'O' with REPLICA
IDENTITY FULL, key-only 'K' otherwise), Delete 'D', Truncate 'T',
Origin 'O'/Type 'Y'/Message 'M' skipped. Tuple values arrive in text
format; JSON rendering matches the test_decoding path (bare numerics /
booleans by type OID, ISO-normalized timestamps, strings otherwise) —
pinned value-identical by the parity test. One fidelity gain over
test_decoding: pgoutput keeps NULL columns in OLD tuples too, so
DELETE payloads and UPDATE previous are complete rows."""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field

from .logical_pg import (
    DEFAULT_SLOT,
    UNCHANGED_TOAST_MARKER,
    PgLogicalPoller,
    _MARKER_JSON,
    _normalize_ts,
    _Txn,
)
from .outbox import DISCOVER_TABLES_SQL, _check_ident, filter_tables
from .outbox_pg import PsqlRunner, _quote_lit

DEFAULT_PUBLICATION = "pqstream_pub"

# type OIDs whose text rendering is a valid bare JSON scalar
_BARE_OIDS = {
    20, 21, 23,  # int8, int2, int4
    26,          # oid
    700, 701,    # float4, float8
    1700,        # numeric
}
_BOOL_OID = 16
_TS_OIDS = {1114, 1184}  # timestamp, timestamptz


@dataclass
class _Relation:
    schema: str
    table: str
    columns: list  # [(name, type_oid)]


class _Reader:
    """Sequential reader over one binary pgoutput message."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def i16(self) -> int:
        (v,) = struct.unpack_from(">h", self.buf, self.pos)
        self.pos += 2
        return v

    def i32(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def i64(self) -> int:
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def cstring(self) -> str:
        end = self.buf.index(0, self.pos)
        s = self.buf[self.pos:end].decode("utf-8")
        self.pos = end + 1
        return s

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b


def _read_tuple(r: _Reader) -> list[str | None] | None:
    """TupleData → per-column text values (None = SQL NULL). Returns
    None when the sentinel says no tuple follows."""
    ncols = r.i16()
    vals: list[str | None] = []
    for _ in range(ncols):
        kind = r.u8()
        if kind == ord("n"):
            vals.append(None)
        elif kind == ord("u"):
            # unchanged TOAST — the value was NOT sent (the new tuple
            # reuses the old toast pointer). Round-10 lead fix: mapping
            # this to None silently nulled the column in UPDATE
            # payloads; the NUL-framed marker (collision-free: PG text
            # cannot contain NUL) is backfilled from the old tuple in
            # _envelopes, or P3-resolved by the inherited poller.
            vals.append(UNCHANGED_TOAST_MARKER)
        elif kind == ord("t"):
            n = r.i32()
            vals.append(r.take(n).decode("utf-8"))
        else:  # 'b' binary — never requested by this reader
            n = r.i32()
            r.take(n)
            vals.append(None)
    return vals


def _row_json(rel: _Relation, vals: list[str | None]) -> str:
    """Typed text values → compact JSON, column order preserved (the
    envelope convention shared with the test_decoding parser)."""
    parts = []
    for (name, oid), val in zip(rel.columns, vals):
        if val is None:
            rendered = "null"
        elif val == UNCHANGED_TOAST_MARKER:
            # unresolved unchanged-TOAST placeholder (no FULL-identity
            # old tuple to backfill from): rendered as the escaped
            # marker REGARDLESS of the column's type oid (a bare-oid
            # rendering would emit invalid JSON) for the poller's P3
            # resolution pass — it never reaches a sink
            rendered = _MARKER_JSON
        elif oid in _BARE_OIDS:
            rendered = val
        elif oid == _BOOL_OID:
            rendered = "true" if val == "t" else "false"
        else:
            if oid in _TS_OIDS:
                val = _normalize_ts(val)
            rendered = json.dumps(val, ensure_ascii=False)
        parts.append(f"{json.dumps(name, ensure_ascii=False)}:{rendered}")
    return "{" + ",".join(parts) + "}"


def _skip_cstring(buf: bytes, i: int) -> int:
    return buf.index(0, i) + 1


def _skip_tupledata(buf: bytes, i: int) -> int:
    (ncols,) = struct.unpack_from(">h", buf, i)
    i += 2
    for _ in range(ncols):
        kind = buf[i]
        i += 1
        if kind in (ord("n"), ord("u")):
            continue
        (ln,) = struct.unpack_from(">i", buf, i)
        i += 4
        if ln > 0:
            i += ln
    return i


def scan_pgoutput_frames(data: bytes) -> list[bytes]:
    """Reframe a pg_recvlogical byte stream into pgoutput MESSAGES
    (round 11, VERDICT r10 #3 — the pgoutput giant-transaction spool).
    pg_recvlogical separates messages with a single '\\n', but the
    messages are BINARY and may themselves contain 0x0A (any text
    value with a newline does), so line splitting is ambiguous. The
    messages are structurally self-describing instead: every type's
    length is computable from its content (cstrings are NUL-terminated,
    TupleData carries explicit column lengths), so this scanner walks
    the stream message-by-message and verifies the separator at each
    computed boundary. In-stream messages (between Stream Start 'S'
    and Stream Stop 'E') carry a 4-byte xid prefix — tracked
    statefully, exactly like the poller's streamed reassembly.

    A torn tail (crash mid-write: truncated message, or a missing
    separator) stops the scan; the un-consumed suffix belongs to a
    transaction without a commit, which the assembly drops and the
    resumed drain redelivers whole."""
    frames: list[bytes] = []
    i, n = 0, len(data)
    in_stream = False
    while i < n:
        try:
            kind = chr(data[i])
            j = i + 1
            if in_stream and kind in "RIUDTM":
                j += 4  # xid prefix on in-stream messages (proto v2)
            if kind == "B":
                j += 20
            elif kind == "C":
                j += 25
            elif kind == "O":
                j = _skip_cstring(data, j + 8)
            elif kind == "R":
                j += 4
                j = _skip_cstring(data, j)
                j = _skip_cstring(data, j)
                j += 1
                (ncols,) = struct.unpack_from(">h", data, j)
                j += 2
                for _ in range(ncols):
                    j += 1
                    j = _skip_cstring(data, j)
                    j += 8
            elif kind == "Y":
                j = _skip_cstring(data, _skip_cstring(data, j + 4))
            elif kind == "I":
                j = _skip_tupledata(data, j + 5)
            elif kind == "U":
                j += 4
                tag = chr(data[j])
                j = _skip_tupledata(data, j + 1)
                if tag in ("K", "O"):
                    j = _skip_tupledata(data, j + 1)
            elif kind == "D":
                j = _skip_tupledata(data, j + 5)
            elif kind == "T":
                (nrels,) = struct.unpack_from(">i", data, j)
                j += 4 + 1 + 4 * nrels
            elif kind == "M":
                j = _skip_cstring(data, j + 9)
                (ln,) = struct.unpack_from(">i", data, j)
                j += 4 + max(ln, 0)
            elif kind == "S":
                j += 5
                in_stream = True
            elif kind == "E":
                in_stream = False
            elif kind == "c":
                j += 29
            elif kind == "A":
                j += 8
            else:
                break  # unknown type: garbage/torn — stop
        except (IndexError, struct.error):
            break  # truncated message — torn tail
        if j > n:
            break
        if j < n and data[j] != 0x0A:
            break  # framing violated — treat the rest as torn
        frames.append(data[i:j])
        i = j + 1
    return frames


SPOOL_SIDECAR = "sidecar.json"
SPOOL_SIDECAR_VERSION = 1


def build_spool_sidecar(seg_dir: str,
                        table_regexp: str | None = None) -> dict:
    """One structural pass over a drained spool generation → the
    driver-facing summary the sharded DataSource needs to plan offsets
    (round 13, VERDICT r12 #1): row count, per-transaction commit-LSN
    boundaries, and SEEK points for slice reads — computed OUTSIDE the
    driver process (write_spool_sidecar runs in a per-shard subprocess
    at drain time), so driver CPU per drained GB stays flat and the
    per-shard fan-out is real OS parallelism, not GIL-shared threads.

    Contents:
    - n: deliverable row count (same xid-dedup + table filter as the
      full parse — equal by construction: the same `_parse_txns` state
      machine runs with the light envelope classifier).
    - bounds: [[cum_rows, commit_lsn_text, commit_lsn_big], ...] per
      row-bearing transaction (the engine offset's advance targets).
    - resume: [[cum_rows_before, seg_name, byte_off, frame_idx], ...]
      one per transaction — a slice read can start the FULL parse at
      the greatest boundary <= its lo instead of re-parsing the
      generation's prefix (VERDICT r12 What's-wrong #2: prefix re-parse
      made multi-batch consumption of one generation quadratic).
      Emitted only when seeking is provably safe: no streamed (proto
      v2) frames and no duplicate xids (crash-redelivery dedup is
      keep-FIRST — a mid-spool resume could not see the first copy).
    - rel_frames: [[frame_idx, hex], ...] — every Relation message,
      so a seek can pre-feed the registry entries its prefix skipped
      (pgoutput sends each table's Relation message once per session,
      before first use).
    - segs: {seg_name: byte_size} — staleness guard; a sidecar that
      does not describe the on-disk segments is rebuilt."""
    import os

    frames: list[bytes] = []
    pos: list[tuple[str, int]] = []
    segs: dict[str, int] = {}
    for f in sorted(os.listdir(seg_dir)):
        if not f.startswith("seg-"):
            continue
        with open(os.path.join(seg_dir, f), "rb") as fh:
            data = fh.read()
        segs[f] = len(data)
        off = 0
        for fr in scan_pgoutput_frames(data):
            frames.append(fr)
            pos.append((f, off))
            off += len(fr) + 1  # +1: the verified '\n' separator
    parser = PgOutputPoller(runner=None, slot="sidecar",
                            table_regexp=table_regexp)
    rows = [{"lsn": "", "lsn_big": 0, "data": fr.hex()} for fr in frames]
    txns = parser._parse_txns(rows, light=True)
    seen: set[str] = set()
    dup = False
    n = 0
    bounds: list[list] = []
    kept: list = []  # post-dedup txns, in emit order
    for t in txns:
        if t.xid is not None:
            if t.xid in seen:
                dup = True
                continue
            seen.add(t.xid)
        kept.append(t)
        if not t.changes:
            continue
        n += len(t.changes)
        if t.commit_lsn > 0:
            bounds.append([n, t.commit_lsn_text, t.commit_lsn])
    rel = [[i, frames[i].hex()] for i, fr in enumerate(frames)
           if fr[:1] == b"R"]
    streamed = any(fr[:1] in (b"S", b"E", b"c", b"A") for fr in frames)
    resume: list[list] = []
    if not dup and not streamed:
        # plain protocol only: the i-th 'B' frame begins the i-th
        # transaction (commit order == begin order without streaming),
        # so each Begin's byte position is a safe full-parse entry
        # point for everything from that transaction on. A trailing
        # torn Begin (no Commit) has no matching txn and is ignored.
        b_idx = [i for i, fr in enumerate(frames) if fr[:1] == b"B"]
        cum = 0
        for bi, t in zip(b_idx, kept):
            resume.append([cum, pos[bi][0], pos[bi][1], bi])
            cum += len(t.changes)
    return {"version": SPOOL_SIDECAR_VERSION, "n": n, "bounds": bounds,
            "resume": resume, "rel_frames": rel, "segs": segs}


def write_spool_sidecar(seg_dir: str,
                        table_regexp: str | None = None) -> dict:
    """Build and atomically persist the sidecar next to the segments
    (the subprocess entry point the sharded DataSource spawns per
    freshly-drained generation)."""
    import os

    sc = build_spool_sidecar(seg_dir, table_regexp)
    path = os.path.join(seg_dir, SPOOL_SIDECAR)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(sc, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return sc


class PgOutputCaptureManager:
    """Publication + slot + replica-identity lifecycle. The
    publication IS the server-side table filter: `table_regexp` picks
    the published set at install time (server.go:149-166 parity, but
    enforced inside the database, not at the consumer)."""

    def __init__(self, runner: PsqlRunner, slot: str = DEFAULT_SLOT,
                 publication: str = DEFAULT_PUBLICATION,
                 table_regexp: str | None = None) -> None:
        _check_ident(slot)
        _check_ident(publication)
        self.runner = runner
        self.slot = slot
        self.publication = publication
        self.table_regexp = table_regexp

    def discover_tables(self) -> list[str]:
        rows = self.runner.query_csv(DISCOVER_TABLES_SQL)
        return filter_tables([r["table_name"] for r in rows],
                             self.table_regexp)

    def _slot_exists(self) -> bool:
        """Same cluster-global contract as the test_decoding manager: a
        same-name slot owned by ANOTHER database must fail loudly
        (pre-validated by the daemon before any destructive step)."""
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
        """`create_slot=False`: see PgLogicalCaptureManager.install —
        the exactly-once bootstrap creates the slot via walsender with
        an exported snapshot, after identity/publication are ready."""
        tables = self.discover_tables()
        if not tables:
            raise RuntimeError("no tables match the table regexp")
        wal_level = self.runner.scalar("SHOW wal_level")
        if wal_level != "logical":
            raise RuntimeError(
                f"wal_level is {wal_level!r}; pgoutput needs "
                "wal_level=logical"
            )
        idents = ", ".join(f'"{_check_ident(t)}"' for t in tables)
        stmts = [
            f'ALTER TABLE "{_check_ident(t)}" REPLICA IDENTITY FULL'
            for t in tables
        ]
        # Publication membership must never lapse (round-10 hardening,
        # ADVICE r9): the old DROP-then-CREATE ran as two autocommitted
        # statements, and a transaction committing in that window had
        # NO publication membership in the historic catalog — silently
        # excluded from decode under a live slot (lost rows). ALTER
        # PUBLICATION ... SET TABLE swaps the table set in ONE
        # statement, so membership is continuous across re-installs.
        pub_exists = self.runner.scalar(
            "SELECT count(*) FROM pg_publication WHERE pubname = "
            f"{_quote_lit(self.publication)}"
        )
        if int(pub_exists or 0) > 0:
            stmts.append(f"ALTER PUBLICATION {self.publication} "
                         f"SET TABLE {idents}")
        else:
            stmts.append(f"CREATE PUBLICATION {self.publication} "
                         f"FOR TABLE {idents}")
        self.runner.sql(";\n".join(stmts) + ";")
        if create_slot and not self._slot_exists():
            self.runner.sql(
                "SELECT pg_create_logical_replication_slot("
                f"{_quote_lit(self.slot)}, 'pgoutput');"
            )
        return tables

    def remove(self) -> list[str]:
        tables = self.discover_tables()
        stmts = [
            f'ALTER TABLE "{_check_ident(t)}" REPLICA IDENTITY DEFAULT'
            for t in tables
        ]
        stmts.append(f"DROP PUBLICATION IF EXISTS {self.publication}")
        self.runner.sql(";\n".join(stmts) + ";")
        if self._slot_exists():
            self.runner.sql(
                f"SELECT pg_drop_replication_slot({_quote_lit(self.slot)});"
            )
        return tables


@dataclass
class PgOutputPoller(PgLogicalPoller):
    """The test_decoding poller's contract on the pgoutput plugin: only
    the peek (binary, publication-scoped) and the message parse differ;
    batching, numbering, advance, crash-replay and escalation are
    inherited verbatim. The engine-table feedback filter is structural
    here — unpublished tables never reach the wire."""

    publication: str = DEFAULT_PUBLICATION
    # protocol version 2 streamed in-progress transactions (round 10,
    # VERDICT r9 #4): with 'streaming','on' the server emits a large
    # transaction's changes in Stream Start/Stop segments WHILE
    # decoding (as soon as logical_decoding_work_mem is exceeded)
    # instead of buffering or spilling the whole reorder buffer
    # server-side; the poller reassembles segments per top-level xid
    # and a transaction completes at its Stream Commit — the same
    # only-complete-transactions batch contract, with server decode
    # memory bounded by work_mem. The peek window must still cover the
    # whole stream + commit (upto_nchanges counts streamed changes),
    # so max_peek remains the client-side bound.
    streaming: bool = False
    _relations: dict[int, _Relation] = field(default_factory=dict, repr=False)

    def _recv_plugin_options(self) -> list[str]:
        """pg_recvlogical options for the pgoutput spool drain (round
        11, VERDICT r10 #3): the publication scopes decode server-side;
        proto v2 + streaming keeps the server's reorder-buffer memory
        bounded at logical_decoding_work_mem while the giant
        transaction streams to the spool file."""
        opts = ["-o", f"publication_names={self.publication}"]
        if self.streaming:
            opts += ["-o", "proto_version=2", "-o", "streaming=on"]
        else:
            opts += ["-o", "proto_version=1"]
        return opts

    def _spool_txns_iter(self, seg_dir: str):
        return iter(self._spool_txns(seg_dir))

    def _spool_txns(self, seg_dir: str) -> list:
        """Binary spool assembly: structural reframing of every
        segment's byte stream (scan_pgoutput_frames — pg_recvlogical's
        newline separators are ambiguous for binary payloads), then the
        SAME streamed-protocol transaction parser as the peek path over
        pseudo peek rows, then crash-redelivery dedup: complete
        transactions keep-first by xid (Begin/Commit and Stream Commit
        both carry it), re-streamed chunk prefixes reset by the Stream
        Start first_segment flag, torn tails dropped (no commit)."""
        import os

        frames: list[bytes] = []
        for f in sorted(os.listdir(seg_dir)):
            if not f.startswith("seg-"):
                continue
            with open(os.path.join(seg_dir, f), "rb") as fh:
                frames += scan_pgoutput_frames(fh.read())
        rows = [{"lsn": "", "lsn_big": 0, "data": fr.hex()}
                for fr in frames]
        relations_before = dict(self._relations)
        try:
            txns = self._parse_txns(rows)
        finally:
            # the spool's Relation messages must not leak into the
            # PEEK path's registry mid-replay (a replayed spool could
            # otherwise regress a schema the live registry advanced)
            self._relations = relations_before
        seen: set[str] = set()
        out: list[tuple[str | None, list]] = []
        for t in txns:
            if t.xid is not None:
                if t.xid in seen:
                    continue
                seen.add(t.xid)
            out.append((t.commit_ts, t.changes))
        return out

    def _spool_txns_from(self, seg_dir: str, seg_name: str, off: int,
                         rel_hexes: list[str], end_seg: str = "",
                         end_off: int = 0):
        """Full spool parse over ONE sidecar seek window (round 13,
        VERDICT r12 What's-wrong #2): seek to `off` inside `seg_name`,
        reframe through the remaining segments up to the exclusive
        (`end_seg`, `end_off`) bound (empty = spool end), pre-feed the
        Relation messages the skipped prefix carried, and run the same
        transaction parser. Only valid at sidecar resume points — which
        exist only for spools with no streamed frames and no duplicate
        xids, so no dedup pass is needed here."""
        import os

        frames = [bytes.fromhex(h) for h in rel_hexes]
        started = False
        for f in sorted(os.listdir(seg_dir)):
            if not f.startswith("seg-"):
                continue
            if not started:
                if f != seg_name:
                    continue
                started = True
                lo_b = off
            else:
                lo_b = 0
            with open(os.path.join(seg_dir, f), "rb") as fh:
                fh.seek(lo_b)
                data = fh.read()
            if end_seg and f == end_seg:
                data = data[:max(0, end_off - lo_b)]
                frames += scan_pgoutput_frames(data)
                break
            frames += scan_pgoutput_frames(data)
        if not started:
            raise FileNotFoundError(
                f"spool resume segment {seg_name!r} missing in {seg_dir}"
            )
        rows = [{"lsn": "", "lsn_big": 0, "data": fr.hex()}
                for fr in frames]
        relations_before = dict(self._relations)
        try:
            txns = self._parse_txns(rows)
        finally:
            self._relations = relations_before
        return [(t.commit_ts, t.changes) for t in txns]

    def _peek(self, upto: int, barrier: bool = True) -> list[dict]:
        proto = ("'proto_version', '2', 'streaming', 'on'"
                 if self.streaming else "'proto_version', '1'")
        peek = (
            "SELECT lsn::text AS lsn, (lsn - '0/0'::pg_lsn)::bigint AS "
            "lsn_big, xid::text AS xid, encode(data, 'hex') AS data "
            f"FROM pg_logical_slot_peek_binary_changes("
            f"{_quote_lit(self.slot)}, NULL, {int(upto)}, "
            f"{proto}, "
            f"'publication_names', {_quote_lit(self.publication)})"
        )
        pre = self._BARRIER_SQL if barrier else ()
        return self.runner.query_csv(peek, pre_statements=pre)

    # -- binary message parse -------------------------------------------------
    def _envelopes(self, msg: bytes) -> list[tuple]:
        """One pgoutput message → envelope tuples (same shape as
        logical_pg.parse_change_line). Relation messages update the
        registry and emit nothing; Begin/Commit are handled by
        _parse_txns."""
        kind = chr(msg[0])
        r = _Reader(msg)
        r.u8()
        if kind == "R":
            rel_id = r.i32()
            schema = r.cstring() or "public"
            table = r.cstring()
            r.u8()  # replica identity setting
            ncols = r.i16()
            cols = []
            for _ in range(ncols):
                r.u8()  # flags
                name = r.cstring()
                oid = r.i32()
                r.i32()  # typmod
                cols.append((name, oid))
            self._relations[rel_id] = _Relation(schema, table, cols)
            return []
        if kind == "T":
            nrels = r.i32()
            r.u8()  # option flags (CASCADE / RESTART IDENTITY)
            out = []
            for _ in range(nrels):
                rel = self._relations.get(r.i32())
                if rel is not None:
                    out.append((rel.schema, rel.table, "TRUNCATE",
                                None, None, None))
            return out
        if kind not in ("I", "U", "D"):
            return []  # Origin / Type / Message — not row changes
        rel = self._relations.get(r.i32())
        if rel is None:
            return []
        old_vals = new_vals = None
        old_tag = None
        tag = chr(r.u8())
        if kind == "I":
            # tag is 'N'
            new_vals = _read_tuple(r)
        elif kind == "U":
            if tag in ("O", "K"):
                old_tag = tag
                old_vals = _read_tuple(r)
                tag = chr(r.u8())
            new_vals = _read_tuple(r)
            # Unchanged-TOAST backfill (round-10 lead fix): a column
            # the UPDATE didn't touch arrives as TupleData kind 'u' —
            # its true value is BY DEFINITION the old tuple's, and the
            # FULL-identity old tuple ('O', which install() guarantees)
            # carries it, toast included. A key-only old tuple ('K')
            # nulls non-key columns, so it must NOT be used — those
            # fall through to the poller's P3 resolution.
            if old_tag == "O" and old_vals is not None:
                new_vals = [
                    ov if nv == UNCHANGED_TOAST_MARKER else nv
                    for nv, ov in zip(new_vals, old_vals)
                ]
        else:  # D — tag 'O' (REPLICA IDENTITY FULL) or 'K' (key only)
            old_vals = _read_tuple(r)
        op = {"I": "INSERT", "U": "UPDATE", "D": "DELETE"}[kind]
        payload_vals = old_vals if kind == "D" else new_vals
        payload = _row_json(rel, payload_vals)
        previous = (
            _row_json(rel, old_vals)
            if kind == "U" and old_vals is not None else None
        )
        row_id = None
        for (name, _oid), val in zip(rel.columns, payload_vals):
            if name == "id":
                row_id = val
                break
        return [(rel.schema, rel.table, op, row_id, payload, previous)]

    def _envelopes_light(self, msg: bytes) -> list[tuple]:
        """Counting-only twin of `_envelopes`: same (schema, table, op)
        classification and Relation-registry upkeep, but NO tuple
        decode and NO JSON rendering — the per-row work is a 4-byte
        relation-id read. The sharded DataSource's latestOffset uses
        this to learn a spool's row count and transaction boundaries
        WITHOUT paying the envelope build (that runs once, on an
        executor, in read()). Emits the same-shape 6-tuples with None
        payloads so `_keep` and the txn machinery apply unchanged —
        counts are equal to the full parse's by construction."""
        kind = chr(msg[0])
        r = _Reader(msg)
        r.u8()
        if kind == "R":
            return self._envelopes(msg)  # registry upkeep (rare, cheap)
        if kind == "T":
            nrels = r.i32()
            r.u8()
            out = []
            for _ in range(nrels):
                rel = self._relations.get(r.i32())
                if rel is not None:
                    out.append((rel.schema, rel.table, "TRUNCATE",
                                None, None, None))
            return out
        if kind not in ("I", "U", "D"):
            return []
        rel = self._relations.get(r.i32())
        if rel is None:
            return []
        op = {"I": "INSERT", "U": "UPDATE", "D": "DELETE"}[kind]
        return [(rel.schema, rel.table, op, None, None, None)]

    def _spool_scan_light(self, seg_dir: str):
        """Light spool scan → (n_rows, boundaries) where `boundaries`
        maps cumulative row count (1-based, relative to the spool's
        start_seq) → (commit_lsn_text, commit_lsn_big) for every
        row-bearing transaction. Same structural reframing and
        crash-redelivery xid dedup as `_spool_txns`, envelope build
        skipped (`_envelopes_light`). Commit LSNs come from the Commit
        message bodies (spool frames carry no peek-row LSN)."""
        import os

        frames: list[bytes] = []
        for f in sorted(os.listdir(seg_dir)):
            if not f.startswith("seg-"):
                continue
            with open(os.path.join(seg_dir, f), "rb") as fh:
                frames += scan_pgoutput_frames(fh.read())
        rows = [{"lsn": "", "lsn_big": 0, "data": fr.hex()}
                for fr in frames]
        relations_before = dict(self._relations)
        try:
            txns = self._parse_txns(rows, light=True)
        finally:
            self._relations = relations_before
        seen: set[str] = set()
        n = 0
        bounds: dict[int, tuple[str, int]] = {}
        for t in txns:
            if t.xid is not None:
                if t.xid in seen:
                    continue
                seen.add(t.xid)
            if not t.changes:
                continue
            n += len(t.changes)
            if t.commit_lsn > 0:
                bounds[n] = (t.commit_lsn_text, t.commit_lsn)
        return n, bounds

    def _parse_txns(self, rows: list[dict],
                    light: bool = False) -> list[_Txn]:
        import re as _re
        from datetime import datetime, timedelta

        envelopes = self._envelopes_light if light else self._envelopes
        pat = _re.compile(self.table_regexp) if self.table_regexp else None
        pg_epoch = datetime(2000, 1, 1)

        def _ts(us: int) -> str:
            return (pg_epoch + timedelta(microseconds=us)
                    ).isoformat(sep=" ")

        def _keep(ch) -> bool:
            table = ch[1]
            if table.startswith("pqstream_"):
                return False  # belt: the publication already filters
            return pat is None or bool(pat.search(table))

        txns: list[_Txn] = []
        cur: list = []
        cur_ts: str | None = None
        cur_xid: int = 0
        # proto v2 streamed-transaction state: segments (Stream Start
        # 'S' .. Stream Stop 'E') carry xid-prefixed messages of one
        # top-level transaction; messages keep their own (sub)txn xid,
        # Stream Abort 'A' discards a subtransaction's rows (or the
        # whole buffer when subxid == xid), Stream Commit 'c' turns the
        # buffer into a complete _Txn at the commit position
        stream_top: int | None = None
        stream_buf: dict[int, list] = {}       # top xid → [(msg_xid, ch)]
        stream_abort: dict[int, set] = {}      # top xid → aborted subxids
        for row in rows:
            msg = bytes.fromhex(row["data"])
            kind = chr(msg[0])
            # xids are uint32 — read ">I" everywhere (VERDICT r10 #2:
            # a signed read goes negative past the 2^31 epoch boundary;
            # internally consistent but a trap for anything surfacing
            # these keys)
            if kind == "S":
                (stream_top,) = struct.unpack_from(">I", msg, 1)
                if len(msg) > 5 and msg[5] == 1:
                    # first_segment flag: the server (re)streams this
                    # transaction FROM THE START — reset any buffered
                    # chunks (crash-redelivery across spool segments
                    # would otherwise duplicate the replayed prefix)
                    stream_buf[stream_top] = []
                    stream_abort.pop(stream_top, None)
                else:
                    stream_buf.setdefault(stream_top, [])
                continue
            if kind == "E":
                stream_top = None
                continue
            if kind == "c":
                (xid,) = struct.unpack_from(">I", msg, 1)
                # flags u8 at 5, commit_lsn q at 6, end_lsn q at 14,
                # commit_ts q at 22
                (ts_us,) = struct.unpack_from(">q", msg, 22)
                lsn_text, lsn_big = row["lsn"], int(row["lsn_big"])
                if lsn_big == 0:
                    # spool pseudo-row (frames carry no peek LSN): the
                    # Stream Commit body's end_lsn is the slot-advance
                    # position for this transaction
                    (end_lsn,) = struct.unpack_from(">q", msg, 14)
                    lsn_big = end_lsn
                    lsn_text = f"{end_lsn >> 32:X}/{end_lsn & 0xFFFFFFFF:X}"
                aborted = stream_abort.pop(xid, set())
                entries = stream_buf.pop(xid, [])
                txns.append(_Txn(
                    lsn_text, lsn_big, _ts(ts_us),
                    [ch for mx, ch in entries if mx not in aborted],
                    xid=str(xid),
                ))
                continue
            if kind == "A":
                xid, subxid = struct.unpack_from(">II", msg, 1)
                if subxid == xid:
                    stream_buf.pop(xid, None)
                    stream_abort.pop(xid, None)
                else:
                    stream_abort.setdefault(xid, set()).add(subxid)
                continue
            if stream_top is not None:
                # in-segment message: type byte + xid(4) + normal body —
                # reframe and reuse the plain parser
                (msg_xid,) = struct.unpack_from(">I", msg, 1)
                for ch in envelopes(msg[:1] + msg[5:]):
                    if _keep(ch):
                        stream_buf[stream_top].append((msg_xid, ch))
                continue
            if kind == "B":
                cur = []
                # Begin: final_lsn(8) + commit_ts(8, µs since 2000-01-01)
                # + xid(4) — the xid keys spool crash-redelivery dedup
                (_, ts_us) = struct.unpack_from(">qq", msg, 1)
                (cur_xid,) = struct.unpack_from(">I", msg, 17)
                cur_ts = _ts(ts_us)
            elif kind == "C":
                lsn_text, lsn_big = row["lsn"], int(row["lsn_big"])
                if lsn_big == 0:
                    # spool pseudo-row: Commit body = flags u8 at 1,
                    # commit_lsn q at 2, end_lsn q at 10, ts q at 18
                    (end_lsn,) = struct.unpack_from(">q", msg, 10)
                    lsn_big = end_lsn
                    lsn_text = f"{end_lsn >> 32:X}/{end_lsn & 0xFFFFFFFF:X}"
                txns.append(_Txn(lsn_text, lsn_big,
                                 cur_ts, cur, xid=str(cur_xid)))
                cur, cur_ts = [], None
            else:
                for ch in envelopes(msg):
                    if _keep(ch):
                        cur.append(ch)
        return txns
