"""STOMP 1.2 wire client over stdlib sockets — the K2 transport
(reference: contrib/cmd/pqsamq/main.go:68-87, go-stomp Dial + Send)
without requiring a STOMP client package (absent here, see
tests/test_transport_probe.py).

STOMP 1.2 is a newline-delimited text protocol
(https://stomp.github.io/stomp-specification-1.2.html): frames are
`COMMAND\nheader:value\n...\n\n<body>\x00`, header names/values escape
`\\`, `\n`, `\r`, `:` as `\\\\`, `\\n`, `\\r`, `\\c`, and bodies carry
an explicit content-length so binary-safe payloads survive. This client
speaks that protocol byte-faithfully — it interoperates with a real
ActiveMQ/RabbitMQ STOMP listener — and exposes exactly the surface
StompForwarder needs (.send(destination, body)), so
`StompForwarder(queue, client=StompClient(host, port))` is the full
pqsamq topology: events in seq order → SEND frames on a TCP socket.
"""

from __future__ import annotations

import socket

_ESCAPES = [("\\", "\\\\"), ("\r", "\\r"), ("\n", "\\n"), (":", "\\c")]


def escape_header(v: str) -> str:
    for raw, esc in _ESCAPES:
        v = v.replace(raw, esc)
    return v


def unescape_header(v: str) -> str:
    out, i = [], 0
    while i < len(v):
        if v[i] == "\\" and i + 1 < len(v):
            nxt = v[i + 1]
            out.append(
                {"\\": "\\", "r": "\r", "n": "\n", "c": ":"}.get(nxt, "\\" + nxt)
            )
            i += 2
        else:
            out.append(v[i])
            i += 1
    return "".join(out)


def encode_frame(command: str, headers: dict[str, str], body: bytes = b"") -> bytes:
    lines = [command]
    for k, v in headers.items():
        lines.append(f"{escape_header(k)}:{escape_header(v)}")
    return ("\n".join(lines) + "\n\n").encode() + body + b"\x00"


def read_frame(sock_file) -> tuple[str, dict[str, str], bytes]:
    """Read one frame from a socket file object (blocking). Skips
    heart-beat newlines between frames."""
    line = sock_file.readline()
    while line in (b"\n", b"\r\n"):
        line = sock_file.readline()
    if not line:
        raise ConnectionError("peer closed")
    command = line.decode().strip()
    headers: dict[str, str] = {}
    while True:
        line = sock_file.readline()
        if line in (b"\n", b"\r\n"):
            break
        if not line:
            raise ConnectionError("peer closed mid-headers")
        k, _, v = line.decode().rstrip("\r\n").partition(":")
        # repeated header: first occurrence wins (spec §Repeated Headers)
        headers.setdefault(unescape_header(k), unescape_header(v))
    if "content-length" in headers:
        n = int(headers["content-length"])
        body = sock_file.read(n)
        term = sock_file.read(1)  # never inside an assert: -O would skip the read
        if term != b"\x00":
            raise ConnectionError(f"missing frame terminator (got {term!r})")
    else:
        chunks = []
        while True:
            c = sock_file.read(1)
            if not c:
                raise ConnectionError("peer closed mid-body")
            if c == b"\x00":
                break
            chunks.append(c)
        body = b"".join(chunks)
    return command, headers, body


class StompClient:
    """Minimal STOMP 1.2 producer: CONNECT on init, SEND per message,
    DISCONNECT with receipt on close. Raises on broker ERROR frames."""

    def __init__(self, host: str, port: int, vhost: str = "/", timeout: float = 30.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._f = self._sock.makefile("rb")
        self._sock.sendall(
            encode_frame(
                "CONNECT",
                {"accept-version": "1.2", "host": vhost, "heart-beat": "0,0"},
            )
        )
        cmd, headers, _ = read_frame(self._f)
        if cmd != "CONNECTED":
            raise ConnectionError(f"broker refused: {cmd} {headers}")
        self.session = headers.get("session", "")
        self._seq = 0

    def send(self, destination: str, body, content_type: str = "text/plain") -> None:
        data = body.encode() if isinstance(body, str) else bytes(body)
        self._sock.sendall(
            encode_frame(
                "SEND",
                {
                    "destination": destination,
                    "content-type": content_type,
                    "content-length": str(len(data)),
                },
                data,
            )
        )

    def disconnect(self) -> None:
        self._seq += 1
        rid = f"r{self._seq}"
        try:
            self._sock.sendall(encode_frame("DISCONNECT", {"receipt": rid}))
            cmd, headers, body = read_frame(self._f)
            if cmd != "RECEIPT":
                # an ERROR here is also the only place a broker can
                # report a failed earlier SEND (we never read between
                # sends) — surface it, never swallow it
                raise ConnectionError(
                    f"expected RECEIPT, got {cmd} {headers} {body[:200]!r}"
                )
            if headers.get("receipt-id") != rid:
                raise ConnectionError(f"receipt mismatch: {headers}")
        finally:
            self._f.close()
            self._sock.close()
