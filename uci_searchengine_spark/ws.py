"""Minimal RFC 6455 WebSocket server leg for the crawler log stream.

The reference exposes real-time crawler logs at ``/api/crawler/ws``
(`backend/app/api/routes.py:310-337`, `websocket_utils.py:12-38`): the
server accepts the upgrade, pushes ``{"message", "timestamp"}`` JSON
text frames as log events happen, and reads (and discards) any client
text. This module is the stdlib-only equivalent for our
``ThreadingHTTPServer`` transport — each connection owns its handler
thread, so the push loop simply lives inside the request handler.

Only the server side of RFC 6455 is implemented, and only what the
route needs:

* handshake — ``Sec-WebSocket-Accept = b64(sha1(key + GUID))``;
* unmasked server→client TEXT frames (all three payload-length forms);
* masked client→server frames (the RFC requires clients to mask):
  TEXT/BINARY are read and discarded (reference behavior), PING is
  answered with PONG, CLOSE is echoed and ends the connection.

Fragmented client messages (FIN=0 continuations) are tolerated by
draining each fragment; the log route never needs to reassemble them.

No third-party ws library exists in this environment; the framing is
from the RFC, not from any codebase.
"""

from __future__ import annotations

import base64
import hashlib
import socket
import struct

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

# opcodes (RFC 6455 §5.2)
OP_CONT = 0x0
OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def accept_key(client_key: str) -> str:
    """``Sec-WebSocket-Accept`` for a client's ``Sec-WebSocket-Key``."""
    digest = hashlib.sha1((client_key + _GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def is_upgrade(headers) -> bool:
    """True when the request headers ask for a WebSocket upgrade."""
    conn = (headers.get("Connection") or "").lower()
    upg = (headers.get("Upgrade") or "").lower()
    return "upgrade" in conn and upg == "websocket"


def handshake(handler) -> bool:
    """Complete the 101 upgrade on a ``BaseHTTPRequestHandler``.

    Returns False (after sending a 400) when the request is not a
    well-formed upgrade. On success the caller owns the raw socket
    until it returns; ``handler.close_connection`` is set so the
    HTTP loop never tries to reuse it.
    """
    key = handler.headers.get("Sec-WebSocket-Key")
    if not is_upgrade(handler.headers) or not key:
        handler.send_response(400)
        handler.send_header("Content-Length", "0")
        handler.end_headers()
        return False
    handler.send_response_only(101, "Switching Protocols")
    handler.send_header("Upgrade", "websocket")
    handler.send_header("Connection", "Upgrade")
    handler.send_header("Sec-WebSocket-Accept", accept_key(key))
    handler.end_headers()
    handler.wfile.flush()
    handler.close_connection = True
    return True


def send_frame(wfile, payload: bytes, opcode: int = OP_TEXT) -> None:
    """One unmasked FIN=1 server frame (server frames MUST NOT mask)."""
    header = bytearray([0x80 | opcode])
    n = len(payload)
    if n < 126:
        header.append(n)
    elif n < (1 << 16):
        header.append(126)
        header += struct.pack(">H", n)
    else:
        header.append(127)
        header += struct.pack(">Q", n)
    wfile.write(bytes(header) + payload)
    wfile.flush()


def send_text(wfile, text: str) -> None:
    send_frame(wfile, text.encode("utf-8"), OP_TEXT)


def _read_exact_sock(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("websocket peer closed mid-frame")
        buf += chunk
    return buf


def recv_frame(sock: socket.socket, require_mask: bool = True) -> tuple[int, bytes]:
    """Read one frame from the RAW socket → ``(opcode, payload)``.

    Reads bypass any buffered file wrapper on purpose: a
    ``socket.timeout`` inside a ``makefile()`` read poisons the file
    object permanently (``OSError: cannot read from timed out
    object``), so the upgraded connection is driven by ``select`` +
    raw ``recv`` instead. With ``require_mask`` (server side, RFC 6455
    §5.1) an unmasked frame raises ``ConnectionError``.
    """
    b0, b1 = _read_exact_sock(sock, 2)
    opcode = b0 & 0x0F
    masked = bool(b1 & 0x80)
    n = b1 & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", _read_exact_sock(sock, 2))
    elif n == 127:
        (n,) = struct.unpack(">Q", _read_exact_sock(sock, 8))
    if not masked:
        if require_mask:
            raise ConnectionError("client frame not masked")
        return opcode, _read_exact_sock(sock, n)
    mask = _read_exact_sock(sock, 4)
    data = bytearray(_read_exact_sock(sock, n))
    for i in range(len(data)):
        data[i] ^= mask[i & 3]
    return opcode, bytes(data)


def poll_client(conn: socket.socket, wfile, tick: float) -> bool:
    """Wait up to ``tick`` seconds for one client frame and handle it:
    PING→PONG, CLOSE→echo-and-stop, anything else is drained and
    ignored (the reference's ``receive_text()`` loop likewise discards
    client text). Returns False when the connection should end.

    Assumes no frame bytes sit in a buffered rfile: an RFC-compliant
    client cannot send frames before it has read the 101 response
    (it must validate ``Sec-WebSocket-Accept`` first), and the
    handshake reply is only written after the request head was fully
    consumed — so post-upgrade bytes always arrive on the raw socket.
    """
    import select

    readable, _, _ = select.select([conn], [], [], tick)
    if not readable:
        return True  # nothing arrived within the poll tick
    opcode, payload = recv_frame(conn)
    if opcode == OP_CLOSE:
        try:
            send_frame(wfile, payload[:125], OP_CLOSE)
        except OSError:
            pass
        return False
    if opcode == OP_PING:
        send_frame(wfile, payload[:125], OP_PONG)
    return True


# --------------------------------------------------------------- client
# (test-only helper: the e2e suite needs a masked client leg and no
# third-party ws library exists in this environment)


def client_handshake(sock: socket.socket, host: str, path: str) -> None:
    """Perform the client upgrade on a connected socket (test helper)."""
    key = base64.b64encode(b"0123456789abcdef").decode()
    req = (
        f"GET {path} HTTP/1.1\r\nHost: {host}\r\n"
        "Upgrade: websocket\r\nConnection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
    )
    sock.sendall(req.encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        chunk = sock.recv(4096)
        if not chunk:
            raise ConnectionError("no handshake response")
        resp += chunk
    status = resp.split(b"\r\n", 1)[0]
    if b"101" not in status:
        raise ConnectionError(f"upgrade refused: {status!r}")
    expect = accept_key(key).encode()
    if expect not in resp:
        raise ConnectionError("bad Sec-WebSocket-Accept")


def client_send_text(sock: socket.socket, text: str) -> None:
    """One masked client TEXT frame (clients MUST mask)."""
    payload = bytearray(text.encode("utf-8"))
    mask = b"\x12\x34\x56\x78"
    for i in range(len(payload)):
        payload[i] ^= mask[i & 3]
    n = len(payload)
    header = bytearray([0x80 | OP_TEXT])
    if n < 126:
        header.append(0x80 | n)
    elif n < (1 << 16):
        header.append(0x80 | 126)
        header += struct.pack(">H", n)
    else:
        header.append(0x80 | 127)
        header += struct.pack(">Q", n)
    sock.sendall(bytes(header) + mask + bytes(payload))


def client_send_close(sock: socket.socket) -> None:
    sock.sendall(bytes([0x80 | OP_CLOSE, 0x80]) + b"\x12\x34\x56\x78")


def client_send_ping(sock: socket.socket, payload: bytes = b"hb") -> None:
    data = bytearray(payload)
    mask = b"\xaa\xbb\xcc\xdd"
    for i in range(len(data)):
        data[i] ^= mask[i & 3]
    sock.sendall(
        bytes([0x80 | OP_PING, 0x80 | len(data)]) + mask + bytes(data)
    )


def client_recv_frame(sock: socket.socket) -> tuple[int, bytes]:
    """Read one (unmasked) server frame from the socket (test helper)."""

    def read_exact(n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed")
            buf += chunk
        return buf

    b0, b1 = read_exact(2)
    opcode = b0 & 0x0F
    if b1 & 0x80:
        raise ConnectionError("server frame unexpectedly masked")
    n = b1 & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", read_exact(2))
    elif n == 127:
        (n,) = struct.unpack(">Q", read_exact(8))
    return opcode, read_exact(n)
