"""In-process RESP2 server speaking just enough Redis-Streams.

Implements the verbs the client/source use — PING, AUTH, XADD, XLEN,
XRANGE/XREVRANGE (with exclusive '(' bounds), XGROUP CREATE, XREADGROUP,
XACK — over real sockets, so `redis_stream.py` is exercised through its
actual wire path without a Redis binary: the test double for the ingestion
suite, and the in-memory broker behind the oracle-gated live-ingestion
query (q115). Single lock-guarded state; threads per connection.
"""

from __future__ import annotations

import socket
import threading
import time


def _parse_id(entry_id: str, default_seq: int) -> tuple[int, int]:
    if entry_id == "-":
        return (0, 0)
    if entry_id == "+":
        return (1 << 62, 1 << 62)
    if "-" in entry_id:
        ms, seq = entry_id.split("-", 1)
        return (int(ms), int(seq))
    return (int(entry_id), default_seq)


class FakeRedisServer:
    def __init__(self, password: str | None = None):
        self.password = password
        self._streams: dict[str, list[tuple[str, dict[str, str]]]] = {}
        self._groups: dict[tuple[str, str], dict] = {}  # (stream, group) -> state
        self._last_ms = 0
        self._last_seq = 0
        self._lock = threading.Lock()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(16)
        self.port = self._sock.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    # -- lifecycle ----------------------------------------------------------

    def close(self) -> None:
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self) -> "FakeRedisServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    # -- RESP ---------------------------------------------------------------

    @staticmethod
    def _encode(value) -> bytes:
        if value is None:
            return b"$-1\r\n"
        if isinstance(value, RespStatus):
            return b"+" + value.text.encode() + b"\r\n"
        if isinstance(value, RespFail):
            return b"-" + value.text.encode() + b"\r\n"
        if isinstance(value, int):
            return b":%d\r\n" % value
        if isinstance(value, str):
            value = value.encode()
        if isinstance(value, bytes):
            return b"$%d\r\n%s\r\n" % (len(value), value)
        if isinstance(value, (list, tuple)):
            return b"*%d\r\n" % len(value) + b"".join(
                FakeRedisServer._encode(v) for v in value
            )
        raise TypeError(f"cannot encode {value!r}")

    def _handle(self, conn: socket.socket) -> None:
        buf = b""
        authed = self.password is None

        def read_line():
            nonlocal buf
            while b"\r\n" not in buf:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            line, rest = buf.split(b"\r\n", 1)
            buf = rest
            return line

        def read_exact(n):
            nonlocal buf
            while len(buf) < n + 2:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            data, buf = buf[:n], buf[n + 2 :]
            return data

        try:
            while True:
                line = read_line()
                if not line.startswith(b"*"):
                    conn.sendall(self._encode(RespFail("ERR protocol")))
                    continue
                n = int(line[1:])
                args = []
                for _ in range(n):
                    hdr = read_line()
                    args.append(read_exact(int(hdr[1:])).decode())
                cmd = args[0].upper()
                if cmd == "AUTH":
                    authed = self.password is None or args[1] == self.password
                    reply = (
                        RespStatus("OK") if authed else RespFail("WRONGPASS invalid password")
                    )
                elif not authed:
                    reply = RespFail("NOAUTH Authentication required.")
                else:
                    reply = self._dispatch(cmd, args[1:])
                conn.sendall(self._encode(reply))
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    # -- commands -----------------------------------------------------------

    def _next_id(self) -> str:
        ms = int(time.time() * 1000)
        if ms <= self._last_ms:
            ms = self._last_ms
            self._last_seq += 1
        else:
            self._last_ms, self._last_seq = ms, 0
        return f"{ms}-{self._last_seq}"

    def _dispatch(self, cmd: str, a: list[str]):
        with self._lock:
            if cmd == "PING":
                return RespStatus("PONG")
            if cmd == "XADD":
                stream, entry_id, flat = a[0], a[1], a[2:]
                fields = {flat[i]: flat[i + 1] for i in range(0, len(flat), 2)}
                if entry_id == "*":
                    entry_id = self._next_id()
                else:
                    ms, seq = _parse_id(entry_id, 0)
                    self._last_ms, self._last_seq = max(
                        (self._last_ms, self._last_seq), (ms, seq)
                    )
                self._streams.setdefault(stream, []).append((entry_id, fields))
                return entry_id
            if cmd == "XLEN":
                return len(self._streams.get(a[0], []))
            if cmd in ("XRANGE", "XREVRANGE"):
                rev = cmd == "XREVRANGE"
                stream = a[0]
                lo_s, hi_s = (a[2], a[1]) if rev else (a[1], a[2])
                count = None
                if len(a) >= 5 and a[3].upper() == "COUNT":
                    count = int(a[4])
                lo_excl = lo_s.startswith("(")
                hi_excl = hi_s.startswith("(")
                lo = _parse_id(lo_s.lstrip("("), 0)
                hi = _parse_id(hi_s.lstrip("("), 1 << 62)
                entries = [
                    (eid, fields)
                    for eid, fields in self._streams.get(stream, [])
                    if (lo < _parse_id(eid, 0) if lo_excl else lo <= _parse_id(eid, 0))
                    and (_parse_id(eid, 0) < hi if hi_excl else _parse_id(eid, 0) <= hi)
                ]
                entries.sort(key=lambda e: _parse_id(e[0], 0), reverse=rev)
                if count is not None:
                    entries = entries[:count]
                return [
                    [eid, [x for kv in fields.items() for x in kv]]
                    for eid, fields in entries
                ]
            if cmd == "XGROUP" and a[0].upper() == "CREATE":
                stream, group, start_id = a[1], a[2], a[3]
                if stream not in self._streams and "MKSTREAM" in (s.upper() for s in a):
                    self._streams[stream] = []
                if start_id == "$":
                    entries = self._streams.get(stream, [])
                    start_id = entries[-1][0] if entries else "0-0"
                self._groups[(stream, group)] = {"cursor": start_id, "pending": {}}
                return RespStatus("OK")
            if cmd == "XREADGROUP":
                # GROUP g consumer [COUNT n] STREAMS stream >
                group, consumer = a[1], a[2]
                count = 10**9
                rest = a[3:]
                if rest and rest[0].upper() == "COUNT":
                    count = int(rest[1])
                    rest = rest[2:]
                stream = rest[1]
                state = self._groups.get((stream, group))
                if state is None:
                    return RespFail("NOGROUP no such group")
                cur = _parse_id(state["cursor"], 0)
                new = [
                    (eid, fields)
                    for eid, fields in self._streams.get(stream, [])
                    if _parse_id(eid, 0) > cur
                ][:count]
                if not new:
                    return None
                state["cursor"] = new[-1][0]
                for eid, _ in new:
                    state["pending"][eid] = consumer
                return [
                    [stream, [[eid, [x for kv in f.items() for x in kv]] for eid, f in new]]
                ]
            if cmd == "XACK":
                stream, group, ids = a[0], a[1], a[2:]
                state = self._groups.get((stream, group))
                if state is None:
                    return 0
                return sum(1 for eid in ids if state["pending"].pop(eid, None) is not None)
            return RespFail(f"ERR unknown command '{cmd}'")


class RespStatus:
    def __init__(self, text: str):
        self.text = text


class RespFail:
    def __init__(self, text: str):
        self.text = text
