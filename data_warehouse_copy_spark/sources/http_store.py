"""A NETWORK-boundary object store: conditional-PUT semantics served over
a real localhost socket, plus the matching client adapter.

The in-process adapters (``InMemoryObjectStore``, ``LocalFSObjectStore``)
prove the commit protocol's logic, but every call is a Python function
call — no serialization, no connect/timeout, no half-open connection, no
"server applied the write, the response died on the wire". This module
closes that gap inside the sandbox (a real S3/GCS endpoint is
unreachable here): an ``http.server`` speaking the standard
``If-None-Match: *`` conditional-PUT idiom (the semantics S3 added in
2024, and GCS/ABFS have always had) fronted by a thread-safe in-memory
bucket, and an ``HttpObjectStore`` client that maps transport outcomes
onto the store contract:

- ``201 Created``  → conditional put WON
- ``412 Precondition Failed`` → an object is already there (CAS lost)
- ``404`` on GET   → absent
- timeout / reset / truncated response / 5xx → ``TransientStoreError``
  (outcome UNKNOWN — the protocol's recovery read resolves it)

Fault injection lives SERVER-side (:class:`FaultPlan`), so the client
exercises its real error paths: ``drop_after_next`` applies the write
and then kills the connection without a status line — the classic lost
ack; ``fail_before_next`` answers 503 without applying; ``latency_s``
delays every response (timeout drills). Tests drive the whole
``ConditionalPutCommitProtocol`` matrix over this adapter in
tests/test_commit_protocol.py.
"""

from __future__ import annotations

import http.client
import socket
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import quote, unquote

from data_warehouse_copy_spark.sources.commit_protocol import (
    InMemoryObjectStore,
    TransientStoreError,
)


@dataclass
class FaultPlan:
    """Server-side fault knobs. The counter faults target CONDITIONAL
    PUTs specifically (the commit CAS — the request whose ambiguity the
    protocol's recovery dance exists for); sabotaging arbitrary GETs
    would just break unrelated read paths. Latencies: ``latency_s``
    delays every response, ``latency_cas_s`` only the CAS ack — with a
    client timeout below it, the write APPLIES but the ack times out,
    the purest 'lost response' a socket can produce."""

    latency_s: float = 0.0
    latency_cas_s: float = 0.0
    fail_before_next_cas: int = 0  # 503 WITHOUT applying the write
    drop_after_next_cas: int = 0   # apply, then no response at all
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def take(self, attr: str) -> bool:
        with self._lock:
            n = getattr(self, attr)
            if n > 0:
                setattr(self, attr, n - 1)
                return True
            return False


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):  # silence per-request stderr noise
        pass

    @property
    def _store(self) -> InMemoryObjectStore:
        return self.server.store  # type: ignore[attr-defined]

    @property
    def _faults(self) -> FaultPlan:
        return self.server.faults  # type: ignore[attr-defined]

    def _respond(self, status: int, body: bytes = b"") -> None:
        if self._faults.latency_s:
            import time

            time.sleep(self._faults.latency_s)
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _drop_connection(self) -> None:
        # no status line, no body: the client sees a reset/short read —
        # the outcome of its request is genuinely unknowable client-side
        try:
            self.connection.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self.close_connection = True

    def do_GET(self):
        key = unquote(self.path.lstrip("/"))
        val = self._store.get(key)
        if val is None:
            return self._respond(404)
        self._respond(200, val.encode())

    def do_PUT(self):
        length = int(self.headers.get("Content-Length", "0"))
        data = self.rfile.read(length).decode()
        key = unquote(self.path.lstrip("/"))
        if self.headers.get("If-None-Match") == "*":
            if self._faults.take("fail_before_next_cas"):
                return self._respond(503)  # rejected BEFORE state change
            created = self._store.put_if_absent(key, data)
            if self._faults.take("drop_after_next_cas"):
                return self._drop_connection()  # applied; ack lost
            if self._faults.latency_cas_s:
                import time

                time.sleep(self._faults.latency_cas_s)
            return self._respond(201 if created else 412)
        self._store.put(key, data)
        self._respond(200)


class HttpObjectStoreServer:
    """The localhost bucket. ``with HttpObjectStoreServer() as srv:`` —
    then ``HttpObjectStore(srv.port)`` clients talk to it over TCP."""

    def __init__(self, backing: InMemoryObjectStore | None = None):
        self.store = backing or InMemoryObjectStore()
        self.faults = FaultPlan()
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self._httpd.store = self.store  # type: ignore[attr-defined]
        self._httpd.faults = self.faults  # type: ignore[attr-defined]
        self._httpd.daemon_threads = True
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)

    def __enter__(self) -> "HttpObjectStoreServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class HttpObjectStore:
    """Client adapter satisfying the commit-protocol store contract over
    the wire. One connection per request: every call pays a real
    connect, and a dropped response never poisons a pooled socket."""

    def __init__(self, port: int, host: str = "127.0.0.1",
                 timeout: float = 5.0):
        self.host, self.port, self.timeout = host, port, timeout

    def _request(
        self, method: str, key: str, body: "str | None" = None,
        headers: "dict | None" = None,
    ) -> "tuple[int, str]":
        conn = http.client.HTTPConnection(
            self.host, self.port, timeout=self.timeout
        )
        try:
            conn.request(
                method, "/" + quote(key, safe=""),
                body=body.encode() if body is not None else None,
                headers=headers or {},
            )
            resp = conn.getresponse()
            data = resp.read()
            return resp.status, data.decode()
        except (OSError, http.client.HTTPException) as e:
            # timeout, reset, refused, truncated response: the request's
            # outcome is UNKNOWN — surface exactly that, never a guess
            raise TransientStoreError(f"{method} {key}: {e!r}") from e
        finally:
            conn.close()

    def put_if_absent(self, key: str, data: str) -> bool:
        status, _ = self._request(
            "PUT", key, body=data, headers={"If-None-Match": "*"}
        )
        if status == 201:
            return True
        if status == 412:
            return False
        raise TransientStoreError(f"conditional PUT {key}: HTTP {status}")

    def put(self, key: str, data: str) -> None:
        status, _ = self._request("PUT", key, body=data)
        if status != 200:
            raise TransientStoreError(f"PUT {key}: HTTP {status}")

    def get(self, key: str) -> "str | None":
        status, body = self._request("GET", key)
        if status == 200:
            return body
        if status == 404:
            return None
        raise TransientStoreError(f"GET {key}: HTTP {status}")
