"""Web upload surface + live import-progress channel.

Analog of the reference's PRIMARY user journey — the Vert.x web verticle
(/root/reference/src/main/java/com/codingchili/excelastic/controller/
Website.java): ``POST /api/upload`` receives a multipart spreadsheet
upload, parses it (fail-fast dry-run), indexes every row, and answers
with the done/error view model (Website.java:130-150,160-178); a status
channel streams ``{uploadId, action, progress}`` events to clients that
subscribe by uploadId (Website.java:94-119, events published per batch by
ElasticWriter.java:149-155).

This engine serves the same journey with the stdlib only:

* ``POST /api/upload`` — multipart form (params ``index``, ``offset``,
  ``options=clear``, ``uploadId``, ``mapping``, ``pipeline``; reference
  ImportEvent.fromParams, model/ImportEvent.java:40-48). The file is
  parsed with the reference-exact ``parse_rows`` semantics and indexed
  through the SAME IndexBuilder / IncrementalIndexer paths the CLI uses:
  first upload builds the index, later uploads append (the ES behavior),
  ``options=clear`` drops it first, ``index_lock`` pins the index name to
  the configured default (Website.java:141-143,180-184).
* ``GET /ws`` — a genuine RFC 6455 websocket (public spec): welcome
  message on connect, client sends one ``{"uploadId": id}`` text frame to
  subscribe, server forwards that upload's progress events, consumer is
  unregistered on close/error (Website.java:94-118 exactly).
* ``GET /api/progress?uploadId=&after=`` — HTTP long-poll equivalent for
  websocket-less clients (returns events with seq > after).
* ``GET /`` — status page with the template context the reference injects
  on every route: version, connectivity, locked index, supported files
  (Website.java:60-76). Connectivity is LIVE: a ``BackendMonitor`` polls
  the Spark JVM + warehouse manifest every 5 s and broadcasts flips on an
  ``es-status`` bus topic, the analog of the reference's ES version poll
  (ElasticWriter.java:41,49,227-240; ES_STATUS at :24).
* Config knobs (Configuration.java:35-38): ``web_port`` is the default
  serve port (9999); ``authentication``+``basic`` demand
  ``Authorization: Basic b64(user:pass)`` on the mutating upload route
  (the reference attaches the same credential to storage-backend writes,
  Configuration.java:63-69); ``tls_cert``/``tls_key`` terminate TLS at
  the head (the elastic_tls analog — the backend lives behind this head).

Progress events come from IndexBuilder's stage hook — the batch-engine
analog of per-bulk-batch percent: a Spark build is a handful of stages,
not 10k HTTP batches, so percent advances per stage (documented
honestly; the event SHAPE {uploadId, action, progress} matches
ElasticWriter.java:152-155).

Scale note: this server is a control-plane front-end — the data plane is
the same Spark job the CLI submits, so a 100 TB upload directory would be
pointed at the CLI/`read_workbooks` path; the web surface exists for the
reference's interactive one-file journey and small-batch appends.
"""

from __future__ import annotations

import base64
import email.parser
import hmac
import email.policy
import hashlib
import json
import os
import queue
import socket
import struct
import tempfile
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import parse_qs, urlsplit

VERSION = "1.0-spark"
SUPPORTED_EXTENSIONS = (".csv", ".xls", ".xlsx")
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"  # RFC 6455 §1.3
NO_FILE_WAS_UPLOADED = "No file was uploaded."  # Website.java:40


# --------------------------------------------------------------------------
# progress bus: the in-process analog of the Vert.x event bus topic
# IMPORT_PROGRESS (ElasticWriter.java:23, published :152-155; consumed per
# uploadId by Website.java:101-109)


class ProgressBus:
    def __init__(self, history: int = 256, max_uploads: int = 256):
        self._lock = threading.Lock()
        self._events: dict[str, list[dict]] = {}
        self._subs: dict[str, list[queue.Queue]] = {}
        self._history = history
        # LRU cap on tracked upload ids: a long-running server must not
        # retain per-upload history forever (unbounded-memory vector on a
        # non-loopback bind). Oldest subscriber-less uploads are evicted
        # once the cap is exceeded; live subscriptions are never dropped.
        self._max_uploads = max_uploads
        self._seq = 0

    def publish(self, upload_id: str, action: str, progress: float, **extra):
        with self._lock:
            self._seq += 1
            ev = {
                "uploadId": upload_id,
                "action": action,
                "progress": round(float(progress), 1),
                "seq": self._seq,
                **extra,
            }
            hist = self._events.pop(upload_id, [])
            hist.append(ev)
            del hist[: -self._history]
            self._events[upload_id] = hist  # re-insert -> LRU order
            for q in self._subs.get(upload_id, []):
                q.put(ev)
            while len(self._events) > self._max_uploads:
                # never evict the upload that was JUST published: if every
                # older tracked upload holds a live subscriber, evicting the
                # newcomer would drop its history before a polling
                # (non-subscribed) /api/progress client ever sees it
                victim = next(
                    (
                        u
                        for u in self._events
                        if u != upload_id and not self._subs.get(u)
                    ),
                    None,
                )
                if victim is None:  # every tracked upload has a live sub
                    break
                del self._events[victim]
        return ev

    def subscribe(self, upload_id: str) -> queue.Queue:
        q: queue.Queue = queue.Queue()
        with self._lock:
            for ev in self._events.get(upload_id, []):
                q.put(ev)  # replay: poll-late clients still see the run
            self._subs.setdefault(upload_id, []).append(q)
        return q

    def unsubscribe(self, upload_id: str, q: queue.Queue) -> None:
        with self._lock:
            subs = self._subs.get(upload_id, [])
            if q in subs:
                subs.remove(q)

    def since(self, upload_id: str, after_seq: int) -> list[dict]:
        with self._lock:
            return [
                e for e in self._events.get(upload_id, []) if e["seq"] > after_seq
            ]


# --------------------------------------------------------------------------
# backend connectivity poll (ElasticWriter.java:41,49,227-240): the reference
# polls elasticsearch every POLL=5000ms (ElasticWriter.java:29) for its
# version string, tracks `connected`, and broadcasts flips on the ES_STATUS
# event-bus topic. Here the backend is the in-process Spark JVM plus the
# index warehouse, so the poll round-trips py4j (NOT the cached Python
# version string — a stopped JVM must flip us to disconnected) and reads the
# warehouse manifest's snapshot count as the storage version.


class BackendMonitor:
    """Periodic backend health/version probe.

    ``probe()`` is one poll tick (pollElasticServer analog); ``start()``
    runs it every ``poll_sec`` seconds on a daemon thread after one
    synchronous tick (the reference calls ``pollElasticServer(0L)`` inline
    at verticle start, ElasticWriter.java:49). Connectivity flips publish an
    ``es-status`` event on the progress bus — the ES_STATUS broadcast
    (ElasticWriter.java:230-238)."""

    POLL_SEC = 5.0  # ElasticWriter.java:29 (POLL = 5000 ms)
    STATUS_TOPIC = "es-status"  # ElasticWriter.java:24

    def __init__(self, spark, cfg, bus: ProgressBus,
                 poll_sec: float = POLL_SEC):
        self.spark = spark
        self.cfg = cfg
        self.bus = bus
        self.poll_sec = poll_sec
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._state: dict[str, Any] = {
            "connected": False, "version": "", "manifestVersion": None,
            "lastPoll": 0.0,
        }

    def probe(self) -> dict[str, Any]:
        """One poll tick: JVM liveness + version, warehouse manifest
        version. Returns (and stores) the new state; publishes an es-status
        bus event when `connected` flips (ElasticWriter.java:230-238)."""
        connected, version, manifest_version = False, "", None
        try:
            sc = self.spark.sparkContext
            # a genuine py4j round trip — spark.version is a Python-side
            # constant and would still "succeed" against a dead JVM
            if sc._jsc is None or sc._jsc.sc().isStopped():
                raise RuntimeError("spark context stopped")
            version = f"spark-{self.spark.version}"
            connected = True
        except Exception:
            connected = False
        if connected:
            # storage-backend half: an EXISTING manifest that cannot be
            # read means the warehouse is unhealthy; no index yet is fine
            # (the reference reports connected against an empty ES too)
            mpath = os.path.join(
                self.cfg.warehouse, self.cfg.resolve_index_name(None),
                "manifest.json",
            )
            try:
                if os.path.exists(mpath):
                    with open(mpath, "r", encoding="utf-8") as f:
                        manifest = json.load(f)
                    manifest_version = len(manifest.get("snapshots", []))
            except Exception:
                connected = False
        with self._lock:
            was = self._state["connected"]
            self._state = {
                "connected": connected, "version": version,
                "manifestVersion": manifest_version, "lastPoll": time.time(),
            }
        if connected != was:
            self.bus.publish(
                self.STATUS_TOPIC,
                "connected" if connected else "disconnected",
                100.0 if connected else 0.0,
                version=version,
            )
        return self.status()

    def status(self) -> dict[str, Any]:
        with self._lock:
            return dict(self._state)

    def start(self) -> threading.Thread:
        """Synchronous first tick, then the periodic daemon thread
        (ElasticWriter.java:41,49). Idempotent."""
        self.probe()
        if self._thread is None or not self._thread.is_alive():
            self._stop.clear()
            self._thread = threading.Thread(
                target=self._loop, daemon=True, name="backend-monitor"
            )
            self._thread.start()
        return self._thread

    def _loop(self) -> None:
        while not self._stop.wait(self.poll_sec):
            self.probe()

    def stop(self) -> None:
        self._stop.set()


# --------------------------------------------------------------------------
# import event (ImportEvent.fromParams, model/ImportEvent.java:40-48)


@dataclass
class ImportEvent:
    index: str
    offset: int = 1
    clear_existing: bool = False
    upload_id: str = ""
    mapping: str = "default"
    pipeline: str | None = None

    @classmethod
    def from_params(cls, params: dict[str, str], default_index: str,
                    index_lock: bool) -> "ImportEvent":
        index = params.get("index") or default_index
        if index_lock:  # Website.java:141-143,180-184
            index = default_index
        mapping = params.get("mapping") or "default"  # ImportEvent.java:77-79
        return cls(
            index=index,
            offset=int(params.get("offset", "1") or "1"),
            clear_existing=params.get("options", "") == "clear",
            upload_id=params.get("uploadId", ""),
            mapping=mapping,
            pipeline=params.get("pipeline") or None,
        )


# --------------------------------------------------------------------------
# upload -> corpus rows -> index (the data plane; same code path as the CLI)


def docs_to_corpus_rows(
    docs: list[dict], filename: str, upload_id: str, ext: str
) -> list[tuple]:
    """One parsed spreadsheet row -> one corpus document, like one ES doc
    per row in the reference: content is the row's JSON (sorted keys so the
    sha256 ingest invariant is deterministic); (repo,path,commit) uniquely
    identify the row across repeat uploads of the same file."""
    return [
        (
            "upload",
            f"{filename}#row{i}",
            upload_id,
            ext.lstrip("."),
            json.dumps(doc, sort_keys=True, separators=(",", ":")),
        )
        for i, doc in enumerate(docs)
    ]


class UploadService:
    """Parses and indexes one uploaded file; publishes progress events.
    The blocking-parse-then-index shape of Website.parse
    (Website.java:195-220): dry-run parse fails fast with nothing indexed,
    then the import runs to completion before the HTTP response."""

    def __init__(self, spark, cfg, bus: ProgressBus):
        self.spark = spark
        self.cfg = cfg
        self.bus = bus
        self._index_locks: dict[str, threading.Lock] = {}
        self._lock = threading.Lock()

    def _index_lock(self, name: str) -> threading.Lock:
        with self._lock:
            return self._index_locks.setdefault(name, threading.Lock())

    def import_file(
        self, payload: bytes, filename: str, event: ImportEvent
    ) -> int:
        """Returns the number of imported rows (parser.getNumberOfElements
        analog). Raises ParserException subclasses on invalid input."""
        from excelastic_spark.build import IndexBuilder
        from excelastic_spark.catalog import IndexStore
        from excelastic_spark.corpus import CORPUS_SCHEMA
        from excelastic_spark.sources.spreadsheet import _extension, parse_rows
        from excelastic_spark.streaming.incremental import IncrementalIndexer

        ext = _extension(filename)  # InvalidFileName/UnsupportedFileType
        # verify event BEFORE parsing starts (Website.sendParsingEvent,
        # Website.java:222-226)
        self.bus.publish(event.upload_id, "verify", 0.0)
        # uploads land on disk first, like the Vert.x BodyHandler's
        # file-uploads dir (Website.java:145 uploadedFileName)
        with tempfile.NamedTemporaryFile(suffix=ext, delete=False) as tf:
            tf.write(payload)
            tmp = tf.name
        try:
            _, docs = parse_rows(tmp, offset=event.offset)
        finally:
            os.unlink(tmp)

        rows = docs_to_corpus_rows(docs, filename, event.upload_id, ext)
        df = self.spark.createDataFrame(rows, schema=CORPUS_SCHEMA)
        store = IndexStore(self.cfg.warehouse, event.index)

        def progress(stage: str, pct: float) -> None:
            self.bus.publish(event.upload_id, "import", pct, stage=stage)

        # one import per index at a time (the reference serializes through
        # a single ES writer verticle per event-bus delivery)
        with self._index_lock(event.index):
            exists = bool(store.manifest().get("stages"))
            if event.clear_existing or not exists:
                IndexBuilder(self.spark, store, self.cfg, progress=progress).build(
                    df, clear=event.clear_existing
                )
            else:
                cfg = type(self.cfg).from_store(store, base=self.cfg)
                progress("append", 50.0)
                IncrementalIndexer(self.spark, store, cfg).append_increment(df)
        self.bus.publish(event.upload_id, "done", 100.0, imported=len(docs))
        return len(docs)


# --------------------------------------------------------------------------
# multipart/form-data (public format, RFC 7578) via the stdlib email parser


def parse_multipart(
    content_type: str, body: bytes
) -> tuple[dict[str, str], list[tuple[str, bytes]]]:
    """-> (form fields, [(filename, payload), ...])."""
    head = f"Content-Type: {content_type}\r\nMIME-Version: 1.0\r\n\r\n"
    msg = email.parser.BytesParser(policy=email.policy.default).parsebytes(
        head.encode("ascii") + body
    )
    fields: dict[str, str] = {}
    files: list[tuple[str, bytes]] = []
    if not msg.is_multipart():
        return fields, files
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        filename = part.get_filename()
        payload = part.get_payload(decode=True) or b""
        if filename:
            files.append((filename, payload))
        elif name:
            fields[str(name)] = payload.decode("utf-8", "replace")
    return fields, files


# --------------------------------------------------------------------------
# RFC 6455 websocket framing (public spec; server->client frames unmasked,
# client->server frames masked)


def ws_accept_key(key: str) -> str:
    digest = hashlib.sha1((key + _WS_GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def ws_encode_text(payload: str) -> bytes:
    data = payload.encode("utf-8")
    n = len(data)
    if n < 126:
        return b"\x81" + bytes([n]) + data
    if n < 1 << 16:
        return b"\x81\x7e" + struct.pack(">H", n) + data
    return b"\x81\x7f" + struct.pack(">Q", n) + data


def ws_read_frame(sock) -> tuple[int, bytes] | None:
    """-> (opcode, payload) or None on EOF. ``sock`` is anything with
    ``recv(n)`` (a socket, or a buffered-reader shim — the server reads
    frames through the handler's rfile so readahead is never lost)."""

    def read_exact(n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    hdr = read_exact(2)
    if hdr is None:
        return None
    opcode = hdr[0] & 0x0F
    masked = bool(hdr[1] & 0x80)
    n = hdr[1] & 0x7F
    if n == 126:
        ext = read_exact(2)
        if ext is None:
            return None
        (n,) = struct.unpack(">H", ext)
    elif n == 127:
        ext = read_exact(8)
        if ext is None:
            return None
        (n,) = struct.unpack(">Q", ext)
    mask = read_exact(4) if masked else b"\x00" * 4
    if mask is None:
        return None
    data = read_exact(n) if n else b""
    if data is None:
        return None
    if masked:
        data = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
    return opcode, data


# --------------------------------------------------------------------------
# the HTTP server


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server: "UploadServer"

    def log_message(self, fmt, *args):  # quiet; server keeps its own log
        pass

    # ---------------------------------------------------------------- util

    def _json(self, obj: dict, status: int = 200) -> None:
        body = json.dumps(obj).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _params(self) -> dict[str, str]:
        qs = parse_qs(urlsplit(self.path).query)
        return {k: v[0] for k, v in qs.items()}

    def _wants_html(self) -> bool:
        """Browser form posts send Accept: text/html; API clients get the
        JSON view model for the same template context."""
        return "text/html" in self.headers.get("Accept", "")

    def _html(self, body: str, status: int = 200) -> None:
        data = body.encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _done_view(self, index: str, filename: str, imported: int) -> str:
        """The done view (templates/done.jade: 'Success!' + imported rows
        sentence + ANOTHER FILE link), rendered from the same context the
        reference injects (Website.java:164-170)."""
        import html as _html_mod

        ctx = self.server.template_context()
        return (
            "<html><head><title>excelastic {version}</title></head><body>"
            "<h1>Success!</h1>"
            "<p>Imported {imported} rows from '{file}' into '{index}' "
            "successfully. <a href='/'>ANOTHER FILE</a></p>"
            "</body></html>"
        ).format(
            # filename and index are client-controlled: escape them or a
            # crafted filename becomes stored XSS in the operator's browser
            version=_html_mod.escape(str(ctx["version"])),
            imported=int(imported),
            file=_html_mod.escape(filename),
            index=_html_mod.escape(index),
        )

    def _error_view(self, message: str) -> str:
        """The error view (templates/error.jade: heading + pre message +
        TRY ANOTHER FILE link), same 200-status reroute the reference uses
        (Website.java:171-176 rerouts to ERROR with the message)."""
        import html as _html_mod

        return (
            "<html><head><title>excelastic error</title></head><body>"
            "<h1>There was an error uploading the file</h1>"
            f"<pre>{_html_mod.escape(message)}</pre>"
            "<p><a href='/'>TRY ANOTHER FILE</a></p>"
            "</body></html>"
        )

    # ----------------------------------------------------------------- GET

    def do_GET(self) -> None:  # noqa: N802 (stdlib API)
        path = urlsplit(self.path).path
        if path == "/ws":
            self._websocket()
        elif path == "/api/progress":
            p = self._params()
            self._json(
                {
                    "uploadId": p.get("uploadId", ""),
                    "events": self.server.bus.since(
                        p.get("uploadId", ""), int(p.get("after", "0") or "0")
                    ),
                }
            )
        elif path == "/favicon.ico":  # Website.java:56
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()
        elif path == "/api/status":
            self._json(self.server.template_context())
        else:
            # the start/done/error views share one template context
            # (Website.java:60-76); a JSON API serves the same model
            ctx = self.server.template_context()
            body = (
                "<html><body><h1>excelastic-spark {version}</h1>"
                "<p>engine connected: {connected}; index locked: "
                "{indexLocked}; default index: {index}</p>"
                "<p>supported files: {supportedFiles}</p>"
                "<form method='post' action='/api/upload' "
                "enctype='multipart/form-data'>"
                "<input type='file' name='file'/>"
                "<input name='index' placeholder='index'/>"
                "<input name='offset' value='1'/>"
                "<input type='submit'/></form></body></html>"
            ).format(**ctx).encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    # ---------------------------------------------------------------- POST

    def _authorized(self) -> bool:
        """Basic-auth gate on the mutating route (Configuration.java:63-69
        getBasicAuth: when `authentication` is on, every write to the
        storage backend carries `Basic b64(user:pass)`; the backend lives
        behind this head, so the head enforces the same credential)."""
        expected = self.server.expected_basic_auth()
        if expected is None:
            return True
        # constant-time compare: == short-circuits on the first differing
        # byte and leaks credential prefix length via timing on a
        # non-loopback bind. Compare as BYTES: http.server decodes headers
        # as latin-1, and compare_digest(str, str) raises on non-ASCII —
        # a scanner sending 'Basic caf\xe9' must get a 401, not a dropped
        # connection.
        if hmac.compare_digest(
            self.headers.get("Authorization", "").encode("latin-1"),
            expected.encode("latin-1"),
        ):
            return True
        body = json.dumps({"error": "unauthorized"}).encode("utf-8")
        self.send_response(401)
        self.send_header("WWW-Authenticate", 'Basic realm="excelastic"')
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)
        # the request body was never drained; desynchronized keep-alive
        self.close_connection = True
        return False

    def do_POST(self) -> None:  # noqa: N802
        path = urlsplit(self.path).path
        if path != "/api/upload":
            self._json({"error": "not found"}, status=404)
            return
        if not self._authorized():
            return
        from excelastic_spark.sources.spreadsheet import ParserException

        def fail(upload_id: str, message: str) -> None:
            # reroute(ERROR): a terminal 'error' event for subscribers AND
            # the 200 + error view (Website.java:171-176) — EVERY failure
            # path must land here, or websocket/long-poll clients for that
            # uploadId wait forever for a done/error event
            self.server.bus.publish(upload_id, "error", 0.0, message=message)
            if self._wants_html():
                self._html(self._error_view(message))
            else:
                self._json({"error": message})

        length = int(self.headers.get("Content-Length", "0") or "0")
        max_bytes = self.server.max_upload_bytes
        if length > max_bytes:
            # reject BEFORE reading the body into memory (the reference's
            # BodyHandler spools to disk; this server is in-RAM, so the cap
            # is the memory-safety bound for non-loopback binds)
            upload_id = self._params().get("uploadId", "")
            fail(
                upload_id,
                f"Upload of {length} bytes exceeds the maximum upload size "
                f"of {max_bytes} bytes.",
            )
            # the request body was never drained: the keep-alive stream is
            # desynchronized, so this connection must close after the reply
            self.close_connection = True
            return
        body = self.rfile.read(length) if length else b""
        ctype = self.headers.get("Content-Type", "")
        fields: dict[str, str] = {}
        files: list[tuple[str, bytes]] = []
        if ctype.startswith("multipart/"):
            fields, files = parse_multipart(ctype, body)
        params = {**self._params(), **fields}

        if not files:
            # reroute(ERROR) with 200 + message (Website.java:146-149);
            # routed through fail() so a subscriber on this uploadId gets
            # its terminal 'error' event instead of waiting forever
            fail(params.get("uploadId", ""), NO_FILE_WAS_UPLOADED)
            return
        filename, payload = files[0]  # first upload only, like the reference
        event = ImportEvent(index="", upload_id=params.get("uploadId", ""))
        try:
            # NumberFormatException from bad params fails like a parse
            # error (Website.java:214 catches it alongside ParserException)
            event = ImportEvent.from_params(
                params,
                default_index=self.server.cfg.resolve_index_name(None),
                index_lock=self.server.cfg.index_lock,
            )
            imported = self.server.service.import_file(payload, filename, event)
        except (ParserException, ValueError) as e:
            fail(event.upload_id, f"{type(e).__name__}: {e}")
            return
        except Exception as e:  # noqa: BLE001 — the reference routes ALL
            # import failures through reroute(ERROR); a Spark
            # AnalysisException / Py4J error / OSError mid-build must
            # produce the error view + terminal event, not a dropped
            # connection and a forever-waiting subscriber
            fail(event.upload_id, f"{type(e).__name__}: {e}")
            return
        # the done view model (Website.java:164-170)
        if self._wants_html():
            self._html(self._done_view(event.index, filename, imported))
        else:
            self._json(
                {"index": event.index, "file": filename, "imported": imported}
            )

    # ----------------------------------------------------------- websocket

    def _websocket(self) -> None:
        key = self.headers.get("Sec-WebSocket-Key")
        if (
            self.headers.get("Upgrade", "").lower() != "websocket"
            or not key
        ):
            self._json({"error": "websocket upgrade required"}, status=400)
            return
        self.send_response(101, "Switching Protocols")
        self.send_header("Upgrade", "websocket")
        self.send_header("Connection", "Upgrade")
        self.send_header("Sec-WebSocket-Accept", ws_accept_key(key))
        self.end_headers()
        self.wfile.flush()
        sock = self.connection

        class _Reader:
            # frames come through the handler's buffered rfile: any bytes
            # the reader buffered past the handshake are not lost
            def __init__(self, rfile):
                self._rfile = rfile

            def recv(self, n: int) -> bytes:
                return self._rfile.read(n)

        reader = _Reader(self.rfile)
        # welcome frame (Website.java:96,121-123)
        sock.sendall(
            ws_encode_text(
                json.dumps(
                    {
                        "message": "websocket connected to excelastic-spark "
                        + VERSION
                    }
                )
            )
        )
        bus = self.server.bus
        upload_id: str | None = None
        q: queue.Queue | None = None
        stop = threading.Event()

        def pump() -> None:
            # forwards subscribed progress events until close
            # (Website.java:101-109)
            while not stop.is_set():
                if q is None:
                    time.sleep(0.02)
                    continue
                try:
                    ev = q.get(timeout=0.1)
                except queue.Empty:
                    continue
                try:
                    sock.sendall(ws_encode_text(json.dumps(ev)))
                except OSError:
                    stop.set()

        pumper = threading.Thread(target=pump, daemon=True)
        pumper.start()
        try:
            while not stop.is_set():
                frame = ws_read_frame(reader)
                if frame is None:
                    break
                opcode, data = frame
                if opcode == 8:  # close
                    try:
                        sock.sendall(b"\x88\x00")
                    except OSError:
                        pass
                    break
                if opcode == 9:  # ping -> pong
                    sock.sendall(b"\x8a" + bytes([len(data)]) + data)
                elif opcode == 1:
                    # the one supported client message: set the uploadId to
                    # listen to (Website.java:110-111)
                    try:
                        uid = json.loads(data.decode("utf-8")).get("uploadId")
                    except (ValueError, UnicodeDecodeError):
                        continue
                    if uid:
                        if q is not None and upload_id:
                            bus.unsubscribe(upload_id, q)
                        upload_id = str(uid)
                        q = bus.subscribe(upload_id)
        finally:
            stop.set()
            if q is not None and upload_id:
                bus.unsubscribe(upload_id, q)  # Website.java:113-117
            self.close_connection = True


class UploadServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, spark, cfg=None, host: str = "127.0.0.1",
                 port: int = 0, max_upload_bytes: int = 256 << 20):
        from excelastic_spark.config import EngineConfig

        self.cfg = cfg or EngineConfig()
        self.bus = ProgressBus()
        self.service = UploadService(spark, self.cfg, self.bus)
        self.max_upload_bytes = max_upload_bytes
        # connectivity poll (A17): one synchronous tick now so the status
        # page is truthful before the periodic thread spins up
        # (pollElasticServer(0L) at start, ElasticWriter.java:49)
        self.monitor = BackendMonitor(spark, self.cfg, self.bus)
        self.monitor.probe()
        super().__init__((host, port), _Handler)
        if self.cfg.tls_cert and self.cfg.tls_key:
            # TLS terminates at the head (config.py: the elastic_tls analog)
            import ssl

            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            ctx.load_cert_chain(self.cfg.tls_cert, self.cfg.tls_key)
            self.socket = ctx.wrap_socket(self.socket, server_side=True)

    def expected_basic_auth(self) -> str | None:
        """`Basic b64(user:pass)` when authentication is enabled, else None
        (Configuration.java:63-69)."""
        if not self.cfg.authentication:
            return None
        tok = base64.b64encode(self.cfg.basic.encode("utf-8")).decode("ascii")
        return f"Basic {tok}"

    def template_context(self) -> dict[str, Any]:
        """The view model injected on every route (Website.java:60-76).
        `connected`/`backend` come from the live BackendMonitor probe, the
        ES-version-poll analog (ElasticWriter.java:227-240)."""
        backend = self.monitor.status()
        return {
            "version": VERSION,
            "connected": backend["connected"],
            "backend": backend,
            "indexLocked": self.cfg.index_lock,
            "index": self.cfg.resolve_index_name(None),
            "supportedFiles": ", ".join(SUPPORTED_EXTENSIONS),
        }

    @property
    def port(self) -> int:
        return self.server_address[1]

    def start_background(self) -> threading.Thread:
        self.monitor.start()
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self) -> None:
        self.monitor.stop()
        super().shutdown()


def serve(spark, cfg=None, host: str = "127.0.0.1", port: int = 9999,
          max_upload_bytes: int = 256 << 20):
    """Blocking entry: `python index.py serve` uses this."""
    srv = UploadServer(spark, cfg, host, port, max_upload_bytes)
    srv.monitor.start()  # periodic backend poll (ElasticWriter.java:41)
    # scheme must match the socket: UploadServer wraps it in TLS when both
    # cert and key are configured, and printing http:// there misleads
    # operators into connecting with the wrong scheme
    scheme = "https" if (srv.cfg.tls_cert and srv.cfg.tls_key) else "http"
    print(f"excelastic-spark web on {scheme}://{host}:{srv.port}")
    srv.serve_forever()
