"""Web upload surface tests: the reference's TestWebsite journey
(/root/reference/src/test/java/com/codingchili/TestWebsite.java) plus the
progress-channel semantics of Website.java:94-119 — start page, multipart
upload -> parse -> index -> done view model, no-file error, index_lock,
websocket subscribe-by-uploadId with welcome + progress + done events."""

from __future__ import annotations

import http.client
import json
import os
import secrets
import socket
import struct

import pytest

from excelastic_spark.config import EngineConfig
from excelastic_spark.web import UploadServer, ws_read_frame


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("web_wh"))
    cfg = EngineConfig(
        warehouse=wh, n_buckets=4, block_size=8, shuffle_partitions=4,
        default_index="webdefault",
    )
    srv = UploadServer(spark, cfg)
    srv.start_background()
    yield srv
    srv.shutdown()


def _post_upload(
    port: int, filename: str, payload: bytes, fields: dict[str, str]
) -> dict:
    boundary = "b" + secrets.token_hex(12)
    parts = []
    for k, v in fields.items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"'
            f"\r\n\r\n{v}\r\n".encode()
        )
    parts.append(
        f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
        f'filename="{filename}"\r\n'
        "Content-Type: application/octet-stream\r\n\r\n".encode()
        + payload
        + b"\r\n"
    )
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request(
        "POST", "/api/upload", body,
        {"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    resp = conn.getresponse()
    assert resp.status == 200  # reference reroutes done/error with 200
    out = json.loads(resp.read())
    conn.close()
    return out


CSV = "name,value\nalpha,1\nbeta,2\ngamma delta,3\n"


def test_start_page_and_status(server):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.request("GET", "/")
    resp = conn.getresponse()
    assert resp.status == 200  # TestWebsite.shouldGetStartPage
    html = resp.read().decode()
    assert "excelastic-spark" in html and "webdefault" in html
    conn.request("GET", "/api/status")
    st = json.loads(conn.getresponse().read())
    assert st["supportedFiles"] == ".csv, .xls, .xlsx"
    assert st["connected"] is True and st["indexLocked"] is False
    conn.request("GET", "/favicon.ico")  # Website.java:56
    assert conn.getresponse().read() == b""
    conn.close()


def test_upload_csv_builds_queryable_index(server, spark):
    out = _post_upload(
        server.port, "data.csv", CSV.encode(),
        {"index": "webidx", "offset": "1", "uploadId": "u1", "options": "",
         "mapping": ""},
    )
    assert out == {"index": "webidx", "file": "data.csv", "imported": 3}

    from excelastic_spark.catalog import IndexStore
    from excelastic_spark.query import QueryEngine

    store = IndexStore(server.cfg.warehouse, "webidx")
    cfg = EngineConfig.from_store(store, base=server.cfg)
    hits = QueryEngine(spark, store, cfg).search(["alpha"], "or", 5).to_pandas()
    assert len(hits) == 1
    # doc metadata carries the upload provenance (file#row, uploadId)
    docs = store.read_table(spark, "docs").toPandas()
    assert set(docs["path"]) == {f"data.csv#row{i}" for i in range(3)}
    assert set(docs["commit"]) == {"u1"}


def test_second_upload_appends(server, spark):
    csv2 = "name,value\nepsilon,9\nzeta,10\n"
    out = _post_upload(
        server.port, "more.csv", csv2.encode(),
        {"index": "webidx", "offset": "1", "uploadId": "u2"},
    )
    assert out["imported"] == 2
    from excelastic_spark.catalog import IndexStore
    from excelastic_spark.query import QueryEngine

    store = IndexStore(server.cfg.warehouse, "webidx")
    cfg = EngineConfig.from_store(store, base=server.cfg)
    qe = QueryEngine(spark, store, cfg)
    assert len(qe.search(["epsilon"], "or", 5).to_pandas()) == 1
    assert len(qe.search(["alpha"], "or", 5).to_pandas()) == 1  # still there
    assert store.read_table(spark, "stats").collect()[0]["n_docs"] == 5


def test_upload_xlsx_with_offset(server, spark):
    from excelastic_spark.sources.workbook import write_xlsx

    path = os.path.join(server.cfg.warehouse, "fixture.xlsx")
    write_xlsx(
        path, ["city", "pop"], [["oslo", 7], ["bergen", 3]], offset=3
    )
    with open(path, "rb") as f:
        payload = f.read()
    out = _post_upload(
        server.port, "cities.xlsx", payload,
        {"index": "xlsxidx", "offset": "3", "uploadId": "u3"},
    )
    assert out == {"index": "xlsxidx", "file": "cities.xlsx", "imported": 2}
    from excelastic_spark.catalog import IndexStore
    from excelastic_spark.query import QueryEngine

    store = IndexStore(server.cfg.warehouse, "xlsxidx")
    cfg = EngineConfig.from_store(store, base=server.cfg)
    hits = QueryEngine(spark, store, cfg).search(["oslo"], "or", 5).to_pandas()
    assert len(hits) == 1


def test_upload_xls_biff(server, spark):
    """.xls uploads go through the BIFF8/CFB reader (ExcelParser.java's
    HSSF branch) on the same web journey as .xlsx."""
    from excelastic_spark.sources.biff import write_xls

    path = os.path.join(server.cfg.warehouse, "fixture.xls")
    write_xls(path, ["city", "pop"], [["tromso", 4], ["narvik", 2]], offset=2)
    with open(path, "rb") as f:
        payload = f.read()
    out = _post_upload(
        server.port, "cities.xls", payload,
        {"index": "xlsidx", "offset": "2", "uploadId": "u3b"},
    )
    assert out == {"index": "xlsidx", "file": "cities.xls", "imported": 2}
    from excelastic_spark.catalog import IndexStore
    from excelastic_spark.query import QueryEngine

    store = IndexStore(server.cfg.warehouse, "xlsidx")
    cfg = EngineConfig.from_store(store, base=server.cfg)
    hits = QueryEngine(spark, store, cfg).search(["tromso"], "or", 5).to_pandas()
    assert len(hits) == 1


def test_no_file_is_error(server):
    boundary = "b0"
    body = (
        f'--{boundary}\r\nContent-Disposition: form-data; name="index"'
        f"\r\n\r\nx\r\n--{boundary}--\r\n"
    ).encode()
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.request(
        "POST", "/api/upload", body,
        {"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    resp = conn.getresponse()
    assert resp.status == 200  # TestWebsite.shouldFailUpload: 200 + error
    out = json.loads(resp.read())
    conn.close()
    assert out == {"error": "No file was uploaded."}  # Website.java:40


def test_parse_error_reported(server):
    bad = "a,b\n1,2,3\n"  # arity mismatch at row 2
    out = _post_upload(
        server.port, "bad.csv", bad.encode(),
        {"index": "badidx", "offset": "1", "uploadId": "u4"},
    )
    assert "error" in out
    assert "2" in out["error"]  # 1-based row number in the message
    # error event published on the progress channel (Website.java:171-176)
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.request("GET", "/api/progress?uploadId=u4")
    evs = json.loads(conn.getresponse().read())["events"]
    conn.close()
    assert any(e["action"] == "error" for e in evs)


def test_unsupported_extension(server):
    out = _post_upload(
        server.port, "data.pdf", b"%PDF", {"index": "x", "uploadId": "u5"}
    )
    assert "error" in out


def test_index_lock_pins_default_index(spark, tmp_path):
    cfg = EngineConfig(
        warehouse=str(tmp_path), n_buckets=4, block_size=8,
        shuffle_partitions=4, default_index="locked", index_lock=True,
    )
    srv = UploadServer(spark, cfg)
    srv.start_background()
    try:
        out = _post_upload(
            srv.port, "d.csv", CSV.encode(),
            {"index": "evil", "offset": "1", "uploadId": "u6"},
        )
        # Website.java:141-143: locked -> the requested index is ignored
        assert out["index"] == "locked"
        assert os.path.isdir(os.path.join(str(tmp_path), "locked"))
        assert not os.path.isdir(os.path.join(str(tmp_path), "evil"))
    finally:
        srv.shutdown()


def test_upload_size_cap(server):
    """Oversized Content-Length is rejected BEFORE the body is read into
    memory, with the reference's 200 + error-view semantics and a terminal
    'error' event for progress subscribers."""
    old = server.max_upload_bytes
    server.max_upload_bytes = 1024
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
        body = b"x" * 4096
        conn.request(
            "POST", "/api/upload?uploadId=ucap", body,
            {"Content-Type": "multipart/form-data; boundary=b1"},
        )
        resp = conn.getresponse()
        assert resp.status == 200
        out = json.loads(resp.read())
        assert "maximum upload size" in out["error"]
        conn.close()  # server closed too (undrained body desyncs keep-alive)
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
        conn.request("GET", "/api/progress?uploadId=ucap")
        evs = json.loads(conn.getresponse().read())["events"]
        conn.close()
        assert any(e["action"] == "error" for e in evs)
    finally:
        server.max_upload_bytes = old


def test_html_done_and_error_views(server):
    """Browser form posts (Accept: text/html) get the done.jade/error.jade
    analog views rendered from the same template context, not raw JSON."""
    boundary = "bhtml"
    parts = (
        f'--{boundary}\r\nContent-Disposition: form-data; name="index"'
        f"\r\n\r\nhtmlidx\r\n"
        f'--{boundary}\r\nContent-Disposition: form-data; name="uploadId"'
        f"\r\n\r\nuh1\r\n"
        f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
        f'filename="h.csv"\r\n\r\n{CSV}\r\n--{boundary}--\r\n'
    ).encode()
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=300)
    hdrs = {
        "Content-Type": f"multipart/form-data; boundary={boundary}",
        "Accept": "text/html,application/xhtml+xml",
    }
    conn.request("POST", "/api/upload", parts, hdrs)
    resp = conn.getresponse()
    assert resp.status == 200
    assert "text/html" in resp.getheader("Content-Type", "")
    html = resp.read().decode()
    # done.jade: "Success!" + "Imported N rows from 'file' into 'index'"
    assert "Success!" in html
    assert "Imported 3 rows from 'h.csv' into 'htmlidx'" in html

    bad = (
        f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
        f'filename="bad.csv"\r\n\r\na,b\n1,2,3\n\r\n--{boundary}--\r\n'
    ).encode()
    conn.request("POST", "/api/upload", bad, hdrs)
    resp = conn.getresponse()
    assert resp.status == 200
    html = resp.read().decode()
    conn.close()
    # error.jade: heading + <pre> message
    assert "There was an error uploading the file" in html
    assert "<pre>" in html


def test_unexpected_exception_routes_to_error_view(server):
    """Any failure during indexing — not just ParserException — must
    produce the 200 + error view AND a terminal 'error' event, never a
    dropped connection with subscribers waiting forever."""
    orig = server.service.import_file

    def boom(payload, filename, event):
        raise RuntimeError("executor lost: simulated mid-build failure")

    server.service.import_file = boom
    try:
        out = _post_upload(
            server.port, "ok.csv", CSV.encode(),
            {"index": "boomidx", "uploadId": "uboom"},
        )
        assert "RuntimeError" in out["error"]
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
        conn.request("GET", "/api/progress?uploadId=uboom")
        evs = json.loads(conn.getresponse().read())["events"]
        conn.close()
        assert evs[-1]["action"] == "error"
    finally:
        server.service.import_file = orig


def test_progress_bus_eviction():
    """A long-running server must not retain per-upload history forever:
    the bus LRU-evicts subscriber-less uploads past the cap, keeps live
    subscriptions, and stays bounded."""
    from excelastic_spark.web import ProgressBus

    bus = ProgressBus(max_uploads=4)
    live_q = bus.subscribe("keepme")
    bus.publish("keepme", "verify", 0.0)
    for i in range(20):
        bus.publish(f"u{i}", "done", 100.0)
    assert len(bus._events) <= 5  # cap + the subscribed survivor
    assert "keepme" in bus._events  # live subscription never evicted
    assert bus.since("u0", 0) == []  # oldest history gone
    assert not live_q.empty()
    bus.unsubscribe("keepme", live_q)


# ---------------------------------------------------------------- websocket


class _BufSock:
    """Client-side socket with a pushback buffer: bytes read past the
    handshake (the welcome frame can arrive glued to the 101) are not
    lost."""

    def __init__(self, s: socket.socket, rest: bytes = b""):
        self._s = s
        self._buf = rest

    def recv(self, n: int) -> bytes:
        if self._buf:
            out, self._buf = self._buf[:n], self._buf[n:]
            return out
        return self._s.recv(n)

    def sendall(self, data: bytes) -> None:
        self._s.sendall(data)

    def close(self) -> None:
        self._s.close()


def _ws_connect(port: int) -> _BufSock:
    s = socket.create_connection(("127.0.0.1", port), timeout=60)
    key = "dGhlIHNhbXBsZSBub25jZQ=="
    s.sendall(
        (
            "GET /ws HTTP/1.1\r\nHost: localhost\r\nUpgrade: websocket\r\n"
            "Connection: Upgrade\r\nSec-WebSocket-Version: 13\r\n"
            f"Sec-WebSocket-Key: {key}\r\n\r\n"
        ).encode()
    )
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += s.recv(4096)
    head, rest = buf.split(b"\r\n\r\n", 1)
    head = head.decode()
    assert "101" in head.splitlines()[0]
    # RFC 6455 accept key for the fixed sample nonce
    assert "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=" in head
    return _BufSock(s, rest)


def _ws_send_text(s: socket.socket, payload: str) -> None:
    data = payload.encode()
    mask = b"\x01\x02\x03\x04"  # client frames must be masked
    masked = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
    assert len(data) < 126
    s.sendall(b"\x81" + bytes([0x80 | len(data)]) + mask + masked)


def test_websocket_progress_channel(server):
    # import first; the bus replays history to new subscribers, so the
    # whole event sequence is still observable post-hoc
    out = _post_upload(
        server.port, "ws.csv", CSV.encode(),
        {"index": "wsidx", "offset": "1", "uploadId": "ws1"},
    )
    assert out["imported"] == 3

    s = _ws_connect(server.port)
    op, data = ws_read_frame(s)
    assert op == 1
    welcome = json.loads(data)
    assert "websocket connected to excelastic-spark" in welcome["message"]

    _ws_send_text(s, json.dumps({"uploadId": "ws1"}))
    events = []
    while True:
        frame = ws_read_frame(s)
        assert frame is not None
        op, data = frame
        ev = json.loads(data)
        events.append(ev)
        if ev.get("action") == "done":
            break
    actions = [e["action"] for e in events]
    assert actions[0] == "verify"  # sendParsingEvent, Website.java:222-226
    assert "import" in actions and actions[-1] == "done"
    progress = [e["progress"] for e in events]
    assert progress == sorted(progress) and progress[-1] == 100.0
    assert events[-1]["imported"] == 3
    assert all(e["uploadId"] == "ws1" for e in events)
    # close handshake
    s.sendall(b"\x88\x80\x01\x02\x03\x04")
    s.close()


def test_websocket_ping_and_other_upload_filtered(server):
    _post_upload(
        server.port, "o1.csv", CSV.encode(),
        {"index": "f1idx", "offset": "1", "uploadId": "mine"},
    )
    _post_upload(
        server.port, "o2.csv", CSV.encode(),
        {"index": "f2idx", "offset": "1", "uploadId": "theirs"},
    )
    s = _ws_connect(server.port)
    ws_read_frame(s)  # welcome
    # ping -> pong
    s.sendall(b"\x89\x80\x01\x02\x03\x04")
    op, data = ws_read_frame(s)
    assert op == 10
    _ws_send_text(s, json.dumps({"uploadId": "mine"}))
    seen = []
    while True:
        op, data = ws_read_frame(s)
        ev = json.loads(data)
        seen.append(ev)
        if ev.get("action") == "done":
            break
    # only the subscribed upload's events arrive (Website.java:101-109)
    assert all(e["uploadId"] == "mine" for e in seen)
    s.close()


def test_long_poll_incremental(server):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.request("GET", "/api/progress?uploadId=ws1")
    evs = json.loads(conn.getresponse().read())["events"]
    assert [e["action"] for e in evs][-1] == "done"
    last = evs[-1]["seq"]
    conn.request("GET", f"/api/progress?uploadId=ws1&after={last}")
    assert json.loads(conn.getresponse().read())["events"] == []
    conn.close()


def test_basic_auth_gate(spark, tmp_path):
    """Configuration.java:63-69 getBasicAuth analog: with authentication on,
    the mutating upload route demands `Basic b64(basic)`; reads stay open
    (the reference only attaches the credential to storage-backend writes)."""
    import base64

    cfg = EngineConfig(
        warehouse=str(tmp_path / "wh"), authentication=True, basic="u:sekrit",
        default_index="authidx", n_buckets=4, shuffle_partitions=4,
    )
    srv = UploadServer(spark, cfg)
    srv.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        # reads are open
        conn.request("GET", "/api/status")
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read()
        # write without the credential -> 401 + challenge
        conn.request("POST", "/api/upload", b"", {"Content-Length": "0"})
        resp = conn.getresponse()
        assert resp.status == 401
        assert resp.getheader("WWW-Authenticate").startswith("Basic")
        resp.read()
        conn.close()
        # wrong credential -> 401
        bad = base64.b64encode(b"u:wrong").decode()
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request(
            "POST", "/api/upload", b"",
            {"Content-Length": "0", "Authorization": f"Basic {bad}"},
        )
        assert conn.getresponse().status == 401
        conn.close()
        # right credential -> passes the gate (200 no-file error view model)
        tok = base64.b64encode(b"u:sekrit").decode()
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request(
            "POST", "/api/upload", b"",
            {"Content-Length": "0", "Authorization": f"Basic {tok}"},
        )
        resp = conn.getresponse()
        assert resp.status == 200
        assert json.loads(resp.read())["error"] == "No file was uploaded."
        conn.close()
        # non-ASCII header (http.server decodes latin-1): must be a clean
        # 401, not a TypeError from hmac.compare_digest(str, str) dropping
        # the connection
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request(
            "POST", "/api/upload", b"",
            {"Content-Length": "0",
             "Authorization": "Basic caf\xe9".encode("latin-1")},
        )
        assert conn.getresponse().status == 401
        conn.close()
    finally:
        srv.shutdown()


def test_tls_serve(spark, tmp_path):
    """tls_cert/tls_key (the elastic_tls analog) serve HTTPS at the head."""
    import shutil
    import ssl
    import subprocess

    if not shutil.which("openssl"):
        pytest.skip("no openssl binary to mint a test cert")
    cert = str(tmp_path / "c.pem")
    key = str(tmp_path / "k.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", cert, "-days", "1", "-subj", "/CN=localhost"],
        check=True, capture_output=True,
    )
    cfg = EngineConfig(
        warehouse=str(tmp_path / "wh"), tls_cert=cert, tls_key=key,
        default_index="tlsidx",
    )
    srv = UploadServer(spark, cfg)
    srv.start_background()
    try:
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        conn = http.client.HTTPSConnection(
            "127.0.0.1", srv.port, timeout=30, context=ctx
        )
        conn.request("GET", "/api/status")
        st = json.loads(conn.getresponse().read())
        assert st["index"] == "tlsidx"
        conn.close()
        # plaintext client against the TLS port must NOT get HTTP back
        raw = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
        try:
            raw.request("GET", "/api/status")
            raw.getresponse()
        except (ConnectionError, http.client.HTTPException, OSError):
            pass
        else:
            raise AssertionError("plaintext request served on a TLS socket")
        finally:
            raw.close()
    finally:
        srv.shutdown()


def test_web_port_config_default():
    """Configuration.java:35 web_port default is 9999."""
    assert EngineConfig().web_port == 9999
    assert EngineConfig().authentication is False


def test_no_file_publishes_terminal_error_event(server):
    """EVERY failure path must emit a terminal error event, or subscribers
    on that uploadId wait forever (the fail() invariant)."""
    boundary = "b1"
    body = (
        f'--{boundary}\r\nContent-Disposition: form-data; name="uploadId"'
        f"\r\n\r\nnofile7\r\n--{boundary}--\r\n"
    ).encode()
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.request(
        "POST", "/api/upload", body,
        {"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    assert conn.getresponse().status == 200
    conn.close()
    evs = server.bus.since("nofile7", 0)
    assert evs and evs[-1]["action"] == "error"
    assert evs[-1]["message"] == "No file was uploaded."


def test_done_view_escapes_client_controlled_markup(server):
    """A crafted filename must not become stored XSS in the done view."""
    evil = '<script>alert(1)</script>.csv'
    boundary = "b2" + secrets.token_hex(8)
    parts = [
        f'--{boundary}\r\nContent-Disposition: form-data; name="index"'
        f"\r\n\r\nxssidx\r\n".encode(),
        f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
        f'filename="{evil}"\r\n'
        "Content-Type: application/octet-stream\r\n\r\n".encode()
        + CSV.encode() + b"\r\n",
    ]
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=300)
    conn.request(
        "POST", "/api/upload", body,
        {"Content-Type": f"multipart/form-data; boundary={boundary}",
         "Accept": "text/html"},
    )
    resp = conn.getresponse()
    assert resp.status == 200
    html = resp.read().decode()
    conn.close()
    assert "<script>" not in html
    assert "&lt;script&gt;" in html


# --------------------------------------------------------------------------
# backend connectivity poll (A17 analog; ElasticWriter.java:41,49,227-240)


def test_backend_monitor_status_route(server):
    """/api/status reports the LIVE probe: JVM version + manifest version
    (the reference's ES version poll, ElasticWriter.java:227-240)."""
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.request("GET", "/api/status")
    st = json.loads(conn.getresponse().read())
    conn.close()
    assert st["connected"] is True
    assert st["backend"]["version"].startswith("spark-")
    # earlier upload tests committed snapshots to the web warehouse's
    # default index, so the storage version is a positive snapshot count
    assert st["backend"]["manifestVersion"] is None or (
        st["backend"]["manifestVersion"] >= 0
    )
    assert st["backend"]["lastPoll"] > 0


def test_backend_monitor_flip_publishes_es_status(spark, tmp_path):
    """Connectivity flips broadcast on the bus exactly like the ES_STATUS
    event-bus topic (ElasticWriter.java:230-238): first successful probe
    publishes `connected`, a dead backend publishes `disconnected`, and
    steady state publishes nothing."""
    from excelastic_spark.web import BackendMonitor, ProgressBus

    cfg = EngineConfig(warehouse=str(tmp_path / "wh"))
    bus = ProgressBus()
    mon = BackendMonitor(spark, cfg, bus)

    st = mon.probe()  # initial disconnected -> connected flip
    assert st["connected"] is True and st["version"].startswith("spark-")
    assert st["manifestVersion"] is None  # no index built yet
    mon.probe()  # steady state: no new event
    evs = bus.since(BackendMonitor.STATUS_TOPIC, 0)
    assert [e["action"] for e in evs] == ["connected"]

    class _DeadSpark:
        @property
        def sparkContext(self):
            raise RuntimeError("jvm gone")

    mon.spark = _DeadSpark()
    st = mon.probe()
    assert st["connected"] is False and st["version"] == ""
    mon.spark = spark
    st = mon.probe()
    assert st["connected"] is True
    evs = bus.since(BackendMonitor.STATUS_TOPIC, 0)
    assert [e["action"] for e in evs] == [
        "connected", "disconnected", "connected"
    ]


def test_backend_monitor_reads_manifest_version(spark, tmp_path):
    """The storage half of the probe: snapshot count from the committed
    manifest, and an unreadable EXISTING manifest flips to disconnected."""
    from excelastic_spark.catalog import IndexStore
    from excelastic_spark.web import BackendMonitor, ProgressBus

    wh = str(tmp_path / "wh")
    cfg = EngineConfig(warehouse=wh)
    name = cfg.resolve_index_name(None)
    store = IndexStore(wh, name)
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    store.write_table(df, "t1")

    mon = BackendMonitor(spark, cfg, ProgressBus())
    st = mon.probe()
    assert st["connected"] is True and st["manifestVersion"] == 1
    store.write_table(df, "t2")
    assert mon.probe()["manifestVersion"] == 2

    with open(store.manifest_path, "w", encoding="utf-8") as f:
        f.write("{corrupt")  # existing-but-unreadable manifest
    assert mon.probe()["connected"] is False


def test_backend_monitor_periodic_thread(spark, tmp_path):
    """start() ticks synchronously then keeps polling on the daemon thread
    (vertx.setPeriodic(POLL, ...), ElasticWriter.java:41); stop() halts it."""
    import time as _time

    from excelastic_spark.web import BackendMonitor, ProgressBus

    cfg = EngineConfig(warehouse=str(tmp_path / "wh"))
    mon = BackendMonitor(spark, cfg, ProgressBus(), poll_sec=0.05)
    t = mon.start()
    first = mon.status()["lastPoll"]
    assert first > 0  # synchronous first tick
    deadline = _time.time() + 5
    while mon.status()["lastPoll"] == first and _time.time() < deadline:
        _time.sleep(0.02)
    assert mon.status()["lastPoll"] > first  # periodic tick happened
    mon.stop()
    t.join(timeout=5)
    assert not t.is_alive()
