"""Live-protocol tests for the HTTP transport (O-1/O-2, task.ts:245-279)
and the HTTP FeatureCollection sink (task.ts:238) — against a loopback
``http.server`` that speaks the reference's wire protocol. No internet.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from etl_active911_spark.sources.active911_source import (
    encode_error_payload,
    encode_wire_payload,
)

VALID_USER, VALID_PASS = "dispatcher", "hunter2"
AGENCIES = {7: [{"id": "101", "description": "Engine run"}], 9: []}
JWT = "jwt-abc123"
SESSION_COOKIE = "A911SESS=deadbeef"


class _InterfaceHandler(BaseHTTPRequestHandler):
    """Minimal interface.ajax.php: login (sets session cookie, returns JWT
    + agency entitlements) and get_archived_alerts_spreadsheet (requires
    the cookie AND the JWT, returns the JSONP wire payload)."""

    server_version = "A911Fixture/1.0"

    def log_message(self, *args):  # quiet
        pass

    def _body(self) -> str:
        return self.rfile.read(int(self.headers.get("Content-Length", 0))).decode()

    def _reply(self, text: str, status: int = 200):
        data = text.encode()
        self.send_response(status)
        self.send_header("Content-Type", "text/javascript")
        self.send_header("Content-Length", str(len(data)))
        if getattr(self, "_set_cookie", None):
            self.send_header("Set-Cookie", self._set_cookie)
        self.end_headers()
        self.wfile.write(data)

    def do_POST(self):  # noqa: N802 — stdlib naming
        body = self._body()
        self._set_cookie = None
        post_data = json.loads(
            re.search(r'name="post_data"\r\n\r\n(.*?)\r\n', body, re.S).group(1)
        )
        if 'name="operation"\r\n\r\nlogin' in body:
            self.server.login_bodies.append(post_data)
            if (
                post_data.get("username") != VALID_USER
                or post_data.get("password") != VALID_PASS
            ):
                self._reply(json.dumps({"result": "error", "message": "bad creds"}))
                return
            self._set_cookie = SESSION_COOKIE
            self._reply(
                "("
                + json.dumps(
                    {
                        "result": "success",
                        "message": {
                            "jwt": JWT,
                            "agencies": [{"id": a} for a in sorted(AGENCIES)],
                        },
                    }
                )
                + ")"
            )
            return
        # archived-alerts fetch: cookie + jwt both required (cookie jar +
        # auth token, task.ts:129-148)
        auth = re.search(r'name="auth"\r\n\r\n(.*?)\r\n', body, re.S).group(1)
        if SESSION_COOKIE.split("=")[0] not in (self.headers.get("Cookie") or ""):
            self._reply(encode_error_payload("no session cookie"))
            return
        if auth != JWT:
            self._reply(encode_error_payload("bad token"))
            return
        agency = int(post_data["agency_id"])
        self.server.fetch_windows.append((agency, post_data["from_date"], post_data["to_date"]))
        rows = [
            {"id": r["id"], "description": r["description"]}
            for r in AGENCIES.get(agency, [])
        ]
        self._reply(encode_wire_payload(rows))


class _SubmitHandler(BaseHTTPRequestHandler):
    def log_message(self, *args):
        pass

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        self.server.raw_posts.append(body)
        self.server.posts.append(json.loads(body))
        self.send_response(200)
        self.send_header("Content-Length", "2")
        self.end_headers()
        self.wfile.write(b"ok")


@pytest.fixture()
def interface_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _InterfaceHandler)
    srv.login_bodies, srv.fetch_windows = [], []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


@pytest.fixture()
def submit_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _SubmitHandler)
    srv.posts, srv.raw_posts = [], []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}/api/etl"
    srv.shutdown()


def test_transport_login_and_fetch(interface_server):
    srv, url = interface_server
    from etl_active911_spark.sources.http_transport import HttpTransport

    tr = HttpTransport(VALID_USER, VALID_PASS, url, clock=lambda: 1755000000.0)
    token, agencies = tr.login()
    assert token == JWT
    assert agencies == sorted(AGENCIES)
    text = tr.fetch(7, 0, 10_000)
    from etl_active911_spark.sources.active911_source import (
        decode_alert_csv,
        unwrap_jsonp,
    )

    payload = unwrap_jsonp(text)
    assert payload["result"] == "success"
    rows = decode_alert_csv(payload["message"])
    assert [r["id"] for r in rows] == ["101"]
    # the time window was pushed into the fetch body (O-2, task.ts:134-135)
    assert srv.fetch_windows == [(7, 0, 10_000)]
    # login body carried the reference's form fields
    assert srv.login_bodies[0]["permanent"] == 0


def test_transport_rejects_bad_credentials(interface_server):
    _, url = interface_server
    from etl_active911_spark.sources.http_transport import HttpTransport

    tr = HttpTransport(VALID_USER, "wrong", url)
    with pytest.raises(ValueError, match="login failed"):
        tr.login()  # error payload has no jwt message


def test_source_end_to_end_over_http(spark, interface_server):
    srv, url = interface_server
    from etl_active911_spark.sources import active911_source

    active911_source.register(spark)
    df = (
        spark.read.format("active911")
        .option("transport", "http")
        .option("base_url", url)
        .option("username", VALID_USER)
        .option("password", VALID_PASS)
        .option("from_date", "1000")
        .option("to_date", "2000")
        .load()
    )
    rows = df.filter(F.col("_error").isNull()).select("id", "agency_id").collect()
    assert {(r["id"], r["agency_id"]) for r in rows} == {("101", "7")}
    # one partition per agency; each fetch carried the pushed window
    assert sorted(set(srv.fetch_windows)) == [(7, 1000, 2000), (9, 1000, 2000)]


def test_source_http_allowlist_validation(spark, interface_server):
    _, url = interface_server
    from etl_active911_spark.sources import active911_source

    active911_source.register(spark)
    df = (
        spark.read.format("active911")
        .option("transport", "http")
        .option("base_url", url)
        .option("username", VALID_USER)
        .option("password", VALID_PASS)
        .option("agencies", "7,42")
        .load()
    )
    with pytest.raises(Exception, match="does not provide access to agency: 42"):
        df.collect()


def test_http_sink_posts_feature_collections(spark, submit_server):
    srv, url = submit_server
    from etl_active911_spark.pipeline.active911 import to_features
    from etl_active911_spark.streaming.http_sink import submit_features
    from tests.test_active911 import make_alert

    features = to_features(make_alert(spark))
    submit_features(features, url, max_features_per_post=10)
    assert len(srv.posts) == 1
    fc = srv.posts[0]
    assert fc["type"] == "FeatureCollection"
    [feat] = fc["features"]
    assert feat["id"] == "active911-1"
    assert feat["type"] == "Feature"
    assert feat["properties"]["callsign"] == "Structure Fire"
    assert feat["properties"]["start"] == "2025-12-09T01:27:47.000Z"
    assert feat["geometry"] == {"type": "Point", "coordinates": [-104.9, 39.7]}


def test_http_sink_chunks_partitions(spark, submit_server):
    srv, url = submit_server
    from etl_active911_spark.streaming.http_sink import http_sink_foreach_batch

    df = spark.range(25).select(
        F.col("id").cast("string").alias("id"), F.lit("Feature").alias("type")
    ).coalesce(1)
    http_sink_foreach_batch(url, max_features_per_post=10)(df, 0)
    sizes = sorted(len(p["features"]) for p in srv.posts)
    assert sizes == [5, 10, 10]


def test_control_stream_end_to_end(spark, submit_server, tmp_path):
    """The full reference lifecycle as one streaming job: fixture-transport
    source (overlapping pulls re-emit alerts) → error routing → features →
    per-batch deduped FeatureCollection POSTs to the loopback sink."""
    from etl_active911_spark.streaming.jobs import run_control_stream
    from tests.test_source import ALERT

    d = tmp_path / "wire"
    d.mkdir()
    (d / "agency_1.jsonp").write_text(encode_wire_payload([ALERT]))
    (d / "agency_2.jsonp").write_text(
        encode_wire_payload([{**ALERT, "id": "43"}, {**ALERT, "id": "44"}])
    )
    (d / "agency_3.jsonp").write_text(encode_error_payload("upstream failure"))

    srv, url = submit_server
    run_control_stream(
        spark,
        url,
        checkpoint_dir=str(tmp_path / "ckpt"),
        source_options={"fixture_dir": str(d), "max_pulls": "2"},
    )
    all_ids = {f["id"] for p in srv.posts for f in p["features"]}
    assert all_ids == {"active911-42", "active911-43", "active911-44"}
    # overlapping pulls re-emit alerts; dedup by stable feature id must
    # collapse them within each POSTed batch (task.ts:238 sink semantics)
    for p in srv.posts:
        ids = [f["id"] for f in p["features"]]
        assert len(ids) == len(set(ids)), "features must be deduped per batch"
    # the dead-letter agency is routed, never POSTed
    assert all(not f["id"].endswith("-None") for p in srv.posts for f in p["features"])


def test_control_stream_payloads_tz_invariant(spark, submit_server, tmp_path):
    """VERDICT r05 item 7: the FULL source → transform → HTTP-sink loop
    (Trigger.AvailableNow foreachBatch POSTs) must emit BYTE-IDENTICAL
    feature payloads whatever the session timezone — the reference's
    FeatureCollection carries moment-style UTC ISO strings (task.ts:
    214-231), so a hostile session TZ leaking into the serialized start
    timestamp would corrupt every downstream consumer. Runs the loopback
    e2e under UTC and again under Asia/Tokyo and compares the POSTed
    feature bytes (sorted per-feature: POST chunking order is partition
    order, which is not part of the contract)."""
    from etl_active911_spark.streaming.jobs import run_control_stream
    from tests.test_source import ALERT

    d = tmp_path / "wire_tz"
    d.mkdir()
    (d / "agency_1.jsonp").write_text(
        encode_wire_payload([ALERT, {**ALERT, "id": "52"}])
    )

    srv, url = submit_server

    def one_run(tag: str) -> list[bytes]:
        srv.posts.clear()
        srv.raw_posts.clear()
        run_control_stream(
            spark,
            url,
            checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
            source_options={"fixture_dir": str(d), "max_pulls": "1"},
        )
        feats = sorted(
            json.dumps(f, sort_keys=True).encode() for p in srv.posts for f in p["features"]
        )
        assert feats, "e2e run must POST features"
        return feats

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        base = one_run("utc")
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        tokyo = one_run("tokyo")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    assert base == tokyo
    # and the serialized timestamps are the reference's UTC ISO form
    starts = [json.loads(f)["properties"]["start"] for f in base]
    assert starts and all(s.endswith("Z") for s in starts)
    # ABSOLUTE golden (r7): relative UTC-vs-Tokyo equality cannot catch a
    # serialization change that shifts BOTH runs the same way, so pin the
    # exact POSTed bytes for feature 42 — byte-exact remarks template
    # (task.ts:221-226), link extraction, coordinate order, and the
    # moment-toISOString UTC instant (12/08 18:27:47 MST → 12/09 01:27 Z)
    f42 = next(f for f in base if b"active911-42" in f)
    assert f42 == (
        b'{"geometry": {"coordinates": [-104.9, 39.7], "type": "Point"}, '
        b'"id": "active911-42", "properties": {"callsign": "Structure Fire", '
        b'"links": [{"callsign": "Nick", "production_time": '
        b'"2025-12-09T01:28:20.000Z", "relation": "t-s", "remarks": "Respond"}], '
        b'"remarks": "\\n                                Groups: E1'
        b'\\n                                Author: CAD'
        b'\\n                                det'
        b'\\n                            ", '
        b'"start": "2025-12-09T01:27:47.000Z"}, "type": "Feature"}'
    )
