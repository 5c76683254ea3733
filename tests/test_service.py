"""HTTP REST ingest service: the transport layer over RowEventIngestor.

Drives the reference's REST surface (rest_api.rs:196-204) over a live
ThreadingHTTPServer: create -> async ingest -> sync flush (LSN ack) ->
delete -> optimize -> upload, plus error paths (unknown route, bad JSON,
unknown column, missing table).
"""

import base64
import json
import threading
import urllib.error
import urllib.request

import pytest

from moonlink_spark.service import make_server
from moonlink_spark.table.scan import scan


@pytest.fixture()
def server(spark, tmp_path):
    srv = make_server(spark, str(tmp_path / "svc"))
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _req(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    r = urllib.request.Request(url, data=data, method=method)
    if data:
        r.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(r, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _row(i, caption="hello", payload=b"\x00\x01"):
    return {
        "image_id": f"svc{i:06d}",
        "bytes": base64.b64encode(payload).decode(),
        "w": 8,
        "h": 8,
        "fmt": "png",
        "caption": caption,
        "phash": i,
    }


def test_rest_lifecycle(spark, server):
    srv, base = server
    st, h = _req(f"{base}/health")
    assert st == 200 and h["status"] == "healthy"

    st, c = _req(f"{base}/tables/imgs", "POST", {"properties": {"write.buckets": "4"}})
    assert st == 200, c

    # async events buffer without committing
    for i in range(6):
        st, r = _req(f"{base}/ingest/imgs", "POST",
                     {"operation": "insert", "data": _row(i)})
        assert st == 200 and r["lsn"] is None, r
    # sync upsert + delete flush everything as ONE merge snapshot
    st, r = _req(f"{base}/ingest/imgs", "POST",
                 {"operation": "upsert", "data": _row(2, caption="hello v2")})
    assert st == 200
    st, r = _req(f"{base}/ingest/imgs", "POST",
                 {"operation": "delete", "data": {"image_id": "svc000005"},
                  "request_mode": "sync"})
    assert st == 200 and isinstance(r["lsn"], int), r

    state = srv.RequestHandlerClass.state
    t = state._get("imgs")[0]
    got = {
        r["image_id"]: r["caption"]
        for r in scan(spark, t).select("image_id", "caption").collect()
    }
    assert len(got) == 5
    assert got["svc000002"] == "hello v2"
    assert "svc000005" not in got

    # second batch then optimize through the API
    st, r = _req(f"{base}/ingest/imgs", "POST",
                 {"operation": "insert", "data": _row(9), "request_mode": "sync"})
    assert st == 200
    st, r = _req(f"{base}/tables/imgs/optimize", "POST", {"mode": "full"})
    assert st == 200, r
    assert scan(spark, t).count() == 6

    st, lst = _req(f"{base}/tables")
    assert st == 200 and [x["table"] for x in lst["tables"]] == ["imgs"]

    st, r = _req(f"{base}/tables/imgs", "DELETE")
    assert st == 200 and r["dropped"]
    st, lst = _req(f"{base}/tables")
    assert lst["tables"] == []


def test_rest_upload_bulk_files(spark, server, tmp_path):
    srv, base = server
    _req(f"{base}/tables/bulk", "POST", {})
    from moonlink_spark.datagen import generate_images

    ext = str(tmp_path / "foreign")
    generate_images(spark, 50, partitions=2).write.parquet(ext)
    import glob

    files = sorted(glob.glob(f"{ext}/*.parquet"))
    st, r = _req(f"{base}/upload/bulk", "POST",
                 {"operation": "insert", "files": files})
    assert st == 200 and r["files"] == len(files), r
    t = srv.RequestHandlerClass.state._get("bulk")[0]
    assert scan(spark, t).count() == 50


def test_rest_errors(server):
    _, base = server
    st, r = _req(f"{base}/nope")
    assert st == 404
    st, r = _req(f"{base}/ingest/ghost", "POST",
                 {"operation": "insert", "data": _row(1)})
    assert st == 404 and "no such table" in r["error"]
    _req(f"{base}/tables/t1", "POST", {})
    st, r = _req(f"{base}/ingest/t1", "POST",
                 {"operation": "insert", "data": {"image_id": "a", "nope": 1}})
    assert st == 400 and "unknown columns" in r["error"]
    st, r = _req(f"{base}/ingest/t1", "POST",
                 {"operation": "mutate", "data": {}})
    assert st == 400
    st, r = _req(f"{base}/tables/t1", "POST", {})  # duplicate create
    assert st == 409
    st, r = _req(f"{base}/tables/t1", "POST",
                 {"schema": "a string, b int"})  # fresh name, no merge key
    assert st in (400, 409)
