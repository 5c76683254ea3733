"""PgReplicationClient: byte-level tests over recorded handshake exchanges.

No PostgreSQL server exists in this sandbox, so each test scripts the
exact bytes a real backend would send (built here from the PUBLIC
frontend/backend protocol v3 documentation, independently of the client's
own encoders) and asserts the exact bytes the client sends back —
StartupMessage, MD5 and SCRAM-SHA-256 authentication (proof recomputed in
the test with hashlib directly), walsender queries, and the CopyBoth
replication stream feeding ReplicationSink unchanged.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import struct

import pytest

from moonlink_spark import pgoutput as pgo
from moonlink_spark.pg_client import (
    PgProtocolError,
    PgReplicationClient,
    PgServerError,
    replicate_to_sink,
)

# ----------------------------------------------------------- scripted socket


class ScriptedSocket:
    """Replays a recorded exchange: ("S", bytes) are served to recv();
    ("C", bytes) must arrive via sendall() byte-for-byte before the
    following server bytes unlock."""

    def __init__(self, script):
        self.script = list(script)
        self.client_buf = b""
        self.out = b""
        self._advance()

    def _advance(self):
        while self.script and self.script[0][0] == "S":
            self.out += self.script.pop(0)[1]

    def sendall(self, data):
        self.client_buf += data
        while self.script and self.script[0][0] == "C":
            want = self.script[0][1]
            if self.client_buf.startswith(want):
                self.client_buf = self.client_buf[len(want):]
                self.script.pop(0)
                self._advance()
            elif want.startswith(self.client_buf):
                return  # need more client bytes
            else:
                raise AssertionError(
                    f"client sent {self.client_buf[:120]!r}\n"
                    f"expected    {want[:120]!r}"
                )

    def recv(self, n):
        out, self.out = self.out[:n], self.out[n:]
        return out

    def close(self):
        pass

    def done(self):
        assert not self.script, f"unconsumed script steps: {self.script[:2]}"


# ------------------------------------------------- backend message builders
# (independent of the client: written from the protocol docs)


def be(kind: bytes, payload: bytes) -> bytes:
    return kind + struct.pack(">i", len(payload) + 4) + payload


def fe_startup(user: str, database: str) -> bytes:
    body = (
        struct.pack(">i", 196608)
        + b"user\0" + user.encode() + b"\0"
        + b"database\0" + database.encode() + b"\0"
        + b"replication\0database\0"
        + b"application_name\0moonlink_spark\0\0"
    )
    return struct.pack(">i", len(body) + 4) + body


def fe(kind: bytes, payload: bytes) -> bytes:
    return kind + struct.pack(">i", len(payload) + 4) + payload


AUTH_OK = be(b"R", struct.pack(">i", 0))
READY = be(b"Z", b"I")


def _connect(script):
    sock = ScriptedSocket(script)
    c = PgReplicationClient(
        "alice", "db", password="s3cret", sock=sock, nonce="clientNONCE"
    ).connect()
    return c, sock


def test_startup_trust_and_parameters():
    script = [
        ("C", fe_startup("alice", "db")),
        ("S", AUTH_OK),
        ("S", be(b"S", b"server_version\x0016.3\x00")),
        ("S", be(b"K", struct.pack(">ii", 4242, 99))),
        ("S", READY),
    ]
    c, sock = _connect(script)
    assert c.parameters["server_version"] == "16.3"
    assert c.backend_pid == 4242
    sock.done()


def test_md5_authentication_bytes():
    salt = b"\x01\x02\x03\x04"
    inner = hashlib.md5(b"s3cret" + b"alice").hexdigest()
    digest = hashlib.md5(inner.encode() + salt).hexdigest()
    script = [
        ("C", fe_startup("alice", "db")),
        ("S", be(b"R", struct.pack(">i", 5) + salt)),
        ("C", fe(b"p", b"md5" + digest.encode() + b"\0")),
        ("S", AUTH_OK),
        ("S", READY),
    ]
    _, sock = _connect(script)
    sock.done()


def _scram_exchange(user="alice", password="s3cret", nonce="clientNONCE"):
    """Recompute the full SCRAM-SHA-256 exchange with hashlib directly
    (PostgreSQL sends an empty SCRAM username: n=,r=...)."""
    server_ext = "serverEXT"
    salt = b"0123456789abcdef"
    iters = 4096
    full = nonce + server_ext
    server_first = f"r={full},s={base64.b64encode(salt).decode()},i={iters}"
    cfb = f"n=,r={nonce}"
    wo_proof = f"c=biws,r={full}"
    auth_msg = f"{cfb},{server_first},{wo_proof}".encode()
    salted = hashlib.pbkdf2_hmac("sha256", password.encode(), salt, iters)
    ckey = hmac.new(salted, b"Client Key", "sha256").digest()
    skey = hashlib.sha256(ckey).digest()
    proof = bytes(
        a ^ b for a, b in zip(ckey, hmac.new(skey, auth_msg, "sha256").digest())
    )
    client_final = f"{wo_proof},p={base64.b64encode(proof).decode()}"
    server_key = hmac.new(salted, b"Server Key", "sha256").digest()
    server_final = "v=" + base64.b64encode(
        hmac.new(server_key, auth_msg, "sha256").digest()
    ).decode()
    return server_first, client_final, server_final


def test_scram_sha256_full_exchange_bytes():
    server_first, client_final, server_final = _scram_exchange()
    first_msg = b"n,,n=,r=clientNONCE"
    script = [
        ("C", fe_startup("alice", "db")),
        ("S", be(b"R", struct.pack(">i", 10) + b"SCRAM-SHA-256\0\0")),
        ("C", fe(b"p", b"SCRAM-SHA-256\0"
                 + struct.pack(">i", len(first_msg)) + first_msg)),
        ("S", be(b"R", struct.pack(">i", 11) + server_first.encode())),
        ("C", fe(b"p", client_final.encode())),
        ("S", be(b"R", struct.pack(">i", 12) + server_final.encode())),
        ("S", AUTH_OK),
        ("S", READY),
    ]
    _, sock = _connect(script)
    sock.done()


def test_scram_rejects_bad_server_signature():
    server_first, client_final, _ = _scram_exchange()
    bad_final = "v=" + base64.b64encode(b"x" * 32).decode()
    script = [
        ("C", fe_startup("alice", "db")),
        ("S", be(b"R", struct.pack(">i", 10) + b"SCRAM-SHA-256\0\0")),
        ("C", fe(b"p", b"SCRAM-SHA-256\0"
                 + struct.pack(">i", 19) + b"n,,n=,r=clientNONCE")),
        ("S", be(b"R", struct.pack(">i", 11) + server_first.encode())),
        ("C", fe(b"p", client_final.encode())),
        ("S", be(b"R", struct.pack(">i", 12) + bad_final.encode())),
    ]
    with pytest.raises(PgProtocolError, match="signature mismatch"):
        _connect(script)


def test_auth_error_surfaces_server_fields():
    script = [
        ("C", fe_startup("alice", "db")),
        ("S", be(b"E", b"SFATAL\0C28P01\0Mpassword authentication failed\0\0")),
    ]
    with pytest.raises(PgServerError, match="password authentication failed"):
        _connect(script)


def _row(*vals):
    out = struct.pack(">h", len(vals))
    for v in vals:
        b = v.encode()
        out += struct.pack(">i", len(b)) + b
    return out


def test_identify_system_and_create_slot():
    ident = _row("7357", "1", "0/16B3748", "db")
    slot = _row("moon_slot", "0/16B3748", "snap-001", "pgoutput")
    script = [
        ("C", fe_startup("alice", "db")),
        ("S", AUTH_OK), ("S", READY),
        ("C", fe(b"Q", b"IDENTIFY_SYSTEM\0")),
        ("S", be(b"T", struct.pack(">h", 0))),
        ("S", be(b"D", ident)),
        ("S", be(b"C", b"IDENTIFY_SYSTEM\0")),
        ("S", READY),
        ("C", fe(b"Q", b"CREATE_REPLICATION_SLOT moon_slot LOGICAL pgoutput\0")),
        ("S", be(b"T", struct.pack(">h", 0))),
        ("S", be(b"D", slot)),
        ("S", be(b"C", b"CREATE_REPLICATION_SLOT\0")),
        ("S", READY),
    ]
    c, sock = _connect(script)
    info = c.identify_system()
    assert info["xlogpos"] == "0/16B3748" and info["timeline"] == 1
    out = c.create_replication_slot("moon_slot")
    assert out["consistent_point"] == "0/16B3748"
    assert out["snapshot_name"] == "snap-001"
    sock.done()


IMG_REL = pgo.Relation(
    relation_id=77,
    namespace="public",
    relation_name="images",
    replica_identity="d",
    columns=[
        pgo.RelationColumn(1, "image_id", pgo.TEXT, -1),
        pgo.RelationColumn(0, "bytes", pgo.BYTEA, -1),
        pgo.RelationColumn(0, "w", pgo.INT4, -1),
        pgo.RelationColumn(0, "h", pgo.INT4, -1),
        pgo.RelationColumn(0, "fmt", pgo.VARCHAR, -1),
        pgo.RelationColumn(0, "caption", pgo.TEXT, -1),
        pgo.RelationColumn(0, "phash", pgo.INT8, -1),
    ],
)


def _img_row(i, caption="cap"):
    return {
        "image_id": f"img{i:012d}", "bytes": b"\x00\x01", "w": 4, "h": 3,
        "fmt": "png", "caption": caption, "phash": i * 7,
    }


def test_copyboth_stream_drives_sink(spark, tmp_path):
    """End-to-end transport: START_REPLICATION → CopyBoth; scripted wire
    frames (one committed transaction + a reply-requested keepalive) flow
    through the client into ReplicationSink UNCHANGED; the keepalive is
    answered with a standby-status CopyData and the table lands the MERGE."""
    from moonlink_spark.pg_replication import ReplicationSink
    from moonlink_spark.schema import IMAGES_SCHEMA
    from moonlink_spark.table.catalog import create_table
    from moonlink_spark.table.scan import scan

    enc = pgo.PgOutputEncoder()
    wire = [
        enc.xlogdata(enc.relation(IMG_REL)),
        enc.xlogdata(enc.begin(100, 9)),
        enc.xlogdata(enc.insert(IMG_REL, _img_row(1))),
        enc.xlogdata(enc.insert(IMG_REL, _img_row(2))),
        enc.xlogdata(enc.commit(100, 101)),
        enc.keepalive(wal_end=101, reply=True),
    ]
    start_cmd = (
        b"START_REPLICATION SLOT moon_slot LOGICAL 0/0 (proto_version '2', "
        b"publication_names '\"pub\"', streaming 'on')\0"
    )
    status = b"r" + struct.pack(">QQQq", 101, 101, 101, 0) + b"\x00"
    script = [
        ("C", fe_startup("alice", "db")),
        ("S", AUTH_OK), ("S", READY),
        ("C", fe(b"Q", start_cmd)),
        ("S", be(b"W", b"\x00\x00\x00")),
        *[("S", be(b"d", f_)) for f_ in wire],
        ("C", fe(b"d", status)),  # keepalive reply (applied lsn = 101)
        ("S", be(b"c", b"")),     # CopyDone ends the stream
        ("C", fe(b"c", b"")),
        ("C", fe(b"d", status)),  # final status on stream end
    ]
    sock = ScriptedSocket(script)
    c = PgReplicationClient("alice", "db", password="x", sock=sock).connect()
    t = create_table(str(tmp_path / "imgs"), IMAGES_SCHEMA)
    sink = ReplicationSink(spark, {"public.images": t})
    results = replicate_to_sink(c, sink, "moon_slot", ["pub"])
    assert len(results) == 1 and not results[0].skipped
    got = {r["image_id"] for r in scan(spark, t.refresh()).collect()}
    assert got == {"img000000000001", "img000000000002"}
    sock.done()
