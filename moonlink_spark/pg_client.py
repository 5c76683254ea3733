"""PostgreSQL replication-connection client (stdlib sockets only).

The last mile of the CDC source (reference:
src/moonlink_connectors/src/pg_replicate/replication_connection.rs and
clients/postgres.rs:740-845): a frontend that speaks the PUBLIC PostgreSQL
frontend/backend protocol v3 over a plain socket —

- StartupMessage with ``replication=database`` (walsender mode)
- authentication: trust, cleartext, MD5, and SCRAM-SHA-256 (RFC 5802/7677,
  implemented with hashlib/hmac)
- simple queries on the replication connection (``IDENTIFY_SYSTEM``,
  ``CREATE_REPLICATION_SLOT``)
- ``START_REPLICATION ... LOGICAL`` → CopyBoth: an iterator of CopyData
  payloads (exactly what :func:`moonlink_spark.pgoutput.iter_copy_data`
  consumes) plus standby-status-update frames flowing back

No PostgreSQL server exists in this sandbox, so the transport is built
against a socket-shaped duck (any object with ``sendall``/``recv``) and
verified byte-level over recorded handshake exchanges
(tests/test_pg_client.py, including the RFC 7677 SCRAM test vector).
``pg_replication.ReplicationSink`` consumes the stream unchanged.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import socket as _socket
import struct


class PgProtocolError(RuntimeError):
    pass


class PgServerError(RuntimeError):
    """ErrorResponse from the backend (fields keyed by the protocol's
    single-letter codes: S severity, C sqlstate, M message)."""

    def __init__(self, fields: dict):
        self.fields = fields
        super().__init__(fields.get("M", "server error"))


def _i32(n: int) -> bytes:
    return struct.pack(">i", n)


def _msg(kind: bytes, payload: bytes) -> bytes:
    return kind + _i32(len(payload) + 4) + payload


class _SockIO:
    """Buffered reader over a socket-shaped object."""

    def __init__(self, sock):
        self.sock = sock
        self._buf = b""

    def send(self, data: bytes) -> None:
        self.sock.sendall(data)

    def read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise PgProtocolError("connection closed by server")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_message(self) -> tuple[str, bytes]:
        head = self.read_exact(5)
        kind = chr(head[0])
        (length,) = struct.unpack(">i", head[1:])
        return kind, self.read_exact(length - 4)


def _scram_client(password: str, nonce: str):
    """SCRAM-SHA-256 state machine (RFC 5802/7677). Returns
    (client_first_bare, continue_fn) where continue_fn(server_first) →
    (client_final, verify_fn)."""
    gs2 = "n,,"
    client_first_bare = f"n=,r={nonce}"

    def cont(server_first: str):
        attrs = dict(p.split("=", 1) for p in server_first.split(","))
        full_nonce, salt_b64, iters = attrs["r"], attrs["s"], int(attrs["i"])
        if not full_nonce.startswith(nonce):
            raise PgProtocolError("server nonce does not extend client nonce")
        salted = hashlib.pbkdf2_hmac(
            "sha256", password.encode(), base64.b64decode(salt_b64), iters
        )
        client_key = hmac.new(salted, b"Client Key", "sha256").digest()
        stored_key = hashlib.sha256(client_key).digest()
        channel = base64.b64encode(gs2.encode()).decode()
        wo_proof = f"c={channel},r={full_nonce}"
        auth_msg = f"{client_first_bare},{server_first},{wo_proof}".encode()
        sig = hmac.new(stored_key, auth_msg, "sha256").digest()
        proof = bytes(a ^ b for a, b in zip(client_key, sig))
        final = f"{wo_proof},p={base64.b64encode(proof).decode()}"
        server_key = hmac.new(salted, b"Server Key", "sha256").digest()
        want_v = base64.b64encode(
            hmac.new(server_key, auth_msg, "sha256").digest()
        ).decode()

        def verify(server_final: str) -> None:
            got = dict(p.split("=", 1) for p in server_final.split(","))
            if got.get("v") != want_v:
                raise PgProtocolError("SCRAM server signature mismatch")

        return final, verify

    return gs2 + client_first_bare, cont


class PgReplicationClient:
    """A logical-replication frontend over one socket.

    ``sock`` injects a pre-connected socket-shaped object (tests replay
    recorded bytes through it); otherwise a TCP connection is opened.
    ``nonce`` pins the SCRAM client nonce for deterministic exchanges.
    """

    def __init__(
        self,
        user: str,
        database: str,
        password: str | None = None,
        host: str = "localhost",
        port: int = 5432,
        sock=None,
        nonce: str | None = None,
    ):
        self.user = user
        self.database = database
        self.password = password
        self.host = host
        self.port = port
        self._nonce = nonce
        self._sock = sock
        self.io: _SockIO | None = None
        self.parameters: dict[str, str] = {}
        self.backend_pid: int | None = None

    # ------------------------------------------------------------ startup

    def connect(self) -> "PgReplicationClient":
        if self._sock is None:
            self._sock = _socket.create_connection((self.host, self.port))
        self.io = _SockIO(self._sock)
        params = (
            b"user\0" + self.user.encode() + b"\0"
            b"database\0" + self.database.encode() + b"\0"
            b"replication\0database\0"
            b"application_name\0moonlink_spark\0\0"
        )
        body = _i32(196608) + params  # protocol 3.0
        self.io.send(_i32(len(body) + 4) + body)
        self._auth_loop()
        return self

    def _auth_loop(self) -> None:
        verify = None
        while True:
            kind, body = self.io.read_message()
            if kind == "E":
                raise PgServerError(_error_fields(body))
            if kind == "R":
                (sub,) = struct.unpack(">i", body[:4])
                if sub == 0:  # AuthenticationOk
                    continue
                if sub == 3:  # cleartext
                    self._need_password()
                    self.io.send(_msg(b"p", self.password.encode() + b"\0"))
                elif sub == 5:  # md5(md5(password+user)+salt)
                    self._need_password()
                    salt = body[4:8]
                    inner = hashlib.md5(
                        self.password.encode() + self.user.encode()
                    ).hexdigest()
                    outer = hashlib.md5(inner.encode() + salt).hexdigest()
                    self.io.send(_msg(b"p", b"md5" + outer.encode() + b"\0"))
                elif sub == 10:  # SASL: pick SCRAM-SHA-256
                    self._need_password()
                    mechs = body[4:].split(b"\0")
                    if b"SCRAM-SHA-256" not in mechs:
                        raise PgProtocolError(f"no supported SASL mechanism in {mechs}")
                    nonce = self._nonce or base64.b64encode(os.urandom(18)).decode()
                    first, self._scram_cont = _scram_client(self.password, nonce)
                    payload = (
                        b"SCRAM-SHA-256\0"
                        + _i32(len(first))
                        + first.encode()
                    )
                    self.io.send(_msg(b"p", payload))
                elif sub == 11:  # SASLContinue
                    final, verify = self._scram_cont(body[4:].decode())
                    self.io.send(_msg(b"p", final.encode()))
                elif sub == 12:  # SASLFinal
                    if verify is not None:
                        verify(body[4:].decode())
                else:
                    raise PgProtocolError(f"unsupported auth request {sub}")
            elif kind == "S":
                k, v = body.rstrip(b"\0").split(b"\0", 1)
                self.parameters[k.decode()] = v.decode()
            elif kind == "K":
                self.backend_pid = struct.unpack(">i", body[:4])[0]
            elif kind == "Z":  # ReadyForQuery
                return
            elif kind == "N":  # NoticeResponse — ignore
                continue
            else:
                raise PgProtocolError(f"unexpected message {kind!r} during startup")

    def _need_password(self) -> None:
        if self.password is None:
            raise PgProtocolError("server requested a password; none configured")

    # ------------------------------------------------------------ queries

    def simple_query(self, sql: str) -> list[tuple]:
        """Simple-protocol query → data rows (text format). Used for the
        walsender commands: IDENTIFY_SYSTEM, CREATE_REPLICATION_SLOT."""
        self.io.send(_msg(b"Q", sql.encode() + b"\0"))
        rows: list[tuple] = []
        while True:
            kind, body = self.io.read_message()
            if kind == "E":
                err = PgServerError(_error_fields(body))
                self._drain_to_ready()
                raise err
            if kind == "T":  # RowDescription — column metadata, unused
                continue
            if kind == "D":
                rows.append(_data_row(body))
            elif kind in ("C", "N", "S"):
                continue
            elif kind == "Z":
                return rows
            else:
                raise PgProtocolError(f"unexpected message {kind!r} in query")

    def _drain_to_ready(self) -> None:
        while True:
            kind, _ = self.io.read_message()
            if kind == "Z":
                return

    def identify_system(self) -> dict:
        rows = self.simple_query("IDENTIFY_SYSTEM")
        sysid, timeline, xlogpos, dbname = rows[0]
        return {
            "systemid": sysid,
            "timeline": int(timeline),
            "xlogpos": xlogpos,
            "dbname": dbname,
        }

    def create_replication_slot(
        self, slot: str, temporary: bool = False, output_plugin: str = "pgoutput"
    ) -> dict:
        tmp = " TEMPORARY" if temporary else ""
        rows = self.simple_query(
            f"CREATE_REPLICATION_SLOT {slot}{tmp} LOGICAL {output_plugin}"
        )
        name, lsn, snapshot, plugin = rows[0]
        return {
            "slot_name": name,
            "consistent_point": lsn,
            "snapshot_name": snapshot,
            "output_plugin": plugin,
        }

    # -------------------------------------------------------- replication

    def start_replication(
        self,
        slot: str,
        publications: list[str],
        start_lsn: str = "0/0",
        proto_version: int = 2,
        streaming: bool = True,
    ):
        """Enter CopyBoth and yield CopyData payloads — feed them straight
        to ``pgoutput.iter_copy_data``. The generator ends on CopyDone."""
        pubs = ", ".join(f'"{p}"' for p in publications)
        opts = f"proto_version '{proto_version}', publication_names '{pubs}'"
        if streaming:
            opts += ", streaming 'on'"
        self.io.send(
            _msg(
                b"Q",
                f"START_REPLICATION SLOT {slot} LOGICAL {start_lsn} ({opts})".encode()
                + b"\0",
            )
        )
        while True:
            kind, body = self.io.read_message()
            if kind == "W":  # CopyBothResponse
                break
            if kind == "E":
                raise PgServerError(_error_fields(body))
            if kind in ("N", "S"):
                continue
            raise PgProtocolError(f"expected CopyBothResponse, got {kind!r}")

        def frames():
            while True:
                k, b = self.io.read_message()
                if k == "d":
                    yield b
                elif k == "c":  # CopyDone — acknowledge and stop
                    self.io.send(_msg(b"c", b""))
                    return
                elif k == "E":
                    raise PgServerError(_error_fields(b))
                elif k in ("C", "Z", "N"):
                    continue
                else:
                    raise PgProtocolError(f"unexpected message {k!r} in CopyBoth")

        return frames()

    def send_standby_status(self, status_frame: bytes) -> None:
        """Wrap a standby-status-update payload (``ReplicationSink.
        standby_status`` builds it) in a CopyData message."""
        self.io.send(_msg(b"d", status_frame))

    def close(self) -> None:
        try:
            if self.io is not None:
                self.io.send(_msg(b"X", b""))
        finally:
            if self._sock is not None:
                try:
                    self._sock.close()
                except OSError:
                    pass


def _error_fields(body: bytes) -> dict:
    out = {}
    for part in body.split(b"\0"):
        if part:
            out[chr(part[0])] = part[1:].decode(errors="replace")
    return out


def _data_row(body: bytes) -> tuple:
    (n,) = struct.unpack(">h", body[:2])
    off = 2
    vals = []
    for _ in range(n):
        (ln,) = struct.unpack(">i", body[off : off + 4])
        off += 4
        if ln == -1:
            vals.append(None)
        else:
            vals.append(body[off : off + ln].decode())
            off += ln
    return tuple(vals)


def replicate_to_sink(client: PgReplicationClient, sink, slot: str,
                      publications: list[str], start_lsn: str = "0/0"):
    """Glue: drive a connected client's CopyBoth stream into a
    ``ReplicationSink`` — decode frames, apply transactions as MERGE
    commits, answer keepalive reply requests with standby status. Returns
    the MergeResults of committed transactions."""
    from moonlink_spark import pgoutput as pgo

    before = len(sink.results)
    frames = client.start_replication(slot, publications, start_lsn)
    for msg in pgo.iter_copy_data(frames):
        if isinstance(msg, pgo.PrimaryKeepalive):
            if msg.reply_requested:
                client.send_standby_status(sink.standby_status())
            continue
        sink.process(msg)
    client.send_standby_status(sink.standby_status())
    return sink.results[before:]
