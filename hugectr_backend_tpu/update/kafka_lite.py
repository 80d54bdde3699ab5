"""Wire-protocol-lite Kafka transport for the online-update stream.

Implements the reference's ``kafka_message_queue`` update source (reference
README.md:213-218, docs/hierarchical_parameter_server.md:575-646;
UpdateSourceParams parsing backend.cpp:263-308) WITHOUT any Kafka client
dependency: a minimal implementation of the Kafka binary protocol over TCP,
using the v0 wire versions of four APIs —

    Produce(0) / Fetch(1) / ListOffsets(2) / Metadata(3)

with MessageSet v0 framing (offset i64 | size i32 | crc32 i32 | magic=0 |
attrs=0 | key | value). v0 is the most widely accepted subset: every Apache
Kafka broker from 0.8 through 3.x speaks it (Kafka 4.0 dropped the v0/v1
message format — deployments there can bridge via the file queue).

Mapping (mirrors the reference's one-topic-per-embedding-table layout,
README.md:215):

    table tag  "hps_et.<model>.<table>"  ->  topic "hps_et.<model>.<table>"
    message key   = tag (utf-8)
    message value = [dim i32][n i32][keys n x i64][vectors n x dim x f32]
    (little-endian payload inside the big-endian Kafka framing)

Consumer offsets are kept locally (optionally persisted via
``offsets_path``) rather than through the Kafka group-coordinator APIs;
re-consumption after a restart is safe because updates are idempotent
upserts into the DRAM/SSD tiers (at-least-once semantics, like the
reference's cache-refresh pipeline).

``MiniKafkaBroker`` (update/mini_broker.py) is an in-process broker speaking
the same subset, used by the integration tests and usable as a dev
single-node queue.
"""

from __future__ import annotations

import json
import os
import socket
import struct
import threading
import zlib
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from hugectr_backend_tpu.update.source import MessageProducer, MessageSource
from hugectr_backend_tpu.utils.logging import get_logger

log = get_logger("hps_tpu.kafka")

_API_PRODUCE = 0
_API_FETCH = 1
_API_LIST_OFFSETS = 2
_API_METADATA = 3


# ---------------------------------------------------------------- encoding

def _enc_str(s: Optional[str]) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _enc_bytes(b: Optional[bytes]) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) < n:
            raise EOFError("short kafka payload")
        self.pos += n
        return b

    def i8(self) -> int:
        return struct.unpack(">b", self.take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self.take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def string(self) -> Optional[str]:
        n = self.i16()
        return None if n < 0 else self.take(n).decode()

    def bytes_(self) -> Optional[bytes]:
        n = self.i32()
        return None if n < 0 else self.take(n)

    def remaining(self) -> int:
        return len(self.buf) - self.pos


def encode_message_set(entries: "list[tuple[bytes | None, bytes]]") -> bytes:
    """MessageSet v0 with placeholder offsets (broker assigns on produce)."""
    out = b""
    for key, value in entries:
        body = struct.pack(">bb", 0, 0) + _enc_bytes(key) + _enc_bytes(value)
        msg = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body
        out += struct.pack(">q", -1) + struct.pack(">i", len(msg)) + msg
    return out


def decode_message_set(raw: bytes):
    """-> [(offset, key|None, value)] — tolerates a truncated trailing
    message (Fetch v0 may cut the last one)."""
    out = []
    r = _Reader(raw)
    while r.remaining() >= 12:
        offset = r.i64()
        size = r.i32()
        if r.remaining() < size:
            break
        m = _Reader(r.take(size))
        m.i32()  # crc (trusted: TCP already checksums)
        magic = m.i8()
        m.i8()  # attributes
        if magic >= 1:
            m.i64()  # v1 timestamp
        key = m.bytes_()
        value = m.bytes_()
        out.append((offset, key, value or b""))
    return out


# ---------------------------------------------------------------- client

class KafkaClient:
    """One-broker v0 client (metadata-discovered leaders reuse the same
    socket when they are the bootstrap broker — the mini broker and any
    single-node deployment; multi-node clusters get per-leader sockets)."""

    def __init__(self, bootstrap: str, client_id: str = "hps-tpu",
                 recv_buffer: int = 1 << 20, timeout_s: float = 10.0):
        host, _, port = bootstrap.rpartition(":")
        self.bootstrap = (host or "127.0.0.1", int(port))
        self.client_id = client_id
        self.recv_buffer = recv_buffer
        self.timeout_s = timeout_s
        self._corr = 0
        self._socks: dict[tuple, socket.socket] = {}
        self._lock = threading.Lock()

    def _sock(self, addr) -> socket.socket:
        s = self._socks.get(addr)
        if s is None:
            s = socket.create_connection(addr, timeout=self.timeout_s)
            try:
                s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF,
                             self.recv_buffer)
            except OSError:
                pass
            self._socks[addr] = s
        return s

    def close(self):
        with self._lock:
            for s in self._socks.values():
                try:
                    s.close()
                except OSError:
                    pass
            self._socks.clear()

    def _roundtrip(self, api: int, version: int, body: bytes,
                   addr=None) -> _Reader:
        with self._lock:
            addr = addr or self.bootstrap
            self._corr += 1
            corr = self._corr
            header = struct.pack(">hhi", api, version, corr) + _enc_str(
                self.client_id
            )
            payload = header + body
            sock = self._sock(addr)
            try:
                sock.sendall(struct.pack(">i", len(payload)) + payload)
                raw = self._recv_frame(sock)
            except OSError:
                # One reconnect attempt (broker restarted / idle close).
                self._socks.pop(addr, None)
                sock = self._sock(addr)
                sock.sendall(struct.pack(">i", len(payload)) + payload)
                raw = self._recv_frame(sock)
        r = _Reader(raw)
        got = r.i32()
        if got != corr:
            raise IOError(f"kafka correlation mismatch: {got} != {corr}")
        return r

    def _recv_frame(self, sock: socket.socket) -> bytes:
        hdr = b""
        while len(hdr) < 4:
            chunk = sock.recv(4 - len(hdr))
            if not chunk:
                raise IOError("kafka broker closed connection")
            hdr += chunk
        (n,) = struct.unpack(">i", hdr)
        buf = bytearray()
        while len(buf) < n:
            chunk = sock.recv(min(1 << 20, n - len(buf)))
            if not chunk:
                raise IOError("kafka broker closed mid-frame")
            buf += chunk
        return bytes(buf)

    # -- APIs (all v0) -----------------------------------------------------

    def metadata(self, topics: "Optional[list[str]]" = None):
        """-> (brokers {node: (host, port)}, topics {name: [partition ids]})."""
        if topics is None:
            body = struct.pack(">i", 0)  # empty array = all topics
        else:
            body = struct.pack(">i", len(topics)) + b"".join(
                _enc_str(t) for t in topics
            )
        r = self._roundtrip(_API_METADATA, 0, body)
        brokers = {}
        for _ in range(r.i32()):
            node = r.i32()
            host = r.string()
            port = r.i32()
            brokers[node] = (host, port)
        out: dict[str, list[int]] = {}
        for _ in range(r.i32()):
            terr = r.i16()
            name = r.string()
            parts = []
            for _ in range(r.i32()):
                r.i16()  # partition error
                pid = r.i32()
                r.i32()  # leader
                for _ in range(r.i32()):
                    r.i32()  # replicas
                for _ in range(r.i32()):
                    r.i32()  # isr
                parts.append(pid)
            if terr == 0 and name is not None:
                out[name] = parts
        return brokers, out

    def produce(self, topic: str, partition: int,
                entries: "list[tuple[bytes | None, bytes]]") -> int:
        ms = encode_message_set(entries)
        body = (
            struct.pack(">hi", 1, 10000)  # acks=1, timeout
            + struct.pack(">i", 1) + _enc_str(topic)
            + struct.pack(">i", 1) + struct.pack(">i", partition)
            + struct.pack(">i", len(ms)) + ms
        )
        r = self._roundtrip(_API_PRODUCE, 0, body)
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                base = r.i64()
                if err:
                    raise IOError(f"kafka produce error {err} on {topic}")
                return base
        raise IOError("kafka produce: empty response")

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 20, max_wait_ms: int = 0):
        """-> (highwater, [(offset, key, value)])."""
        body = (
            struct.pack(">iii", -1, max_wait_ms, 0)  # replica, wait, min_bytes
            + struct.pack(">i", 1) + _enc_str(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iqi", partition, offset, max_bytes)
        )
        r = self._roundtrip(_API_FETCH, 0, body)
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                hw = r.i64()
                ms = r.bytes_() or b""
                if err:
                    raise IOError(f"kafka fetch error {err} on {topic}")
                return hw, decode_message_set(ms)
        return 0, []

    def list_offsets(self, topic: str, partition: int, time_ms: int = -2) -> int:
        """time_ms -2 = earliest, -1 = latest."""
        body = (
            struct.pack(">i", -1)
            + struct.pack(">i", 1) + _enc_str(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iqi", partition, time_ms, 1)
        )
        r = self._roundtrip(_API_LIST_OFFSETS, 0, body)
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()
                err = r.i16()
                offs = [r.i64() for _ in range(r.i32())]
                if err:
                    raise IOError(f"kafka list_offsets error {err}")
                return offs[0] if offs else 0
        return 0


# ---------------------------------------------------------------- transport

TOPIC_PREFIX = "hps_et"


def encode_update(dim: int, keys: np.ndarray, vectors: np.ndarray) -> bytes:
    keys = np.ascontiguousarray(keys, "<i8").reshape(-1)
    vectors = np.ascontiguousarray(vectors, "<f4").reshape(keys.shape[0], -1)
    return (
        struct.pack("<ii", int(dim), keys.shape[0])
        + keys.tobytes()
        + vectors.tobytes()
    )


def decode_update(value: bytes):
    dim, n = struct.unpack("<ii", value[:8])
    keys = np.frombuffer(value[8 : 8 + 8 * n], "<i8").copy()
    vecs = np.frombuffer(value[8 + 8 * n :], "<f4").reshape(n, dim).copy()
    return keys, vecs


class KafkaQueueSource(MessageProducer, MessageSource):
    """``kafka_message_queue`` transport: Producer + Source over KafkaClient.

    One topic per embedding table (topic name == table tag). Offsets are
    local (optionally persisted at ``offsets_path``); consumption is
    at-least-once and updates are idempotent upserts.
    """

    def __init__(self, brokers: str, receive_buffer_size: int = 1 << 20,
                 offsets_path: Optional[str] = None):
        bootstrap = brokers.split(",")[0].strip()
        self.client = KafkaClient(bootstrap, recv_buffer=receive_buffer_size)
        self._offsets: dict[str, int] = {}
        self._offsets_path = Path(offsets_path) if offsets_path else None
        if self._offsets_path and self._offsets_path.exists():
            self._offsets = {
                k: int(v)
                for k, v in json.loads(self._offsets_path.read_text()).items()
            }

    # -- producer ----------------------------------------------------------

    def post(self, table_tag: str, keys: np.ndarray, vectors: np.ndarray) -> int:
        value = encode_update(np.asarray(vectors).shape[-1], keys, vectors)
        return self.client.produce(
            table_tag, 0, [(table_tag.encode(), value)]
        )

    # -- source ------------------------------------------------------------

    def poll(self, timeout_ms: int = 0) -> Iterator:
        try:
            _, topics = self.client.metadata()
        except OSError as e:
            raise IOError(f"kafka metadata failed: {e}") from e
        for topic in sorted(topics):
            if not topic.startswith(TOPIC_PREFIX):
                continue
            offset = self._offsets.get(topic)
            if offset is None:
                offset = self.client.list_offsets(topic, 0, -2)  # earliest
            while True:
                _, msgs = self.client.fetch(
                    topic, 0, offset, max_wait_ms=timeout_ms
                )
                if not msgs:
                    break
                for moff, _key, value in msgs:
                    keys, vecs = decode_update(value)
                    offset = moff + 1
                    self._offsets[topic] = offset
                    yield topic, keys, vecs

    def commit(self) -> None:
        if self._offsets_path is None:
            return
        tmp = self._offsets_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self._offsets))
        os.replace(tmp, self._offsets_path)

    def close(self) -> None:
        self.client.close()
