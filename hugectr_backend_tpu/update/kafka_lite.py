"""Wire-protocol-lite Kafka transport for the online-update stream.

Implements the reference's ``kafka_message_queue`` update source (reference
README.md:213-218, docs/hierarchical_parameter_server.md:575-646;
UpdateSourceParams parsing backend.cpp:263-308) WITHOUT any Kafka client
dependency: a minimal implementation of the Kafka binary protocol over TCP,
speaking TWO wire dialects of four APIs —

    Produce(0) / Fetch(1) / ListOffsets(2) / Metadata(3)

negotiated at connect time via ApiVersions(18):

  * **v0 dialect** — MessageSet v0 framing (offset i64 | size i32 |
    crc32 i32 | magic=0 | attrs=0 | key | value); spoken by every Apache
    Kafka broker from 0.8 through 3.x and by MiniKafkaBroker.
  * **v2 dialect** — Produce v3 / Fetch v4 / ListOffsets v1 / Metadata v4
    with magic=2 RecordBatch framing (update/record_batch.py, CRC32C
    checksums): the baseline Kafka 4.0 kept after dropping the v0/v1
    message formats (KIP-896), and the format stock librdkafka/Java
    trainer-side producers emit on >=0.11 brokers.

A broker that speaks neither subset fails at connect with an actionable
error instead of silently misbehaving.

Topics may be multi-partition: the consumer fetches EVERY partition
returned by Metadata (per-partition local offsets), and the producer
assigns partitions by message-key murmur2 — the stock Kafka default
partitioner, so ordering per table tag is preserved and a trainer-side
Java/librdkafka producer hashes to the same partitions.

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
import time
import zlib
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from hugectr_backend_tpu.update.record_batch import (
    decode_record_batches,
    encode_record_batch,
)
from hugectr_backend_tpu.update.source import MessageProducer, MessageSource
from hugectr_backend_tpu.utils.logging import get_logger

log = get_logger("hps_tpu.kafka")

_API_PRODUCE = 0
_API_FETCH = 1
_API_LIST_OFFSETS = 2
_API_METADATA = 3
_API_OFFSET_COMMIT = 8
_API_OFFSET_FETCH = 9
_API_FIND_COORDINATOR = 10
_API_JOIN_GROUP = 11
_API_HEARTBEAT = 12
_API_LEAVE_GROUP = 13
_API_SYNC_GROUP = 14
_API_VERSIONS = 18


def murmur2(data: bytes) -> int:
    """Kafka's default-partitioner hash (org.apache.kafka.common.utils.Utils
    .murmur2) — produces the same partition assignment as a stock Java/
    librdkafka producer for a given message key."""
    m, r = 0x5BD1E995, 24
    h = (0x9747B28C ^ len(data)) & 0xFFFFFFFF
    n4 = len(data) // 4
    for i in range(n4):
        (k,) = struct.unpack_from("<I", data, i * 4)
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> r
        k = (k * m) & 0xFFFFFFFF
        h = ((h * m) & 0xFFFFFFFF) ^ k
    extra = len(data) % 4
    base = n4 * 4
    if extra >= 3:
        h ^= data[base + 2] << 16
    if extra >= 2:
        h ^= data[base + 1] << 8
    if extra >= 1:
        h ^= data[base]
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def partition_for_key(key: bytes, num_partitions: int) -> int:
    return (murmur2(key) & 0x7FFFFFFF) % max(num_partitions, 1)


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


def encode_message_set(entries: "list[tuple[bytes | None, bytes]]",
                       codec: "int | str | None" = 0) -> bytes:
    """MessageSet v0 with placeholder offsets (broker assigns on produce).

    With ``codec`` set, the whole set is wrapped in one compressed wrapper
    message (attributes bits 0-2 = codec id, null key, value = compressed
    inner MessageSet — the pre-RecordBatch compression framing)."""
    from hugectr_backend_tpu.update import compression

    cid = compression.codec_id(codec)
    out = b""
    for key, value in entries:
        body = struct.pack(">bb", 0, 0) + _enc_bytes(key) + _enc_bytes(value)
        msg = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body
        out += struct.pack(">q", -1) + struct.pack(">i", len(msg)) + msg
    if not cid:
        return out
    # Magic-0 lz4 wrappers use the pre-KIP-57 'broken' header-checksum
    # convention, which old brokers validate (compression.py).
    packed = compression.compress(
        cid, out, lz4_legacy_kafka_hc=(cid == compression.CODEC_LZ4))
    body = (struct.pack(">bb", 0, cid) + _enc_bytes(None)
            + _enc_bytes(packed))
    msg = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body
    return struct.pack(">q", -1) + struct.pack(">i", len(msg)) + msg


def decode_message_set(raw: bytes):
    """-> [(offset, key|None, value)] — tolerates a truncated trailing
    message (Fetch v0 may cut the last one). Compressed wrapper messages
    (attribute bits 0-2) are unwrapped recursively; inner offsets follow
    the wrapper-offset convention (consecutive, ending at the wrapper's)."""
    from hugectr_backend_tpu.update import compression

    out = []
    r = _Reader(raw)
    while r.remaining() >= 12:
        offset = r.i64()
        size = r.i32()
        if size <= 0:
            # CRCs are deliberately not checked (TCP already checksums),
            # so a corrupt/malicious size field must be rejected here: a
            # negative size would walk the reader BACKWARD and loop
            # forever.
            raise IOError(f"kafka message set: invalid message size {size}")
        if r.remaining() < size:
            break
        m = _Reader(r.take(size))
        m.i32()  # crc (trusted: TCP already checksums)
        magic = m.i8()
        attrs = m.i8()
        if magic >= 1:
            m.i64()  # v1 timestamp
        key = m.bytes_()
        value = m.bytes_()
        if attrs & 0x07:
            inner = decode_message_set(
                compression.decompress(attrs & 0x07, value or b""))
            # Brokers rewrite the WRAPPER offset to the LAST inner record's;
            # producer-side inner offsets are 0..n-1 — renumber so the run
            # ends at the wrapper offset (covers magic 0 and 1 producers).
            n = len(inner)
            out.extend(
                (offset - (n - 1) + i, k, v)
                for i, (_o, k, v) in enumerate(inner)
            )
            continue
        out.append((offset, key, value or b""))
    return out


# ---------------------------------------------------------------- client

class KafkaClient:
    """One-broker client (metadata-discovered leaders reuse the same
    socket when they are the bootstrap broker — the mini broker and any
    single-node deployment; multi-node clusters get per-leader sockets).

    Dialect (``self.mode``) is negotiated lazily on first use: "v2"
    (RecordBatch framing, the Kafka >=0.11 native format — preferred, since
    it is what modern brokers store and what trainer-side producers emit,
    avoiding broker-side format down-conversion) when the broker supports
    Produce v3 / Fetch v4 / ListOffsets v1 / Metadata v4, else "v0"
    (MessageSet framing, brokers 0.8-3.x)."""

    def __init__(self, bootstrap: str, client_id: str = "hps-tpu",
                 recv_buffer: int = 1 << 20, timeout_s: float = 10.0):
        host, _, port = bootstrap.rpartition(":")
        self.bootstrap = (host or "127.0.0.1", int(port))
        self.client_id = client_id
        self.recv_buffer = recv_buffer
        self.timeout_s = timeout_s
        self.mode: Optional[str] = None  # "v0" | "v2" once negotiated
        self._corr = 0
        self._socks: dict[tuple, socket.socket] = {}
        #: (topic, partition) -> leader (host, port), filled by metadata().
        self._leaders: dict[tuple, tuple] = {}
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

    def api_versions(self) -> "dict[int, tuple[int, int]]":
        """ApiVersions v0 -> {api_key: (min_version, max_version)}.

        Supported by every Apache Kafka broker since 0.10; pre-0.10 brokers
        close the connection on the unknown API (callers treat that as
        "v0 speaks everywhere", which is true there)."""
        r = self._roundtrip(_API_VERSIONS, 0, b"")
        err = r.i16()
        if err:
            raise IOError(f"kafka ApiVersions error {err}")
        out = {}
        for _ in range(r.i32()):
            api = r.i16()
            out[api] = (r.i16(), r.i16())
        return out

    # Per-dialect (api -> version) tables.
    _V2_VERSIONS = {_API_PRODUCE: 3, _API_FETCH: 4, _API_LIST_OFFSETS: 1,
                    _API_METADATA: 4}

    def negotiate(self) -> str:
        """Pick the wire dialect from ApiVersions; fail fast with an
        actionable error when the broker speaks neither (Kafka 4.0 dropped
        v0/v1 per KIP-896 — those brokers take the v2 dialect here; a
        future broker that drops the non-flexible versions too would land
        in the error branch)."""
        if self.mode:
            return self.mode
        try:
            vers = self.api_versions()
        except (ConnectionError, TimeoutError) as e:
            # The broker is UNREACHABLE (refused / timed out) — that says
            # nothing about its dialect. Do NOT cache a mode: locking v0
            # here would permanently break against a Kafka>=4.0 broker
            # that merely started after us. The caller's retry loop
            # renegotiates once the broker is up.
            raise IOError(
                f"kafka broker unreachable at {self.bootstrap[0]}:"
                f"{self.bootstrap[1]}: {e}"
            ) from e
        except (OSError, EOFError):
            # CONNECTED but the broker dropped the unknown ApiVersions
            # request: a pre-0.10 broker — v0 is all it speaks.
            self.mode = "v0"
            return self.mode

        def ok(api: int, v: int) -> bool:
            lo, hi = vers.get(api, (0, -1))
            return lo <= v <= hi

        if all(ok(a, v) for a, v in self._V2_VERSIONS.items()):
            self.mode = "v2"
        elif all(ok(a, 0) for a in self._V2_VERSIONS):
            self.mode = "v0"
        else:
            supported = {a: vers.get(a) for a in self._V2_VERSIONS}
            raise IOError(
                f"kafka broker at {self.bootstrap[0]}:{self.bootstrap[1]}"
                f" supports neither the v0 MessageSet dialect (Kafka 0.8-3.x;"
                f" removed in Kafka 4.0, KIP-896) nor the v2 RecordBatch"
                f" dialect (Produce v3/Fetch v4/ListOffsets v1/Metadata v4)"
                f" this transport speaks — broker versions: {supported}. Use"
                " a standard Apache Kafka broker, or bridge updates through"
                " the file-queue update source"
                " (update_source.type=file_queue)."
            )
        log.info("kafka dialect negotiated: %s (%s:%s)", self.mode,
                 self.bootstrap[0], self.bootstrap[1])
        return self.mode

    def metadata(self, topics: "Optional[list[str]]" = None):
        """-> (brokers {node: (host, port)}, topics {name: [partition ids]})."""
        v2 = self.negotiate() == "v2"
        if topics is None:
            # "all topics" spells differently per version: v0 empty array,
            # v1+ null array.
            body = struct.pack(">i", -1 if v2 else 0)
        else:
            body = struct.pack(">i", len(topics)) + b"".join(
                _enc_str(t) for t in topics
            )
        if v2:
            body += struct.pack(">b", 1)  # allow_auto_topic_creation
            r = self._roundtrip(_API_METADATA, 4, body)
            r.i32()  # throttle_time_ms
        else:
            r = self._roundtrip(_API_METADATA, 0, body)
        brokers = {}
        for _ in range(r.i32()):
            node = r.i32()
            host = r.string()
            port = r.i32()
            if v2:
                r.string()  # rack (nullable)
            brokers[node] = (host, port)
        if v2:
            r.string()  # cluster_id (nullable)
            r.i32()  # controller_id
        out: dict[str, list[int]] = {}
        for _ in range(r.i32()):
            terr = r.i16()
            name = r.string()
            if v2:
                r.i8()  # is_internal
            parts = []
            for _ in range(r.i32()):
                r.i16()  # partition error
                pid = r.i32()
                leader = r.i32()
                for _ in range(r.i32()):
                    r.i32()  # replicas
                for _ in range(r.i32()):
                    r.i32()  # isr
                parts.append(pid)
                if name is not None and leader in brokers:
                    # Cache the partition leader: produce/fetch/
                    # list_offsets route to it (multi-broker clusters
                    # answer NOT_LEADER from the bootstrap node).
                    self._leaders[(name, pid)] = brokers[leader]
            if terr == 0 and name is not None:
                out[name] = parts
        return brokers, out

    def _leader_addr(self, topic: str, partition: int):
        """Cached partition-leader address (None -> bootstrap)."""
        return self._leaders.get((topic, partition))

    def _data_plane(self, api_name: str, topic: str, partition: int, fn):
        """Run a leader-routed data-plane request; on a stale-metadata
        error (NOT_LEADER / UNKNOWN_TOPIC — e.g. after a leader election)
        refresh metadata once and retry against the new leader."""
        try:
            return fn(self._leader_addr(topic, partition))
        except KafkaProtocolError as e:
            if e.code not in KafkaProtocolError.STALE_META_CODES:
                raise
            self._leaders.pop((topic, partition), None)
            self.metadata([topic])
            return fn(self._leader_addr(topic, partition))

    def produce(self, topic: str, partition: int,
                entries: "list[tuple[bytes | None, bytes]]",
                codec: "int | str | None" = 0) -> int:
        v2 = self.negotiate() == "v2"
        if v2:
            ms = encode_record_batch(
                entries, timestamp_ms=int(time.time() * 1000), codec=codec)
            body = (
                _enc_str(None)  # transactional_id
                + struct.pack(">hi", 1, 10000)  # acks=1, timeout
                + struct.pack(">i", 1) + _enc_str(topic)
                + struct.pack(">i", 1) + struct.pack(">i", partition)
                + _enc_bytes(ms)
            )
        else:
            ms = encode_message_set(entries, codec=codec)
            body = (
                struct.pack(">hi", 1, 10000)  # acks=1, timeout
                + struct.pack(">i", 1) + _enc_str(topic)
                + struct.pack(">i", 1) + struct.pack(">i", partition)
                + struct.pack(">i", len(ms)) + ms
            )

        def run(addr):
            r = self._roundtrip(_API_PRODUCE, 3 if v2 else 0, body,
                                addr=addr)
            for _ in range(r.i32()):
                r.string()
                for _ in range(r.i32()):
                    r.i32()  # partition
                    err = r.i16()
                    base = r.i64()
                    if err:
                        raise KafkaProtocolError("produce", err,
                                                 f" on {topic}")
                    return base
            raise IOError("kafka produce: empty response")

        return self._data_plane("produce", topic, partition, run)

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 20, max_wait_ms: int = 0):
        """-> (highwater, [(offset, key, value)])."""
        v2 = self.negotiate() == "v2"
        if v2:
            body = (
                # replica, wait, min_bytes, max_bytes(total), isolation=0
                struct.pack(">iiiib", -1, max_wait_ms, 0, max_bytes, 0)
                + struct.pack(">i", 1) + _enc_str(topic)
                + struct.pack(">i", 1)
                + struct.pack(">iqi", partition, offset, max_bytes)
            )
        else:
            body = (
                struct.pack(">iii", -1, max_wait_ms, 0)
                + struct.pack(">i", 1) + _enc_str(topic)
                + struct.pack(">i", 1)
                + struct.pack(">iqi", partition, offset, max_bytes)
            )

        def run(addr):
            r = self._roundtrip(_API_FETCH, 4 if v2 else 0, body, addr=addr)
            if v2:
                r.i32()  # throttle_time_ms
            for _ in range(r.i32()):
                r.string()
                for _ in range(r.i32()):
                    r.i32()  # partition
                    err = r.i16()
                    hw = r.i64()
                    if v2:
                        r.i64()  # last_stable_offset
                        n_aborted = r.i32()  # nullable array: -1 == none
                        for _ in range(max(n_aborted, 0)):
                            r.i64()  # producer_id
                            r.i64()  # first_offset
                    ms = r.bytes_() or b""
                    if err:
                        raise KafkaProtocolError("fetch", err, f" on {topic}")
                    msgs = (decode_record_batches(ms) if v2
                            else decode_message_set(ms))
                    # A batch's base offset can precede the requested
                    # offset (broker returns whole batches): drop
                    # already-seen records.
                    return hw, [m for m in msgs if m[0] >= offset]
            return 0, []

        return self._data_plane("fetch", topic, partition, run)

    def list_offsets(self, topic: str, partition: int, time_ms: int = -2) -> int:
        """time_ms -2 = earliest, -1 = latest."""
        v2 = self.negotiate() == "v2"

        def run(addr):
            if v2:
                body = (
                    struct.pack(">i", -1)
                    + struct.pack(">i", 1) + _enc_str(topic)
                    + struct.pack(">i", 1)
                    + struct.pack(">iq", partition, time_ms)
                )
                r = self._roundtrip(_API_LIST_OFFSETS, 1, body, addr=addr)
                for _ in range(r.i32()):
                    r.string()
                    for _ in range(r.i32()):
                        r.i32()
                        err = r.i16()
                        r.i64()  # timestamp
                        off = r.i64()
                        if err:
                            raise KafkaProtocolError("list_offsets", err)
                        return off
                return 0
            body = (
                struct.pack(">i", -1)
                + struct.pack(">i", 1) + _enc_str(topic)
                + struct.pack(">i", 1)
                + struct.pack(">iqi", partition, time_ms, 1)
            )
            r = self._roundtrip(_API_LIST_OFFSETS, 0, body, addr=addr)
            for _ in range(r.i32()):
                r.string()
                for _ in range(r.i32()):
                    r.i32()
                    err = r.i16()
                    offs = [r.i64() for _ in range(r.i32())]
                    if err:
                        raise KafkaProtocolError("list_offsets", err)
                    return offs[0] if offs else 0
            return 0

        return self._data_plane("list_offsets", topic, partition, run)

    # -- consumer-group coordination (all v0/v1 — spoken by every broker
    #    since 0.9; the reference consumes through librdkafka's full group
    #    consumer, doc:575-646) -------------------------------------------

    #: (api, version) pairs the classic group protocol here requires.
    _GROUP_APIS = ((_API_FIND_COORDINATOR, 0), (_API_JOIN_GROUP, 0),
                   (_API_SYNC_GROUP, 0), (_API_HEARTBEAT, 0),
                   (_API_LEAVE_GROUP, 0), (_API_OFFSET_COMMIT, 1),
                   (_API_OFFSET_FETCH, 1))

    def require_group_apis(self) -> None:
        """Fail fast with an actionable error when the broker dropped the
        classic group-protocol versions this client speaks (Kafka 4.0
        removed them per KIP-896 alongside the v0 data-plane versions)."""
        try:
            vers = self.api_versions()
        except (OSError, EOFError):
            return  # pre-0.10 broker: v0 everywhere
        bad = [
            (api, v) for api, v in self._GROUP_APIS
            if not (vers.get(api, (0, -1))[0] <= v
                    <= vers.get(api, (0, -1))[1])
        ]
        if bad:
            raise IOError(
                "kafka broker does not accept the classic consumer-group "
                f"protocol versions this client speaks ({bad} outside the "
                "broker's supported ranges — Kafka 4.0 removed them, "
                "KIP-896). Unset update_source.consumer_group_id (node-"
                "local offsets; double-apply across nodes is harmless for "
                "idempotent upserts) or consume through a <=3.x broker."
            )

    def find_coordinator(self, group: str) -> "tuple[str, int]":
        r = self._roundtrip(_API_FIND_COORDINATOR, 0, _enc_str(group))
        err = r.i16()
        if err:
            raise IOError(f"kafka FindCoordinator error {err}")
        r.i32()  # node id
        return r.string(), r.i32()

    def join_group(self, group: str, member_id: str, topics: "list[str]",
                   session_timeout_ms: int = 30_000, addr=None):
        """-> (generation, protocol, leader_id, member_id,
        members [(id, subscribed topics)]) — members only for the leader."""
        body = (
            _enc_str(group) + struct.pack(">i", session_timeout_ms)
            + _enc_str(member_id) + _enc_str("consumer")
            + struct.pack(">i", 1) + _enc_str("range")
            + _enc_bytes(encode_member_metadata(topics))
        )
        r = self._roundtrip(_API_JOIN_GROUP, 0, body, addr=addr)
        err = r.i16()
        if err:
            raise KafkaGroupError("JoinGroup", err)
        gen = r.i32()
        proto = r.string()
        leader = r.string()
        mid = r.string()
        members = [
            (r.string(), decode_member_metadata(r.bytes_() or b""))
            for _ in range(r.i32())
        ]
        return gen, proto, leader, mid, members

    def sync_group(self, group: str, generation: int, member_id: str,
                   assignments: "list[tuple[str, dict]]", addr=None):
        """Leader passes ``assignments`` [(member, {topic: [pids]})];
        followers pass []. -> this member's {topic: [pids]}."""
        body = (
            _enc_str(group) + struct.pack(">i", generation)
            + _enc_str(member_id) + struct.pack(">i", len(assignments))
            + b"".join(
                _enc_str(m) + _enc_bytes(encode_assignment(a))
                for m, a in assignments
            )
        )
        r = self._roundtrip(_API_SYNC_GROUP, 0, body, addr=addr)
        err = r.i16()
        if err:
            raise KafkaGroupError("SyncGroup", err)
        return decode_assignment(r.bytes_() or b"")

    def heartbeat(self, group: str, generation: int, member_id: str,
                  addr=None) -> None:
        body = (_enc_str(group) + struct.pack(">i", generation)
                + _enc_str(member_id))
        r = self._roundtrip(_API_HEARTBEAT, 0, body, addr=addr)
        err = r.i16()
        if err:
            raise KafkaGroupError("Heartbeat", err)

    def leave_group(self, group: str, member_id: str, addr=None) -> None:
        r = self._roundtrip(_API_LEAVE_GROUP, 0,
                            _enc_str(group) + _enc_str(member_id),
                            addr=addr)
        r.i16()  # best-effort

    def offset_commit(self, group: str,
                      offsets: "dict[tuple[str, int], int]",
                      generation: int = -1, member_id: str = "",
                      addr=None) -> None:
        """OffsetCommit v1: stored by the group coordinator (v0 wrote to
        ZooKeeper on old brokers — mismatched with OffsetFetch v1) and
        fenced by generation/member so a stale member's late commit cannot
        clobber the new partition owner's offsets."""
        by_topic: dict[str, list] = {}
        for (topic, pid), off in offsets.items():
            by_topic.setdefault(topic, []).append((pid, off))
        body = (_enc_str(group) + struct.pack(">i", generation)
                + _enc_str(member_id) + struct.pack(">i", len(by_topic)))
        for topic, parts in by_topic.items():
            body += _enc_str(topic) + struct.pack(">i", len(parts))
            for pid, off in parts:
                body += (struct.pack(">iq", pid, off)
                         + struct.pack(">q", -1) + _enc_str(""))
        r = self._roundtrip(_API_OFFSET_COMMIT, 1, body, addr=addr)
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()
                err = r.i16()
                if err:
                    raise KafkaGroupError("OffsetCommit", err)

    def offset_fetch(self, group: str,
                     tps: "list[tuple[str, int]]", addr=None
                     ) -> "dict[tuple[str, int], int]":
        """OffsetFetch v1 (broker-stored offsets). Missing -> -1."""
        by_topic: dict[str, list] = {}
        for topic, pid in tps:
            by_topic.setdefault(topic, []).append(pid)
        body = _enc_str(group) + struct.pack(">i", len(by_topic))
        for topic, pids in by_topic.items():
            body += _enc_str(topic) + struct.pack(">i", len(pids))
            for pid in pids:
                body += struct.pack(">i", pid)
        r = self._roundtrip(_API_OFFSET_FETCH, 1, body, addr=addr)
        out = {}
        for _ in range(r.i32()):
            topic = r.string()
            for _ in range(r.i32()):
                pid = r.i32()
                off = r.i64()
                r.string()  # metadata
                err = r.i16()
                if err:
                    raise IOError(f"kafka OffsetFetch error {err}")
                out[(topic, pid)] = off
        return out


class KafkaProtocolError(IOError):
    """Data-plane error carrying the Kafka error code (1
    OFFSET_OUT_OF_RANGE triggers an offset reset; 3 UNKNOWN_TOPIC /
    6 NOT_LEADER_FOR_PARTITION trigger a metadata refresh + retry)."""

    #: stale partition-leader cache: refresh metadata and retry once.
    STALE_META_CODES = (3, 6)

    def __init__(self, api: str, code: int, detail: str = ""):
        super().__init__(f"kafka {api} error {code}{detail}")
        self.code = code


class KafkaGroupError(IOError):
    """Group-protocol error carrying the Kafka error code (22
    ILLEGAL_GENERATION / 25 UNKNOWN_MEMBER_ID / 27 REBALANCE_IN_PROGRESS
    trigger a rejoin)."""

    REJOIN_CODES = (22, 25, 27)
    #: coordinator moved / not yet available: re-find the coordinator.
    COORD_CODES = (14, 15, 16)

    def __init__(self, api: str, code: int):
        super().__init__(f"kafka {api} error {code}")
        self.code = code


# -- consumer-protocol payloads (the "consumer" protocol_type wire format
#    every Kafka client embeds in JoinGroup/SyncGroup) ----------------------


def encode_member_metadata(topics: "list[str]") -> bytes:
    return (struct.pack(">hi", 0, len(topics))
            + b"".join(_enc_str(t) for t in topics) + _enc_bytes(b""))


def decode_member_metadata(raw: bytes) -> "list[str]":
    r = _Reader(raw)
    r.i16()  # version
    return [r.string() for _ in range(r.i32())]


def encode_assignment(tp_map: "dict[str, list[int]]") -> bytes:
    out = struct.pack(">hi", 0, len(tp_map))
    for topic, pids in sorted(tp_map.items()):
        out += _enc_str(topic) + struct.pack(">i", len(pids))
        for p in pids:
            out += struct.pack(">i", p)
    return out + _enc_bytes(b"")


def decode_assignment(raw: bytes) -> "dict[str, list[int]]":
    if not raw:
        return {}
    r = _Reader(raw)
    r.i16()  # version
    return {
        r.string(): [r.i32() for _ in range(r.i32())]
        for _ in range(r.i32())
    }


def range_assign(members: "list[tuple[str, list[str]]]",
                 topic_partitions: "dict[str, list[int]]"
                 ) -> "dict[str, dict[str, list[int]]]":
    """The stock range assignor: per topic, subscribed members sorted by id
    split the sorted partition list into contiguous ranges (first members
    take the remainder) — matches Java's RangeAssignor so mixed fleets
    agree."""
    out: dict[str, dict[str, list[int]]] = {m: {} for m, _ in members}
    for topic, pids in sorted(topic_partitions.items()):
        subs = sorted(m for m, topics in members if topic in topics)
        if not subs:
            continue
        pids = sorted(pids)
        n, k = divmod(len(pids), len(subs))
        pos = 0
        for i, m in enumerate(subs):
            take = n + (1 if i < k else 0)
            if take:
                out[m].setdefault(topic, []).extend(pids[pos:pos + take])
            pos += take
    return out


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

    One topic per embedding table (topic name == table tag). Consumption is
    at-least-once and updates are idempotent upserts. Two offset modes:

    - default: offsets are node-local (optionally persisted at
      ``offsets_path``) and every node reads the full stream (safe —
      upserts are idempotent);
    - ``group_id`` set: full consumer-group coordination — the node joins
      the group (JoinGroup/SyncGroup, stock range assignor), consumes only
      its ASSIGNED partitions, heartbeats each poll, rejoins on rebalance,
      and commits offsets to the broker (OffsetCommit/OffsetFetch), so a
      fleet of inference nodes splits the update stream without
      double-apply (the reference's librdkafka consumer behavior,
      doc:575-646).
    """

    def __init__(self, brokers: str, receive_buffer_size: int = 1 << 20,
                 offsets_path: Optional[str] = None,
                 compression: "int | str | None" = 0,
                 group_id: Optional[str] = None,
                 session_timeout_ms: int = 30_000):
        bootstrap = brokers.split(",")[0].strip()
        self.client = KafkaClient(bootstrap, recv_buffer=receive_buffer_size)
        self.compression = compression  # producer-side compression.type
        self.group_id = group_id
        self.session_timeout_ms = session_timeout_ms
        self._member_id = ""
        self._generation = -1
        self._assignment: "Optional[dict[str, list[int]]]" = None
        self._subscribed: "tuple[str, ...]" = ()
        self._coord: "Optional[tuple[str, int]]" = None
        self._group_apis_checked = False
        self._compat_checked = False
        self._nparts: dict[str, int] = {}  # topic -> partition count (cached)
        # Offsets are per (topic, partition), persisted as "topic:pid" keys;
        # a legacy plain-topic key (round-2 files) reads as partition 0.
        self._offsets: dict[tuple[str, int], int] = {}
        self._offsets_path = Path(offsets_path) if offsets_path else None
        if self._offsets_path and self._offsets_path.exists():
            for k, v in json.loads(self._offsets_path.read_text()).items():
                topic, _, pid = k.rpartition(":")
                if topic and pid.isdigit():
                    self._offsets[(topic, int(pid))] = int(v)
                else:
                    self._offsets[(k, 0)] = int(v)

    def _ensure_compat(self):
        if not self._compat_checked:
            self.client.negotiate()
            self._compat_checked = True

    def _partitions(self, topic: str, refresh: bool = False) -> int:
        n = self._nparts.get(topic)
        if n is None or refresh:
            _, topics = self.client.metadata([topic])
            n = len(topics.get(topic, [])) or 1
            self._nparts[topic] = n
        return n

    # -- producer ----------------------------------------------------------

    def post(self, table_tag: str, keys: np.ndarray, vectors: np.ndarray) -> int:
        """Produce one update batch, partitioned by message-key hash (the
        stock Kafka default partitioner, so per-table ordering holds on
        multi-partition topics exactly as with a Java/librdkafka trainer-side
        producer — reference doc:575-646)."""
        self._ensure_compat()
        value = encode_update(np.asarray(vectors).shape[-1], keys, vectors)
        key = table_tag.encode()
        part = partition_for_key(key, self._partitions(table_tag))
        try:
            return self.client.produce(table_tag, part, [(key, value)],
                                       codec=self.compression)
        except IOError:
            # Partition count may have changed (or the cached metadata was
            # for an auto-created placeholder): refresh once and retry.
            part = partition_for_key(
                key, self._partitions(table_tag, refresh=True))
            return self.client.produce(table_tag, part, [(key, value)],
                                       codec=self.compression)

    # -- consumer-group membership ----------------------------------------

    def _coordinator(self, refresh: bool = False):
        """Group requests route to the group COORDINATOR broker (hashed
        from the group id on multi-broker clusters), not the bootstrap."""
        if not self._group_apis_checked:
            self.client.require_group_apis()
            self._group_apis_checked = True
        if self._coord is None or refresh:
            host, port = self.client.find_coordinator(self.group_id)
            self._coord = (host or self.client.bootstrap[0], port)
        return self._coord

    def _rejoin(self, topics: "list[str]") -> None:
        """Join/sync until this member holds a valid assignment."""
        self._subscribed = tuple(sorted(topics))
        coord = self._coordinator()
        for _ in range(10):
            try:
                gen, _proto, leader, mid, members = self.client.join_group(
                    self.group_id, self._member_id, list(self._subscribed),
                    self.session_timeout_ms, addr=coord,
                )
            except KafkaGroupError as e:
                if e.code == 25:  # UNKNOWN_MEMBER_ID: start fresh
                    self._member_id = ""
                    continue
                if e.code in KafkaGroupError.COORD_CODES:
                    coord = self._coordinator(refresh=True)
                    continue
                raise
            except (ConnectionError, TimeoutError):
                # Dead coordinator endpoint: re-resolve and retry.
                coord = self._coordinator(refresh=True)
                continue
            self._member_id = mid
            self._generation = gen
            if leader == mid:
                # Assign over the UNION of every member's subscription
                # (Java's RangeAssignor semantics) — a topic another
                # member sees but this leader doesn't (metadata lag)
                # must not silently go unassigned.
                union = sorted(
                    set(self._subscribed).union(
                        *(set(sub) for _m, sub in members)
                    )
                )
                _, tp = self.client.metadata(union)
                plan = range_assign(
                    members, {t: tp.get(t, [0]) for t in union}
                )
                assignments = [(m, plan.get(m, {})) for m, _ in members]
            else:
                assignments = []
            try:
                self._assignment = self.client.sync_group(
                    self.group_id, gen, mid, assignments, addr=coord)
                # Drop cached offsets for partitions no longer ours: a
                # later commit() must not clobber the new owner's offsets
                # (the broker also fences via generation, OffsetCommit v1).
                mine = {
                    (t, p)
                    for t, pids in self._assignment.items() for p in pids
                }
                self._offsets = {
                    tp_: off for tp_, off in self._offsets.items()
                    if tp_ in mine
                }
                log.info("kafka group %s member %s gen %d assigned %s",
                         self.group_id, mid, gen, self._assignment)
                return
            except KafkaGroupError as e:
                if e.code in KafkaGroupError.REJOIN_CODES:
                    continue
                if e.code in KafkaGroupError.COORD_CODES:
                    coord = self._coordinator(refresh=True)
                    continue
                raise
        raise IOError(f"kafka group {self.group_id}: rejoin did not settle")

    def _group_ready(self, topics: "list[str]") -> bool:
        if self.group_id is None:
            return False
        need_join = (
            self._assignment is None
            or tuple(sorted(topics)) != self._subscribed
        )
        if not need_join:
            try:
                self.client.heartbeat(self.group_id, self._generation,
                                      self._member_id,
                                      addr=self._coordinator())
            except KafkaGroupError as e:
                if e.code in KafkaGroupError.COORD_CODES:
                    self._coordinator(refresh=True)
                    need_join = True
                elif e.code not in KafkaGroupError.REJOIN_CODES:
                    raise
                else:
                    need_join = True
            except OSError:
                # Transport-level failure (coordinator host gone): a dead
                # TCP endpoint can never return the COORD error codes, so
                # re-resolve the coordinator here or grouped consumption
                # never recovers from a coordinator host move.
                self._coordinator(refresh=True)
                need_join = True
        if need_join:
            self._rejoin(topics)
        return True

    # -- source ------------------------------------------------------------

    def poll(self, timeout_ms: int = 0) -> Iterator:
        self._ensure_compat()
        try:
            _, topics = self.client.metadata()
        except OSError as e:
            raise IOError(f"kafka metadata failed: {e}") from e
        mine = sorted(t for t in topics if t.startswith(TOPIC_PREFIX))
        grouped = self._group_ready(mine)
        for topic in mine:
            self._nparts[topic] = len(topics[topic]) or 1
            # EVERY partition: a multi-partition trainer-side topic loses no
            # updates (round-2 consumed partition 0 only). Under a consumer
            # group, only the partitions this member was ASSIGNED.
            pids = (self._assignment.get(topic, []) if grouped
                    else sorted(topics[topic]))
            for pid in pids:
                offset = self._offsets.get((topic, pid))
                if offset is None and grouped:
                    committed = self.client.offset_fetch(
                        self.group_id, [(topic, pid)],
                        addr=self._coordinator(),
                    ).get((topic, pid), -1)
                    if committed >= 0:
                        offset = committed
                if offset is None:
                    offset = self.client.list_offsets(topic, pid, -2)
                while True:
                    try:
                        _, msgs = self.client.fetch(
                            topic, pid, offset, max_wait_ms=timeout_ms
                        )
                    except KafkaProtocolError as e:
                        if e.code != 1:  # OFFSET_OUT_OF_RANGE
                            raise
                        # Persisted/committed offset precedes the log
                        # start (node down past retention, or the topic
                        # was recreated): reset to earliest instead of
                        # wedging the stream forever on a dead offset.
                        reset = self.client.list_offsets(topic, pid, -2)
                        log.warning(
                            "kafka offset %d out of range for %s[%d]; "
                            "resetting to earliest %d", offset, topic,
                            pid, reset,
                        )
                        offset = reset
                        self._offsets[(topic, pid)] = offset
                        continue
                    if not msgs:
                        break
                    for moff, _key, value in msgs:
                        keys, vecs = decode_update(value)
                        offset = moff + 1
                        self._offsets[(topic, pid)] = offset
                        yield topic, keys, vecs

    def commit(self) -> None:
        if self.group_id is not None and self._offsets:
            # Only CURRENTLY-ASSIGNED partitions: after a rebalance our
            # cache may hold offsets for partitions another member now
            # owns, and committing those would rewind its progress.
            mine = {
                (t, p)
                for t, pids in (self._assignment or {}).items()
                for p in pids
            }
            to_commit = {tp_: off for tp_, off in self._offsets.items()
                         if tp_ in mine}
            if to_commit:
                try:
                    self.client.offset_commit(
                        self.group_id, to_commit,
                        generation=self._generation,
                        member_id=self._member_id,
                        addr=self._coordinator(),
                    )
                except (ConnectionError, TimeoutError):
                    # Coordinator host moved: re-resolve once and retry
                    # (the error-code path below cannot fire on a dead
                    # TCP endpoint).
                    self.client.offset_commit(
                        self.group_id, to_commit,
                        generation=self._generation,
                        member_id=self._member_id,
                        addr=self._coordinator(refresh=True),
                    )
        if self._offsets_path is None:
            return
        tmp = self._offsets_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(
            {f"{t}:{p}": off for (t, p), off in self._offsets.items()}
        ))
        os.replace(tmp, self._offsets_path)

    def close(self) -> None:
        if self.group_id is not None and self._member_id:
            try:
                self.client.leave_group(self.group_id, self._member_id,
                                        addr=self._coordinator())
            except (OSError, KafkaGroupError):
                pass
        self.client.close()
