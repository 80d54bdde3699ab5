"""Local-SSD persistent tier: log-structured key->vector store.

TPU-native replacement for the reference's RocksDB persistent database
(reference docs/hierarchical_parameter_server.md:548-573): durable full copy
of every embedding table on local disk, bulk query/insert, column-family-like
separation per table (one subdirectory per table tag, mirroring the
reference's column-family-per-table, README.md:210).

Layout per table:
    <path>/<tag>/data.log   : append-only records [int64 key][float32 x dim]
    <path>/<tag>/meta.json  : {"dim": D}

The in-memory key -> record-offset index is rebuilt on open by scanning the
log (newest record wins, giving upsert semantics); reads go through a
np.memmap so the page cache does the heavy lifting. Compaction rewrites the
log dropping superseded records.
"""

from __future__ import annotations

import json
import os
import threading
from pathlib import Path

import numpy as np

from hugectr_backend_tpu.config.params import PersistentDatabaseParams
from hugectr_backend_tpu.tiers.base import KVTier


class _TableLog:
    def __init__(self, root: Path, tag: str, dim: int, read_only: bool):
        self.dir = root / tag.replace("/", "_")
        self.dir.mkdir(parents=True, exist_ok=True)
        self.data_path = self.dir / "data.log"
        self.meta_path = self.dir / "meta.json"
        self.read_only = read_only
        self.lock = threading.Lock()
        if self.meta_path.exists():
            meta = json.loads(self.meta_path.read_text())
            if meta["dim"] != dim and dim:
                raise ValueError(
                    f"table {tag}: on-disk dim {meta['dim']} != requested {dim}"
                )
            self.dim = int(meta["dim"])
        else:
            if read_only:
                raise FileNotFoundError(f"read-only SSD tier: table {tag} absent")
            self.dim = dim
            self.meta_path.write_text(json.dumps({"dim": dim}))
        self.record_bytes = 8 + 4 * self.dim
        self.index: dict[int, int] = {}
        self._scan()

    def _scan(self):
        """Rebuild key -> record index from the log; last write wins."""
        self.index.clear()
        if not self.data_path.exists():
            self.data_path.touch()
            return
        size = self.data_path.stat().st_size
        n = size // self.record_bytes
        if n == 0:
            return
        raw = np.memmap(self.data_path, dtype=np.uint8, mode="r", shape=(n * self.record_bytes,))
        recs = raw.reshape(n, self.record_bytes)
        keys = recs[:, :8].copy().view(np.int64).reshape(-1)
        for i, k in enumerate(keys.tolist()):
            self.index[k] = i

    def insert(self, keys: np.ndarray, vectors: np.ndarray) -> int:
        if self.read_only:
            raise PermissionError("SSD tier opened read_only")
        keys = np.asarray(keys, dtype="<i8").reshape(-1)
        vectors = np.asarray(vectors, dtype="<f4").reshape(keys.shape[0], self.dim)
        rec = np.empty((keys.shape[0], self.record_bytes), dtype=np.uint8)
        rec[:, :8] = keys.view(np.uint8).reshape(-1, 8)
        rec[:, 8:] = vectors.view(np.uint8).reshape(-1, 4 * self.dim)
        with self.lock:
            base = self.data_path.stat().st_size // self.record_bytes
            with open(self.data_path, "ab") as f:
                f.write(rec.tobytes())
            for i, k in enumerate(keys.tolist()):
                self.index[k] = base + i
        return int(keys.shape[0])

    def query(self, keys: np.ndarray):
        keys = np.asarray(keys, dtype=np.int64).reshape(-1)
        out = np.zeros((keys.shape[0], self.dim), dtype=np.float32)
        found = np.zeros(keys.shape[0], dtype=bool)
        with self.lock:
            size = self.data_path.stat().st_size
            n = size // self.record_bytes
            if n == 0:
                return out, found
            raw = np.memmap(
                self.data_path, dtype=np.uint8, mode="r", shape=(n * self.record_bytes,)
            )
            recs = raw.reshape(n, self.record_bytes)
            rows = np.fromiter(
                (self.index.get(int(k), -1) for k in keys), dtype=np.int64, count=len(keys)
            )
            hit = rows >= 0
            if hit.any():
                sel = recs[rows[hit], 8:]
                out[hit] = sel.copy().view("<f4").reshape(-1, self.dim)
                found[hit] = True
        return out, found

    def compact(self):
        """Rewrite the log keeping only live records."""
        with self.lock:
            size = self.data_path.stat().st_size
            n = size // self.record_bytes
            if n == 0 or n == len(self.index):
                return
            raw = np.memmap(
                self.data_path, dtype=np.uint8, mode="r", shape=(n * self.record_bytes,)
            )
            recs = raw.reshape(n, self.record_bytes)
            live = np.fromiter(self.index.values(), dtype=np.int64, count=len(self.index))
            live.sort()
            kept = recs[live].copy()
            del raw, recs
            tmp = self.data_path.with_suffix(".log.tmp")
            tmp.write_bytes(kept.tobytes())
            os.replace(tmp, self.data_path)
        self._scan()


class SsdKVTier(KVTier):
    def __init__(self, params: PersistentDatabaseParams | None = None, path: str | None = None):
        self.params = params or PersistentDatabaseParams()
        self.root = Path(path or self.params.path)
        self.root.mkdir(parents=True, exist_ok=True)
        self._logs: dict[str, _TableLog] = {}
        self._lock = threading.Lock()
        # Reopen existing tables (durable across restarts, like RocksDB).
        for d in self.root.iterdir():
            if (d / "meta.json").exists():
                tag = d.name
                self._logs[tag] = _TableLog(self.root, tag, 0, self.params.read_only)

    def _norm(self, tag: str) -> str:
        return tag.replace("/", "_")

    def create_table(self, tag: str, dim: int) -> None:
        tag = self._norm(tag)
        with self._lock:
            if tag not in self._logs:
                self._logs[tag] = _TableLog(self.root, tag, dim, self.params.read_only)

    def drop_table(self, tag: str) -> None:
        tag = self._norm(tag)
        with self._lock:
            log = self._logs.pop(tag, None)
        if log is not None:
            import shutil

            shutil.rmtree(log.dir, ignore_errors=True)

    def tables(self) -> list[str]:
        return list(self._logs.keys())

    def insert(self, tag: str, keys: np.ndarray, vectors: np.ndarray) -> int:
        tag = self._norm(tag)
        if tag not in self._logs:
            self.create_table(tag, int(np.asarray(vectors).reshape(len(keys), -1).shape[1]))
        return self._logs[tag].insert(keys, vectors)

    def query(self, tag: str, keys: np.ndarray):
        return self._logs[self._norm(tag)].query(keys)

    def size(self, tag: str) -> int:
        return len(self._logs[self._norm(tag)].index)

    def keys(self, tag: str) -> np.ndarray:
        idx = self._logs[self._norm(tag)].index
        return np.fromiter(idx.keys(), dtype=np.int64, count=len(idx))

    def compact(self) -> None:
        for log in self._logs.values():
            log.compact()
