"""ctypes binding for the native DRAM KV store (kvstore.cpp).

Drop-in for :class:`hugectr_backend_tpu.tiers.dram.DramKVTier` with identical
semantics; selected automatically by ``make_dram_tier`` when the shared
library is built (``make -C hugectr_backend_tpu/native``). The build is also
attempted lazily here (a few seconds, once).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

from hugectr_backend_tpu.config.params import (
    DatabaseOverflowPolicy,
    VolatileDatabaseParams,
)
from hugectr_backend_tpu.tiers.base import KVTier

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libhps_native.so"
_POLICY_CODE = {
    DatabaseOverflowPolicy.EVICT_RANDOM: 0,
    DatabaseOverflowPolicy.EVICT_LEAST_USED: 1,
    DatabaseOverflowPolicy.EVICT_OLDEST: 2,
}

_lib = None
_lib_lock = threading.Lock()


def _build_lib() -> None:
    subprocess.run(
        ["make", "-C", str(_DIR), "-s"],
        check=True,
        capture_output=True,
        timeout=120,
    )


def _lib_stale() -> bool:
    """True when any .cpp in the native dir is newer than the built .so —
    loading a stale binary after a source edit can segfault on changed
    struct layouts / missing guards."""
    if not _LIB_PATH.exists():
        return True
    so_mtime = _LIB_PATH.stat().st_mtime
    return any(p.stat().st_mtime > so_mtime for p in _DIR.glob("*.cpp"))


def load_lib() -> ctypes.CDLL:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _lib_stale():
            _build_lib()
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.hps_kv_create.restype = ctypes.c_void_p
        lib.hps_kv_create.argtypes = [
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_uint64,
            ctypes.c_int,
            ctypes.c_double,
        ]
        lib.hps_kv_destroy.argtypes = [ctypes.c_void_p]
        lib.hps_kv_insert.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.hps_kv_query.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.hps_kv_evict.restype = ctypes.c_int64
        lib.hps_kv_evict.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.hps_kv_size.restype = ctypes.c_int64
        lib.hps_kv_size.argtypes = [ctypes.c_void_p]
        lib.hps_kv_keys.restype = ctypes.c_int64
        lib.hps_kv_keys.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        _lib = lib
        return lib


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class _NativeTable:
    def __init__(self, lib, dim: int, params: VolatileDatabaseParams):
        self.lib = lib
        self.dim = dim
        self.handle = lib.hps_kv_create(
            dim,
            params.effective_num_partitions(),
            min(params.overflow_margin, 2**63 - 1),
            _POLICY_CODE[params.overflow_policy],
            params.overflow_resolution_target,
        )

    def __del__(self):
        try:
            self.lib.hps_kv_destroy(self.handle)
        except Exception:
            pass


class NativeDramKVTier(KVTier):
    def __init__(self, params: Optional[VolatileDatabaseParams] = None):
        self.params = params or VolatileDatabaseParams()
        self.lib = load_lib()
        self._tables: dict[str, _NativeTable] = {}
        self._lock = threading.Lock()

    def create_table(self, tag: str, dim: int) -> None:
        with self._lock:
            if tag in self._tables:
                if self._tables[tag].dim != dim:
                    raise ValueError(
                        f"table {tag} exists with dim {self._tables[tag].dim}, "
                        f"requested {dim}"
                    )
                return
            self._tables[tag] = _NativeTable(self.lib, dim, self.params)

    def drop_table(self, tag: str) -> None:
        with self._lock:
            self._tables.pop(tag, None)

    def tables(self) -> list[str]:
        return list(self._tables.keys())

    def insert(self, tag: str, keys: np.ndarray, vectors: np.ndarray) -> int:
        keys = np.ascontiguousarray(keys, dtype=np.int64).reshape(-1)
        vectors = np.ascontiguousarray(vectors, dtype=np.float32).reshape(
            keys.shape[0], -1
        )
        if tag not in self._tables:
            self.create_table(tag, int(vectors.shape[1]))
        t = self._tables[tag]
        if vectors.shape[1] != t.dim:
            raise ValueError(f"dim mismatch: table {t.dim}, vectors {vectors.shape[1]}")
        self.lib.hps_kv_insert(t.handle, keys.shape[0], _i64p(keys), _f32p(vectors))
        return int(keys.shape[0])

    def query(self, tag: str, keys: np.ndarray):
        keys = np.ascontiguousarray(keys, dtype=np.int64).reshape(-1)
        t = self._tables[tag]
        out = np.empty((keys.shape[0], t.dim), dtype=np.float32)
        found = np.empty(keys.shape[0], dtype=np.uint8)
        self.lib.hps_kv_query(
            t.handle, keys.shape[0], _i64p(keys), _f32p(out), _u8p(found)
        )
        return out, found.astype(bool)

    def evict(self, tag: str, keys: np.ndarray) -> int:
        keys = np.ascontiguousarray(keys, dtype=np.int64).reshape(-1)
        t = self._tables[tag]
        return int(self.lib.hps_kv_evict(t.handle, keys.shape[0], _i64p(keys)))

    def size(self, tag: str) -> int:
        return int(self.lib.hps_kv_size(self._tables[tag].handle))

    def keys(self, tag: str) -> np.ndarray:
        t = self._tables[tag]
        n = self.size(tag)
        out = np.empty(max(n, 1), dtype=np.int64)
        w = self.lib.hps_kv_keys(t.handle, _i64p(out), n)
        return out[:w]


# ---------------------------------------------------------------------------
# multi-process shared-memory store (shm_kvstore.cpp)
# ---------------------------------------------------------------------------


def _bind_shm(lib: ctypes.CDLL) -> ctypes.CDLL:
    if getattr(lib, "_shm_bound", False):
        return lib
    lib.hps_shmkv_open.restype = ctypes.c_void_p
    lib.hps_shmkv_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_double, ctypes.c_int,
    ]
    lib.hps_shmkv_close.argtypes = [ctypes.c_void_p]
    lib.hps_shmkv_unlink.restype = ctypes.c_int
    lib.hps_shmkv_unlink.argtypes = [ctypes.c_char_p]
    lib.hps_shmkv_insert.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
    ]
    lib.hps_shmkv_query.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.hps_shmkv_evict.restype = ctypes.c_int64
    lib.hps_shmkv_evict.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
    ]
    lib.hps_shmkv_size.restype = ctypes.c_int64
    lib.hps_shmkv_size.argtypes = [ctypes.c_void_p]
    lib.hps_shmkv_capacity.restype = ctypes.c_int64
    lib.hps_shmkv_capacity.argtypes = [ctypes.c_void_p]
    lib.hps_shmkv_keys.restype = ctypes.c_int64
    lib.hps_shmkv_keys.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib._shm_bound = True
    return lib


def _shm_segment_name(base: str, tag: str) -> str:
    safe = "".join(c if c.isalnum() or c in "._-" else "_" for c in tag)
    return f"/{base.lstrip('/')}.{safe}"[:250]


class _ShmTable:
    def __init__(self, lib, name: str, dim: int, params: VolatileDatabaseParams):
        self.lib = lib
        self.name = name
        self.dim = dim
        # Capacity from the shared-memory budget: rows + index overhead
        # (~dim*4 + 44 bytes/row + 2x hash slots of 12B) — the reference sizes
        # the map from `shared_memory_size` the same way (doc:417-421).
        row_bytes = dim * 4 + 44 + 24
        budget_rows = max(int(params.shared_memory_size) // row_bytes, 16)
        cap = min(budget_rows, int(min(params.overflow_margin, 2**62)))
        self.handle = lib.hps_shmkv_open(
            name.encode(), dim, params.effective_num_partitions(),
            cap, _POLICY_CODE[params.overflow_policy],
            params.overflow_resolution_target, 1,
        )
        if not self.handle:
            raise OSError(
                f"failed to open shared-memory segment {name} "
                f"(geometry mismatch with an existing segment?)"
            )

    def close(self, unlink: bool):
        if self.handle:
            self.lib.hps_shmkv_close(self.handle)
            self.handle = None
        if unlink:
            self.lib.hps_shmkv_unlink(self.name.encode())

    def __del__(self):
        try:
            if self.handle:
                self.lib.hps_shmkv_close(self.handle)
        except Exception:
            pass


class SharedMemoryDramKVTier(KVTier):
    """`multi_process_hash_map` parity: one /dev/shm segment per table,
    shared by every serving process on the host (reference
    docs/hierarchical_parameter_server.md:404,417-421). Config keys honored:
    `shared_memory_size` (capacity budget), `shared_memory_name` (segment
    prefix), `shared_memory_auto_remove` (unlink on drop/close)."""

    def __init__(self, params: Optional[VolatileDatabaseParams] = None):
        self.params = params or VolatileDatabaseParams()
        self.lib = _bind_shm(load_lib())
        self._tables: dict[str, _ShmTable] = {}
        self._lock = threading.Lock()

    def create_table(self, tag: str, dim: int) -> None:
        with self._lock:
            if tag in self._tables:
                if self._tables[tag].dim != dim:
                    raise ValueError(
                        f"table {tag} exists with dim {self._tables[tag].dim}, "
                        f"requested {dim}"
                    )
                return
            name = _shm_segment_name(self.params.shared_memory_name, tag)
            self._tables[tag] = _ShmTable(self.lib, name, dim, self.params)

    def drop_table(self, tag: str) -> None:
        with self._lock:
            t = self._tables.pop(tag, None)
            if t is not None:
                t.close(unlink=self.params.shared_memory_auto_remove)

    def tables(self) -> list[str]:
        return list(self._tables.keys())

    def insert(self, tag: str, keys: np.ndarray, vectors: np.ndarray) -> int:
        keys = np.ascontiguousarray(keys, dtype=np.int64).reshape(-1)
        vectors = np.ascontiguousarray(vectors, dtype=np.float32).reshape(
            keys.shape[0], -1
        )
        if tag not in self._tables:
            self.create_table(tag, int(vectors.shape[1]))
        t = self._tables[tag]
        if vectors.shape[1] != t.dim:
            raise ValueError(
                f"dim mismatch: table {t.dim}, vectors {vectors.shape[1]}"
            )
        self.lib.hps_shmkv_insert(
            t.handle, keys.shape[0], _i64p(keys), _f32p(vectors)
        )
        return int(keys.shape[0])

    def query(self, tag: str, keys: np.ndarray):
        keys = np.ascontiguousarray(keys, dtype=np.int64).reshape(-1)
        t = self._tables[tag]
        out = np.empty((keys.shape[0], t.dim), dtype=np.float32)
        found = np.empty(keys.shape[0], dtype=np.uint8)
        self.lib.hps_shmkv_query(
            t.handle, keys.shape[0], _i64p(keys), _f32p(out), _u8p(found)
        )
        return out, found.astype(bool)

    def evict(self, tag: str, keys: np.ndarray) -> int:
        keys = np.ascontiguousarray(keys, dtype=np.int64).reshape(-1)
        t = self._tables[tag]
        return int(self.lib.hps_shmkv_evict(t.handle, keys.shape[0], _i64p(keys)))

    def size(self, tag: str) -> int:
        return int(self.lib.hps_shmkv_size(self._tables[tag].handle))

    def capacity(self, tag: str) -> int:
        return int(self.lib.hps_shmkv_capacity(self._tables[tag].handle))

    def keys(self, tag: str) -> np.ndarray:
        t = self._tables[tag]
        n = self.size(tag)
        out = np.empty(max(n, 1), dtype=np.int64)
        w = self.lib.hps_shmkv_keys(t.handle, _i64p(out), n)
        return out[:w]

    def close(self) -> None:
        with self._lock:
            for t in self._tables.values():
                t.close(unlink=self.params.shared_memory_auto_remove)
            self._tables.clear()


def batch_translate_args(handles, keys_list, miss_slots):
    """Marshal the shared argument layout of the `*_translate_batch` C calls
    (per-table handle/count/key-pointer/out-pointer/miss arrays).

    -> (out_arrays, argtuple, keepalive): pass ``*argtuple`` to the C call
    (it covers every parameter up to and including the miss pointer) and
    hold ``keepalive`` until it returns (it owns the counts/miss numpy
    buffers the pointers reference).
    """
    n = len(handles)
    keys_c = [np.ascontiguousarray(k, np.int64).reshape(-1) for k in keys_list]
    outs = [np.empty(k.shape[0], np.int32) for k in keys_c]
    h = (ctypes.c_void_p * n)(*handles)
    counts = np.array([k.shape[0] for k in keys_c], np.int64)
    miss = np.asarray(miss_slots, np.int32)
    kp = (ctypes.POINTER(ctypes.c_int64) * n)(
        *[k.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)) for k in keys_c]
    )
    op = (ctypes.POINTER(ctypes.c_int32) * n)(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for o in outs]
    )
    args = (
        n, h,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        kp, op,
        miss.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return outs, args, (keys_c, counts, miss)
