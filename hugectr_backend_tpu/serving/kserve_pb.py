"""Lazy protoc codegen for the KServe v2 gRPC protocol messages.

The generated module is cached next to the .proto and regenerated whenever
the .proto is newer (same lazy-build pattern as native/kvstore.py for the
C++ store). Only message codegen is needed — the service itself is wired by
hand in grpc_server.py via grpc generic method handlers, so grpcio-tools is
not required (it is not in this image; plain ``protoc`` is).
"""

from __future__ import annotations

import importlib.util
import pathlib
import subprocess
import threading

_HERE = pathlib.Path(__file__).resolve().parent
_PROTO = _HERE / "kserve_v2.proto"
_GEN = _HERE / "_gen"
_PB2 = _GEN / "kserve_v2_pb2.py"
_lock = threading.Lock()
_module = None

# Full service name clients address RPCs to (tritonclient.grpc compatible).
SERVICE_NAME = "inference.GRPCInferenceService"


def _generate():
    import os
    import tempfile

    _GEN.mkdir(exist_ok=True)
    (_GEN / "__init__.py").touch()
    # Generate into a private temp dir and publish with an atomic rename:
    # two processes regenerating concurrently must never load a
    # half-written pb2. Surface protoc's stderr on failure — a bare
    # CalledProcessError hides the actual parse error.
    with tempfile.TemporaryDirectory(dir=_GEN) as tmp:
        proc = subprocess.run(
            ["protoc", f"-I{_HERE}", f"--python_out={tmp}", _PROTO.name],
            cwd=_HERE,
            capture_output=True,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"protoc failed for {_PROTO.name}:\n"
                f"{proc.stderr.decode(errors='replace')}"
            )
        os.replace(pathlib.Path(tmp) / _PB2.name, _PB2)


def load():
    """Return the generated kserve_v2_pb2 module (codegen on first use)."""
    global _module
    if _module is not None:
        return _module
    with _lock:
        if _module is not None:
            return _module
        if not _PB2.exists() or _PB2.stat().st_mtime <= _PROTO.stat().st_mtime:
            _generate()
        spec = importlib.util.spec_from_file_location("kserve_v2_pb2", _PB2)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _module = mod
        return mod
