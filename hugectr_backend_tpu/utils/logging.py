"""Structured logging, the TPU-side stand-in for HPS_TRITON_LOG
(reference hps_backend/include/triton_common.hpp:37-44)."""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def get_logger(name: str = "hps_tpu") -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        level = os.environ.get("HPS_TPU_LOG_LEVEL", "INFO").upper()
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(
            logging.Formatter(
                "%(asctime)s %(levelname).1s %(name)s: %(message)s", "%H:%M:%S"
            )
        )
        root = logging.getLogger("hps_tpu")
        root.addHandler(h)
        root.setLevel(level)
        _CONFIGURED = True
    return logging.getLogger(name)
