from hugectr_backend_tpu.utils.timer import Timer
from hugectr_backend_tpu.utils.logging import get_logger

__all__ = ["Timer", "get_logger"]
