from hugectr_backend_tpu.ps.parameter_server import HierParameterServer

__all__ = ["HierParameterServer"]
