from hugectr_backend_tpu.lookup.session import LookupSession

__all__ = ["LookupSession"]
