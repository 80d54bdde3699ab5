from hugectr_backend_tpu.tiers.hbm import DeviceTable, KeyIndex

__all__ = ["DeviceTable", "KeyIndex"]
