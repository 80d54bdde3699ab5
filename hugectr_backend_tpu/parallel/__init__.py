from hugectr_backend_tpu.parallel.mesh import make_mesh
from hugectr_backend_tpu.parallel.sharded_table import ShardedTable, sharded_lookup

__all__ = ["make_mesh", "ShardedTable", "sharded_lookup"]
