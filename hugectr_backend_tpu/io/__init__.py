from hugectr_backend_tpu.io.sparse_model import (
    SparseModelTable,
    read_sparse_model,
    write_sparse_model,
)
from hugectr_backend_tpu.io.synthetic import make_synthetic_table

__all__ = [
    "SparseModelTable",
    "read_sparse_model",
    "write_sparse_model",
    "make_synthetic_table",
]
