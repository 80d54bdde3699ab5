from hugectr_backend_tpu.models.dlrm import DLRM
from hugectr_backend_tpu.models.wdl import WideAndDeep
from hugectr_backend_tpu.models.dcn import DCNv2
from hugectr_backend_tpu.models.din import DIN
from hugectr_backend_tpu.models.deepfm import DeepFM
from hugectr_backend_tpu.models.xdeepfm import XDeepFM
from hugectr_backend_tpu.models.ncf import NCF
from hugectr_backend_tpu.models.two_tower import TwoTowerUser
from hugectr_backend_tpu.models.bst import BST
from hugectr_backend_tpu.models.mmoe import MMoE

__all__ = ["DLRM", "WideAndDeep", "DCNv2", "DIN", "DeepFM", "XDeepFM", "NCF", "TwoTowerUser", "BST", "MMoE"]
