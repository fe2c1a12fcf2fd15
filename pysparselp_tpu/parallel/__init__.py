from .sharded_cp import build_sharded_cp_data, sharded_cp_chunk
from .mesh import default_mesh

__all__ = ["build_sharded_cp_data", "sharded_cp_chunk", "default_mesh"]
