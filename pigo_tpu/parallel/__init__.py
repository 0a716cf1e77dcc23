from pigo_tpu.parallel.mesh import init_distributed, make_mesh
from pigo_tpu.parallel.sharded import ShardedFaceCascade

__all__ = ["init_distributed", "make_mesh", "ShardedFaceCascade"]
