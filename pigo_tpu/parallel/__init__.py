from pigo_tpu.parallel.mesh import make_mesh
from pigo_tpu.parallel.sharded import ShardedFaceCascade

__all__ = ["make_mesh", "ShardedFaceCascade"]
