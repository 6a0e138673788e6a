from .mesh import make_mesh, batch_sharding, replicated, MeshAxes

__all__ = ["make_mesh", "batch_sharding", "replicated", "MeshAxes"]
