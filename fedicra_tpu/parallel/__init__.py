from .mesh import batch_sharding, client_sharding, make_mesh, replicated

__all__ = ["batch_sharding", "client_sharding", "make_mesh", "replicated"]
