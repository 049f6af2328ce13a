"""Device-mesh sharding of the coaddition workload."""

from .mesh import make_mesh, sharded_stamp_solve  # noqa: F401
