from nimble_tpu.parallel.mesh import MeshPlan, make_mesh, shard_tables

__all__ = ["MeshPlan", "make_mesh", "shard_tables"]
