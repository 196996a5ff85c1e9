from adaflo_tpu.parallel.sharding import shard_solver_state, solver_mesh

__all__ = ["shard_solver_state", "solver_mesh"]
