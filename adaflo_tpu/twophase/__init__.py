from adaflo_tpu.twophase.level_set_okz import LevelSetOKZSolver

__all__ = ["LevelSetOKZSolver"]
