from adaflo_tpu.fe.basis import (
    LagrangeBasis1D,
    gauss_lobatto_points,
    gauss_quadrature,
)
from adaflo_tpu.fe.space import ScalarSpace

__all__ = [
    "LagrangeBasis1D",
    "gauss_lobatto_points",
    "gauss_quadrature",
    "ScalarSpace",
]
