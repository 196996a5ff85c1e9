from adaflo_tpu.mesh.structured import StructuredMesh

__all__ = ["StructuredMesh"]
