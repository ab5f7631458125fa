from crosstalk_tpu.parallel.mesh import data_mesh, maybe_data_mesh

__all__ = ["data_mesh", "maybe_data_mesh"]
