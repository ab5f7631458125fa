from crosstalk_tpu.parallel.distributed import (
    allgather_to_host,
    initialize,
    is_primary,
    make_global_batch,
    process_row_slice,
)
from crosstalk_tpu.parallel.mesh import data_mesh, maybe_data_mesh

__all__ = [
    "data_mesh",
    "maybe_data_mesh",
    "initialize",
    "is_primary",
    "process_row_slice",
    "make_global_batch",
    "allgather_to_host",
]
