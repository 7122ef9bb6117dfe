from tpu_audio.parallel.mesh import (
    make_mesh, partitioned_state_sharding, partitioned_shardings,
    shard_partitioned_step, shard_collapse,
    fmajor_shardings, shard_fmajor_step, shard_fmajor_collapse,
)

__all__ = [
    "make_mesh", "partitioned_state_sharding", "partitioned_shardings",
    "shard_partitioned_step", "shard_collapse",
    "fmajor_shardings", "shard_fmajor_step", "shard_fmajor_collapse",
]
