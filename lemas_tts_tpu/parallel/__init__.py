from lemas_tts_tpu.parallel.mesh import (
    make_mesh,
    dit_param_pspecs,
    batch_pspecs,
    shard_pytree,
    data_parallel_sampler,
)

__all__ = [
    "make_mesh",
    "dit_param_pspecs",
    "batch_pspecs",
    "shard_pytree",
    "data_parallel_sampler",
]
