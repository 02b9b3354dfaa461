from lemas_tts_tpu.cfm.sampler import (
    SamplerSettings,
    sway_time_grid,
    compute_sway_max,
    sample_mel,
    make_sampler,
    pick_bucket,
    DURATION_BUCKETS,
)

__all__ = [
    "SamplerSettings",
    "sway_time_grid",
    "compute_sway_max",
    "sample_mel",
    "make_sampler",
    "pick_bucket",
    "DURATION_BUCKETS",
]
