from lemas_tts_tpu.cfm.sampler import (
    SamplerSettings,
    sway_time_grid,
    compute_sway_max,
    resolve_sway_coef,
    warped_time_grid,
    sample_mel,
    make_sampler,
    pick_bucket,
    DURATION_BUCKETS,
)

__all__ = [
    "SamplerSettings",
    "sway_time_grid",
    "compute_sway_max",
    "resolve_sway_coef",
    "warped_time_grid",
    "sample_mel",
    "make_sampler",
    "pick_bucket",
    "DURATION_BUCKETS",
    "Distiller",
    "DistillState",
    "student_sampler_settings",
]


def __getattr__(name):  # lazy: distill pulls in optax/trainer machinery
    if name in ("Distiller", "DistillState", "student_sampler_settings"):
        from lemas_tts_tpu.cfm import distill as _d

        return getattr(_d, name)
    raise AttributeError(name)
