"""Shared Pallas kernel plumbing.

``resolve_interpret`` is the single policy for when the fused TPU kernels run
in Pallas interpreter mode: callers pass ``interpret=None`` (the default) and
the kernels self-select — compiled Mosaic on TPU, interpreter everywhere else
(CPU CI, the 8-device virtual mesh). This lets the model code enable the
``vmem`` backend unconditionally in tests without monkeypatching, while still
honoring an explicit True/False for targeted parity tests.
"""

from __future__ import annotations

from functools import lru_cache


@lru_cache(maxsize=1)
def _on_tpu() -> bool:
    import jax

    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return plat in ("tpu", "axon")


def resolve_interpret(interpret: bool | None) -> bool:
    if interpret is not None:
        return interpret
    return not _on_tpu()
