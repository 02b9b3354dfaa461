"""Misc model utilities (reference ``model/utils.py:18-25,182-190``)."""

from __future__ import annotations

import random
from collections import defaultdict

import numpy as np


def seed_everything(seed: int = 0) -> "jax.Array":  # noqa: F821
    """Seed python/numpy RNGs and return a jax PRNG key (the JAX analogue of
    the reference's global ``torch.manual_seed`` cascade)."""
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.key(seed)


def repetition_found(text: str, length: int = 2, tolerance: int = 10) -> bool:
    """True when any character or any ``length``-gram repeats more than
    ``tolerance`` times — the reference uses this to reject degenerate ASR
    transcripts (``model/utils.py:182-190``)."""
    pattern_count: dict = defaultdict(int)
    for i in range(len(text) - length + 1):
        pattern_count[text[i : i + length]] += 1
    for pattern, count in pattern_count.items():
        if count > tolerance:
            return True
    return False


def fast_random_params(init_fn, key, scale: float = 0.02,
                       dtype=None) -> "jax.Array":  # noqa: F821
    """Random param pytree with the shapes of ``init_fn(key)``, generated
    on-device in ONE jitted program.

    Running a flax ``model.init`` through the benchmarking tunnel costs
    minutes (every intermediate init op is dispatched host-side); sampling
    normals directly into the abstract shapes costs milliseconds and is
    exactly as good for weight-independent RTF / kernel-numerics checks."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(init_fn, jax.random.key(0))
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def gen(k):
        ks = jax.random.split(k, len(leaves))
        return treedef.unflatten(
            [jax.random.normal(kk, l.shape, dtype or l.dtype or jnp.float32)
             * scale for kk, l in zip(ks, leaves)]
        )

    return jax.block_until_ready(gen(key))


def enable_compile_cache(path: str | None = None,
                         min_compile_seconds: float = 1.0) -> str | None:
    """Turn on JAX's persistent compilation cache so server restarts reuse
    yesterday's XLA binaries instead of recompiling every shape bucket
    (first TPU compiles run tens of seconds; no reference counterpart —
    torch has no AOT compile step).

    ``path`` defaults to the ``LEMAS_COMPILE_CACHE`` env var; returns the
    cache dir in use, or None if disabled (no path configured).
    """
    import os

    import jax

    path = path or os.environ.get("LEMAS_COMPILE_CACHE")
    if not path:
        return None
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_seconds)
    return path
