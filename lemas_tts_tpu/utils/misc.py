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
