"""Conditional-flow-matching sampler as one jitted XLA program.

This replaces the reference's dynamic-Python hot loop (torchdiffeq ``odeint``
calling a stateful nn.Module with a mutable text cache,
``cfm.py:206-473`` + ``dit.py:213-222``) with a pure function:

 - text embeddings (cond & uncond CFG variants) are computed **once** before
   the ODE loop and carried as constants — no cache, no data race;
 - the cond and uncond CFG passes run as **one batched forward** over a 2B
   stacked batch (equivalent to the two calls at ``cfm.py:393-417``);
 - the NFE Euler steps are a ``lax.scan`` over a host-precomputed sway-warped
   time grid (``cfm.py:445-456``);
 - speech editing is first-class: ``cond_mask`` is the per-frame keep mask
   (``lens_to_mask & edit_mask``, ``cfm.py:293-295``) and kept frames are
   bit-exactly pasted back at the end (``cfm.py:461``);
 - shapes are static: callers pad durations to a bucket length so XLA compiles
   a bounded set of programs.

Numerics mirror the reference step for step: CFG scale ``cfg_strength*(1-t)^2``
then velocity clamp ±20 (``cfm.py:420-424``), sway bound ``compute_sway_max``
(``cfm.py:343-373``), sway warp ``t**(1+coef)`` (``cfm.py:451``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lemas_tts_tpu.utils.masks import lens_to_mask

# Duration buckets (mel frames): bounded recompilation, ≤4096 ≈ 44 s
# (reference hard cap, ``cfm.py:215,304``).
DURATION_BUCKETS = (256, 512, 768, 1024, 1536, 2048, 3072, 4096)


def pick_bucket(duration: int, buckets=DURATION_BUCKETS) -> int:
    for b in buckets:
        if duration <= b:
            return b
    return buckets[-1]


def compute_sway_max(
    steps: int,
    t_start: float = 0.0,
    min_ratio: float = 1e-9,
    safety_factor: float = 0.7,
) -> float:
    """Safe upper bound for the sway coefficient (reference ``cfm.py:343-373``
    with the arguments used at the ``sample`` call site, ``cfm.py:447``)."""
    assert 0.0 <= t_start < 1.0
    dt = (1.0 - t_start) / max(1, steps)
    if dt >= 0.9:
        p_max = 11.0
    else:
        p_max = math.log(min_ratio) / math.log(dt)
    return max(0.0, p_max - 1.0) * safety_factor


def resolve_sway_coef(
    steps: int,
    sway_sampling_coef: Optional[float],
    t_start: float = 0.0,
) -> float:
    """The effective sway coefficient: clamped to ``compute_sway_max`` and
    defaulting to it when None (``cfm.py:447-453``)."""
    sway_max = compute_sway_max(steps, t_start=t_start)
    coef = sway_max if sway_sampling_coef is None else min(sway_max, float(sway_sampling_coef))
    # coef < -1 would make the exponent negative: 0**(1+coef) = inf → NaN
    # mel. coef == -1 (the gradio slider minimum) degenerates to an all-ones
    # grid in the reference too; we only guard the NaN region below it.
    return max(coef, -1.0)


def warped_time_grid(steps: int, coef: float, t_start: float = 0.0) -> np.ndarray:
    """[steps+1] grid ``linspace(t_start,1)**(1+coef)`` for an already
    resolved coefficient (no clamping — distillation builds nested
    fine/coarse grids with ONE shared exponent)."""
    t = np.linspace(t_start, 1.0, steps + 1, dtype=np.float64)
    return (t ** (1.0 + coef)).astype(np.float32)


def sway_time_grid(
    steps: int,
    sway_sampling_coef: Optional[float],
    t_start: float = 0.0,
) -> np.ndarray:
    """Warped time grid [steps+1] with the coefficient resolved per
    :func:`resolve_sway_coef`."""
    coef = resolve_sway_coef(steps, sway_sampling_coef, t_start=t_start)
    return warped_time_grid(steps, coef, t_start=t_start)


@dataclass(frozen=True)
class SamplerSettings:
    """Static sampler configuration (hashable: becomes part of the jit key)."""

    steps: int = 32
    cfg_strength: float = 2.0
    sway_sampling_coef: Optional[float] = None
    t_start: float = 0.0
    velocity_clamp: float = 20.0
    return_trajectory: bool = False
    # "euler" matches the reference (cfm.py:456 odeint(..., "euler"));
    # "midpoint" is a 2nd-order option: 2 velocity evals per step, so
    # midpoint@K costs the same as euler@2K but integrates more accurately
    # on the same budget. No reference equivalent.
    method: str = "euler"
    # CFG truncation (opt-in, no reference equivalent): the CFG scale
    # ``cfg_strength·(1−t)²`` (cfm.py:420) decays to ~0 along the trajectory,
    # yet the uncond half of the batched forward is paid on every step. When
    # set, steps whose cfg_t falls below this threshold run the cond pass
    # only (still ±clamped). The split is static — the time grid is a
    # compile-time constant — so it costs zero dynamic branching.
    cfg_cutoff: Optional[float] = None

    def __post_init__(self):
        if self.method not in ("euler", "midpoint"):
            raise ValueError(f"unknown ODE method: {self.method!r}")

    @property
    def use_cfg(self) -> bool:
        return self.cfg_strength >= 1e-5

    def cfg_active_steps(self, time_grid) -> int:
        """Number of leading ODE steps that run the 2-pass CFG forward.
        cfg_t is monotone-decreasing in t, so the active steps are a prefix.
        Requires a concrete (non-traced) time grid."""
        steps = len(time_grid) - 1
        if not self.use_cfg:
            return 0
        if self.cfg_cutoff is None:
            return steps
        if isinstance(time_grid, jax.core.Tracer):
            # the CFG prefix split is static program structure — it cannot
            # depend on a traced grid. Fail loudly instead of letting
            # np.asarray raise an opaque TracerArrayConversionError.
            raise TypeError(
                "cfg_cutoff requires a concrete (non-traced) time_grid: "
                "pass it as a numpy array / jit-static argument, or use "
                "make_sampler (which closes over the grid)"
            )
        ts = np.asarray(time_grid)[:-1]
        cfg_t = self.cfg_strength * np.square(1.0 - ts)
        return int(np.sum(cfg_t >= self.cfg_cutoff))


def sample_mel(
    model: Any,  # DiT flax module
    params: Any,
    *,
    cond: jax.Array,  # [B, N, D] cond mel, zero-padded to bucket N
    cond_mask: jax.Array,  # [B, N] keep mask (True = frame is given/kept)
    text_ids: jax.Array,  # [B, nt] -1-padded token ids
    duration: jax.Array,  # [B] total frames per sample (≤ N)
    y0: jax.Array,  # [B, N, D] initial noise
    time_grid: jax.Array,  # [steps+1] warped times
    settings: SamplerSettings,
    step_cond: Optional[jax.Array] = None,  # alt cond for the ODE (GRL shuffle)
    prosody_text: Optional[jax.Array] = None,  # [B, T_text, 512]
    text_embed_pair: Optional[tuple] = None,  # precomputed (te_cond, te_uncond)
    attn_mask_override: Optional[jax.Array] = None,  # [B, N] (seq-parallel)
) -> jax.Array:
    """Run the Euler CFG flow from noise to mel. Returns [B, N, D] with kept
    frames pasted from ``cond`` (plus trajectory if requested).

    ``text_embed_pair``/``attn_mask_override`` let a sequence-parallel caller
    (``parallel/sequence``) precompute the full-sequence text embeddings and
    the global attention mask outside ``shard_map`` and pass them in sharded
    — everything else in this function is shard-local math."""
    B, N, D = cond.shape
    keep = cond_mask[..., None]

    if step_cond is None:
        step_cond = cond
    step_cond = jnp.where(keep, step_cond, 0.0)

    if attn_mask_override is not None:
        attn_mask = attn_mask_override
    else:
        attn_mask = lens_to_mask(duration, N)  # [B, N]
    # Reference pads per-sample noise with zeros to the batch max duration
    # (``cfm.py:430-435`` pad_sequence(..., padding_value=0)).
    y0 = jnp.where(attn_mask[..., None], y0, 0.0)

    # Text embeddings for both CFG branches, computed once (replaces the
    # reference's mutable cache).
    if text_embed_pair is not None:
        te_cond = text_embed_pair[0]
    else:
        te_cond = model.apply(params, text_ids, N, False, method=model.embed_text)

    def velocity_cond_only(t, x, clamp):
        # single cond pass; the no-CFG path skips the clamp on purpose (the
        # reference's early return at cfm.py:405 exits BEFORE the ±20 clamp
        # at :424) while the cfg_cutoff tail keeps it (it replaces a clamped
        # CFG step whose uncond term has decayed to ~0)
        v = model.apply(
            params, x, step_cond, None, jnp.broadcast_to(t, (B,)), attn_mask,
            text_embed=te_cond, prosody_text=prosody_text,
        )
        if clamp:
            v = jnp.clip(v, -settings.velocity_clamp, settings.velocity_clamp)
        return v

    if settings.use_cfg:
        if text_embed_pair is not None:
            te_uncond = text_embed_pair[1]
            assert te_uncond is not None, "CFG needs the uncond text embed"
        else:
            te_uncond = model.apply(params, text_ids, N, True,
                                    method=model.embed_text)
        te2 = jnp.concatenate([te_cond, te_uncond], axis=0)
        cond2 = jnp.concatenate([step_cond, jnp.zeros_like(step_cond)], axis=0)
        mask2 = jnp.concatenate([attn_mask, attn_mask], axis=0)
        pt2 = (
            None
            if prosody_text is None
            else jnp.concatenate([prosody_text, prosody_text], axis=0)
        )

        def velocity(t, x):
            x2 = jnp.concatenate([x, x], axis=0)
            pred2 = model.apply(
                params, x2, cond2, None, jnp.broadcast_to(t, (2 * B,)), mask2,
                text_embed=te2, prosody_text=pt2,
            )
            pred, null_pred = pred2[:B], pred2[B:]
            cfg_t = settings.cfg_strength * jnp.square(1.0 - t)
            v = pred + (pred - null_pred) * cfg_t
            return jnp.clip(v, -settings.velocity_clamp, settings.velocity_clamp)

    else:

        def velocity(t, x):
            return velocity_cond_only(t, x, clamp=False)

    t_pairs = jnp.stack([time_grid[:-1], time_grid[1:] - time_grid[:-1]], axis=1)

    def make_ode_step(vel):
        if settings.method == "midpoint":

            def ode_step(y, t_dt):
                t, dt = t_dt[0], t_dt[1]
                half = 0.5 * dt
                y_mid = y + half * vel(t, y)
                y_next = y + dt * vel(t + half, y_mid)
                return y_next, (y_next if settings.return_trajectory else None)

        else:

            def ode_step(y, t_dt):
                t, dt = t_dt[0], t_dt[1]
                y_next = y + dt * vel(t, y)
                return y_next, (y_next if settings.return_trajectory else None)

        return ode_step

    k = settings.cfg_active_steps(time_grid)
    steps = t_pairs.shape[0]
    if settings.use_cfg and k < steps:
        # static CFG truncation: prefix scan with the 2-pass CFG velocity,
        # tail scan with the (clamped) cond-only velocity
        y_mid_state, traj_a = jax.lax.scan(
            make_ode_step(velocity), y0.astype(jnp.float32), t_pairs[:k])
        y_final, traj_b = jax.lax.scan(
            make_ode_step(lambda t, x: velocity_cond_only(t, x, clamp=True)),
            y_mid_state, t_pairs[k:])
        traj = (
            None if not settings.return_trajectory
            else jnp.concatenate([traj_a, traj_b], axis=0)
        )
    else:
        y_final, traj = jax.lax.scan(
            make_ode_step(velocity), y0.astype(jnp.float32), t_pairs)

    out = jnp.where(keep, cond, y_final)  # bit-exact paste of kept frames
    if settings.return_trajectory:
        return out, traj
    return out


def make_sampler(model: Any, settings: SamplerSettings):
    """Build a jitted sampler closure over a model definition.

    Returns ``fn(params, cond, cond_mask, text_ids, duration, y0,
    step_cond=None, prosody_text=None)``; the sway time grid is folded in as a
    constant. Each (bucket-N, text-len) shape pair compiles once.
    """
    time_grid = jnp.asarray(sway_time_grid(settings.steps, settings.sway_sampling_coef,
                                           settings.t_start))

    @partial(jax.jit, static_argnames=())
    def run(params, cond, cond_mask, text_ids, duration, y0,
            step_cond=None, prosody_text=None):
        return sample_mel(
            model,
            params,
            cond=cond,
            cond_mask=cond_mask,
            text_ids=text_ids,
            duration=duration,
            y0=y0,
            time_grid=time_grid,
            settings=settings,
            step_cond=step_cond,
            prosody_text=prosody_text,
        )

    return run
