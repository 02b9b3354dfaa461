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
    # Block-range residual cache (opt-in, training-free — DeepCache/Δ-DiT
    # family; no reference equivalent): adjacent ODE steps produce similar
    # mid-stack activations, so on "refresh" steps the full stack runs and
    # the aggregate residual of blocks [lo, hi) is stored; on the other steps
    # that range is replaced by ONE cached add (skipped blocks' sequential
    # deltas telescope: x_hi = x_lo + Σ Δ_i = x_lo + cache). The schedule is
    # compile-time, so the NFE scan is segmented STATICALLY into periodic
    # regions (one scan iteration = refresh + (period−1) skip steps) — no
    # `lax.cond` anywhere, which also lets the cache compose with
    # sequence-parallel sampling (collectives are legal inside a scan body).
    # DiT-only, euler-only; measure the speed/quality trade with
    # ``scripts/blockcache_probe.py``.
    block_cache_range: Optional[tuple] = None  # (lo, hi) block indices
    # refresh period (1 ≡ exact, no skipping). COMPILE-TIME NOTE: the NFE
    # scan is segmented statically with the (period−1) skip steps UNROLLED
    # inside each scan body (_scan_block_cached), so a period near the NFE
    # count effectively fully unrolls the ODE loop — compile time grows
    # ~linearly with `every` (through a slow compile link that can be
    # minutes). The shipped specs use every ≤ 4; treat larger values as
    # probe-only.
    block_cache_every: int = 2
    # always-refresh windows at the trajectory's head/tail (steps, not
    # fractions): under the sway warp, dt grows along the trajectory, so the
    # cache is stalest late — a dense tail buys a longer base period at
    # equal error (measured in scripts/blockcache_probe.py)
    block_cache_warm_head: int = 0
    block_cache_warm_tail: int = 0

    def __post_init__(self):
        if self.method not in ("euler", "midpoint"):
            raise ValueError(f"unknown ODE method: {self.method!r}")
        if self.block_cache_range is not None:
            lo, hi = self.block_cache_range
            if not (0 <= lo < hi):
                raise ValueError(f"bad block_cache_range: {(lo, hi)}")
            if self.method != "euler":
                raise ValueError("block_cache_range requires method='euler'")
            if self.block_cache_every < 1:
                raise ValueError("block_cache_every must be >= 1")

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


def parse_block_cache(spec: Optional[str]):
    """Parse a block-cache spec string ``"lo-hi:every[+hN][+tN]"`` (e.g.
    ``"2-20:2"``, ``"2-20:3+t6"``) into ``((lo, hi), every, head, tail)``;
    ``None``/empty/"0"/"none" → None. ``+hN``/``+tN`` are always-refresh
    windows of N steps at the trajectory head/tail. The string form is what
    configs, CLIs, env knobs, and per-request serving overrides carry
    (compact, hashable, validates in one place)."""
    if not spec or str(spec).strip().lower() in ("0", "none", "off"):
        return None
    s = str(spec).strip()
    try:
        rng, _, rest = s.partition(":")
        lo, hi = (int(x) for x in rng.split("-"))
        parts = rest.split("+") if rest else [""]
        every = int(parts[0]) if parts[0] else 2
        head = tail = 0
        for p in parts[1:]:
            if p[:1] == "h":
                head = int(p[1:])
            elif p[:1] == "t":
                tail = int(p[1:])
            else:
                raise ValueError(p)
    except ValueError:
        raise ValueError(
            f"bad block_cache spec {spec!r} (want 'lo-hi:every[+hN][+tN]')")
    if not (0 <= lo < hi) or every < 1 or head < 0 or tail < 0:
        raise ValueError(f"bad block_cache spec {spec!r}")
    return (lo, hi), every, head, tail


def block_cache_fields(spec: Optional[str], depth: Optional[int] = None,
                       method: str = "euler") -> dict:
    """``SamplerSettings`` kwargs for a block-cache spec string (empty dict
    when disabled) — the one-liner every settings-construction site uses.
    ``depth`` (the model's block count) clamps ``hi`` so a flagship-tuned
    spec like the serving default "2-20:2" degrades gracefully on smaller
    architectures (empty range → cache disabled) instead of raising, and a
    non-euler ``method`` likewise disables the cache (midpoint's two evals
    per step break the one-cache-per-step schedule) so a serving default
    never turns a legal per-request ``ode_method`` override into a 500."""
    if method != "euler":
        return {}
    parsed = parse_block_cache(spec)
    if parsed is None:
        return {}
    (lo, hi), every, head, tail = parsed
    if depth is not None:
        hi = min(hi, int(depth))
        if lo >= hi:
            return {}
    out = {"block_cache_range": (lo, hi), "block_cache_every": every}
    if head:
        out["block_cache_warm_head"] = head
    if tail:
        out["block_cache_warm_tail"] = tail
    return out


def make_cached_forward(model: Any, params: Any, lo: int, hi: int):
    """Block-range-cached DiT forward for the sampler's residual cache
    (``SamplerSettings.block_cache_range``).

    Returns ``fwd(x, cond_x, mask_x, te_x, pt_x, t, cache, refresh) ->
    (pred, new_cache)``: the stacked block params split (at trace time) into
    [0,lo) / [lo,hi) / [hi,depth) ranges; ``refresh`` is a STATIC Python
    bool — True traces the full mid range and returns its aggregate residual
    as the new cache, False replaces the range with one add of the cached
    residual (skipped blocks' sequential deltas telescope, so
    ``x_hi = x_lo + (x_hi − x_lo)_cached`` is the exact reuse of the last
    refresh step's mid-stack work). The two variants are separate traced
    programs (no ``lax.cond``), so the skip variant contains no collectives
    or dead branches and the cache composes with sequence-parallel sampling
    (``parallel/sequence.py`` — all collectives sit in straight-line scan
    bodies)."""
    from lemas_tts_tpu.models.dit import make_block_stack

    depth = model.arch.depth
    if not (0 <= lo < hi <= depth):
        raise ValueError(f"block_cache_range {(lo, hi)} outside depth {depth}")
    embed = getattr(type(model), "embed_inputs", None)
    head = getattr(type(model), "head", None)
    if embed is None or head is None:
        raise ValueError("block cache supports the DiT backbone only")

    stack_pre = make_block_stack(model, lo) if lo else None
    stack_mid = make_block_stack(model, hi - lo)
    stack_post = make_block_stack(model, depth - hi) if depth > hi else None
    blocks = params["params"]["blocks"]

    def sl(a, b):
        return {"params": jax.tree_util.tree_map(lambda x: x[a:b], blocks)}

    pre_p, mid_p, post_p = sl(0, lo), sl(lo, hi), sl(hi, depth)

    def fwd(x, cond_x, mask_x, te_x, pt_x, t, cache, refresh: bool):
        Bx = x.shape[0]
        h, t_emb, rope = model.apply(
            params, x, cond_x, None, jnp.broadcast_to(t, (Bx,)), mask_x,
            text_embed=te_x, prosody_text=pt_x, method=embed,
        )
        residual = h if model.arch.long_skip_connection else None
        if stack_pre is not None:
            h, _ = stack_pre.apply(pre_p, h, t_emb, mask_x, rope, True)
        if refresh:
            h_mid, _ = stack_mid.apply(mid_p, h, t_emb, mask_x, rope, True)
            h, new_cache = h_mid, h_mid - h
        else:
            h, new_cache = h + cache, cache
        if stack_post is not None:
            h, _ = stack_post.apply(post_p, h, t_emb, mask_x, rope, True)
        pred = model.apply(params, h, residual, t_emb, method=head)
        return pred, new_cache

    return fwd


def block_cache_flags(settings: SamplerSettings, steps: int) -> np.ndarray:
    """Static refresh-flag schedule [steps] for the block-range cache:
    every ``block_cache_every``-th step refreshes, plus the warm head/tail
    always-refresh windows. ``flags[0]`` is always True (the cache must be
    filled before the first skip). Shared by the sampler's static scan
    segmentation and ``scripts/blockcache_probe.py``'s analytic cost."""
    flags = np.arange(steps) % settings.block_cache_every == 0
    if settings.block_cache_warm_head:
        flags[: settings.block_cache_warm_head] = True
    if settings.block_cache_warm_tail:
        flags[max(0, steps - settings.block_cache_warm_tail):] = True
    return flags


def _segment_flags(flags: np.ndarray):
    """Decompose a static refresh schedule into periodic regions
    ``[(period, count), ...]`` where each region is ``count`` repetitions of
    [refresh, skip × (period−1)] — the shape the statically-segmented scan
    consumes (one ``lax.scan`` per region, period unrolled inside the body).
    The default schedules produce 2–5 regions (e.g. every=2 with a dense
    2-step tail → [(2, k), (1, 2)])."""
    steps = len(flags)
    if steps == 0:
        return []
    assert flags[0], "block-cache schedule must start with a refresh"
    refresh_idx = np.flatnonzero(flags)
    periods = np.diff(np.append(refresh_idx, steps))
    regions: list[list[int]] = []
    for p in periods:
        if regions and regions[-1][0] == int(p):
            regions[-1][1] += 1
        else:
            regions.append([int(p), 1])
    return [(p, c) for p, c in regions]


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
            return _cfg_velocity_combine(pred2, B, t, settings)

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
    if settings.block_cache_range is not None:
        y_final, traj = _scan_block_cached(
            model, params, settings, t_pairs, k, y0,
            step_cond=step_cond, attn_mask=attn_mask, te_cond=te_cond,
            prosody_text=prosody_text,
            # reuse the exact path's prebuilt 2B CFG operands — one
            # construction site, the two paths cannot drift
            cfg_pack=((te2, cond2, mask2, pt2) if settings.use_cfg else None),
        )
    elif settings.use_cfg and k < steps:
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


def _cfg_velocity_combine(pred2, B, t, settings):
    """CFG combine + clamp shared by the exact and block-cached velocity
    paths (reference ``cfm.py:420-424`` order: scale by ``cfg·(1−t)²``,
    then clamp)."""
    pred, null_pred = pred2[:B], pred2[B:]
    cfg_t = settings.cfg_strength * jnp.square(1.0 - t)
    v = pred + (pred - null_pred) * cfg_t
    return jnp.clip(v, -settings.velocity_clamp, settings.velocity_clamp)


def _scan_block_cached(model, params, settings, t_pairs, k, y0, *,
                       step_cond, attn_mask, te_cond, prosody_text,
                       cfg_pack):
    """NFE loop with the block-range residual cache, segmented STATICALLY:
    the refresh schedule is a compile-time constant
    (:func:`block_cache_flags`), so it decomposes into periodic regions
    (:func:`_segment_flags`) and each region runs as one ``lax.scan`` whose
    body is [refresh step, (period−1) unrolled skip steps] — refresh/skip
    are separate traced programs (static bool into
    :func:`make_cached_forward`), no ``lax.cond``. Mirrors the
    CFG-truncation prefix/tail split of the plain path; the tail forces a
    refresh at its first step because the batch width halves (2B → B) at
    the boundary. ``cfg_pack`` carries the exact path's prebuilt
    (te2, cond2, mask2, pt2) CFG operands."""
    lo, hi = settings.block_cache_range
    fwd = make_cached_forward(model, params, lo, hi)
    B, N, _ = step_cond.shape
    dim = model.arch.dim
    cdtype = getattr(model, "compute_dtype", jnp.float32)
    steps = t_pairs.shape[0]
    clamp = settings.velocity_clamp
    flags = block_cache_flags(settings, steps)
    want_traj = settings.return_trajectory

    def cond_only_vel(t, x, cache, refresh, do_clamp):
        pred, cache = fwd(x, step_cond, attn_mask, te_cond, prosody_text,
                          t, cache, refresh)
        if do_clamp:  # same clamp semantics as the plain path
            pred = jnp.clip(pred, -clamp, clamp)
        return pred, cache

    if settings.use_cfg:
        te2, cond2, mask2, pt2 = cfg_pack

        def cfg_vel(t, x, cache, refresh):
            x2 = jnp.concatenate([x, x], axis=0)
            pred2, cache = fwd(x2, cond2, mask2, te2, pt2, t, cache, refresh)
            return _cfg_velocity_combine(pred2, B, t, settings), cache

    def run_segments(vel, part_pairs, part_flags, y, width):
        """All regions of one CFG phase: carry = (y, cache), xs = the
        region's t/dt pairs reshaped [count, period, 2]."""
        cache = jnp.zeros((width, N, dim), cdtype)
        pos = 0
        trajs = []
        for period, count in _segment_flags(part_flags):
            xs = part_pairs[pos:pos + period * count].reshape(
                count, period, 2)

            def body(carry, ts, period=period):
                y, cache = carry
                outs = []
                v, cache = vel(ts[0, 0], y, cache, True)
                y = y + ts[0, 1] * v
                if want_traj:
                    outs.append(y)
                for j in range(1, period):
                    v, cache = vel(ts[j, 0], y, cache, False)
                    y = y + ts[j, 1] * v
                    if want_traj:
                        outs.append(y)
                return (y, cache), (jnp.stack(outs) if want_traj else None)

            (y, cache), tr = jax.lax.scan(body, (y, cache), xs)
            if want_traj:
                trajs.append(tr.reshape((count * period,) + tr.shape[2:]))
            pos += period * count
        return y, trajs

    y = y0.astype(jnp.float32)
    if settings.use_cfg and k < steps:
        fb = flags[k:].copy()
        if fb.size:
            fb[0] = True  # batch width halves at the boundary
        y, tr_a = run_segments(cfg_vel, t_pairs[:k], flags[:k], y, 2 * B)
        y, tr_b = run_segments(
            lambda t, x, c, r: cond_only_vel(t, x, c, r, True),
            t_pairs[k:], fb, y, B)
        traj = jnp.concatenate(tr_a + tr_b, axis=0) if want_traj else None
        return y, traj

    vel = (cfg_vel if settings.use_cfg
           else lambda t, x, c, r: cond_only_vel(t, x, c, r, False))
    width = 2 * B if settings.use_cfg else B
    y, trs = run_segments(vel, t_pairs, flags, y, width)
    return y, (jnp.concatenate(trs, axis=0) if want_traj else None)


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
