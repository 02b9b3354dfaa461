"""Sequence-parallel sampling: one utterance sharded over a mesh axis.

The reference caps utterances at 4096 mel frames ≈ 44 s and synthesizes each
on one GPU (``cfm.py:215,304``); batch is its only scaling axis. This module
adds the axis the cap leaves out: shard the *sequence* dimension of a single
(or small-batch) synthesis over chips so the 44-second worst case's latency
drops with the number of chips instead of being pinned to one.

Composition (everything inside one ``shard_map`` over a ``('data','seq')``
mesh; collectives ride ICI):

 - attention → ring schedule (``ops/ring_attention.ring_attention``): kv
   chunks ``ppermute`` around the ring, online-softmax accumulation, no full
   ``[N, N]`` tile anywhere;
 - ConvPositionEmbedding → one halo exchange of 30 frames per side, then
   VALID convs (bit-identical to the global SAME chain);
 - rope → global-position rows sliced per shard (``models/dit.py``);
 - text embedding + attention mask → full-sequence math is computed once
   OUTSIDE the shard_map (it runs once per utterance, not per ODE step) and
   enters sharded along N — the ODE scan itself is fully shard-local;
 - prosody conditioning (``prosody_text`` [B, nt, 512]) → the projection
   ``prosody_text_proj`` adds LINEARLY to the text embedding
   (``models/dit.py:embed_inputs``) and is constant across ODE steps, so it
   is folded into the precomputed cond/uncond text-embed pair outside the
   shard_map — zero per-step cost and nothing new inside the ring;
 - GRL ``step_cond`` (the accent-shuffled conditioning mel, [B, N, D]) →
   per-frame like ``cond``; shards over 'seq' with the same spec.

Same params as the unsharded model (``DiT(seq_axis="seq")`` only changes the
computation); outputs match the single-device sampler to float tolerance
(online-softmax reduction order). ``tests/test_sequence_parallel.py`` pins
this on the 8-device CPU mesh, including the prosody and step_cond paths.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lemas_tts_tpu.cfm.sampler import SamplerSettings, sample_mel, sway_time_grid
from lemas_tts_tpu.parallel.mesh import compat_shard_map
from lemas_tts_tpu.utils.masks import lens_to_mask


def make_seq_mesh(
    n_devices: int | None = None, seq_parallel: int = 2, devices=None
) -> Mesh:
    """('data','seq') mesh: batch rows shard over 'data', the sequence axis
    of every row shards over 'seq'."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices % seq_parallel == 0, (n_devices, seq_parallel)
    grid = np.asarray(devices[:n_devices]).reshape(
        n_devices // seq_parallel, seq_parallel
    )
    return Mesh(grid, axis_names=("data", "seq"))


def sequence_parallel_sampler(
    model: Any,  # DiT constructed with seq_axis == the mesh's 'seq' axis
    settings: SamplerSettings,
    mesh: Mesh,
    data_axis: str = "data",
    seq_axis: str = "seq",
):
    """Build ``fn(params, cond, cond_mask, text_ids, duration, y0) -> mel``
    running the full NFE scan sequence-parallel.

    Requirements: ``model.seq_axis == seq_axis``; bucket length divisible by
    the 'seq' axis size with shards ≥ the conv halo (30 frames); batch
    divisible by the 'data' axis size.
    """
    assert getattr(model, "seq_axis", None) == seq_axis, (
        "construct the model with DiT(seq_axis=...) matching the mesh axis"
    )
    time_grid = jnp.asarray(
        sway_time_grid(settings.steps, settings.sway_sampling_coef,
                       settings.t_start)
    )
    s = mesh.shape[seq_axis]
    shard_map = compat_shard_map()

    seq3 = P(data_axis, seq_axis, None)
    seq2 = P(data_axis, seq_axis)

    def make_run(has_step_cond: bool):
        def local(params, cond, cond_mask, attn_mask, duration, y0, *rest):
            rest = list(rest)
            sc = rest.pop(0) if has_step_cond else None
            te_pair = (rest[0], rest[1] if settings.use_cfg else None)
            return sample_mel(
                model, params,
                cond=cond, cond_mask=cond_mask, text_ids=None,
                duration=duration, y0=y0, time_grid=time_grid,
                settings=settings, step_cond=sc,
                text_embed_pair=te_pair, attn_mask_override=attn_mask,
            )

        in_specs = (P(), seq3, seq2, seq2, P(data_axis), seq3)
        if has_step_cond:
            in_specs += (seq3,)
        in_specs += (seq3,)
        if settings.use_cfg:
            in_specs += (seq3,)
        return jax.jit(shard_map(local, mesh=mesh, in_specs=in_specs,
                                 out_specs=seq3))

    runs: dict = {}

    @partial(jax.jit, static_argnames=("seq_len",))
    def embed(params, text_ids, seq_len, prosody_text=None):
        te_c = model.apply(params, text_ids, seq_len, False,
                           method=model.embed_text)
        tes = (te_c,)
        if settings.use_cfg:
            te_u = model.apply(params, text_ids, seq_len, True,
                               method=model.embed_text)
            tes = (te_c, te_u)
        if prosody_text is not None:
            # the prosody projection adds linearly to the text embedding and
            # is step-constant (dit.py:embed_inputs) — fold it into BOTH CFG
            # branches here, outside the shard_map, exactly as the unsharded
            # forward adds it inside every velocity eval
            pt = model.apply(
                params, prosody_text,
                method=lambda m, p: m.prosody_text_proj(
                    p.astype(m.compute_dtype)),
            )
            if pt.shape[1] < seq_len:
                pt = jnp.pad(pt, ((0, 0), (0, seq_len - pt.shape[1]), (0, 0)))
            else:
                pt = pt[:, :seq_len]
            tes = tuple(te + pt for te in tes)
        return tes

    def fn(params, cond, cond_mask, text_ids, duration, y0,
           step_cond=None, prosody_text=None):
        B, N, _ = cond.shape
        assert N % s == 0 and N // s >= 30, (
            f"bucket {N} must split into seq shards ≥ the conv halo "
            f"(30 frames) over {s} devices"
        )
        assert B % mesh.shape[data_axis] == 0, (B, mesh.shape[data_axis])
        if prosody_text is not None and not getattr(
                model, "use_prosody_encoder", False):
            prosody_text = None  # unsharded forward ignores it too
        # full-sequence math, once per utterance: text embeds (+ folded
        # prosody projection) + global mask
        tes = embed(params, text_ids, N, prosody_text)
        attn_mask = lens_to_mask(duration, N)
        has_sc = step_cond is not None
        run = runs.get(has_sc)
        if run is None:
            run = runs[has_sc] = make_run(has_sc)
        put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
        args = (params,
                put(cond, seq3), put(cond_mask, seq2), put(attn_mask, seq2),
                put(duration, P(data_axis)), put(y0, seq3))
        if has_sc:
            args += (put(step_cond, seq3),)
        args += tuple(put(t, seq3) for t in tes)
        return run(*args)

    return fn
