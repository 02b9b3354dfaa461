"""Few-step progressive distillation of the CFM sampler.

The measured per-step ceiling of the flagship sampler is hardware-bound
(docs/performance.md): further real-time-factor gains must come from fewer
ODE steps. This module implements progressive distillation (Salimans & Ho
2022, adapted to conditional flow matching): a student DiT — initialized
from the teacher — learns the teacher's *average* velocity over each of its
own (sway-warped) Euler intervals, with the teacher's classifier-free
guidance baked in. A K-step student therefore replaces ``K × 2`` CFG
sub-steps of a ``2K``-step teacher with ``K`` single passes: distilling
NFE 32 → 8 cuts sampler forwards 8× (64 → 8).

No reference equivalent — the reference is inference-only
(``lemas_tts/model/cfm.py`` has a training loss but no trainer and no
distillation). Sampling a distilled student reuses the standard sampler
with ``cfg_strength=0`` and ``steps=K`` (:func:`student_sampler_settings`).

TPU design notes: one jitted step; the teacher's two sub-steps run inside
the same program (no host round-trips); per-sample segment indices are a
``gather`` over the static warped grid so every shape stays static; mesh
sharding reuses the trainer's PartitionSpecs (DP over 'data', TP over
'model'), with teacher params sharded the same way as student params.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh

from lemas_tts_tpu.cfm.sampler import (
    SamplerSettings,
    resolve_sway_coef,
    warped_time_grid,
)
from lemas_tts_tpu.cfm.train import make_optimizer
from lemas_tts_tpu.config import TrainConfig
from lemas_tts_tpu.parallel.mesh import (
    batch_pspecs,
    dit_param_pspecs,
    shard_opt_state,
    shard_pytree,
)
from lemas_tts_tpu.utils.masks import lens_to_mask, mask_from_frac_lengths


@struct.dataclass
class DistillState:
    step: jax.Array
    params: Any  # student DiT params (trainable)
    teacher_params: Any  # frozen
    opt_state: Any
    ema_params: Any = None


def student_sampler_settings(
    student_steps: int, sway_sampling_coef: Optional[float] = None
) -> SamplerSettings:
    """Sampler settings for a distilled student: K steps, CFG baked in
    (``cfg_strength=0`` → single forward per step), same sway warp the
    student was trained on."""
    return SamplerSettings(
        steps=student_steps,
        cfg_strength=0.0,
        sway_sampling_coef=sway_sampling_coef,
    )


class Distiller:
    """Progressive distillation trainer for one halving stage.

    ``student_steps`` is the target NFE; the teacher integrates
    ``substeps`` (default 2) CFG Euler sub-steps across each student
    interval. Chain stages (32→16→8→…) by passing the previous student as
    the next teacher (:meth:`next_stage`).
    """

    def __init__(
        self,
        dit_model: Any,
        student_steps: int,
        cfg: TrainConfig = TrainConfig(),
        *,
        teacher_cfg_strength: float = 2.0,
        sway_sampling_coef: Optional[float] = None,
        substeps: int = 2,
        velocity_clamp: float = 20.0,
        frac_lengths_mask: tuple[float, float] = (0.7, 1.0),
        mesh: Optional[Mesh] = None,
        student_model: Optional[Any] = None,
    ):
        """``student_model`` (optional): a DiT whose *parameter tree* is
        identical to the teacher's but whose runtime geometry differs — the
        measured case is the wide-head student (heads=8, dim_head=128 at
        dim=1024: same qkv/out projection shapes, +14% e2e sampler RTF from
        full MXU contraction depth in the attention kernel — see
        ``scripts/widehead_probe.py`` and docs/performance.md). Standard-PD
        teacher-copy init still applies (the trees match); the initial loss
        gap is larger than same-geometry PD because the head re-split changes
        the function, which the distillation loss then closes."""
        assert student_steps >= 1 and substeps >= 1
        # The gradient step must run a differentiable forward: the fused
        # Pallas inference kernels (attn_backend="vmem") define no VJP, so a
        # serving-configured model is cloned to the XLA path here — exactly
        # the backend scripts/train.py trains with. Callers keep sampling
        # students/teachers with the fast kernels (make_sampler on their own
        # model); only the distill-loss forwards take the XLA path. The clone
        # also turns on activation checkpointing: a serving arch is
        # inference-tuned, and the un-remat'd flagship backward (22 saved
        # block activations) exceeds a single chip's HBM at useful batch
        # sizes (measured: 16.4 G needed vs 15.75 G at 4000 frames).
        def to_train_path(m):
            if getattr(m, "attn_backend", "xla") != "xla" and hasattr(m, "clone"):
                import dataclasses

                arch = dataclasses.replace(m.arch, checkpoint_activations=True)
                m = m.clone(attn_backend="xla", arch=arch)
            return m

        dit_model = to_train_path(dit_model)
        self.dit_model = dit_model
        self.student_model = (to_train_path(student_model)
                              if student_model is not None else dit_model)
        self.student_steps = student_steps
        self.cfg = cfg
        self.teacher_cfg_strength = teacher_cfg_strength
        self.sway_sampling_coef = sway_sampling_coef
        self.substeps = substeps
        self.velocity_clamp = velocity_clamp
        self.frac_lengths_mask = frac_lengths_mask
        self.mesh = mesh
        self.optimizer = make_optimizer(cfg)
        self.ema_decay = 0.999
        # the student's inference grid; the fine grid nests `substeps`
        # teacher points inside each student interval. ONE resolved exponent
        # (the student's: the grid the student will be sampled with) is used
        # for both so fine[k*substeps] == coarse[k] exactly.
        self.resolved_sway_coef = resolve_sway_coef(student_steps, sway_sampling_coef)
        self.coarse_grid = warped_time_grid(student_steps, self.resolved_sway_coef)
        self.fine_grid = warped_time_grid(
            student_steps * substeps, self.resolved_sway_coef
        )
        self._step_fn = None

    # ------------------------------------------------------------------ init
    def init_state(self, teacher_params: Any) -> DistillState:
        """Student starts as a copy of the teacher (standard PD init). A
        distinct ``student_model`` must therefore share the teacher's exact
        parameter tree (the wide-head geometry does: only the runtime head
        split differs) — verified loudly here, because a mismatched tree
        would otherwise fail deep inside the first jitted step."""
        if self.student_model is not self.dit_model:
            want = jax.eval_shape(
                lambda: self.student_model.init(
                    jax.random.key(0), jnp.zeros((1, 8, self.student_model.mel_dim)),
                    jnp.zeros((1, 8, self.student_model.mel_dim)),
                    jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,)))
            )["params"]
            got = (teacher_params.get("params", teacher_params)
                   if isinstance(teacher_params, dict) else teacher_params)
            ws = jax.tree_util.tree_structure(want)
            gs = jax.tree_util.tree_structure(got)
            shape_ok = ws == gs and all(
                tuple(a.shape) == tuple(b.shape)
                for a, b in zip(jax.tree_util.tree_leaves(want),
                                jax.tree_util.tree_leaves(got)))
            if not shape_ok:
                raise ValueError(
                    "student_model parameter tree differs from the teacher's "
                    "— teacher-copy init requires identical trees and leaf "
                    "shapes (e.g. the wide-head split heads·dim_head must "
                    "keep the inner dim)")
        student = jax.tree_util.tree_map(
            lambda p: jnp.array(p, copy=True), teacher_params
        )
        opt_state = self.optimizer.init(student)
        ema = jax.tree_util.tree_map(
            lambda p: jnp.array(p, dtype=jnp.float32, copy=True), student
        )
        state = DistillState(
            step=jnp.zeros((), jnp.int32),
            params=student,
            teacher_params=teacher_params,
            opt_state=opt_state,
            ema_params=ema,
        )
        if self.mesh is not None:
            state = self.shard_state(state)
        return state

    def shard_state(self, state: DistillState) -> DistillState:
        pspecs = dit_param_pspecs(state.params)
        shard = lambda tree: shard_pytree(tree, self.mesh, dit_param_pspecs(tree))
        return DistillState(
            step=state.step,
            params=shard(state.params),
            teacher_params=shard(state.teacher_params),
            opt_state=shard_opt_state(state.opt_state, self.mesh, pspecs),
            ema_params=None if state.ema_params is None else shard(state.ema_params),
        )

    # ------------------------------------------------------------------ loss
    @property
    def _teacher_uses_cfg(self) -> bool:
        return self.teacher_cfg_strength >= 1e-5

    def _teacher_velocity(self, params, x, cond, attn_mask, te_cond, te_uncond, t, B):
        """CFG velocity exactly as inference (sampler.py velocity closure):
        one 2B-stacked forward, ``cfg*(1-t)^2`` schedule, ±clamp. A baked
        teacher (strength 0, later PD stages) runs a single guided pass —
        clamped as well, since its training targets were clamped."""
        if not self._teacher_uses_cfg:
            pred = self.dit_model.apply(
                params, x, cond, None, t, attn_mask, text_embed=te_cond
            )
            return jnp.clip(pred, -self.velocity_clamp, self.velocity_clamp)
        x2 = jnp.concatenate([x, x], axis=0)
        cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        mask2 = jnp.concatenate([attn_mask, attn_mask], axis=0)
        te2 = jnp.concatenate([te_cond, te_uncond], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        pred2 = self.dit_model.apply(
            params, x2, cond2, None, t2, mask2, text_embed=te2
        )
        pred, null_pred = pred2[:B], pred2[B:]
        cfg_t = self.teacher_cfg_strength * jnp.square(1.0 - t)[:, None, None]
        v = pred + (pred - null_pred) * cfg_t
        return jnp.clip(v, -self.velocity_clamp, self.velocity_clamp)

    def _loss(self, student_params, teacher_params, batch, rng):
        mel = batch["mel"].astype(jnp.float32)  # [B, T, D]
        lengths = batch["mel_lengths"]  # [B]
        text = batch["text"]  # [B, nt]
        B, T, D = mel.shape

        r_noise, r_frac, r_span, r_seg = jax.random.split(rng, 4)
        attn_mask = lens_to_mask(lengths, T)  # [B, T]

        # span conditioning exactly like the CFM training loss: the kept
        # complement of a random 0.7–1.0 span is the "reference" prefix
        frac = jax.random.uniform(
            r_frac, (B,),
            minval=self.frac_lengths_mask[0], maxval=self.frac_lengths_mask[1],
        )
        gen_mask = mask_from_frac_lengths(lengths, frac, T, r_span) & attn_mask
        cond = jnp.where((attn_mask & ~gen_mask)[..., None], mel, 0.0)

        # per-sample student interval [t_i, t_{i+1}] from the warped grid
        seg = jax.random.randint(r_seg, (B,), 0, self.student_steps)
        coarse = jnp.asarray(self.coarse_grid)  # [K+1]
        fine = jnp.asarray(self.fine_grid)  # [K*substeps+1]
        t0 = coarse[seg]  # [B]
        t1 = coarse[seg + 1]

        # trajectory point: flow interpolation between noise and data
        x0 = jax.random.normal(r_noise, (B, T, D))
        x0 = jnp.where(attn_mask[..., None], x0, 0.0)
        x = (1.0 - t0)[:, None, None] * x0 + t0[:, None, None] * mel

        # teacher text embeddings once per branch
        te_c = self.dit_model.apply(
            teacher_params, text, T, False, method=self.dit_model.embed_text
        )
        te_u = (
            self.dit_model.apply(
                teacher_params, text, T, True, method=self.dit_model.embed_text
            )
            if self._teacher_uses_cfg
            else None
        )

        # teacher: `substeps` CFG Euler sub-steps along the nested fine grid
        x_t = x
        for j in range(self.substeps):
            ta = fine[seg * self.substeps + j]
            tb = fine[seg * self.substeps + j + 1]
            v = self._teacher_velocity(
                teacher_params, x_t, cond, attn_mask, te_c, te_u, ta, B
            )
            x_t = x_t + (tb - ta)[:, None, None] * v
        x_t = jax.lax.stop_gradient(x_t)

        target_v = (x_t - x) / jnp.maximum(t1 - t0, 1e-8)[:, None, None]

        # student: ONE pass, no CFG (guidance is being baked in); the student
        # model may differ from the teacher in runtime geometry only
        te_s = self.student_model.apply(
            student_params, text, T, False, method=self.student_model.embed_text
        )
        pred_v = self.student_model.apply(
            student_params, x, cond, None, t0, attn_mask, text_embed=te_s
        )

        err = jnp.square(pred_v - target_v)
        w = gen_mask[..., None].astype(jnp.float32)
        loss = jnp.sum(err * w) / jnp.maximum(jnp.sum(w) * D, 1.0) * D
        loss = jnp.nan_to_num(loss, nan=0.0, posinf=300.0, neginf=300.0)
        metrics = {
            "loss": loss,
            "t_mean": jnp.mean(t0),
            "target_v_rms": jnp.sqrt(jnp.mean(jnp.square(target_v))),
        }
        return loss, metrics

    # ------------------------------------------------------------------ step
    def _build_step(self):
        # the mutable student state (donated) is separated from the frozen
        # teacher (NOT donated: its buffers are shared with the caller and
        # must survive every step)
        def step(mutable, teacher_params, batch, rng):
            step_ct, params, opt_state, ema = mutable
            (loss, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
                params, teacher_params, batch, rng
            )
            updates, new_opt = self.optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            new_ema = ema
            if new_ema is not None:
                from lemas_tts_tpu.cfm.checkpoint import ema_update

                new_ema = ema_update(new_ema, new_params, decay=self.ema_decay)
            return (step_ct + 1, new_params, new_opt, new_ema), metrics

        return jax.jit(step, donate_argnums=(0,))

    def distill_step(self, state: DistillState, batch: Dict[str, jax.Array],
                     rng: jax.Array):
        if self._step_fn is None:
            self._step_fn = self._build_step()
        if self.mesh is not None:
            batch = shard_pytree(batch, self.mesh, batch_pspecs(batch))
        mutable = (state.step, state.params, state.opt_state, state.ema_params)
        (step_ct, params, opt_state, ema), metrics = self._step_fn(
            mutable, state.teacher_params, batch, rng
        )
        return (
            DistillState(step=step_ct, params=params,
                         teacher_params=state.teacher_params,
                         opt_state=opt_state, ema_params=ema),
            metrics,
        )

    # ------------------------------------------------------------------ chain
    def next_stage(self, student_steps: Optional[int] = None) -> "Distiller":
        """Build the next halving stage. Pass the finished stage's (EMA)
        student to the new stage's :meth:`init_state` as its teacher. After
        one stage guidance is baked in, so the next teacher runs WITHOUT
        CFG (strength 0) — its velocity is already guided. The previous
        stage's student becomes the teacher, so a geometry change (wide-head
        student) persists: both sides of every later stage run the student
        geometry."""
        return Distiller(
            self.student_model,
            student_steps if student_steps is not None
            else max(1, self.student_steps // 2),
            cfg=self.cfg,
            teacher_cfg_strength=0.0,
            sway_sampling_coef=self.sway_sampling_coef,
            substeps=self.substeps,
            velocity_clamp=self.velocity_clamp,
            frac_lengths_mask=self.frac_lengths_mask,
            mesh=self.mesh,
        )
