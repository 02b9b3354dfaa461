"""Training step: AdamW + warmup + grad clipping, sharded over a device mesh.

The reference only *configures* training (``configs/multilingual_grl.yaml:
optim`` section; accelerate multi-GPU env commented out at the top) and ships
no trainer. This is the TPU-native trainer: one jitted step function whose
params/optimizer state are sharded by the ``parallel.mesh`` PartitionSpecs
(DP over 'data', tensor-parallel DiT blocks over 'model') with XLA GSPMD
inserting the collectives over ICI.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lemas_tts_tpu.cfm.loss import AccentClassifier, CTCHead, cfm_training_loss
from lemas_tts_tpu.config import TrainConfig
from lemas_tts_tpu.parallel.mesh import (
    batch_pspecs,
    dit_param_pspecs,
    fsdp_param_pspecs,
    shard_opt_state,
    shard_pytree,
)


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any  # {"dit": ..., "accent": ..., "ctc": ...?}
    opt_state: Any
    ema_params: Any = None  # EMA of params["dit"] (ckpt `ema_model.*` parity)


def make_schedule(cfg: TrainConfig) -> optax.Schedule:
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.learning_rate, cfg.num_warmup_updates),
            optax.constant_schedule(cfg.learning_rate),
        ],
        [cfg.num_warmup_updates],
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(make_schedule(cfg)),
    )


class Trainer:
    """Builds state + jitted sharded train step for the CFM/DiT stack."""

    def __init__(
        self,
        dit_model: Any,
        vocab_size: int,
        mel_dim: int = 100,
        cfg: TrainConfig = TrainConfig(),
        use_ctc: bool = True,
        mesh: Optional[Mesh] = None,
        use_prosody: bool = False,
        fsdp: bool = False,
        fsdp_min_size: int = 1 << 16,
    ):
        self.dit_model = dit_model
        self.cfg = cfg
        self.vocab_size = vocab_size
        self.mesh = mesh
        self.use_prosody = use_prosody
        # ZeRO-3-style param/moment/EMA sharding over 'data' (fsdp_param_
        # pspecs): a pure PartitionSpec change — GSPMD all-gathers params at
        # use sites and reduce-scatters grads, same numerics as plain DP
        self.fsdp = fsdp and mesh is not None
        self.fsdp_min_size = fsdp_min_size
        self.aux_models = {"accent": AccentClassifier(hidden_dim=dit_model.arch.dim)}
        if use_ctc:
            self.aux_models["ctc"] = CTCHead(
                hidden_size=dit_model.arch.dim, vocab_size=vocab_size
            )
        self.optimizer = make_optimizer(cfg)
        # gradient accumulation (reference config field
        # `grad_accumulation_steps`, configs/multilingual_grl.yaml): mini-step
        # grads average inside MultiSteps; the inner clip+adamw (and its
        # warmup count) fire only at accumulation boundaries
        self._accum = max(int(cfg.grad_accumulation_steps), 1)
        if self._accum > 1:
            self.optimizer = optax.MultiSteps(self.optimizer, self._accum)
        self.ema_decay = 0.999
        self._step_cache: Dict[tuple, Any] = {}

    # ------------------------------------------------------------------ init
    def init_state(self, rng: jax.Array, sample_batch: Dict[str, jax.Array]) -> TrainState:
        mel = sample_batch["mel"]
        text = sample_batch["text"]
        B, T, D = mel.shape
        r_dit, r_acc, r_ctc, r_pros = jax.random.split(rng, 4)
        dit_params = self.dit_model.init(
            r_dit, mel, mel, text, jnp.zeros((B,), mel.dtype),
            prosody_text=(
                jnp.zeros((B, text.shape[1], 512)) if self.use_prosody else None
            ),
        )
        params = {
            "dit": dit_params,
            "accent": self.aux_models["accent"].init(r_acc, mel),
        }
        if "ctc" in self.aux_models:
            params["ctc"] = self.aux_models["ctc"].init(r_ctc, mel)
        if self.use_prosody:  # trainable prosody→mel projection (cfm.py:144)
            params["prosody_to_mel"] = {
                "kernel": jax.random.normal(r_pros, (512, D), jnp.float32) * 0.02,
                "bias": jnp.zeros((D,), jnp.float32),
            }
        opt_state = self.optimizer.init(params)
        # independent buffers (a no-op astype would alias params and break
        # jit donation: same buffer donated twice)
        ema = jax.tree_util.tree_map(
            lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params["dit"]
        )
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=opt_state, ema_params=ema)
        if self.mesh is not None:
            state = self.shard_state(state)
        return state

    def param_pspecs(self, params: Any) -> Any:
        specs = {"dit": dit_param_pspecs(params["dit"])}
        for k in params:
            if k != "dit":
                specs[k] = jax.tree_util.tree_map(lambda _: P(), params[k])
        if self.fsdp:
            specs["dit"] = fsdp_param_pspecs(
                params["dit"], self.mesh.shape["data"],
                base=specs["dit"], min_elems=self.fsdp_min_size,
            )
        return specs

    def shard_state(self, state: TrainState) -> TrainState:
        pspecs = self.param_pspecs(state.params)
        params = shard_pytree(state.params, self.mesh, pspecs)
        opt_state = shard_opt_state(state.opt_state, self.mesh, pspecs)
        # EMA mirrors params["dit"]'s tree → same specs (incl. fsdp sharding)
        ema = (
            None
            if state.ema_params is None
            else shard_pytree(state.ema_params, self.mesh, pspecs["dit"])
        )
        return TrainState(step=state.step, params=params, opt_state=opt_state,
                          ema_params=ema)

    # ------------------------------------------------------------------ step
    def _build_step(self, drop_audio: bool, drop_text: bool):
        def loss_fn(params, batch, rng):
            aux_params = {k: params[k] for k in params
                          if k not in ("dit", "prosody_to_mel")}
            return cfm_training_loss(
                self.dit_model,
                params["dit"],
                self.aux_models,
                aux_params,
                batch,
                rng,
                frac_lengths_mask=self.cfg.frac_lengths_mask,
                drop_audio_cond=drop_audio,
                drop_text=drop_text,
                vocab_size=self.vocab_size if "ctc" in self.aux_models else None,
                prosody_params=params.get("prosody_to_mel"),
            )

        def step(state: TrainState, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng
            )
            updates, new_opt = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            new_ema = state.ema_params
            if new_ema is not None:
                from lemas_tts_tpu.cfm.checkpoint import ema_update

                cand = ema_update(new_ema, new_params["dit"],
                                  decay=self.ema_decay)
                if self._accum > 1:
                    # decay only when the optimizer actually stepped — EMA
                    # tracks optimizer updates, not accumulation mini-steps
                    did = self.optimizer.has_updated(new_opt)
                    new_ema = jax.tree_util.tree_map(
                        lambda e, n: jnp.where(did, n, e), new_ema, cand)
                else:
                    new_ema = cand
            if self.fsdp:
                # pin the sharded layout on everything param-shaped so the
                # 1/data footprint survives the step (GSPMD would otherwise
                # be free to emit replicated outputs, breaking donation and
                # the memory budget on the next iteration)
                from lemas_tts_tpu.parallel.mesh import opt_state_pspecs

                pspecs = self.param_pspecs(new_params)
                pin = lambda t, s: jax.tree_util.tree_map(
                    lambda x, sp: jax.lax.with_sharding_constraint(
                        x, NamedSharding(self.mesh, sp)), t, s)
                new_params = pin(new_params, pspecs)
                new_opt = pin(new_opt, opt_state_pspecs(new_opt, pspecs))
                if new_ema is not None:
                    new_ema = pin(new_ema, pspecs["dit"])
            new_state = TrainState(
                step=state.step + 1, params=new_params, opt_state=new_opt,
                ema_params=new_ema,
            )
            return new_state, metrics

        # no mesh context needed: state/batch carry explicit NamedShardings,
        # which jit resolves at trace time (GSPMD propagates the rest)
        return jax.jit(step, donate_argnums=(0,))

    def train_step(self, state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array, step_rng_host: Optional[Any] = None):
        """One optimizer step. CFG drops are sampled host-side per step
        (reference ``cfm.py:631-634``: audio p=0.3, text p=0.1)."""
        import random as _pyrandom

        r = step_rng_host if step_rng_host is not None else _pyrandom
        drop_audio = r.random() < self.cfg.audio_drop_prob
        drop_text = r.random() < self.cfg.text_drop_prob
        key = (drop_audio, drop_text)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_step(*key)
        if self.mesh is not None:
            batch = shard_pytree(batch, self.mesh, batch_pspecs(batch))
        return self._step_cache[key](state, batch, rng)
