"""Pipeline parallelism: GPipe-style microbatch pipeline over the DiT blocks.

The reference has no distributed runtime at all (SURVEY.md §2.3), so — like
tensor and sequence parallelism (``parallel/mesh.py``, ``parallel/sequence.py``)
— this axis is designed TPU-first rather than translated. It completes the
parallelism matrix: DP (`data`), TP (`model`), SP (`seq`), and now PP
(`pipe`); the model family has no MoE, so EP is structurally N/A.

Design (everything inside one ``shard_map`` over a ``('data','pipe')`` mesh):

 - The 22 identical DiT blocks are already *stacked* along a leading depth
   axis by ``nn.scan`` — pipeline sharding is literally a ``P('pipe')`` on
   that axis: each stage holds ``depth / pipe`` consecutive blocks, no
   re-layout, no per-stage parameter surgery.
 - Embeddings / final head are replicated and computed redundantly per stage
   (they are <2% of step FLOPs); only the block stack is pipelined.
 - Circular schedule: ``M`` microbatches flow through ``M + P − 1`` ticks of
   a ``lax.scan``; each tick every stage applies its block shard and
   ``ppermute``s its activation to the next stage over the ICI ring. Stage 0
   injects microbatches, the last stage collects them. Bubble fraction is the
   standard ``(P−1)/(M+P−1)``.
 - Backward is plain autodiff: ``ppermute`` transposes to the reverse
   ``ppermute``, so the cotangents flow back around the ring in the mirrored
   schedule — no hand-written backward pass.
 - Gradient combination is explicit (grad-inside-shard_map): the scalar loss
   is masked to the last stage, so each parameter's gradient materializes on
   exactly the stage(s) that used it — stage-local for block shards,
   single-stage for embed/head — making ``psum('pipe')`` for replicated
   params + ``pmean('data')`` for everything the exact global gradient.

Composable with data parallelism on the same mesh, and (``fsdp=True``) with
ZeRO-3-style state sharding over the 'data' axis: persistent params, adam
moments, and EMA additionally shard one weight dimension over 'data'; the
step all-gathers params entering the differentiated region and slices each
device's gradient shard back out after the (exact, replicated) global-norm
clip — so only the transients are full-size, exactly like GSPMD FSDP in the
plain trainer. The tensor-parallel (`model`) axis is a separate tool (GSPMD
pspecs) and does not compose with the pipe axis in this implementation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from lemas_tts_tpu.cfm.loss import cfm_training_loss
from lemas_tts_tpu.cfm.train import TrainState, Trainer, make_schedule
from lemas_tts_tpu.config import TrainConfig
from lemas_tts_tpu.models.dit import DiT, make_block_stack
from lemas_tts_tpu.parallel.mesh import (
    batch_pspecs_axis,
    compat_shard_map,
    fsdp_param_pspecs,
    opt_state_pspecs,
    shard_pytree,
    spec_axis_dims,
)


def make_pipe_mesh(
    n_devices: Optional[int] = None, pipe_parallel: int = 2, devices=None
) -> Mesh:
    """('data','pipe') mesh: batch shards over 'data', DiT block stages over
    'pipe'. The pipe ring rides the minor (fastest) ICI axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices % pipe_parallel == 0, (n_devices, pipe_parallel)
    grid = np.asarray(devices[:n_devices]).reshape(
        n_devices // pipe_parallel, pipe_parallel
    )
    return Mesh(grid, axis_names=("data", "pipe"))


def pipe_param_pspecs(params: Any, pipe_axis: str = "pipe") -> Any:
    """Blocks (stacked depth axis) shard over 'pipe'; everything else
    replicates."""

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "idx", p)) for p in path]
        if "blocks" in names:
            return P(*([pipe_axis] + [None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(rule, params)


def pipeline_forward_local(
    model: DiT,
    stack: Any,
    pipe_size: int,
    num_microbatches: int,
    pipe_axis: str,
    variables: Any,  # full DiT variables; ["params"]["blocks"] = stage shard
    x: jax.Array,
    cond: jax.Array,
    text_ids: Optional[jax.Array],
    time: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    drop_audio_cond: bool = False,
    drop_text: bool = False,
    prosody_text: Optional[jax.Array] = None,
    deterministic: bool = True,
    rngs: Optional[Dict[str, jax.Array]] = None,
    remat: bool = True,
):
    """Device-local pipelined DiT forward (call inside shard_map).

    Returns pred on the LAST stage and zeros elsewhere — callers either mask
    their loss to the last stage (training) or ``psum`` over 'pipe' to
    broadcast (inference). The zeros keep every garbage/bubble path NaN-free
    through autodiff.
    """
    Pp, M = pipe_size, num_microbatches
    stage = jax.lax.axis_index(pipe_axis)
    is_last = stage == Pp - 1

    h, t_emb, rope = model.apply(
        variables, x, cond, text_ids, time,
        drop_audio_cond=drop_audio_cond, drop_text=drop_text,
        prosody_text=prosody_text, method=DiT.embed_inputs,
    )
    residual = h if model.arch.long_skip_connection else None

    B = h.shape[0]
    assert B % M == 0, (B, M)

    def mb(a):
        return a.reshape(M, B // M, *a.shape[1:])

    h_mb, t_mb = mb(h), mb(t_emb)
    mask_mb = None if mask is None else mb(mask)
    perm = [(p, (p + 1) % Pp) for p in range(Pp)]
    block_vars = {"params": variables["params"]["blocks"]}
    base_key = None if rngs is None else rngs.get("dropout")

    def apply_stage(xb, tb, mkb, key):
        r = None if key is None else {"dropout": key}
        out, _ = stack.apply(block_vars, xb, tb, mkb, rope, deterministic,
                             rngs=r)
        return out

    if remat:
        apply_stage = jax.checkpoint(apply_stage)

    def tick(buf, i):
        inj = jnp.where(stage == 0, h_mb[jnp.clip(i, 0, M - 1)], buf)
        mb_i = jnp.clip(i - stage, 0, M - 1)  # microbatch at this stage now
        tb = t_mb[mb_i]
        mkb = None if mask_mb is None else mask_mb[mb_i]
        key = (None if base_key is None
               else jax.random.fold_in(jax.random.fold_in(base_key, i), stage))
        out = apply_stage(inj, tb, mkb, key)
        return jax.lax.ppermute(out, pipe_axis, perm), out

    _, outs = jax.lax.scan(tick, jnp.zeros_like(h_mb[0]),
                           jnp.arange(M + Pp - 1))
    # last stage's outputs at ticks P−1 … M+P−2 are microbatches 0 … M−1;
    # zero every other stage so downstream garbage math stays finite and the
    # masked-loss backward never multiplies a NaN
    sel = jnp.where(is_last, outs[Pp - 1:], 0.0)
    h_out = sel.reshape(B, *sel.shape[2:])
    pred = model.apply(variables, h_out, residual, t_emb, method=DiT.head)
    return jnp.where(is_last, pred, 0.0)


def pipeline_dit_forward(
    model: DiT,
    mesh: Mesh,
    num_microbatches: Optional[int] = None,
    data_axis: str = "data",
    pipe_axis: str = "pipe",
):
    """Jitted pipelined DiT forward over a ('data','pipe') mesh:
    ``fn(variables, x, cond, text_ids, time, mask) -> pred`` with the output
    broadcast back to every stage. Used for inference-style runs and parity
    tests; training goes through :class:`PipelinedTrainer`."""
    Pp = mesh.shape[pipe_axis]
    assert model.arch.depth % Pp == 0, (model.arch.depth, Pp)
    M = num_microbatches or Pp
    stack = make_block_stack(model, model.arch.depth // Pp)
    shard_map = compat_shard_map()

    def local(variables, x, cond, text_ids, time, mask):
        pred = pipeline_forward_local(
            model, stack, Pp, M, pipe_axis,
            variables, x, cond, text_ids, time, mask,
        )
        return jax.lax.psum(pred, pipe_axis)  # broadcast from the last stage

    d3 = P(data_axis, None, None)
    d2 = P(data_axis, None)
    d1 = P(data_axis)
    cache: dict = {}  # variables treedef → (specs, jitted shard_map)

    def fn(variables, x, cond, text_ids, time, mask):
        tdef = jax.tree_util.tree_structure(variables)
        if tdef not in cache:
            specs = pipe_param_pspecs(variables, pipe_axis)
            run = jax.jit(shard_map(
                local, mesh=mesh,
                in_specs=(specs, d3, d3, d2, d1, d2),
                out_specs=d3,
            ))
            cache[tdef] = (specs, run)
        specs, run = cache[tdef]
        variables = shard_pytree(variables, mesh, specs)
        return run(variables, x, cond, text_ids, time, mask)

    return fn


def _tree_sq_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros((), jnp.float32)
    return sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)


class PipelinedTrainer(Trainer):
    """Trainer whose step runs the DiT forward/backward through the microbatch
    pipeline. Same public interface as :class:`Trainer` (init_state /
    train_step / shard_state); requires a ('data','pipe') mesh from
    :func:`make_pipe_mesh` and ``depth % pipe == 0``."""

    def __init__(
        self,
        dit_model: DiT,
        vocab_size: int,
        mel_dim: int = 100,
        cfg: TrainConfig = TrainConfig(),
        use_ctc: bool = True,
        mesh: Optional[Mesh] = None,
        use_prosody: bool = False,
        num_microbatches: Optional[int] = None,
        data_axis: str = "data",
        pipe_axis: str = "pipe",
        remat: bool = True,
        fsdp: bool = False,
        fsdp_min_size: int = 1 << 16,
    ):
        assert mesh is not None and pipe_axis in mesh.axis_names, (
            "PipelinedTrainer needs a ('data','pipe') mesh (make_pipe_mesh)"
        )
        super().__init__(dit_model, vocab_size, mel_dim=mel_dim, cfg=cfg,
                         use_ctc=use_ctc, mesh=mesh, use_prosody=use_prosody,
                         fsdp=fsdp, fsdp_min_size=fsdp_min_size)
        self.pipe_axis = pipe_axis
        self.data_axis = data_axis
        self.pipe_size = mesh.shape[pipe_axis]
        assert dit_model.arch.depth % self.pipe_size == 0, (
            dit_model.arch.depth, self.pipe_size)
        self.num_microbatches = num_microbatches or self.pipe_size
        self.remat = remat
        self._stack = make_block_stack(dit_model, dit_model.arch.depth // self.pipe_size)
        assert cfg.grad_accumulation_steps <= 1, (
            "gradient accumulation is not supported with pipeline "
            "parallelism — raise num_microbatches instead (same effect: "
            "more microbatches per optimizer step)")
        # manual global-norm clip inside the step (the clip must psum the
        # stage-local block-gradient norms over 'pipe'); adamw alone here
        self.optimizer = optax.adamw(make_schedule(cfg))

    # ------------------------------------------------------------ sharding
    def param_pspecs(self, params: Any) -> Any:
        specs = {"dit": pipe_param_pspecs(params["dit"], self.pipe_axis)}
        for k in params:
            if k != "dit":
                specs[k] = jax.tree_util.tree_map(lambda _: P(), params[k])
        if self.fsdp:
            # ZeRO-3 composition: each large DiT leaf shards ONE more dim
            # over 'data' on top of the pipe-stage spec — persistent state
            # (params/moments/EMA) is 1/(data·pipe) per device
            specs["dit"] = fsdp_param_pspecs(
                params["dit"], self.mesh.shape[self.data_axis],
                axis=self.data_axis, base=specs["dit"],
                min_elems=self.fsdp_min_size,
            )
        return specs

    def shard_state(self, state: TrainState) -> TrainState:
        pspecs = self.param_pspecs(state.params)
        params = shard_pytree(state.params, self.mesh, pspecs)
        opt_state = shard_pytree(
            state.opt_state, self.mesh,
            opt_state_pspecs(state.opt_state, pspecs))
        # EMA mirrors params["dit"]'s tree → same specs (incl. fsdp sharding)
        ema = (
            None if state.ema_params is None
            else shard_pytree(state.ema_params, self.mesh, pspecs["dit"])
        )
        return TrainState(step=state.step, params=params, opt_state=opt_state,
                          ema_params=ema)

    def _state_specs(self, state: TrainState) -> TrainState:
        pspecs = self.param_pspecs(state.params)
        ema_specs = None if state.ema_params is None else pspecs["dit"]
        return TrainState(
            step=P(), params=pspecs,
            opt_state=opt_state_pspecs(state.opt_state, pspecs),
            ema_params=ema_specs,
        )

    # ---------------------------------------------------------------- step
    def _build_pipe_step(self, drop_audio: bool, drop_text: bool,
                         state_specs: TrainState, batch_specs: Any):
        mesh, Pp, M = self.mesh, self.pipe_size, self.num_microbatches
        pipe_axis, data_axis = self.pipe_axis, self.data_axis
        model, stack = self.dit_model, self._stack
        remat = self.remat
        max_norm = self.cfg.max_grad_norm
        shard_map = compat_shard_map()

        def apply_fn(dit_params, phi, cond, text, time, mask,
                     drop_audio_cond=False, drop_text=False,
                     prosody_text=None, deterministic=True, rngs=None):
            return pipeline_forward_local(
                model, stack, Pp, M, pipe_axis,
                dit_params, phi, cond, text, time, mask,
                drop_audio_cond=drop_audio_cond, drop_text=drop_text,
                prosody_text=prosody_text, deterministic=deterministic,
                rngs=rngs, remat=remat,
            )

        def local_loss(params, batch, rng):
            aux_params = {k: params[k] for k in params
                          if k not in ("dit", "prosody_to_mel")}
            total, metrics = cfm_training_loss(
                model, params["dit"], self.aux_models, aux_params, batch, rng,
                frac_lengths_mask=self.cfg.frac_lengths_mask,
                drop_audio_cond=drop_audio, drop_text=drop_text,
                vocab_size=self.vocab_size if "ctc" in self.aux_models else None,
                prosody_params=params.get("prosody_to_mel"),
                apply_fn=apply_fn,
                # global-batch reductions over the data shards: the loss each
                # stage computes IS the plain trainer's global objective
                # (incl. the reference's whole-batch `n_sel > 2` CTC gate)
                loss_psum_axis=data_axis,
            )
            # pred is zeros on every stage but the last (pipeline_forward_
            # local), so only the last stage's loss is the real one — mask the
            # scalar so each param's cotangent materializes exactly on the
            # stage(s) that used it, making the explicit psum/pmean below the
            # exact global gradient
            is_last = jax.lax.axis_index(pipe_axis) == Pp - 1
            total = jnp.where(is_last, total, 0.0)
            metrics = {k: jnp.where(is_last, v, 0.0)
                       for k, v in metrics.items()}
            return total, metrics

        # True at leaves whose spec names the pipe axis (the block shards)
        is_block = jax.tree_util.tree_map(
            lambda s: pipe_axis in tuple(s), state_specs.params,
            is_leaf=lambda s: isinstance(s, P))

        # ZeRO-3 composition: per-leaf index of the dim sharded over 'data'
        # (−1 = not fsdp-sharded). Params are all-gathered entering the
        # differentiated region; gradient shards are sliced back out after
        # the exact replicated clip — transients full-size, persistent state
        # 1/data, numerics identical (test_pipelined_fsdp_matches_plain).
        fsdp_dims = (spec_axis_dims(state_specs.params, data_axis)
                     if self.fsdp else None)
        d_size = mesh.shape[data_axis]

        def gather_fsdp(tree):
            return jax.tree_util.tree_map(
                lambda x, dim: x if dim < 0 else jax.lax.all_gather(
                    x, data_axis, axis=dim, tiled=True), tree, fsdp_dims)

        def slice_fsdp(tree):
            idx = jax.lax.axis_index(data_axis)

            def go(g, dim):
                if dim < 0:
                    return g
                k = g.shape[dim] // d_size
                return jax.lax.dynamic_slice_in_dim(g, idx * k, k, axis=dim)

            return jax.tree_util.tree_map(go, tree, fsdp_dims)

        def local_step(state: TrainState, batch, rng):
            # identical randomness across the pipe stages of one data shard
            # (each stage recomputes the same φ/x0/span masks); distinct per
            # data shard
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
            full_params = (state.params if fsdp_dims is None
                           else gather_fsdp(state.params))
            (_, metrics), grads = jax.value_and_grad(
                local_loss, has_aux=True)(full_params, batch, rng)

            # the loss each device computes is the GLOBAL objective
            # (loss_psum_axis inside the loss). Under shard_map, psum
            # transposes to psum (pinned by test_psum_transpose_contract), so
            # every device's local grad carries an extra data-axis-size
            # factor on its local-term contribution: pmean over 'data'
            # yields exactly the sum of contributions = the global gradient.
            # Replicated params additionally psum over 'pipe' (their use
            # sites are stage-disjoint); block shards are stage-local.
            def combine(g, blk):
                g = g if blk else jax.lax.psum(g, pipe_axis)
                return jax.lax.pmean(g, data_axis)

            grads = jax.tree_util.tree_map(combine, grads, is_block)
            # metrics are global scalars already (identical across 'data');
            # the pipe psum recovers them from the last-stage masking
            metrics = {k: jax.lax.psum(v, pipe_axis)
                       for k, v in metrics.items()}

            # global-norm clip: block-shard norms live per stage → psum
            blocks_sq = _tree_sq_norm(
                jax.tree_util.tree_map(lambda g, b: g if b else None,
                                       grads, is_block))
            rest_sq = _tree_sq_norm(
                jax.tree_util.tree_map(lambda g, b: None if b else g,
                                       grads, is_block))
            gnorm = jnp.sqrt(jax.lax.psum(blocks_sq, pipe_axis) + rest_sq)
            scale = jnp.where(gnorm > max_norm, max_norm / (gnorm + 1e-12), 1.0)
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            if fsdp_dims is not None:
                # grads are exact + replicated over 'data' after combine();
                # each device keeps only its state shard's slice
                grads = slice_fsdp(grads)

            updates, new_opt = self.optimizer.update(
                grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_ema = state.ema_params
            if new_ema is not None:
                from lemas_tts_tpu.cfm.checkpoint import ema_update

                new_ema = ema_update(new_ema, new_params["dit"],
                                     decay=self.ema_decay)
            new_state = TrainState(step=state.step + 1, params=new_params,
                                   opt_state=new_opt, ema_params=new_ema)
            return new_state, metrics

        metric_specs = {k: P() for k in
                        ("loss", "flow_loss", "accent_loss", "ctc_loss")}
        return jax.jit(shard_map(
            local_step, mesh=mesh,
            in_specs=(state_specs, batch_specs, P()),
            out_specs=(state_specs, metric_specs),
        ), donate_argnums=(0,))

    def train_step(self, state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array, step_rng_host: Optional[Any] = None):
        import random as _pyrandom

        r = step_rng_host if step_rng_host is not None else _pyrandom
        drop_audio = r.random() < self.cfg.audio_drop_prob
        drop_text = r.random() < self.cfg.text_drop_prob
        B = batch["mel"].shape[0]
        d = self.mesh.shape[self.data_axis]
        assert B % (d * self.num_microbatches) == 0, (
            f"global batch {B} must divide into data={d} shards of "
            f"{self.num_microbatches} microbatches")
        key = (drop_audio, drop_text, tuple(sorted(batch.keys())))
        if key not in self._step_cache:
            self._step_cache[key] = self._build_pipe_step(
                drop_audio, drop_text, self._state_specs(state),
                batch_pspecs_axis(batch, self.data_axis))
        batch = shard_pytree(batch, self.mesh,
                             batch_pspecs_axis(batch, self.data_axis))
        return self._step_cache[key](state, batch, rng)
