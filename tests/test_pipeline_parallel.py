"""Pipeline parallelism (parallel/pipeline.py) on the 8-device CPU mesh.

Pins: (1) the pipelined DiT forward is exactly the unsharded forward,
(2) one PipelinedTrainer step reproduces the plain single-device Trainer step
(loss and updated params), (3) the combined data×pipe mesh trains with finite
loss and EMA/opt-state shardings intact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lemas_tts_tpu.cfm.train import Trainer
from lemas_tts_tpu.config import DiTArch, TrainConfig
from lemas_tts_tpu.models.dit import DiT
from lemas_tts_tpu.parallel.pipeline import (
    PipelinedTrainer,
    make_pipe_mesh,
    pipeline_dit_forward,
)

# dropout=0: flax short-circuits rate-0 dropout, so the pipelined step's
# per-tick rng folding can't diverge from the plain trainer's scan split
ARCH = DiTArch(dim=32, depth=4, heads=2, dim_head=16, ff_mult=2, text_dim=16,
               conv_layers=1, dropout=0.0)


def make_batch(B=8, T=32, D=12, nt=6, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "mel": jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32)),
        "mel_lengths": jnp.asarray(rng.integers(T // 2, T + 1, B).astype(np.int32)),
        "text": jnp.asarray(rng.integers(0, 30, (B, nt)).astype(np.int32)),
        "langs": jnp.asarray(rng.integers(0, 12, B).astype(np.int32)),
    }


class FixedDrops:
    """Host-side rng stub pinning the CFG drop branches."""

    def __init__(self, v=0.99):
        self.v = v

    def random(self):
        return self.v


def _forward_inputs(model, B=8, N=16, D=8, seed=1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 20, (B, 5)).astype(np.int32))
    time = jnp.asarray(rng.uniform(0, 1, B).astype(np.float32))
    mask = jnp.asarray(np.arange(N)[None] < rng.integers(5, N + 1, B)[:, None])
    params = model.init(jax.random.key(0), x, cond, text, time, mask)
    return params, (x, cond, text, time, mask)


def test_pipeline_forward_matches_unsharded():
    model = DiT(arch=ARCH, mel_dim=8, text_num_embeds=20)
    params, args = _forward_inputs(model)
    ref = model.apply(params, *args)

    mesh = make_pipe_mesh(8, pipe_parallel=4)  # data=2 × pipe=4
    out = pipeline_dit_forward(model, mesh)(params, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # pipe-only ring, more microbatches than stages
    mesh2 = make_pipe_mesh(4, pipe_parallel=4)
    out2 = pipeline_dit_forward(model, mesh2, num_microbatches=8)(params, *args)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_pipelined_step_matches_plain_trainer():
    dit = DiT(arch=ARCH, mel_dim=12, text_num_embeds=30)
    cfg = TrainConfig(num_warmup_updates=2, learning_rate=1e-3)
    batch = make_batch()

    plain = Trainer(dit, vocab_size=30, mel_dim=12, cfg=cfg, use_ctc=True)
    mesh = make_pipe_mesh(4, pipe_parallel=4)  # data=1: exact rng/loss parity
    piped = PipelinedTrainer(dit, vocab_size=30, mel_dim=12, cfg=cfg,
                             use_ctc=True, mesh=mesh, num_microbatches=4)

    s_plain = plain.init_state(jax.random.key(0), batch)
    s_piped = piped.init_state(jax.random.key(0), batch)

    rng = jax.random.key(7)
    # the pipelined step folds the step rng by data-shard index — mirror it
    s_plain, m_plain = plain.train_step(
        s_plain, batch, jax.random.fold_in(rng, 0), FixedDrops())
    s_piped, m_piped = piped.train_step(s_piped, batch, rng, FixedDrops())

    np.testing.assert_allclose(float(m_piped["loss"]), float(m_plain["loss"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m_piped["flow_loss"]),
                               float(m_plain["flow_loss"]),
                               rtol=1e-5, atol=1e-6)

    ref_leaves = jax.tree_util.tree_leaves(s_plain.params)
    got_leaves = jax.tree_util.tree_leaves(
        jax.device_get(s_piped.params))
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-6)


@pytest.mark.slow
def test_pipelined_training_on_data_pipe_mesh():
    dit = DiT(arch=ARCH, mel_dim=12, text_num_embeds=30)
    cfg = TrainConfig(num_warmup_updates=2, learning_rate=1e-3)
    mesh = make_pipe_mesh(8, pipe_parallel=2)  # data=4 × pipe=2
    trainer = PipelinedTrainer(dit, vocab_size=30, mel_dim=12, cfg=cfg,
                               use_ctc=True, mesh=mesh, num_microbatches=2)
    batch = make_batch(B=8)
    state = trainer.init_state(jax.random.key(0), batch)

    losses = []
    for i in range(3):
        state, metrics = trainer.train_step(
            state, batch, jax.random.key(i), FixedDrops())
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert int(state.step) == 3

    # block params and their adam moments stay sharded over the pipe axis
    blk = state.params["dit"]["params"]["blocks"]
    leaf = jax.tree_util.tree_leaves(blk)[0]
    assert "pipe" in str(leaf.sharding.spec)
    assert state.ema_params is not None


@pytest.mark.slow
def test_pipelined_fsdp_matches_plain_pipelined():
    """ZeRO-3 composition over the ('data','pipe') mesh is a layout choice,
    not a numerics choice: one fsdp=True step equals the fsdp=False step
    bit-for-layout (params gathered entering the grad, grad shards sliced
    after the exact replicated clip)."""
    dit = DiT(arch=ARCH, mel_dim=12, text_num_embeds=30)
    cfg = TrainConfig(num_warmup_updates=2, learning_rate=1e-3)
    mesh = make_pipe_mesh(8, pipe_parallel=2)  # data=4 × pipe=2
    batch = make_batch(B=8)

    plain = PipelinedTrainer(dit, vocab_size=30, mel_dim=12, cfg=cfg,
                             use_ctc=True, mesh=mesh, num_microbatches=2)
    fsdp = PipelinedTrainer(dit, vocab_size=30, mel_dim=12, cfg=cfg,
                            use_ctc=True, mesh=mesh, num_microbatches=2,
                            fsdp=True, fsdp_min_size=128)

    s0 = plain.init_state(jax.random.key(0), batch)
    s1 = fsdp.init_state(jax.random.key(0), batch)

    # persistent block state shards over BOTH axes
    blk_specs = fsdp.param_pspecs(jax.device_get(s1.params))["dit"]["params"]["blocks"]
    flat = [tuple(s) for s in jax.tree_util.tree_leaves(
        blk_specs, is_leaf=lambda s: isinstance(s, P))]
    assert any("pipe" in s and "data" in s for s in flat), flat

    for i in range(2):
        s0, m0 = plain.train_step(s0, batch, jax.random.key(i), FixedDrops())
        s1, m1 = fsdp.train_step(s1, batch, jax.random.key(i), FixedDrops())
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s0.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s1.params))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-6)
    # EMA sharded like params, values matching too
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s0.ema_params)),
                    jax.tree_util.tree_leaves(jax.device_get(s1.ema_params))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-6)


def test_psum_transpose_contract():
    """Pins the jax behavior the pipelined gradient combination relies on:
    under shard_map (replication checks off), psum transposes to psum — the
    cotangent of a pre-psum value is the psum of the per-device seeds, so a
    device's local grad of a psum-built global scalar carries an extra
    axis-size factor, and pmean (not psum) over the axis reconstructs the
    true global gradient."""
    from jax.sharding import Mesh
    from lemas_tts_tpu.parallel.mesh import compat_shard_map

    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("data",))
    x = jnp.arange(8.0).reshape(2, 4)
    w = jnp.ones((4,))

    def local(w, x):
        def loss(w):
            return jax.lax.psum(jnp.sum(x * w), "data")

        l, g = jax.value_and_grad(loss)(w)
        return l, jax.lax.pmean(g, "data")

    f = jax.jit(compat_shard_map()(
        local, mesh=mesh, in_specs=(P(), P("data", None)),
        out_specs=(P(), P())))
    l, g = f(w, x)
    assert float(l) == 28.0
    np.testing.assert_allclose(np.asarray(g), [4.0, 6.0, 8.0, 10.0])


@pytest.mark.slow
def test_ctc_gate_is_global_across_data_shards():
    """At data=4 the per-shard batch is 2 ≤ the reference's `n_sel > 2` CTC
    activation gate (cfm.py:679) — the gate must evaluate over the GLOBAL
    batch (loss_psum_axis) or CTC would silently never train under
    pipeline+data parallelism."""
    dit = DiT(arch=ARCH, mel_dim=12, text_num_embeds=30)
    cfg = TrainConfig(num_warmup_updates=0, learning_rate=1e-3)
    mesh = make_pipe_mesh(8, pipe_parallel=2)  # data=4 → 2 samples/shard
    trainer = PipelinedTrainer(dit, vocab_size=30, mel_dim=12, cfg=cfg,
                               use_ctc=True, mesh=mesh, num_microbatches=2)
    batch = make_batch(B=8)
    state = trainer.init_state(jax.random.key(0), batch)
    ctc_vals = []
    for i in range(4):
        state, metrics = trainer.train_step(
            state, batch, jax.random.key(i), FixedDrops())
        ctc_vals.append(float(metrics["ctc_loss"]))
    # with 8 global samples and t ~ U(0,1), some step draws > 2 high-t
    # samples; a per-shard gate (2 samples) could never fire
    assert any(v > 0 for v in ctc_vals), ctc_vals


@pytest.mark.slow
def test_train_cli_pipe_parallel(tmp_path):
    from lemas_tts_tpu.scripts.train import main

    rc = main(["--synthetic", "16", "--tiny",
               "--ckpt_dir", str(tmp_path / "ck"),
               "--steps", "2", "--pipe_parallel", "2"])
    assert rc == 0
