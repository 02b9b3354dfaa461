"""Speaker encoder (SpeechBrain-style ECAPA) + InfoNCE loss tests."""

import numpy as np

import jax
import jax.numpy as jnp

from lemas_tts_tpu.cfm.loss import info_nce_speaker
from lemas_tts_tpu.models.speaker import SpeakerConfig, SpeakerEncoder

TINY = SpeakerConfig(
    input_dim=12, embed_dim=32, channels=(16, 16, 16, 48),
    kernel_sizes=(5, 3, 3, 1), dilations=(1, 2, 3, 1),
    attention_channels=8, res2net_scale=4, se_channels=8,
)


def test_speaker_encoder_shapes_and_stats():
    model = SpeakerEncoder(cfg=TINY)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 40, 12)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    emb = model.apply(variables, x)
    assert emb.shape == (3, 32)
    assert np.isfinite(np.asarray(emb)).all()

    # training mode updates batch stats
    emb_t, mutated = model.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
    assert emb_t.shape == (3, 32)
    before = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert not np.array_equal(np.asarray(before), np.asarray(after))


def test_speaker_embedding_input_dependent():
    model = SpeakerEncoder(cfg=TINY)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 30, 12)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    e = np.asarray(model.apply(variables, x))
    assert not np.allclose(e[0], e[1])


def test_info_nce_identity_vs_shuffled():
    rng = np.random.default_rng(2)
    e = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    # matched pairs → low loss; shuffled negatives as positives → high loss
    loss_match = float(info_nce_speaker(e, e))
    loss_shuf = float(info_nce_speaker(e, jnp.roll(e, 3, axis=0)))
    assert loss_match < loss_shuf
    # matched loss approaches ln(1) + logsumexp floor: strictly below chance
    chance = np.log(8)
    assert loss_match < chance < loss_shuf


def test_info_nce_gradient_flows():
    rng = np.random.default_rng(3)
    e_gt = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)

    def f(e_pred):
        return info_nce_speaker(e_gt, e_pred)

    g = jax.grad(f)(jnp.asarray(rng.standard_normal((4, 8)), jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
