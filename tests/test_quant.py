"""Int8 W8A8 quantized serving path (ops/quant.py).

The reference has no quantization feature; this is a TPU-native serving
mode (v5e MXU int8 is 2× bf16 peak). Correctness contract: the quantized
DiT must track the float DiT closely on random weights, and the param-tree
converter must produce exactly the structure the quantized model applies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lemas_tts_tpu.config import DiTArch
from lemas_tts_tpu.models.dit import DiT
from lemas_tts_tpu.ops.quant import (
    QuantDense,
    int8_dense,
    maybe_quant_dense,
    quantize_dense_tree,
    quantize_weight,
)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    w_q, scale = quantize_weight(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (32,)
    deq = w_q.astype(jnp.float32) * scale[None, :]
    # per-channel absmax: max error is half a quantization step per channel
    step = scale[None, :]
    assert float(jnp.max(jnp.abs(deq - w) / step)) <= 0.5 + 1e-5


def test_quantize_weight_stacked_blocks():
    # nn.scan-stacked kernels [depth, in, out] quantize per block per channel
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((3, 16, 8)).astype(np.float32))
    w_q, scale = quantize_weight(w)
    assert w_q.shape == (3, 16, 8) and scale.shape == (3, 8)
    w0_q, s0 = quantize_weight(w[1])
    np.testing.assert_array_equal(np.asarray(w_q[1]), np.asarray(w0_q))
    np.testing.assert_allclose(np.asarray(scale[1]), np.asarray(s0))


def test_int8_dense_matches_float():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((5, 7, 96)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((96, 48)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal(48).astype(np.float32) * 0.01)
    w_q, scale = quantize_weight(w)
    got = int8_dense(x, w_q, scale, b)
    want = x @ w + b
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 2e-2, rel


def test_quant_dense_param_structure_matches_converter():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
    import flax.linen as nn

    class Wrap(nn.Module):
        quant: str | None

        @nn.compact
        def __call__(self, x):
            layer = maybe_quant_dense(
                16, quant=self.quant, dtype=jnp.float32, name="to_q"
            )
            if self.quant is None:
                assert isinstance(layer, nn.Dense)
            else:
                assert isinstance(layer, QuantDense)
            return layer(x)

    params = Wrap(None).init(jax.random.key(0), x)
    qparams = quantize_dense_tree(params)
    got = Wrap("int8").apply(qparams, x)  # structure must line up exactly
    want = Wrap(None).apply(params, x)
    rel = float(jnp.linalg.norm(got - want) / (jnp.linalg.norm(want) + 1e-9))
    assert rel < 2e-2, rel


def test_maybe_quant_dense_rejects_unknown_mode():
    with pytest.raises(ValueError):
        maybe_quant_dense(8, quant="fp4", dtype=jnp.float32, name="x")


def test_quantize_dense_tree_only_touches_block_matmuls():
    params = {
        "params": {
            "input_embed": {"proj": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}},
            "blocks": {
                "block": {
                    "attn": {"to_q": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}},
                    "ff": {"in_proj": {"kernel": jnp.ones((4, 8)), "bias": jnp.zeros(8)}},
                }
            },
        }
    }
    q = quantize_dense_tree(params)
    assert "kernel" in q["params"]["input_embed"]["proj"]  # untouched
    to_q = q["params"]["blocks"]["block"]["attn"]["to_q"]
    assert "kernel" not in to_q and to_q["kernel_q"].dtype == jnp.int8
    assert q["params"]["blocks"]["block"]["ff"]["in_proj"]["scale"].shape == (8,)


@pytest.fixture(scope="module")
def small_dit():
    arch = DiTArch(dim=128, depth=3, heads=4, dim_head=32, ff_mult=2,
                   text_dim=64, conv_layers=2, dropout=0.0)
    m = DiT(arch=arch, mel_dim=20, text_num_embeds=50)
    mq = DiT(arch=arch, mel_dim=20, text_num_embeds=50, quant="int8")
    rng = np.random.default_rng(0)
    B, N, nt = 2, 64, 16
    args = (
        jnp.asarray(rng.standard_normal((B, N, 20)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((B, N, 20)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 50, (B, nt)).astype(np.int32)),
        jnp.asarray(rng.uniform(0, 1, B).astype(np.float32)),
    )
    params = m.init(jax.random.key(0), *args)
    return m, mq, params, args


def test_int8_dit_tracks_float_dit(small_dit):
    m, mq, params, args = small_dit
    y = m.apply(params, *args)
    yq = mq.apply(quantize_dense_tree(params), *args)
    rel = float(jnp.linalg.norm(y - yq) / jnp.linalg.norm(y))
    assert rel < 3e-2, rel


def test_int8_dit_jits(small_dit):
    _, mq, params, args = small_dit
    qparams = quantize_dense_tree(params)
    y1 = mq.apply(qparams, *args)
    y2 = jax.jit(lambda p, *a: mq.apply(p, *a))(qparams, *args)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-2)


def test_tts_facade_quantized_e2e(tmp_path):
    """TTS(quantization="int8") synthesizes end-to-end: random float init is
    quantized like a real checkpoint and the sampler runs on the int8 DiT."""
    import warnings

    import lemas_tts_tpu
    from lemas_tts_tpu.utils.audio_io import write_wav

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(
        [" "] + list("abcdefghijklmnopqrstuvwxyz")
        + ["(en)", "(zh)", "_", ",", ".", "!", "?", "#1", "#2", "#3", "#4"]
    ) + "\n")
    sr = 8000
    t = np.arange(sr) / sr
    write_wav(str(tmp_path / "ref.wav"),
              (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts = lemas_tts_tpu.TTS(model="tests/data/tiny.yaml",
                                vocab_file=str(vocab), device="cpu",
                                quantization="int8")
    wave, out_sr, spec = tts.infer(str(tmp_path / "ref.wav"), "hello there",
                                   "general kenobi", nfe_step=2,
                                   cfg_strength=1.0, seed=11)
    assert wave.size > 0 and np.isfinite(wave).all() and out_sr == sr
    # the quantized layout actually reached the model
    leaf_names = set()

    def walk(d):
        for k, v in d.items():
            (walk(v) if isinstance(v, dict) else leaf_names.add(k))

    walk(tts.synth.dit_params)
    assert "kernel_q" in leaf_names and "scale" in leaf_names


def test_tts_facade_quantization_rejects_other_backbones():
    import lemas_tts_tpu

    with pytest.raises(ValueError, match="only supported for the DiT"):
        lemas_tts_tpu.TTS(model="tests/data/tiny_mmdit.yaml",
                          quantization="int8", device="cpu")


def test_int8_ff_hybrid_tracks_float_and_keeps_attention_float(small_dit):
    """quant="int8_ff" quantizes ONLY the FeedForward matmuls (~2/3 of block
    weights) so the attention-side fused Pallas kernels keep running
    (models/modules.py hybrid resolution). The converted tree keeps float
    kernels for to_q/.../to_out and int8 for in_proj/out_proj."""
    import dataclasses

    from lemas_tts_tpu.ops.quant import FF_QUANT_NAMES

    m, _, params, args = small_dit
    mh = dataclasses.replace(m, quant="int8_ff")
    hp = quantize_dense_tree(params, names=FF_QUANT_NAMES)
    blocks = hp["params"]["blocks"]["block"]
    assert "kernel" in blocks["attn"]["to_q"]          # attention stays float
    assert "kernel_q" in blocks["ff"]["in_proj"]       # FF quantized
    y = m.apply(params, *args)
    yh = mh.apply(hp, *args)
    rel = float(jnp.linalg.norm(y - yh) / jnp.linalg.norm(y))
    assert rel < 3e-2, rel
    # hybrid error must not exceed the full-int8 error (it quantizes less)
    yq = DiT(arch=m.arch, mel_dim=20, text_num_embeds=50, quant="int8").apply(
        quantize_dense_tree(params), *args)
    relq = float(jnp.linalg.norm(y - yq) / jnp.linalg.norm(y))
    assert rel <= relq + 1e-3, (rel, relq)


def test_unknown_quant_mode_rejected_at_block_level(small_dit):
    import dataclasses

    m, _, params, args = small_dit
    bad = dataclasses.replace(m, quant="fp4")
    with pytest.raises(ValueError):
        bad.apply(params, *args)
