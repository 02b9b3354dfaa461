"""CFM training objective (flow MSE + accent-GRL CE + optional CTC).

Functional re-design of the reference ``CFM.forward`` (``cfm.py:506-702``):
same math — φ = (1−t)x0 + t·x1 flow target, random 0.7–1.0 span-mask
conditioning, gradient-reversed cond for the accent classifier, per-batch CFG
drops, NaN/300 clamps — expressed as a pure jittable function. CFG drop
decisions are static booleans chosen by the host per step (4 cached programs)
because text-drop changes the embedding graph, matching the reference's
python-level ``random()`` branches (``cfm.py:631-634``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from lemas_tts_tpu.utils.masks import lens_to_mask, mask_from_frac_lengths


@jax.custom_vjp
def grad_reverse(x, lam=1.0):
    return x


def _gr_fwd(x, lam):
    return x, lam


def _gr_bwd(lam, g):
    return (-lam * g, None)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


class AccentClassifier(nn.Module):
    """Linear→ReLU→Linear accent head over GRL features (``modules.py:776-787``)."""

    hidden_dim: int
    num_accents: int = 12

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden_dim, name="fc1")(x)
        h = jax.nn.relu(h)
        return nn.Dense(self.num_accents, name="fc2")(h)


class CTCHead(nn.Module):
    """MI estimator head: proj→ReLU→vocab+1 CTC logits (``modules.py:734-767``)."""

    hidden_size: int
    vocab_size: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(nn.Dense(self.hidden_size, name="proj")(x))
        return nn.Dense(self.vocab_size + 1, name="ctc_proj")(h)


def info_nce_speaker(e_gt: jax.Array, e_pred: jax.Array,
                     temperature: float = 0.1) -> jax.Array:
    """In-batch InfoNCE between ground-truth and predicted speaker embeddings
    (reference ``CFM.info_nce_speaker``, ``cfm.py:476-503``): row i of
    ``e_pred`` is positive with row i of ``e_gt``, all other rows negative."""
    e_gt = e_gt / jnp.clip(jnp.linalg.norm(e_gt, axis=1, keepdims=True), 1e-12)
    e_pred = e_pred / jnp.clip(
        jnp.linalg.norm(e_pred, axis=1, keepdims=True), 1e-12
    )
    logits = jnp.einsum("bd,cd->bc", e_pred, e_gt) / temperature
    labels = jnp.arange(e_gt.shape[0])
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def cfm_training_loss(
    dit_model: Any,
    dit_params: Any,
    aux_models: Dict[str, Any],  # {"accent": AccentClassifier, "ctc": CTCHead?}
    aux_params: Dict[str, Any],
    batch: Dict[str, jax.Array],  # mel [B,T,D], mel_lengths [B], text [B,nt], langs [B]
    rng: jax.Array,
    *,
    frac_lengths_mask=(0.7, 1.0),
    drop_audio_cond: bool = False,
    drop_text: bool = False,
    accent_weight: float = 0.1,
    ctc_weight: float = 0.1,
    vocab_size: Optional[int] = None,
    prosody_params: Optional[Dict[str, Any]] = None,  # {"kernel","bias"} 512→D
    prosody_dropout: float = 0.2,
    apply_fn: Optional[Any] = None,  # override for dit_model.apply (same
    # signature) — used by parallel/pipeline.py to route the forward through
    # the microbatch pipeline while keeping the loss math identical
    loss_psum_axis: Optional[str] = None,  # mesh axis holding batch shards
    # (shard_map callers): reductions (flow denom, accent mean, CTC gate)
    # psum over it so the local-batch loss IS the global-batch loss — the
    # reference's single-device semantics (e.g. its `n_sel > 2` CTC gate,
    # cfm.py:679, is over the whole batch, not a shard)
):
    mel = batch["mel"]  # [B, T, D]
    lens = batch["mel_lengths"]
    text = batch["text"]
    langs = batch["langs"]
    B, T, D = mel.shape

    r_frac, r_span, r_noise, r_time, r_pdrop, r_dropout = jax.random.split(rng, 6)

    mask = lens_to_mask(lens, T)
    frac = jax.random.uniform(
        r_frac, (B,), minval=frac_lengths_mask[0], maxval=frac_lengths_mask[1]
    )
    rand_span_mask = mask_from_frac_lengths(lens, frac, T, r_span) & mask

    x1 = mel
    x0 = jax.random.normal(r_noise, x1.shape, x1.dtype)
    time = jax.random.uniform(r_time, (B,), dtype=x1.dtype)
    t = time[:, None, None]
    phi = (1 - t) * x0 + t * x1
    flow = x1 - x0

    cond = jnp.where(rand_span_mask[..., None], 0.0, x1)

    # --- optional prosody conditioning (cfm.py:544-624): dense per-frame /
    # per-token embedding maps are pre-scattered by the data pipeline
    # (cfm/data.py) so the jitted loss stays static-shaped; dropout 0.2 on
    # both maps, mel-side projected and added to cond before grad reversal.
    prosody_text_cond = batch.get("prosody_text_cond")
    prosody_mel_cond = batch.get("prosody_mel_cond")
    if prosody_mel_cond is not None and prosody_params is not None:
        kd, kt = jax.random.split(r_pdrop)
        if prosody_dropout > 0:
            keep = 1.0 - prosody_dropout
            prosody_mel_cond = prosody_mel_cond * (
                jax.random.bernoulli(kd, keep, prosody_mel_cond.shape) / keep
            )
            if prosody_text_cond is not None:
                prosody_text_cond = prosody_text_cond * (
                    jax.random.bernoulli(kt, keep, prosody_text_cond.shape) / keep
                )
        proj = (prosody_mel_cond[:, :T, :] @ prosody_params["kernel"]
                + prosody_params["bias"])
        cond = cond + proj

    # NOTE: the prosody projection is added BEFORE grad_reverse, exactly as the
    # reference does (cfm.py:612-624) — which means prosody_to_mel receives
    # the *reversed* flow-loss gradient through the transformer path (its only
    # well-behaved training signal is the accent head). Kept for checkpoint /
    # behavior parity; flip the order if training prosody models from scratch.
    cond_grl = grad_reverse(cond, 1.0)

    pred = (apply_fn or dit_model.apply)(
        dit_params, phi, cond_grl, text, time, mask,
        drop_audio_cond=drop_audio_cond, drop_text=drop_text,
        prosody_text=prosody_text_cond,
        deterministic=False,  # training: arch.dropout is live (reference
        # Attention/FeedForward Dropout, modules.py:342-353,412-414)
        rngs={"dropout": r_dropout},
    )

    # --- flow loss: clamped masked MSE (cfm.py:647-661)
    def gsum(x):
        return (jax.lax.psum(x, loss_psum_axis) if loss_psum_axis is not None
                else x)

    pred_clamp = jnp.clip(pred.astype(jnp.float32), -20.0, 20.0)
    diff = pred_clamp - flow.astype(jnp.float32)
    # sanitize per-element BEFORE the reduction (double-where): a scalar
    # where() only fixes the forward value — its backward multiplies the
    # zero cotangent by NaN, poisoning every grad through clip_by_global_norm
    diff = jnp.where(jnp.isfinite(diff), diff, 0.0)
    per_elem = jnp.square(diff)
    mexp = rand_span_mask[..., None].astype(jnp.float32)
    denom = jnp.maximum(gsum(mexp.sum()) * D, 1.0)
    loss = gsum((per_elem * mexp).sum()) / denom
    loss = jnp.where(jnp.isnan(loss) | (loss > 300.0), 300.0, loss)

    # --- accent loss over gradient-reversed cond (cfm.py:663-671)
    accent_logits = aux_models["accent"].apply(aux_params["accent"], cond_grl)
    accent_mean = accent_logits.mean(axis=1)
    accent_ce = optax.softmax_cross_entropy_with_integer_labels(
        accent_mean, langs
    )
    accent_loss = gsum(accent_ce.sum()) / gsum(jnp.float32(B))
    accent_loss = jnp.where(jnp.isfinite(accent_loss), accent_loss, 0.0)

    total = loss + accent_weight * accent_loss

    # --- optional CTC loss on high-t samples (cfm.py:676-695)
    ctc_loss_val = jnp.zeros((), jnp.float32)
    if "ctc" in aux_models and vocab_size is not None:
        logits = aux_models["ctc"].apply(aux_params["ctc"], pred)  # [B, T, V+1]
        logit_pad = 1.0 - mask.astype(jnp.float32)
        labels = jnp.maximum(text, 0)
        label_pad = (text == -1).astype(jnp.float32)
        per_sample = optax.ctc_loss(
            logits.astype(jnp.float32), logit_pad, labels, label_pad,
            blank_id=vocab_size,
        )
        per_sample = per_sample / jnp.maximum(lens.astype(jnp.float32), 1.0)
        bad = jnp.isnan(per_sample) | (per_sample > 300.0)
        # double-where: the inner where zeroes the NaN on the grad path so
        # the outer clamp's zero cotangent never multiplies a NaN
        per_sample = jnp.where(bad, 300.0, jnp.where(bad, 0.0, per_sample))
        sel = (time > 0.5).astype(jnp.float32)
        n_sel = gsum(sel.sum())
        ctc_mean = gsum((per_sample * sel).sum()) / jnp.maximum(n_sel, 1.0)
        # n_sel > 2: the reference's exact activation gate (cfm.py:679) —
        # with global batch <= 2 the CTC term never fires, by design
        use_ctc = (n_sel > 2) & jnp.isfinite(ctc_mean) & (ctc_mean > 1e-6)
        ctc_loss_val = jnp.where(use_ctc, ctc_mean, 0.0)
        total = total + ctc_weight * ctc_loss_val

    metrics = {
        "loss": total,
        "flow_loss": loss,
        "accent_loss": accent_loss,
        "ctc_loss": ctc_loss_val,
    }
    return total, metrics
