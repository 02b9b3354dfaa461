"""Shared setup for the sampler speed/quality probes
(``cutoff_probe`` / ``blockcache_probe``): one construction site for the
flagship-geometry model, params, and synthetic probe inputs so the two
probes measure the exact same workload."""

from __future__ import annotations


def probe_model_and_inputs(args):
    """(model, params, inputs) for a probe CLI namespace with
    ``ckpt/dim/depth/heads/seed/batch/n`` args.

    inputs = (cond, cond_mask, text_ids, duration, y0) at [batch, n] probe
    geometry: ~2 s of synthetic reference mel (``ref = min(188, n // 4)``
    frames) conditioning the rest of the bucket.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lemas_tts_tpu.config import DiTArch
    from lemas_tts_tpu.models.dit import DiT
    from lemas_tts_tpu.ops.attention import default_backend
    from lemas_tts_tpu.utils.misc import fast_random_params

    dim_head = getattr(args, "dim_head", None) or (
        args.dim // args.heads if args.dim < 1024 else 64)
    # --mel_dim/--vocab let the probes run on non-flagship checkpoints
    # (e.g. the validate_assets full-chain drill's tiny synthetic ckpt)
    D = getattr(args, "mel_dim", None) or 100
    vocab = getattr(args, "vocab", None) or 898
    arch = DiTArch(dim=args.dim, depth=args.depth, heads=args.heads,
                   dim_head=dim_head,
                   text_dim=getattr(args, "text_dim", None) or 512,
                   conv_layers=getattr(args, "conv_layers", None) or 4)
    model = DiT(arch=arch, mel_dim=D, text_num_embeds=vocab,
                compute_dtype=jnp.bfloat16, attn_backend=default_backend())
    if args.ckpt:
        from pathlib import Path

        from lemas_tts_tpu.infer.checkpoints import (
            load_cfm_checkpoint,
            load_native,
        )

        # a directory is an orbax artifact (what convert_checkpoint /
        # validate_assets write — the full-chain drill caught the reprobes
        # only accepting torch files); a file is a torch/safetensors ckpt
        if Path(args.ckpt).is_dir():
            params = {"params": load_native(str(Path(args.ckpt).resolve()))["dit"]}
        else:
            params = {"params": load_cfm_checkpoint(args.ckpt)["dit"]}
    else:
        params = fast_random_params(
            lambda k: model.init(k, jnp.zeros((1, 8, D)),
                                 jnp.zeros((1, 8, D)),
                                 jnp.zeros((1, 4), jnp.int32),
                                 jnp.zeros((1,))),
            jax.random.key(1), dtype=jnp.bfloat16)

    # optional W8A8 (ops/quant.py): probe the serving dtype — specs chosen
    # at bf16 should be re-validated under the int8 serving default
    if getattr(args, "quant", None):
        import dataclasses

        from lemas_tts_tpu.ops.quant import (FF_QUANT_NAMES,
                                             quantize_dense_tree)

        names = FF_QUANT_NAMES if args.quant == "int8_ff" else None
        model = dataclasses.replace(model, quant=args.quant)
        params = jax.jit(
            lambda p: quantize_dense_tree(p, names=names))(params)

    rng = np.random.default_rng(args.seed)
    B, N = args.batch, args.n
    ref = min(188, N // 4)  # ≈ 2 s reference audio at flagship buckets
    nt = min(256, max(8, N // 4))
    text = jnp.asarray(
        rng.integers(1, min(800, vocab - 1), (B, nt)).astype(np.int32))
    cond = np.zeros((B, N, D), np.float32)
    cond[:, :ref] = rng.standard_normal((B, ref, D)) * 0.5 - 5.0
    cond_mask = np.zeros((B, N), bool)
    cond_mask[:, :ref] = True
    inputs = (jnp.asarray(cond), jnp.asarray(cond_mask), text,
              jnp.full((B,), N, jnp.int32),
              jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32))
    return model, params, inputs
