"""Capture and summarize a device trace of the flagship sampler.

The reference has no profiling tooling (SURVEY.md §5 "Tracing: none"); this
CLI makes the TPU timeline a first-class artifact: it runs the jitted
CFM/DiT sampler on random weights (RTF is weight-independent), captures a
``jax.profiler`` trace, and prints the top XLA ops by total device time —
the exact workflow that produced the per-op budgets in docs/performance.md.

Usage::

    python -m lemas_tts_tpu.scripts.profile_sampler --batch 4 --nfe 32
    python -m lemas_tts_tpu.scripts.profile_sampler --logdir /tmp/trace \
        --top 30          # keep the trace for TensorBoard/XProf

Works on any backend (CPU traces parse the same way); op names follow the
optimized HLO, so pair it with
``jax.jit(fn).lower(...).compile().as_text()`` when chasing layouts.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import tempfile
import time


def summarize_xplane(path: str, top: int = 25) -> str:
    """Parse an ``.xplane.pb`` trace and tabulate device-op durations."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    lines_out = []
    for plane in xs.planes:
        # keep any plane carrying an "XLA Ops" line (TPU device planes; CPU
        # traces expose op events under differently-named planes or not at
        # all depending on backend version)
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot: collections.Counter = collections.Counter()
        cnt: collections.Counter = collections.Counter()
        for line in plane.lines:
            if "xla ops" not in line.name.lower():
                continue
            for ev in line.events:
                op = ev_meta.get(ev.metadata_id, "?")
                tot[op] += ev.duration_ps / 1e9  # ps → ms
                cnt[op] += 1
        if not tot:
            continue
        lines_out.append(f"== {plane.name}: total XLA-op time "
                         f"{sum(tot.values()):.2f} ms")
        for op, ms in tot.most_common(top):
            lines_out.append(f"{ms:9.3f} ms  n={cnt[op]:>5}  {op[:110]}")
    return "\n".join(lines_out) or "(no device-op events found in trace)"


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--nfe", type=int, default=32)
    p.add_argument("--frames", type=int, default=1024,
                   help="mel-frame bucket (sequence length)")
    p.add_argument("--text_len", type=int, default=256)
    p.add_argument("--logdir", type=str, default=None,
                   help="keep the trace here (default: temp dir, deleted)")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--summarize", type=str, default=None, metavar="XPLANE_PB",
                   help="only parse an existing .xplane.pb and exit")
    p.add_argument("--quant", type=str, default="",
                   help="profile the W8A8 serving dtype ('int8'/'int8_ff'; "
                        "blank = bf16 exact path)")
    args = p.parse_args(argv)

    if args.summarize:
        print(summarize_xplane(args.summarize, args.top))
        return 0

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lemas_tts_tpu.cfm.sampler import SamplerSettings, make_sampler
    from lemas_tts_tpu.config import DiTArch
    from lemas_tts_tpu.models.dit import DiT
    from lemas_tts_tpu.ops.attention import default_backend

    on_tpu = jax.devices()[0].platform.lower() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    arch = DiTArch()
    model = DiT(arch=arch, mel_dim=100, text_num_embeds=898,
                compute_dtype=dtype, attn_backend=default_backend())

    rng = np.random.default_rng(0)
    B, N, nt = args.batch, args.frames, args.text_len
    text = jnp.asarray(rng.integers(1, 800, (B, nt)).astype(np.int32))

    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 8, 100)), jnp.zeros((1, 8, 100)),
                             jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,))),
        jax.random.key(0),
    )
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def gen_params(k):
        ks = jax.random.split(k, len(leaves))
        return treedef.unflatten(
            [jax.random.normal(kk, l.shape, dtype) * 0.02
             for kk, l in zip(ks, leaves)]
        )

    params = jax.block_until_ready(gen_params(jax.random.key(1)))
    if args.quant:
        import dataclasses

        from lemas_tts_tpu.ops.quant import (FF_QUANT_NAMES,
                                             quantize_dense_tree)

        model = dataclasses.replace(model, quant=args.quant)
        names = FF_QUANT_NAMES if args.quant == "int8_ff" else None
        params = jax.block_until_ready(jax.jit(
            lambda pp: quantize_dense_tree(pp, names=names))(params))

    ref_frames = min(188, N // 4)
    cond = np.zeros((B, N, 100), np.float32)
    cond[:, :ref_frames] = rng.standard_normal((B, ref_frames, 100)) * 0.5 - 5.0
    cond_mask = np.zeros((B, N), bool)
    cond_mask[:, :ref_frames] = True
    run = make_sampler(model, SamplerSettings(steps=args.nfe, cfg_strength=2.0,
                                              sway_sampling_coef=1.0))
    a = (jnp.asarray(cond), jnp.asarray(cond_mask), text,
         jnp.asarray(np.full(B, N, np.int32)),
         jnp.asarray(rng.standard_normal((B, N, 100)).astype(np.float32)))

    jax.block_until_ready(run(params, *a))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(run(params, *a))
    wall = time.perf_counter() - t0
    print(f"sampler: {wall * 1e3:.1f} ms total, "
          f"{wall / args.nfe * 1e3:.2f} ms/step "
          f"(B={B}, N={N}, NFE={args.nfe}, backend={default_backend()})")

    logdir = args.logdir or tempfile.mkdtemp(prefix="lemas_trace_")
    jax.profiler.start_trace(logdir)
    jax.block_until_ready(run(params, *a))
    jax.profiler.stop_trace()
    pbs = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not pbs:
        print(f"no xplane written under {logdir}")
        return 1
    try:
        print(summarize_xplane(max(pbs, key=os.path.getmtime), args.top))
    except ImportError:
        print(f"trace at {pbs[-1]} (tensorflow not available to parse here)")
    if args.logdir:
        print(f"trace kept at {args.logdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
