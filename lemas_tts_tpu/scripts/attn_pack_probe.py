"""Standalone probe: head-pair-PACKED nhd attention (VERDICT r3 item 7).

Compares ``ops/attention.vmem_attention_nhd`` against its ``pack_pair=True``
variant — one block-diagonal [bq,2D]·[2D,2N] score matmul + one
[bq,2N]·[2N,2D] output matmul per head pair, instead of two per-head chains
with lane-masked half-zero contractions (reference attention shape:
``/root/reference/lemas_tts/model/modules.py:442-503``). Same MAC count
(the zero lanes remain zeros either way — the d_head=64 MXU depth cap is
physical), so any win must come from fewer/larger MXU invocations and the
dropped per-q-block lane-mask VPU passes.

Methodology matches the prior kernel probes (CLAUDE.md): in-program
``lax.scan`` reps with the attention output fed back as the next q (defeats
loop-invariant hoisting), one scalar fetch per timing — per-call dispatch
timing through the tunnel has ±30% noise. Correctness is checked against
the unpacked kernel first. Accept/reject on these numbers + an e2e
``LEMAS_ATTN_PACK=1 python bench.py`` run.

Usage: python -m lemas_tts_tpu.scripts.attn_pack_probe [--shapes ...]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from lemas_tts_tpu.ops.attention import vmem_attention_nhd
from lemas_tts_tpu.ops.rope import rope_angles


def _bench(fn, q, k, v, mask, angles, heads, reps: int) -> float:
    """µs per call: scan `reps` dependent kernel calls inside one jit."""

    @jax.jit
    def run(q, k, v):
        def body(c, _):
            o = fn(c, k, v, mask, angles, heads=heads)
            return o.astype(c.dtype), ()

        out, _ = jax.lax.scan(body, q, None, length=reps)
        return jnp.sum(out.astype(jnp.float32))

    float(run(q, k, v))  # compile + warm
    t0 = time.perf_counter()
    float(run(q, k, v))
    return (time.perf_counter() - t0) / reps * 1e6


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="*", default=["8x1024", "1x1024",
                                                    "2x2048", "1x4096"],
                    help="BxN list (flagship heads=16, d=64)")
    ap.add_argument("--heads", type=int, default=16)
    # ≥50 in-scan reps for a valid ratio — ~20 ms tunnel dispatch overhead
    # pollutes shorter scans (CLAUDE.md round-4 methodology note)
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args(argv)

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    H, D = args.heads, 64
    for spec in args.shapes:
        B, N = (int(x) for x in spec.split("x"))
        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.standard_normal((B, N, H * D)), dt)
                   for _ in range(3))
        mask = jnp.asarray(np.arange(N)[None] < N - 64).repeat(B, 0)
        ang = rope_angles(N, D)

        base = vmem_attention_nhd(q, k, v, mask, ang, heads=H)
        packed = vmem_attention_nhd(q, k, v, mask, ang, heads=H,
                                    pack_pair=True)
        num = float(jnp.linalg.norm((packed - base).astype(jnp.float32)))
        den = float(jnp.linalg.norm(base.astype(jnp.float32)))
        rel = num / max(den, 1e-30)

        import functools

        t_base = _bench(functools.partial(vmem_attention_nhd),
                        q, k, v, mask, ang, H, args.reps)
        t_pack = _bench(functools.partial(vmem_attention_nhd,
                                          pack_pair=True),
                        q, k, v, mask, ang, H, args.reps)
        print(f"B={B} N={N}: base {t_base:8.0f} µs  packed {t_pack:8.0f} µs "
              f"({t_base / t_pack:4.2f}x)  rel_l2={rel:.2e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
