"""On-device correctness gate for the fused Pallas kernels.

Runs the FULL flagship DiT forward (dim 1024, depth 22, heads 16, d_head 64 —
``configs/multilingual_grl.yaml:48-58`` geometry) twice per shape — once with
``attn_backend="vmem"`` (the fused qkv/attention/ffn Pallas path that produces
the benchmark headline) and once with ``attn_backend="xla"`` (plain SDPA,
reference semantics per ``lemas_tts/model/modules.py:442-503``) — on the REAL
backend, and asserts agreement within a stated bf16 tolerance.

Why this exists: every Pallas parity test in ``tests/`` runs in interpreter
mode on CPU, but interpret mode is not the Mosaic lowering (f32 MXU rounding
and tile-edge semantics differ — see the perf log in CLAUDE.md). This script
is the only check of the kernels' *compiled* numerics, and ``bench.py`` runs
it before timing so a kernel regression fails the benchmark loudly instead of
producing fast wrong audio.

Tolerance calibration (v5e, 2026-08): at depth 22 the two bf16 backends agree
to a relative L2 of ~1e-2 (the dominant term is bf16 rounding of different but
equally-valid contraction orders, growing ~sqrt(depth)); fp32-vs-bf16 of the
SAME backend is of the same order, so 5e-2 rejects genuine kernel bugs (wrong
masks/rope/normalization produce rel errors ≥ 1) without flaking on rounding.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

REL_TOL = 5e-2

FLAGSHIP_NS = (1024, 2048, 4096)
FLAGSHIP_BS = (1, 8)


def _build(attn_backend: str, dtype):
    from lemas_tts_tpu.config import DiTArch
    from lemas_tts_tpu.models.dit import DiT

    return DiT(arch=DiTArch(), mel_dim=100, text_num_embeds=898,
               compute_dtype=dtype, attn_backend=attn_backend)


def check_kernels(
    ns: Sequence[int] = FLAGSHIP_NS,
    bs: Sequence[int] = FLAGSHIP_BS,
    rel_tol: float = REL_TOL,
    dtype=jnp.bfloat16,
    verbose: bool = True,
) -> list[dict]:
    """Compare vmem vs xla DiT forwards at flagship geometry. Returns one
    record per (N, B); raises AssertionError on any tolerance violation."""
    from lemas_tts_tpu.utils.misc import fast_random_params

    vmem = _build("vmem", dtype)
    xla = _build("xla", dtype)
    params = fast_random_params(
        lambda k: xla.init(k, jnp.zeros((1, 8, 100)), jnp.zeros((1, 8, 100)),
                           jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,))),
        jax.random.key(11), dtype=dtype,
    )

    # params MUST be a jit argument, not a closure capture: closed-over
    # arrays are inlined into the HLO as constants, and 330M inlined weights
    # exceed the axon tunnel's compile-request size limit (HTTP 413)
    @jax.jit
    def fwd_vmem(p, x, cond, text, t, mask):
        return vmem.apply(p, x, cond, text, t, mask)

    @jax.jit
    def fwd_xla(p, x, cond, text, t, mask):
        return xla.apply(p, x, cond, text, t, mask)

    rng = np.random.default_rng(5)
    records = []
    for n in ns:
        for b in bs:
            x = jnp.asarray(rng.standard_normal((b, n, 100)), dtype)
            cond = jnp.asarray(rng.standard_normal((b, n, 100)), dtype)
            text = jnp.asarray(rng.integers(1, 800, (b, 256)).astype(np.int32))
            t = jnp.asarray(rng.uniform(0.05, 0.95, (b,)).astype(np.float32))
            # ragged batch: last row padded to half length like a real bucket
            lens = np.full(b, n)
            if b > 1:
                lens[-1] = n // 2
            mask = jnp.asarray(np.arange(n)[None, :] < lens[:, None])

            a = np.asarray(fwd_vmem(params, x, cond, text, t, mask), np.float32)
            r = np.asarray(fwd_xla(params, x, cond, text, t, mask), np.float32)
            # compare valid frames only (padded queries are zeroed by both)
            m = np.asarray(mask)[..., None]
            diff = (a - r) * m
            rel = float(np.linalg.norm(diff) / (np.linalg.norm(r * m) + 1e-12))
            rec = {"n": n, "batch": b, "rel_l2": round(rel, 5),
                   "max_abs": round(float(np.abs(diff).max()), 5),
                   "ok": rel <= rel_tol}
            records.append(rec)
            if verbose:
                print(json.dumps(rec), file=sys.stderr)
            if not rec["ok"]:
                raise AssertionError(
                    f"fused-kernel mismatch at N={n} B={b}: rel_l2={rel:.4g} "
                    f"> {rel_tol} (platform "
                    f"{jax.devices()[0].platform}) — the vmem Pallas path "
                    f"disagrees with XLA SDPA; do not trust bench numbers"
                )
    return records


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--ns", type=int, nargs="+", default=list(FLAGSHIP_NS))
    ap.add_argument("--bs", type=int, nargs="+", default=list(FLAGSHIP_BS))
    ap.add_argument("--rel_tol", type=float, default=REL_TOL)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args(argv)

    from lemas_tts_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    records = check_kernels(args.ns, args.bs, args.rel_tol,
                            jnp.dtype(args.dtype))
    print(json.dumps({"kernel_check": "ok", "platform":
                      jax.devices()[0].platform, "records": records}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
