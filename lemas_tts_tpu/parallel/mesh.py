"""Device mesh + sharding layer (the reference has no distributed runtime —
SURVEY.md §2.3 — so this is designed TPU-first, not translated).

Axes:
 - ``data``: batch / chunk / request parallelism over ICI (and DCN multi-host);
 - ``model``: Megatron-style tensor parallelism inside each DiT block
   (column-parallel qkv/FF-in, row-parallel out/FF-out) expressed purely as
   ``PartitionSpec``s — XLA GSPMD inserts the all-reduces on ICI.

Everything works on any mesh size including 1×1; tests exercise an 8-device
virtual CPU mesh (``tests/conftest.py``).

Kernel-backend compatibility: the fused Pallas kernels (``attn_backend=
"vmem"``) are data-parallel only — ``data_parallel_sampler`` wraps them in
``shard_map`` so each device runs full-head programs on its batch shard.
Tensor parallelism over ``model`` (``dit_param_pspecs``) requires the
GSPMD-partitionable ``xla`` backend, which is what the trainer uses; at
DiT-flagship size a single v5e chip fits the whole model, so TP is a
training/memory tool, not a serving need.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1, devices=None
) -> Mesh:
    """('data','model') mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices % model_parallel == 0, (n_devices, model_parallel)
    grid = np.asarray(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, axis_names=("data", "model"))


def _path_names(path) -> list[str]:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
        else:
            out.append(str(p))
    return out


def dit_param_pspecs(params: Any) -> Any:
    """PartitionSpec pytree for DiT params: tensor-parallel attention/FF,
    replicated embeddings/norms. Works for both stacked (scan) and flat
    layouts because rules key off leaf path names."""

    def rule(path, leaf):
        names = _path_names(path)
        nd = leaf.ndim
        leaf_name = names[-1]
        parent = names[-2] if len(names) >= 2 else ""

        def spec_last(axis_name):
            return P(*([None] * (nd - 1) + [axis_name]))

        def spec_axis(idx, axis_name):
            s = [None] * nd
            s[idx] = axis_name
            return P(*s)

        # column-parallel: qkv projections and FF expand — shard output features
        if parent in ("to_q", "to_k", "to_v", "in_proj"):
            return spec_last("model")
        # row-parallel: output projections — shard the contraction axis
        if parent in ("to_out", "out_proj") and leaf_name == "kernel":
            return spec_axis(nd - 2, "model")
        # AdaLN modulation: row-parallel over the input dim (output replicated,
        # keeping the 6-way chunk split shard-agnostic)
        if parent == "mod" and leaf_name == "kernel":
            return spec_axis(nd - 2, "model")
        return P()  # replicate

    return jax.tree_util.tree_map_with_path(rule, params)


def fsdp_param_pspecs(
    params: Any,
    axis_size: int,
    axis: str = "data",
    base: Any = None,
    min_elems: int = 1 << 16,
) -> Any:
    """ZeRO-3-style fully-sharded parameter PartitionSpecs (the reference has
    no trainer at all — SURVEY.md §2.3; this is the TPU-native way to train
    models whose params + adam moments exceed one chip's HBM).

    Each leaf with ≥ ``min_elems`` elements shards ONE additional dimension
    over the ``axis`` ('data') mesh axis — the largest dim that is divisible
    by the axis size and not already sharded by the ``base`` (tensor-parallel)
    spec. Expressed purely as PartitionSpecs: under jit, XLA GSPMD all-gathers
    each param at its use site and reduce-scatters its gradient, so the
    resident footprint of params, grads, adam moments, and EMA is 1/axis_size
    per device while the train step stays numerically identical to plain DP.
    Small leaves (norm scales, biases) stay on the base spec — gathering them
    costs more latency than the bytes saved."""
    if base is None:
        base = jax.tree_util.tree_map(lambda _: P(), params)

    def rule(leaf, spec):
        if getattr(leaf, "size", 0) < min_elems:
            return spec
        parts = list(spec) + [None] * (leaf.ndim - len(spec))
        cands = [d for d in range(leaf.ndim)
                 if parts[d] is None and leaf.shape[d] % axis_size == 0
                 and leaf.shape[d] >= axis_size]
        if not cands:
            return spec
        d = max(cands, key=lambda i: leaf.shape[i])
        parts[d] = axis
        return P(*parts)

    return jax.tree_util.tree_map(rule, params, base)


def spec_axis_dims(specs: Any, axis: str) -> Any:
    """Per-leaf index of the dimension a PartitionSpec shards over ``axis``
    (−1 if none) — the manual-collective counterpart of a pspec tree, for
    shard_map code that must ``all_gather``/slice that axis by hand (the
    pipelined trainer's ZeRO-3 composition)."""

    def rule(spec):
        for i, entry in enumerate(tuple(spec)):
            names = entry if isinstance(entry, tuple) else (entry,)
            if axis in [n for n in names if n is not None]:
                return i
        return -1

    return jax.tree_util.tree_map(rule, specs,
                                  is_leaf=lambda s: isinstance(s, P))


def compat_shard_map():
    """`shard_map` with replication checking off, across jax versions
    (`check_vma` on jax ≥ 0.8, `check_rep` before). One shim shared by every
    parallel module (sequence/pipeline/data-parallel sampler)."""
    try:
        from jax import shard_map as _sm

        def sm(f, mesh, in_specs, out_specs):
            return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                       check_vma=False)

        return sm
    except ImportError:  # pragma: no cover - older jax
        from functools import partial as _p

        from jax.experimental.shard_map import shard_map as _sm

        return _p(_sm, check_rep=False)


def batch_pspecs_axis(batch: Any, axis: str) -> Any:
    """Shard the leading (batch) axis of every array over the named axis."""
    return jax.tree_util.tree_map(
        lambda x: P(axis) if getattr(x, "ndim", 0) >= 1 else P(), batch
    )


def batch_pspecs(batch: Any) -> Any:
    """Shard the leading (batch) axis of every array over 'data'."""
    return batch_pspecs_axis(batch, "data")


def shard_pytree(tree: Any, mesh: Mesh, specs: Any) -> Any:
    """Place a pytree onto the mesh with the given PartitionSpecs."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def opt_state_pspecs(opt_state: Any, param_pspecs: Any) -> Any:
    """PartitionSpec pytree for an optax state: param-structured subtrees
    (adam moments, …) get the SAME PartitionSpecs as the params — they are
    2× model size, and replicating them would OOM exactly when tensor
    parallelism is needed. Optax states are nested (named)tuples whose
    param-shaped subtrees are detected by treedef; scalars (step counts, …)
    replicate."""
    param_def = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda _: 0, param_pspecs)
    )

    def go(node):
        if (
            jax.tree_util.tree_structure(
                jax.tree_util.tree_map(lambda _: 0, node)
            )
            == param_def
        ):
            return param_pspecs
        if isinstance(node, tuple):  # optax chain / namedtuple states
            children = [go(c) for c in node]
            return (type(node)(*children) if hasattr(node, "_fields")
                    else type(node)(children))
        return jax.tree_util.tree_map(lambda _: P(), node)

    return go(opt_state)


def shard_opt_state(opt_state: Any, mesh: Mesh, param_pspecs: Any) -> Any:
    """Place an optax state onto the mesh (specs from `opt_state_pspecs`)."""
    return shard_pytree(opt_state, mesh,
                        opt_state_pspecs(opt_state, param_pspecs))


def data_parallel_sampler(sampler_fn, mesh: Mesh):
    """Wrap a jitted sampler so batched synthesis shards requests/chunks over
    the 'data' axis (the TPU equivalent of the reference's multi-process
    fan-out, SURVEY.md §2.3).

    Uses ``shard_map`` rather than GSPMD auto-partitioning: the TPU sampler
    contains Pallas (Mosaic) custom calls (attention/ffn/qkv kernels) which
    GSPMD cannot partition automatically — under shard_map each device runs
    the full program on its local batch shard, which is exactly the
    embarrassingly-parallel semantics batched synthesis wants. Batch sizes
    must be multiples of the 'data' axis (``Synthesizer._pick_batch`` pads)."""
    shard_map = compat_shard_map()

    def bspec(nd):
        return P(*(["data"] + [None] * (nd - 1)))

    # one jitted shard_map per optional-argument signature (None optionals
    # can't cross the shard_map boundary as specs, so each presence pattern
    # is its own program; jit then caches per shape bucket as usual)
    programs: dict = {}

    def _program(n_rest, present_idx, ndims):
        key = (n_rest, present_idx, ndims)
        f = programs.get(key)
        if f is None:
            def local(params_, cond_, cond_mask_, text_ids_, duration_, y0_,
                      *present):
                full = [None] * n_rest
                for j, i in enumerate(present_idx):
                    full[i] = present[j]
                return sampler_fn(params_, cond_, cond_mask_, text_ids_,
                                  duration_, y0_, *full)

            in_specs = (P(), bspec(3), bspec(2), bspec(2), bspec(1), bspec(3))
            in_specs += tuple(bspec(nd) for nd in ndims)
            f = jax.jit(shard_map(local, mesh=mesh, in_specs=in_specs,
                                  out_specs=bspec(3)))
            programs[key] = f
        return f

    def wrapped(params, cond, cond_mask, text_ids, duration, y0, *rest):
        put = lambda x, spec: (
            None if x is None else jax.device_put(x, NamedSharding(mesh, spec))
        )
        cond = put(cond, bspec(3))
        cond_mask = put(cond_mask, bspec(2))
        text_ids = put(text_ids, bspec(2))
        duration = put(duration, bspec(1))
        y0 = put(y0, bspec(3))
        rest = tuple(put(r, bspec(getattr(r, "ndim", 3))) for r in rest)
        present_idx = tuple(i for i, r in enumerate(rest) if r is not None)
        args = tuple(rest[i] for i in present_idx)
        f = _program(len(rest), present_idx, tuple(a.ndim for a in args))
        return f(params, cond, cond_mask, text_ids, duration, y0, *args)

    return wrapped
