"""Checkpoint loading & PyTorch→JAX weight conversion.

The reference ships ``.safetensors``/``.pt`` checkpoints with EMA weights under
``ema_model.*`` keys (``utils_infer.py:204-246``). This module:

 - normalizes a raw state dict (EMA key remap, ``initted``/``step`` dropped,
   back-compat key deletion — same semantics as the reference loader);
 - converts the reference tensor layout (torch Linear ``[out,in]``, Conv1d
   ``[out,in/g,k]``) into this framework's flax param pytree (Dense
   ``[in,out]``, Conv ``[k,in/g,out]``), stacking the per-layer DiT blocks
   along axis 0 for the ``nn.scan`` body;
 - loads/saves native orbax checkpoints for round-tripping without torch.

No torch import is required unless a ``.pt`` file is read.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

# Back-compat keys deleted by the reference loader (utils_infer.py:233-235).
_BACKCOMPAT_DELETE = (
    "mel_spec.mel_stft.mel_scale.fb",
    "mel_spec.mel_stft.spectrogram.window",
    "ctc.proj.0.weight",
    "ctc.proj.0.bias",
    "ctc.ctc_proj.weight",
    "ctc.ctc_proj.bias",
)


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    return v.detach().cpu().float().numpy()  # torch tensor


def load_state_dict(path: str, use_ema: bool = True) -> Dict[str, np.ndarray]:
    """Read a ``.safetensors`` or torch ``.pt`` file into {key: np.ndarray}.

    Training ``.pt`` files hold both ``ema_model_state_dict`` and
    ``model_state_dict``; like the reference loader (``utils_infer.py:227`` vs
    ``:240``), ``use_ema`` selects which (falling back to whichever exists)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and (
        "ema_model_state_dict" in obj or "model_state_dict" in obj
    ):
        preferred = "ema_model_state_dict" if use_ema else "model_state_dict"
        fallback = "model_state_dict" if use_ema else "ema_model_state_dict"
        obj = obj.get(preferred, obj.get(fallback))
    return {k: _to_numpy(v) for k, v in obj.items()}


def normalize_state_dict(
    sd: Mapping[str, np.ndarray], use_ema: bool = True
) -> Dict[str, np.ndarray]:
    """EMA remap + back-compat cleanup (reference ``load_checkpoint`` semantics)."""
    out: Dict[str, np.ndarray] = {}
    has_ema = any(k.startswith("ema_model.") for k in sd)
    has_plain = any(
        not k.startswith("ema_model.") and k not in ("initted", "step")
        for k in sd
    )
    # use_ema picks the stream; an EMA-only file (typical released
    # .safetensors) is still usable with use_ema=False — there is nothing
    # else to load
    take_ema = has_ema and (use_ema or not has_plain)
    for k, v in sd.items():
        if k in ("initted", "step"):
            continue
        is_ema = k.startswith("ema_model.")
        if take_ema:
            if not is_ema:
                continue
            k = k[len("ema_model.") :]
            if k in ("initted", "step"):
                continue
        elif is_ema:
            continue
        out[k] = np.asarray(v)
    for k in _BACKCOMPAT_DELETE:
        out.pop(k, None)
    return out


def _linear(sd, prefix):
    p = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _conv1d(sd, prefix):
    # torch [out, in/groups, k] -> flax [k, in/groups, out]
    p = {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _layernorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _convnext_block(sd, prefix):
    return {
        "dwconv": _conv1d(sd, f"{prefix}.dwconv"),
        "norm": _layernorm(sd, f"{prefix}.norm"),
        "pwconv1": _linear(sd, f"{prefix}.pwconv1"),
        "grn": {"gamma": sd[f"{prefix}.grn.gamma"], "beta": sd[f"{prefix}.grn.beta"]},
        "pwconv2": _linear(sd, f"{prefix}.pwconv2"),
    }


def _stack(dicts: list) -> Any:
    """Stack a list of identically-structured param trees along axis 0."""
    first = dicts[0]
    if isinstance(first, dict):
        return {k: _stack([d[k] for d in dicts]) for k in first}
    return np.stack(dicts, axis=0)


def convert_dit(
    sd: Mapping[str, np.ndarray], prefix: str = "transformer."
) -> Dict[str, Any]:
    """Reference DiT state dict (``dit.py:105-181`` layout) → flax params for
    :class:`lemas_tts_tpu.models.dit.DiT` (scan-stacked blocks)."""
    g = lambda k: f"{prefix}{k}"

    params: Dict[str, Any] = {
        "time_embed": {
            "mlp_in": _linear(sd, g("time_embed.time_mlp.0")),
            "mlp_out": _linear(sd, g("time_embed.time_mlp.2")),
        },
        "input_embed": {
            "proj": _linear(sd, g("input_embed.proj")),
            "conv_pos": {
                "conv1": _conv1d(sd, g("input_embed.conv_pos_embed.conv1d.0")),
                "conv2": _conv1d(sd, g("input_embed.conv_pos_embed.conv1d.2")),
            },
        },
        "norm_out": {"mod": _linear(sd, g("norm_out.linear"))},
        "proj_out": _linear(sd, g("proj_out")),
    }

    te: Dict[str, Any] = {"embed": {"embedding": sd[g("text_embed.text_embed.weight")]}}
    i = 0
    while g(f"text_embed.text_blocks.{i}.dwconv.weight") in sd:
        te[f"block_{i}"] = _convnext_block(sd, g(f"text_embed.text_blocks.{i}"))
        i += 1
    params["text_embed"] = te

    depth = 0
    while g(f"transformer_blocks.{depth}.attn_norm.linear.weight") in sd:
        depth += 1
    blocks = []
    for i in range(depth):
        b = g(f"transformer_blocks.{i}")
        block = {
            "attn_norm": {"mod": _linear(sd, f"{b}.attn_norm.linear")},
            "attn": {
                "to_q": _linear(sd, f"{b}.attn.to_q"),
                "to_k": _linear(sd, f"{b}.attn.to_k"),
                "to_v": _linear(sd, f"{b}.attn.to_v"),
                "to_out": _linear(sd, f"{b}.attn.to_out.0"),
            },
            "ff": {
                "in_proj": _linear(sd, f"{b}.ff.ff.0.0"),
                "out_proj": _linear(sd, f"{b}.ff.ff.2"),
            },
        }
        if f"{b}.attn.q_norm.weight" in sd:
            block["attn"]["q_norm"] = {"weight": sd[f"{b}.attn.q_norm.weight"]}
            block["attn"]["k_norm"] = {"weight": sd[f"{b}.attn.k_norm.weight"]}
        blocks.append(block)
    params["blocks"] = {"block": _stack(blocks)}

    if g("long_skip_connection.weight") in sd:
        params["long_skip"] = _linear(sd, g("long_skip_connection"))
    if g("prosody_text_proj.weight") in sd:
        params["prosody_text_proj"] = _linear(sd, g("prosody_text_proj"))
    return params


def _unstack(tree: Any, depth: int) -> list:
    """Inverse of :func:`_stack`: split scan-stacked leaves into per-block trees."""
    if isinstance(tree, dict):
        parts = {k: _unstack(v, depth) for k, v in tree.items()}
        return [{k: parts[k][i] for k in parts} for i in range(depth)]
    arr = np.asarray(tree)
    assert arr.shape[0] == depth, (arr.shape, depth)
    return [arr[i] for i in range(depth)]


def export_dit_state_dict(
    params: Mapping[str, Any], prefix: str = "transformer."
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_dit`: flax DiT params → reference-layout
    torch state dict (``lemas_tts/model/backbones/dit.py:105-181`` key names,
    fp32 numpy values). Enables migrating checkpoints *back* to the
    reference/torch ecosystem (e.g. distilled or fine-tuned students).
    Round-trips exactly: ``export_dit_state_dict(convert_dit(sd)) == sd``.
    """
    if "dit" in params:  # a convert_cfm-style tree {"dit": ..., ...}
        params = params["dit"]
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    g = lambda k: f"{prefix}{k}"

    def put_linear(key: str, node: Mapping[str, Any]):
        sd[f"{key}.weight"] = np.asarray(node["kernel"]).T
        if "bias" in node:
            sd[f"{key}.bias"] = np.asarray(node["bias"])

    def put_conv1d(key: str, node: Mapping[str, Any]):
        # flax [k, in/groups, out] -> torch [out, in/groups, k]
        sd[f"{key}.weight"] = np.transpose(np.asarray(node["kernel"]), (2, 1, 0))
        if "bias" in node:
            sd[f"{key}.bias"] = np.asarray(node["bias"])

    def put_layernorm(key: str, node: Mapping[str, Any]):
        sd[f"{key}.weight"] = np.asarray(node["scale"])
        sd[f"{key}.bias"] = np.asarray(node["bias"])

    def put_convnext(key: str, node: Mapping[str, Any]):
        put_conv1d(f"{key}.dwconv", node["dwconv"])
        put_layernorm(f"{key}.norm", node["norm"])
        put_linear(f"{key}.pwconv1", node["pwconv1"])
        sd[f"{key}.grn.gamma"] = np.asarray(node["grn"]["gamma"])
        sd[f"{key}.grn.beta"] = np.asarray(node["grn"]["beta"])
        put_linear(f"{key}.pwconv2", node["pwconv2"])

    put_linear(g("time_embed.time_mlp.0"), p["time_embed"]["mlp_in"])
    put_linear(g("time_embed.time_mlp.2"), p["time_embed"]["mlp_out"])
    put_linear(g("input_embed.proj"), p["input_embed"]["proj"])
    put_conv1d(g("input_embed.conv_pos_embed.conv1d.0"),
               p["input_embed"]["conv_pos"]["conv1"])
    put_conv1d(g("input_embed.conv_pos_embed.conv1d.2"),
               p["input_embed"]["conv_pos"]["conv2"])
    put_linear(g("norm_out.linear"), p["norm_out"]["mod"])
    put_linear(g("proj_out"), p["proj_out"])

    te = p["text_embed"]
    sd[g("text_embed.text_embed.weight")] = np.asarray(te["embed"]["embedding"])
    for name, node in te.items():
        if name.startswith("block_"):
            i = int(name.split("_")[1])
            put_convnext(g(f"text_embed.text_blocks.{i}"), node)

    stacked = p["blocks"]["block"]
    if "kernel_q" in stacked.get("attn", {}).get("to_q", {}):
        raise ValueError(
            "cannot export int8-quantized params to torch; export the float "
            "checkpoint the quantized tree was converted from"
        )
    depth = int(np.asarray(stacked["attn"]["to_q"]["kernel"]).shape[0])
    for i, block in enumerate(_unstack(stacked, depth)):
        b = g(f"transformer_blocks.{i}")
        put_linear(f"{b}.attn_norm.linear", block["attn_norm"]["mod"])
        for proj in ("to_q", "to_k", "to_v"):
            put_linear(f"{b}.attn.{proj}", block["attn"][proj])
        put_linear(f"{b}.attn.to_out.0", block["attn"]["to_out"])
        put_linear(f"{b}.ff.ff.0.0", block["ff"]["in_proj"])
        put_linear(f"{b}.ff.ff.2", block["ff"]["out_proj"])
        if "q_norm" in block["attn"]:
            sd[f"{b}.attn.q_norm.weight"] = np.asarray(
                block["attn"]["q_norm"]["weight"])
            sd[f"{b}.attn.k_norm.weight"] = np.asarray(
                block["attn"]["k_norm"]["weight"])

    if "long_skip" in p:
        put_linear(g("long_skip_connection"), p["long_skip"])
    if "prosody_text_proj" in p:
        put_linear(g("prosody_text_proj"), p["prosody_text_proj"])
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def convert_cfm(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Full reference CFM state dict → inference param pytree:
    ``{"dit": ..., "prosody_to_mel": ...?}`` (training-only heads —
    accent classifier, CTC, speaker encoder — are not needed for sampling)."""
    out: Dict[str, Any] = {"dit": convert_dit(sd)}
    if "prosody_to_mel.weight" in sd:
        out["prosody_to_mel"] = _linear(sd, "prosody_to_mel")
    return out


def load_cfm_checkpoint(path: str, use_ema: bool = True) -> Dict[str, Any]:
    """File → normalized → converted inference params."""
    return convert_cfm(
        normalize_state_dict(load_state_dict(path, use_ema=use_ema),
                             use_ema=use_ema)
    )


# --- native (orbax) checkpoints -------------------------------------------------


def save_native(params: Any, path: str) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_native(path: str) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)
