"""UVR5 VR-architecture separation network (CascadedNet) in flax.

Alternate separation family reachable via ``process_method='VR Arc'``
(reference ``uvr5/lib_v5/vr_network/nets_new.py:41-125`` + ``layers_new.py``):
a dual-band cascade of U-Nets — stage 1 processes low/high spectrogram bands
separately, stage 2 refines with stage-1 features, stage 3 fuses the full
band — each U-Net an encoder/ASPP/decoder with a bidirectional-LSTM bottleneck
branch; output is a sigmoid magnitude mask.

TPU notes: channel-last [B, F, T, C] layout; bilinear ``align_corners=True``
upsampling implemented explicitly (XLA's resize has no align_corners mode);
the BiLSTM runs as a ``flax`` ``nn.RNN`` scan over time. BatchNorms run in
inference mode (running stats) — this is an inference framework component.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def bilinear_2x_align_corners(x: jax.Array) -> jax.Array:
    """[B, H, W, C] → [B, 2H, 2W, C], matching torch
    ``F.interpolate(scale_factor=2, mode='bilinear', align_corners=True)``."""
    B, H, W, C = x.shape

    def axis_resize(arr, out_len, axis):
        in_len = arr.shape[axis]
        if in_len == 1:
            return jnp.repeat(arr, out_len, axis=axis)
        pos = jnp.arange(out_len) * (in_len - 1) / (out_len - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_len - 1)
        w = (pos - lo).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = out_len
        return a + (b - a) * w.reshape(shape)

    x = axis_resize(x, 2 * H, 1)
    return axis_resize(x, 2 * W, 2)


def crop_center(skip: jax.Array, target: jax.Array) -> jax.Array:
    """Center-crop ``skip`` [B, F, T, C] to ``target``'s F/T
    (reference ``spec_utils.crop_center``; requires skip ≥ target)."""
    dF = skip.shape[1] - target.shape[1]
    dT = skip.shape[2] - target.shape[2]
    assert dF >= 0 and dT >= 0, (skip.shape, target.shape)
    f0, t0 = dF // 2, dT // 2
    return skip[:, f0 : f0 + target.shape[1], t0 : t0 + target.shape[2], :]


class ConvBNActiv(nn.Module):
    nout: int
    ksize: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    activ: str = "relu"  # "relu" | "leaky"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.nout, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=self.pad, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn")(x)
        return nn.relu(x) if self.activ == "relu" else nn.leaky_relu(x, 0.01)


class Encoder(nn.Module):
    nout: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        h = ConvBNActiv(self.nout, 3, self.stride, 1, activ="leaky",
                        name="conv1")(x)
        return ConvBNActiv(self.nout, 3, 1, 1, activ="leaky", name="conv2")(h)


class Decoder(nn.Module):
    nout: int

    @nn.compact
    def __call__(self, x, skip=None):
        x = bilinear_2x_align_corners(x)
        if skip is not None:
            # upsampling can overshoot an odd-sized skip by one — trim x first
            x = x[:, : skip.shape[1], : skip.shape[2], :]
            x = jnp.concatenate([x, crop_center(skip, x)], axis=-1)
        return ConvBNActiv(self.nout, 3, 1, 1, name="conv1")(x)


class ASPPModule(nn.Module):
    nout: int
    dilations: Tuple[Tuple[int, int], ...] = ((4, 2), (8, 4), (12, 6))

    @nn.compact
    def __call__(self, x):
        B, F_, T, C = x.shape
        # global (freq-pooled) context branch, resized back
        g = x.mean(axis=1, keepdims=True)
        g = ConvBNActiv(self.nout, 1, 1, 0, name="conv1")(g)
        g = jnp.broadcast_to(g, (B, F_, T, self.nout))
        feats = [g, ConvBNActiv(self.nout, 1, 1, 0, name="conv2")(x)]
        for i, d in enumerate(self.dilations):
            df, dt = d if isinstance(d, (tuple, list)) else (d, d)
            h = nn.Conv(self.nout, (3, 3), kernel_dilation=(df, dt),
                        padding=[(df, df), (dt, dt)], use_bias=False,
                        name=f"conv{i + 3}_conv")(x)
            h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             name=f"conv{i + 3}_bn")(h)
            feats.append(nn.relu(h))
        out = jnp.concatenate(feats, axis=-1)
        return ConvBNActiv(self.nout, 1, 1, 0, name="bottleneck")(out)


class LSTMModule(nn.Module):
    """conv → BiLSTM over time → dense, returned as one extra channel
    (reference ``layers_new.py:102-126``)."""

    nin_lstm: int
    nout_lstm: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, F, T, C]
        B, F_, T, C = x.shape
        h = ConvBNActiv(1, 1, 1, 0, name="conv")(x)[..., 0]  # [B, F, T]
        h = jnp.swapaxes(h, 1, 2)  # [B, T, F]
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.nout_lstm // 2), name="lstm_fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.nout_lstm // 2), reverse=True,
                     keep_order=True, name="lstm_bwd")
        h = jnp.concatenate([fwd(h), bwd(h)], axis=-1)  # [B, T, nout]
        h = nn.Dense(self.nin_lstm, name="dense")(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="dense_bn")(h)
        h = nn.relu(h)  # [B, T, F]
        return jnp.swapaxes(h, 1, 2)[..., None]  # [B, F, T, 1]


class BaseNet(nn.Module):
    """One U-Net stage (reference ``nets_new.py:6-39``)."""

    nout: int
    nin_lstm: int
    nout_lstm: int
    dilations: Tuple[Tuple[int, int], ...] = ((4, 2), (8, 4), (12, 6))

    @nn.compact
    def __call__(self, x):
        e1 = ConvBNActiv(self.nout, 3, 1, 1, name="enc1")(x)
        e2 = Encoder(self.nout * 2, name="enc2")(e1)
        e3 = Encoder(self.nout * 4, name="enc3")(e2)
        e4 = Encoder(self.nout * 6, name="enc4")(e3)
        e5 = Encoder(self.nout * 8, name="enc5")(e4)
        h = ASPPModule(self.nout * 8, self.dilations, name="aspp")(e5)
        h = Decoder(self.nout * 6, name="dec4")(h, e4)
        h = Decoder(self.nout * 4, name="dec3")(h, e3)
        h = Decoder(self.nout * 2, name="dec2")(h, e2)
        h = jnp.concatenate(
            [h, LSTMModule(self.nin_lstm, self.nout_lstm, name="lstm_dec2")(h)],
            axis=-1,
        )
        return Decoder(self.nout, name="dec1")(h, e1)


class CascadedNet(nn.Module):
    """[B, 2, n_bins, T] complex-as-channels magnitude in → sigmoid mask
    (reference ``nets_new.py:41-125``). Input layout converted internally to
    channel-last."""

    n_fft: int
    nout: int = 32
    nout_lstm: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        max_bin = self.n_fft // 2
        output_bin = self.n_fft // 2 + 1
        nin_lstm = max_bin // 2
        x = jnp.transpose(x[:, :, :max_bin, :], (0, 2, 3, 1))  # [B, F, T, 2]

        bandw = x.shape[1] // 2
        l1_in, h1_in = x[:, :bandw], x[:, bandw:]
        l1 = BaseNet(self.nout // 2, nin_lstm // 2, self.nout_lstm,
                     name="stg1_low")(l1_in)
        l1 = ConvBNActiv(self.nout // 4, 1, 1, 0, name="stg1_low_out")(l1)
        h1 = BaseNet(self.nout // 4, nin_lstm // 2, self.nout_lstm // 2,
                     name="stg1_high")(h1_in)
        aux1 = jnp.concatenate([l1, h1], axis=1)

        l2 = BaseNet(self.nout, nin_lstm // 2, self.nout_lstm, name="stg2_low")(
            jnp.concatenate([l1_in, l1], axis=-1)
        )
        l2 = ConvBNActiv(self.nout // 2, 1, 1, 0, name="stg2_low_out")(l2)
        h2 = BaseNet(self.nout // 2, nin_lstm // 2, self.nout_lstm // 2,
                     name="stg2_high")(jnp.concatenate([h1_in, h1], axis=-1))
        aux2 = jnp.concatenate([l2, h2], axis=1)

        f3 = BaseNet(self.nout, nin_lstm, self.nout_lstm, name="stg3_full")(
            jnp.concatenate([x, aux1, aux2], axis=-1)
        )
        mask = nn.sigmoid(
            nn.Conv(2, (1, 1), use_bias=False, name="out")(f3)
        )  # [B, F, T, 2]
        mask = jnp.transpose(mask, (0, 3, 1, 2))  # [B, 2, F, T]
        # replicate-pad the cropped top bins back (nets_new.py:92-96)
        pad = output_bin - mask.shape[2]
        return jnp.concatenate(
            [mask, jnp.repeat(mask[:, :, -1:, :], pad, axis=2)], axis=2
        )


# --------------------------------------------------------------- conversion
def _cv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d kernel [O, I, kh, kw] → flax [kh, kw, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def _conv_bn(sd, prefix: str):
    """Reference ``Conv2DBNActiv`` (``layers_new.py:7-24``: Sequential of
    Conv2d/BatchNorm2d/activ) → our ``ConvBNActiv`` params + batch stats."""
    p = {"conv": {"kernel": _cv(sd[f"{prefix}.conv.0.weight"])},
         "bn": {"scale": sd[f"{prefix}.conv.1.weight"],
                "bias": sd[f"{prefix}.conv.1.bias"]}}
    s = {"bn": {"mean": sd[f"{prefix}.conv.1.running_mean"],
                "var": sd[f"{prefix}.conv.1.running_var"]}}
    return p, s


def _lstm_cell(sd, prefix: str, reverse: bool):
    """torch bidirectional ``nn.LSTM`` direction → flax OptimizedLSTMCell.
    torch gate order in the stacked [4H, ·] weights is i, f, g, o; flax keeps
    per-gate Dense modules (input side bias-free, so torch's two biases sum
    into the hidden side)."""
    sfx = "_reverse" if reverse else ""
    w_ih = sd[f"{prefix}.weight_ih_l0{sfx}"]
    w_hh = sd[f"{prefix}.weight_hh_l0{sfx}"]
    b = sd[f"{prefix}.bias_ih_l0{sfx}"] + sd[f"{prefix}.bias_hh_l0{sfx}"]
    H = w_hh.shape[1]
    out = {}
    for gi, g in enumerate("ifgo"):
        sl = slice(gi * H, (gi + 1) * H)
        out[f"i{g}"] = {"kernel": w_ih[sl].T}
        out[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
    return out


def _lstm_module(sd, prefix: str):
    """Reference ``LSTMModule`` (``layers_new.py:102-126``)."""
    p, s = {}, {}
    p["conv"], s["conv"] = _conv_bn(sd, f"{prefix}.conv")
    p["OptimizedLSTMCell_0"] = _lstm_cell(sd, f"{prefix}.lstm", reverse=False)
    p["OptimizedLSTMCell_1"] = _lstm_cell(sd, f"{prefix}.lstm", reverse=True)
    p["dense"] = {"kernel": sd[f"{prefix}.dense.0.weight"].T,
                  "bias": sd[f"{prefix}.dense.0.bias"]}
    p["dense_bn"] = {"scale": sd[f"{prefix}.dense.1.weight"],
                     "bias": sd[f"{prefix}.dense.1.bias"]}
    s["dense_bn"] = {"mean": sd[f"{prefix}.dense.1.running_mean"],
                     "var": sd[f"{prefix}.dense.1.running_var"]}
    return p, s


def _aspp(sd, prefix: str):
    """Reference ``ASPPModule`` (``layers_new.py:64-98``); torch ``conv1`` is
    Sequential(AdaptiveAvgPool2d, Conv2DBNActiv) → its ConvBNActiv is ``.1``;
    torch conv3/4/5 map to our plain conv+bn pairs."""
    p, s = {}, {}
    p["conv1"], s["conv1"] = _conv_bn(sd, f"{prefix}.conv1.1")
    p["conv2"], s["conv2"] = _conv_bn(sd, f"{prefix}.conv2")
    for i in (3, 4, 5):
        p[f"conv{i}_conv"] = {"kernel": _cv(sd[f"{prefix}.conv{i}.conv.0.weight"])}
        p[f"conv{i}_bn"] = {"scale": sd[f"{prefix}.conv{i}.conv.1.weight"],
                            "bias": sd[f"{prefix}.conv{i}.conv.1.bias"]}
        s[f"conv{i}_bn"] = {"mean": sd[f"{prefix}.conv{i}.conv.1.running_mean"],
                            "var": sd[f"{prefix}.conv{i}.conv.1.running_var"]}
    p["bottleneck"], s["bottleneck"] = _conv_bn(sd, f"{prefix}.bottleneck")
    return p, s


def _basenet(sd, prefix: str):
    """Reference ``BaseNet`` (``nets_new.py:6-39``)."""
    p, s = {}, {}
    p["enc1"], s["enc1"] = _conv_bn(sd, f"{prefix}.enc1")
    for enc in ("enc2", "enc3", "enc4", "enc5"):
        pe, se = {}, {}
        for c in ("conv1", "conv2"):
            pe[c], se[c] = _conv_bn(sd, f"{prefix}.{enc}.{c}")
        p[enc], s[enc] = pe, se
    p["aspp"], s["aspp"] = _aspp(sd, f"{prefix}.aspp")
    for dec in ("dec4", "dec3", "dec2", "dec1"):
        pd, sd_ = {}, {}
        pd["conv1"], sd_["conv1"] = _conv_bn(sd, f"{prefix}.{dec}.conv1")
        p[dec], s[dec] = pd, sd_
    p["lstm_dec2"], s["lstm_dec2"] = _lstm_module(sd, f"{prefix}.lstm_dec2")
    return p, s


def convert_cascadednet(sd):
    """Reference VR-arch torch state dict → (flax variables, n_fft, nout,
    nout_lstm). Hyper-parameters are inferred from weight shapes (covers the
    ``nn_arch_size == 218409 → nout 64`` quirk, ``nets_new.py:50``)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    nout = sd["out.weight"].shape[1]
    nout_lstm = sd["stg1_low_band_net.0.lstm_dec2.lstm.weight_ih_l0"].shape[0] // 2
    n_fft = 8 * sd["stg1_low_band_net.0.lstm_dec2.dense.0.weight"].shape[0]
    p, s = {}, {}
    p["stg1_low"], s["stg1_low"] = _basenet(sd, "stg1_low_band_net.0")
    p["stg1_low_out"], s["stg1_low_out"] = _conv_bn(sd, "stg1_low_band_net.1")
    p["stg1_high"], s["stg1_high"] = _basenet(sd, "stg1_high_band_net")
    p["stg2_low"], s["stg2_low"] = _basenet(sd, "stg2_low_band_net.0")
    p["stg2_low_out"], s["stg2_low_out"] = _conv_bn(sd, "stg2_low_band_net.1")
    p["stg2_high"], s["stg2_high"] = _basenet(sd, "stg2_high_band_net")
    p["stg3_full"], s["stg3_full"] = _basenet(sd, "stg3_full_band_net")
    p["out"] = {"kernel": _cv(sd["out.weight"])}  # aux_out is training-only
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": p, "batch_stats": s}
    )
    return variables, n_fft, nout, nout_lstm


def _as_stereo(audio: np.ndarray) -> np.ndarray:
    x = np.asarray(audio, dtype=np.float32)
    if x.ndim == 1:
        x = np.stack([x, x])
    elif x.shape[0] == 1:
        x = np.concatenate([x, x], axis=0)
    return x


def _materialize_random_variables(abs_vars, seed: int = 0):
    """Fill an ``eval_shape``'d flax variable pytree with host-side numpy
    values: BatchNorm running stats get their exact resting values
    (mean 0, var 1), norm scales 1, biases 0, everything else small seeded
    normals — finite, sigmoid-bounded outputs for any input."""
    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        if name == "mean" or name == "bias":
            arr = np.zeros(leaf.shape, leaf.dtype)
        elif name == "var" or name == "scale":
            arr = np.ones(leaf.shape, leaf.dtype)
        else:
            arr = rng.standard_normal(leaf.shape).astype(leaf.dtype) * 0.05
        return jnp.asarray(arr)

    return jax.tree_util.tree_map_with_path(fill, abs_vars)


class VRSeparator:
    """Mask-based VR-arch separation.

    Supports both network generations — the new ``CascadedNet`` (BiLSTM, this
    module) and the legacy ``CascadedASPPNet`` (``vr_legacy.py``, most
    published VR checkpoints) — and two analysis modes:

    - single-band (``band_params=None``): one STFT at ``n_fft``/``hop``,
      windowed mask prediction, masked iSTFT at the input rate.
    - multi-band (``band_params`` set, the reference contract for legacy
      checkpoints): per-band resample → STFT → ``combine_spectrograms`` →
      windowed mask → per-band iSTFT/resample chain + high-end ``mirroring``
      (``spec_utils.py:154-178,307-378``), output at the config sample rate.

    TPU-first: mask windows are batched into one jitted forward (bucketed to
    powers of two so recompiles stay bounded) instead of the reference's
    per-window Python loop.
    """

    @classmethod
    def from_file(cls, path: str, band_params: str | dict | None = None,
                  hop: int = 1024, window_size: int = 512) -> "VRSeparator":
        """Load reference VR-arch torch weights (``.pth``/``.ckpt``/
        ``.safetensors``), either generation, and convert (hyper-params
        inferred from weight shapes). ``band_params`` names a registry config
        (e.g. ``"4band_v2"``), a JSON path, or a parsed dict; legacy
        checkpoints require one (it defines ``n_fft = 2·bins``)."""
        from lemas_tts_tpu.infer.checkpoints import load_state_dict
        from lemas_tts_tpu.uvr5 import vr_legacy
        from lemas_tts_tpu.uvr5.band_params import load_band_params

        sd = load_state_dict(str(path))
        mp = band_params if isinstance(band_params, dict) else \
            (load_band_params(band_params) if band_params else None)
        if vr_legacy.is_legacy_state_dict(sd):
            variables, arch = vr_legacy.convert_cascaded_aspp(sd)
            if mp is None:
                mp = load_band_params(None)  # reference default 2-band param
            n_fft = 2 * mp["bins"]
            model = vr_legacy.CascadedASPPNet(n_fft=n_fft,
                                              nn_architecture=arch)
            return cls(n_fft=n_fft, hop=hop, params=variables, model=model,
                       offset=128, window_size=window_size, band_params=mp)
        variables, n_fft, nout, nout_lstm = convert_cascadednet(sd)
        return cls(n_fft=n_fft, hop=hop, nout=nout, nout_lstm=nout_lstm,
                   params=variables, window_size=window_size, band_params=mp)

    def __init__(self, n_fft: int = 2048, hop: int = 1024, nout: int = 32,
                 nout_lstm: int = 128, params=None, model=None,
                 offset: int = 64, window_size: int = 512, band_params=None,
                 batch_size: int = 4):
        self.n_fft = n_fft
        self.hop = hop
        self.offset = offset  # frames cropped per window edge (nets offset)
        self.window_size = window_size
        self.mp = band_params
        self.batch_size = max(1, int(batch_size))
        self.model = model if model is not None else CascadedNet(
            n_fft=n_fft, nout=nout, nout_lstm=nout_lstm)
        if params is None:
            import warnings

            warnings.warn("VR separator: random init (testing only)")
            # Abstract-eval the variable shapes and fill them host-side
            # instead of running the real initializers: eager init of a
            # 5-U-Net cascade costs ~2 min of per-op XLA compiles on one
            # CPU core; eval_shape traces the same graph in <1 s. Weight
            # *values* are test-only (real use always passes params).
            abs_vars = jax.eval_shape(
                self.model.init, jax.random.key(0),
                jax.ShapeDtypeStruct((1, 2, n_fft // 2 + 1, 16), jnp.float32),
            )
            params = _materialize_random_variables(abs_vars)
        self.params = params
        self._run = jax.jit(self.model.apply)

    # ------------------------------------------------------------- windows
    def _predict_mask(self, mag: np.ndarray) -> np.ndarray:
        """[2, bins, T] magnitude (pre-normalized) → [2, bins, T] mask via
        batched overlapped windows (reference chunked inference: pad by
        ``make_padding``, predict ``window_size`` frames, keep the central
        ``roi`` of each — the offset crop of ``nets.py:predict_mask``)."""
        from lemas_tts_tpu.uvr5.spec_utils import make_padding

        n_frame = mag.shape[2]
        # the offset crop needs a window strictly wider than both edges
        ws = max(self.window_size, 2 * self.offset + 32)
        pad_l, pad_r, roi = make_padding(n_frame, ws, self.offset)
        n_window = int(np.ceil(n_frame / roi))
        pad = np.pad(mag, ((0, 0), (0, 0), (pad_l, pad_r)), mode="constant")
        windows = np.stack(
            [pad[:, :, i * roi : i * roi + ws] for i in range(n_window)]
        )
        # bounded window batches: one giant forward over every window of a
        # long file would need multi-GB U-Net activations (a 3-minute track
        # is ~60 windows); cap the batch and pad the tail to a power of two
        # so at most log2(batch_size)+1 program shapes ever compile
        cap = self.batch_size
        masks = []
        for i in range(0, n_window, cap):
            chunk = windows[i : i + cap]
            nb = 1 << (len(chunk) - 1).bit_length()
            if nb > len(chunk):
                chunk = np.concatenate(
                    [chunk, np.zeros((nb - len(chunk),) + chunk.shape[1:],
                                     chunk.dtype)])
            m = np.asarray(self._run(self.params, jnp.asarray(chunk)))
            masks.append(m[: min(cap, n_window - i)])
        masks = np.concatenate(masks, axis=0)
        masks = masks[:, :, :, self.offset : self.offset + roi]
        return np.concatenate(list(masks), axis=2)[:, :, :n_frame]

    # ------------------------------------------------------------ separate
    def separate(self, audio: np.ndarray, sr: int,
                 aggressiveness: float = 0.0) -> np.ndarray:
        """Stereo [2, T] → primary stem (masked mixture). Single-band mode
        returns at the input rate; multi-band mode at the config rate
        (use :meth:`separate_full` for the rate and secondary stem)."""
        return self.separate_full(audio, sr, aggressiveness)[0]

    def separate_full(
        self,
        audio: np.ndarray,
        sr: int,
        aggressiveness: float = 0.0,
        high_end_process: str = "mirroring",
        post_process: bool = False,
    ):
        """Full separation → ``(primary, secondary, out_sr)``.

        ``aggressiveness`` raises the mask power (more below the band-1 crop,
        reference ``adjust_aggr``); ``post_process`` applies
        ``merge_artifacts`` to the mask; ``high_end_process`` controls the
        mirrored high-frequency restore in multi-band mode."""
        from lemas_tts_tpu.uvr5 import spec_utils as su

        x = _as_stereo(audio)
        if self.mp is None:
            spec = su.stft_stereo(x, self.n_fft, self.hop)
            mask = self._mask_for(np.abs(spec), aggressiveness,
                                  split_bin=spec.shape[1] // 2,
                                  post_process=post_process)
            primary = su.istft_stereo(spec * mask, self.n_fft, self.hop,
                                      length=x.shape[-1])
            secondary = su.istft_stereo(spec * (1.0 - mask), self.n_fft,
                                        self.hop, length=x.shape[-1])
            return primary, secondary, sr

        from lemas_tts_tpu.ops.resample import resample as _resample

        mp = self.mp
        band_ids = sorted(mp["band"])
        bands_n = len(band_ids)
        ms_kw = dict(mid_side=mp.get("mid_side", False),
                     mid_side_b2=mp.get("mid_side_b2", False),
                     reverse=mp.get("reverse", False))
        waves: dict[int, np.ndarray] = {}
        specs: dict[int, np.ndarray] = {}
        input_high_end = None
        input_high_end_h = 0
        for d in reversed(band_ids):
            bp = mp["band"][d]
            if d == bands_n:
                waves[d] = np.asarray(_resample(jnp.asarray(x), sr, bp["sr"])) \
                    if sr != bp["sr"] else x
            else:
                prev = mp["band"][d + 1]["sr"]
                waves[d] = np.asarray(
                    _resample(jnp.asarray(waves[d + 1]), prev, bp["sr"]))
            specs[d] = su.wave_to_spectrogram(waves[d], bp["hl"], bp["n_fft"],
                                              **ms_kw)
            if d == bands_n and high_end_process != "none":
                input_high_end_h = (bp["n_fft"] // 2 - bp["crop_stop"]) + (
                    mp["pre_filter_stop"] - mp["pre_filter_start"])
                input_high_end = specs[d][
                    :, bp["n_fft"] // 2 - input_high_end_h : bp["n_fft"] // 2, :]

        spec_m = su.combine_spectrograms_mp(specs, mp)
        mask = self._mask_for(np.abs(spec_m), aggressiveness,
                              split_bin=mp["band"][1]["crop_stop"],
                              post_process=post_process)
        y_spec = mask * spec_m
        v_spec = spec_m - y_spec

        if high_end_process == "none" or input_high_end is None:
            primary = su.cmb_spectrogram_to_wave(y_spec, mp)
        else:
            hi = su.mirroring_mp(high_end_process, y_spec, input_high_end, mp)
            primary = su.cmb_spectrogram_to_wave(y_spec, mp,
                                                 input_high_end_h, hi)
        secondary = su.cmb_spectrogram_to_wave(v_spec, mp)
        return primary, secondary, mp["sr"]

    def _mask_for(self, mag: np.ndarray, aggressiveness: float,
                  split_bin: int, post_process: bool) -> np.ndarray:
        from lemas_tts_tpu.uvr5 import spec_utils as su

        coef = float(mag.max()) or 1.0
        mask = self._predict_mask(mag / coef)
        if aggressiveness:
            mask = su.adjust_aggr(mask, False, {"value": aggressiveness,
                                                "split_bin": split_bin})
        if post_process:
            mask = su.merge_artifacts(mask)
        return mask
