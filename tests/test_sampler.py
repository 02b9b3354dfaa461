"""CFM sampler parity: jitted lax.scan Euler/CFG/sway loop vs a torch Euler
mirror over the reference semantics (cfm.py:206-473), with shared noise."""

import math

import numpy as np
import torch

import jax
import jax.numpy as jnp

from lemas_tts_tpu.cfm.sampler import (
    SamplerSettings,
    compute_sway_max,
    make_sampler,
    pick_bucket,
    sway_time_grid,
)
from lemas_tts_tpu.config import DiTArch
from lemas_tts_tpu.infer.checkpoints import convert_dit
from lemas_tts_tpu.models.dit import DiT
from tests.torch_ref.dit_torch import DiTRef

CFG = dict(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=12,
           text_num_embeds=40, text_dim=32, conv_layers=1)


def build_pair():
    torch.manual_seed(1)
    tref = DiTRef(**CFG)
    sd = tref.state_dict()
    g = torch.Generator().manual_seed(11)
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.05
    tref.load_state_dict(sd)
    tref.eval()
    arch = DiTArch(dim=CFG["dim"], depth=CFG["depth"], heads=CFG["heads"],
                   dim_head=CFG["dim_head"], ff_mult=CFG["ff_mult"],
                   text_dim=CFG["text_dim"], conv_layers=CFG["conv_layers"])
    jmodel = DiT(arch=arch, mel_dim=CFG["mel_dim"], text_num_embeds=CFG["text_num_embeds"])
    jparams = {"params": convert_dit({k: v.numpy() for k, v in sd.items()}, prefix="")}
    return tref, jmodel, jparams


def torch_euler_sample(tref, cond, cond_mask, text, duration, y0, steps, cfg, sway):
    """Torch mirror of the reference sampling loop (cfm.py:382-461)."""
    grid = sway_time_grid(steps, sway)
    B, N, _ = cond.shape
    mask = torch.arange(N)[None, :] < duration[:, None]
    step_cond = torch.where(cond_mask.unsqueeze(-1), cond, torch.zeros_like(cond))
    # reference zero-pads per-sample noise beyond its duration (cfm.py:430-435)
    y = torch.where(mask.unsqueeze(-1), y0, torch.zeros_like(y0))
    with torch.no_grad():
        for k in range(steps):
            t, dt = float(grid[k]), float(grid[k + 1] - grid[k])
            tt = torch.full((B,), t)
            pred = tref(y, step_cond, text, tt, mask=mask)
            null = tref(y, step_cond, text, tt, mask=mask,
                        drop_audio_cond=True, drop_text=True)
            cfg_t = cfg * (1 - t) ** 2
            v = (pred + (pred - null) * cfg_t).clamp(-20, 20)
            y = y + dt * v
    return torch.where(cond_mask.unsqueeze(-1), cond, y)


def make_inputs(B=2, N=48, nt=8, D=12, ref_len=16):
    rng = np.random.default_rng(3)
    cond = np.zeros((B, N, D), dtype=np.float32)
    cond[:, :ref_len] = rng.standard_normal((B, ref_len, D)).astype(np.float32)
    cond_mask = np.zeros((B, N), dtype=bool)
    cond_mask[:, :ref_len] = True
    text = np.full((B, nt), -1, dtype=np.int64)
    text[0, :6] = rng.integers(0, 40, 6)
    text[1, :8] = rng.integers(0, 40, 8)
    duration = np.array([44, 40])
    y0 = rng.standard_normal((B, N, D)).astype(np.float32)
    return cond, cond_mask, text, duration, y0


def test_sway_bound_reference_value():
    # steps=32: p_max = ln(1e-9)/ln(1/32); sway_max = (p_max-1)*0.7
    expect = (math.log(1e-9) / math.log(1.0 / 32) - 1.0) * 0.7
    assert abs(compute_sway_max(32) - expect) < 1e-12
    # big-dt corner (cfm.py:365-366)
    assert abs(compute_sway_max(1) - 10.0 * 0.7) < 1e-12


def test_time_grid_monotone_and_clamped():
    g = sway_time_grid(32, 5.0)  # 5.0 > sway_max → clamped
    g2 = sway_time_grid(32, compute_sway_max(32))
    np.testing.assert_allclose(g, g2)
    assert g[0] == 0.0 and abs(g[-1] - 1.0) < 1e-7
    assert (np.diff(g) > 0).all()


def test_sampler_matches_torch_euler():
    tref, jmodel, jparams = build_pair()
    cond, cond_mask, text, duration, y0 = make_inputs()
    steps, cfg, sway = 8, 2.0, 1.0

    ref = torch_euler_sample(
        tref, torch.from_numpy(cond), torch.from_numpy(cond_mask),
        torch.from_numpy(text), torch.from_numpy(duration),
        torch.from_numpy(y0), steps, cfg, sway,
    ).numpy()

    run = make_sampler(jmodel, SamplerSettings(steps=steps, cfg_strength=cfg,
                                               sway_sampling_coef=sway))
    ours = np.asarray(run(jparams, jnp.asarray(cond), jnp.asarray(cond_mask),
                          jnp.asarray(text.astype(np.int32)),
                          jnp.asarray(duration), jnp.asarray(y0)))
    assert np.max(np.abs(ours - ref)) < 5e-3
    assert np.mean((ours - ref) ** 2) < 1e-6  # the BASELINE parity metric is 1e-3


def test_sampler_no_cfg_branch():
    _, jmodel, jparams = build_pair()
    cond, cond_mask, text, duration, y0 = make_inputs()
    run = make_sampler(jmodel, SamplerSettings(steps=4, cfg_strength=0.0))
    out = np.asarray(run(jparams, jnp.asarray(cond), jnp.asarray(cond_mask),
                         jnp.asarray(text.astype(np.int32)),
                         jnp.asarray(duration), jnp.asarray(y0)))
    assert np.isfinite(out).all()


def test_edit_mask_keep_frames_bit_exact():
    """Speech editing contract: frames with keep-mask True come back untouched
    (cfm.py:461)."""
    _, jmodel, jparams = build_pair()
    cond, cond_mask, text, duration, y0 = make_inputs()
    # editing: keep a mid-utterance span too
    cond_mask[:, 30:36] = True
    cond[:, 30:36] = 0.5
    run = make_sampler(jmodel, SamplerSettings(steps=4, cfg_strength=1.0))
    out = np.asarray(run(jparams, jnp.asarray(cond), jnp.asarray(cond_mask),
                         jnp.asarray(text.astype(np.int32)),
                         jnp.asarray(duration), jnp.asarray(y0)))
    kept = np.asarray(cond_mask)
    np.testing.assert_array_equal(out[kept], cond[kept])


def test_pick_bucket():
    assert pick_bucket(1) == 256
    assert pick_bucket(257) == 512
    assert pick_bucket(5000) == 4096


def test_midpoint_more_accurate_per_eval():
    """midpoint@K uses 2 velocity evals/step = euler@2K's budget; at an equal
    eval budget the 2nd-order method must land closer to a fine-grid
    reference solution of the same flow."""
    _, jmodel, jparams = build_pair()
    cond, cond_mask, text, duration, y0 = make_inputs()
    args = (jparams, jnp.asarray(cond), jnp.asarray(cond_mask),
            jnp.asarray(text.astype(np.int32)), jnp.asarray(duration),
            jnp.asarray(y0))
    sway = 1.0

    def sample(steps, method):
        run = make_sampler(jmodel, SamplerSettings(
            steps=steps, cfg_strength=2.0, sway_sampling_coef=sway,
            method=method))
        return np.asarray(run(*args))

    truth = sample(64, "euler")
    err_euler = np.mean((sample(8, "euler") - truth) ** 2)
    err_mid = np.mean((sample(4, "midpoint") - truth) ** 2)  # same 8 evals
    assert err_mid < err_euler, (err_mid, err_euler)


def test_midpoint_keep_frames_bit_exact():
    _, jmodel, jparams = build_pair()
    cond, cond_mask, text, duration, y0 = make_inputs()
    run = make_sampler(jmodel, SamplerSettings(steps=4, cfg_strength=1.0,
                                               method="midpoint"))
    out = np.asarray(run(jparams, jnp.asarray(cond), jnp.asarray(cond_mask),
                         jnp.asarray(text.astype(np.int32)),
                         jnp.asarray(duration), jnp.asarray(y0)))
    kept = np.asarray(cond_mask)
    np.testing.assert_array_equal(out[kept], cond[kept])
    assert np.isfinite(out).all()


def test_unknown_method_rejected():
    import pytest

    with pytest.raises(ValueError):
        SamplerSettings(method="rk4")


def test_cfg_cutoff_active_steps_math():
    """cfg_active_steps counts the prefix where cfg_strength·(1−t)² ≥ cutoff."""
    s = SamplerSettings(steps=8, cfg_strength=2.0, sway_sampling_coef=1.0,
                        cfg_cutoff=0.5)
    grid = sway_time_grid(8, 1.0)
    k = s.cfg_active_steps(grid)
    cfg_t = 2.0 * (1 - np.asarray(grid[:-1])) ** 2
    assert k == int((cfg_t >= 0.5).sum())
    assert 0 < k < 8
    # cutoff None / no-CFG edge cases
    assert SamplerSettings(steps=8, cfg_strength=2.0).cfg_active_steps(grid) == 8
    assert SamplerSettings(steps=8, cfg_strength=0.0,
                           cfg_cutoff=0.5).cfg_active_steps(grid) == 0


def test_cfg_cutoff_tiny_threshold_is_identity():
    """A cutoff below the smallest cfg_t keeps every step on the CFG path →
    bit-identical output to the default sampler."""
    _, jmodel, jparams = build_pair()
    cond, cond_mask, text, duration, y0 = make_inputs()
    args = (jparams, jnp.asarray(cond), jnp.asarray(cond_mask),
            jnp.asarray(text.astype(np.int32)), jnp.asarray(duration),
            jnp.asarray(y0))
    base = make_sampler(jmodel, SamplerSettings(
        steps=6, cfg_strength=2.0, sway_sampling_coef=1.0))(*args)
    cut = make_sampler(jmodel, SamplerSettings(
        steps=6, cfg_strength=2.0, sway_sampling_coef=1.0,
        cfg_cutoff=1e-12))(*args)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(cut))


def test_cfg_cutoff_truncates_and_stays_close():
    """A moderate cutoff changes only the late steps: output differs from
    full CFG but matches a torch mirror that switches to the cond-only
    velocity at the same step index."""
    tref, jmodel, jparams = build_pair()
    cond, cond_mask, text, duration, y0 = make_inputs()
    steps, cfg, sway, cutoff = 6, 2.0, 1.0, 0.8
    s = SamplerSettings(steps=steps, cfg_strength=cfg,
                        sway_sampling_coef=sway, cfg_cutoff=cutoff)
    grid = sway_time_grid(steps, sway)
    k = s.cfg_active_steps(grid)
    assert 0 < k < steps

    # torch mirror with the same truncation
    B, N, _ = cond.shape
    tmask = torch.arange(N)[None, :] < torch.from_numpy(duration)[:, None]
    tcond = torch.from_numpy(cond)
    tkeep = torch.from_numpy(cond_mask)
    step_cond = torch.where(tkeep.unsqueeze(-1), tcond, torch.zeros_like(tcond))
    y = torch.where(tmask.unsqueeze(-1), torch.from_numpy(y0),
                    torch.zeros_like(torch.from_numpy(y0)))
    ttext = torch.from_numpy(text)
    with torch.no_grad():
        for i in range(steps):
            t, dt = float(grid[i]), float(grid[i + 1] - grid[i])
            tt = torch.full((B,), t)
            pred = tref(y, step_cond, ttext, tt, mask=tmask)
            if i < k:
                null = tref(y, step_cond, ttext, tt, mask=tmask,
                            drop_audio_cond=True, drop_text=True)
                v = pred + (pred - null) * (cfg * (1 - t) ** 2)
            else:
                v = pred
            y = y + dt * v.clamp(-20, 20)
    ref = torch.where(tkeep.unsqueeze(-1), tcond, y).numpy()

    got = np.asarray(make_sampler(jmodel, s)(
        jparams, jnp.asarray(cond), jnp.asarray(cond_mask),
        jnp.asarray(text.astype(np.int32)), jnp.asarray(duration),
        jnp.asarray(y0)))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)

    full = np.asarray(make_sampler(jmodel, SamplerSettings(
        steps=steps, cfg_strength=cfg, sway_sampling_coef=sway))(
        jparams, jnp.asarray(cond), jnp.asarray(cond_mask),
        jnp.asarray(text.astype(np.int32)), jnp.asarray(duration),
        jnp.asarray(y0)))
    assert np.abs(full - got).max() > 0  # the truncation did change something


def test_cfg_cutoff_requires_concrete_time_grid():
    """The CFG prefix split is static program structure — a traced grid must
    fail loudly (clear TypeError), not with an opaque tracer-leak error."""
    import jax

    from lemas_tts_tpu.cfm.sampler import SamplerSettings

    import pytest

    s = SamplerSettings(steps=4, cfg_strength=2.0, cfg_cutoff=0.5)
    grid = np.linspace(0.0, 1.0, 5, dtype=np.float32)
    assert 0 < s.cfg_active_steps(grid) <= 4  # concrete grid works

    def f(g):
        return s.cfg_active_steps(g)

    with pytest.raises(TypeError, match="concrete"):
        jax.jit(f)(grid)


# ---------------------------------------------------------- block-range cache
def test_block_cache_refresh_matches_full_forward():
    """make_cached_forward with refresh=True must equal the plain DiT forward
    exactly (validates the pre/mid/post param split + head path), and a skip
    step fed the cache from the same input must reproduce it (the telescoped
    residual is exact when x is unchanged)."""
    from lemas_tts_tpu.cfm.sampler import make_cached_forward

    _, jmodel, jparams = build_pair()
    cond, cond_mask, text, duration, y0 = make_inputs()
    B, N, D = cond.shape
    fwd = make_cached_forward(jmodel, jparams, 1, 2)  # depth=2: pre=1, mid=1
    mask = np.arange(N)[None, :] < duration[:, None]
    te = jmodel.apply(jparams, jnp.asarray(text.astype(np.int32)), N, False,
                      method=jmodel.embed_text)
    x = jnp.asarray(y0)
    c = jnp.asarray(np.where(cond_mask[..., None], cond, 0.0))
    t = jnp.float32(0.3)
    cache0 = jnp.zeros((B, N, jmodel.arch.dim), jnp.float32)

    full = jmodel.apply(jparams, x, c, None, jnp.broadcast_to(t, (B,)),
                        jnp.asarray(mask), text_embed=te)
    # refresh is a STATIC bool: the two variants are separate traced programs
    jfwd = jax.jit(fwd, static_argnums=(7,))
    pred_r, cache = jfwd(x, c, jnp.asarray(mask), te, None, t, cache0, True)
    np.testing.assert_allclose(np.asarray(pred_r), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.max(jnp.abs(cache))) > 0
    pred_s, cache2 = jfwd(x, c, jnp.asarray(mask), te, None, t, cache, False)
    np.testing.assert_allclose(np.asarray(pred_s), np.asarray(pred_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cache2), np.asarray(cache))


def test_block_cache_every1_is_exact():
    """refresh-every-step ≡ the plain sampler (only the scan is restructured;
    every mid-range is recomputed)."""
    _, jmodel, jparams = build_pair()
    cond, cond_mask, text, duration, y0 = make_inputs()
    args = (jparams, jnp.asarray(cond), jnp.asarray(cond_mask),
            jnp.asarray(text.astype(np.int32)), jnp.asarray(duration),
            jnp.asarray(y0))
    base = np.asarray(make_sampler(jmodel, SamplerSettings(
        steps=6, cfg_strength=2.0, sway_sampling_coef=1.0))(*args))
    cached = np.asarray(make_sampler(jmodel, SamplerSettings(
        steps=6, cfg_strength=2.0, sway_sampling_coef=1.0,
        block_cache_range=(1, 2), block_cache_every=1))(*args))
    np.testing.assert_allclose(cached, base, rtol=1e-5, atol=1e-5)


def test_block_cache_skipping_close_and_keeps_frames():
    """every=2 actually diverges from the exact trajectory (the skip branch
    ran) but stays close, and the editing keep-mask paste is untouched."""
    _, jmodel, jparams = build_pair()
    cond, cond_mask, text, duration, y0 = make_inputs()
    args = (jparams, jnp.asarray(cond), jnp.asarray(cond_mask),
            jnp.asarray(text.astype(np.int32)), jnp.asarray(duration),
            jnp.asarray(y0))
    base = np.asarray(make_sampler(jmodel, SamplerSettings(
        steps=6, cfg_strength=2.0, sway_sampling_coef=1.0))(*args))
    cached = np.asarray(make_sampler(jmodel, SamplerSettings(
        steps=6, cfg_strength=2.0, sway_sampling_coef=1.0,
        block_cache_range=(1, 2), block_cache_every=2))(*args))
    gen = ~np.asarray(cond_mask)
    assert np.max(np.abs(cached[gen] - base[gen])) > 0  # skip branch engaged
    assert np.mean((cached - base) ** 2) < 1e-2  # same trajectory family
    kept = np.asarray(cond_mask)
    np.testing.assert_array_equal(cached[kept], cond[kept])
    assert np.isfinite(cached).all()


def test_block_cache_with_cfg_cutoff_and_no_cfg():
    """The cache composes with CFG truncation (tail refresh at the 2B→B
    boundary) and with the no-CFG path."""
    _, jmodel, jparams = build_pair()
    cond, cond_mask, text, duration, y0 = make_inputs()
    args = (jparams, jnp.asarray(cond), jnp.asarray(cond_mask),
            jnp.asarray(text.astype(np.int32)), jnp.asarray(duration),
            jnp.asarray(y0))
    out = np.asarray(make_sampler(jmodel, SamplerSettings(
        steps=8, cfg_strength=2.0, sway_sampling_coef=1.0, cfg_cutoff=0.5,
        block_cache_range=(0, 1), block_cache_every=3))(*args))
    assert np.isfinite(out).all()
    out2 = np.asarray(make_sampler(jmodel, SamplerSettings(
        steps=4, cfg_strength=0.0, block_cache_range=(1, 2),
        block_cache_every=2))(*args))
    assert np.isfinite(out2).all()


def test_block_cache_validation():
    import pytest

    with pytest.raises(ValueError):
        SamplerSettings(block_cache_range=(3, 2))
    with pytest.raises(ValueError):
        SamplerSettings(block_cache_range=(1, 2), method="midpoint")
    with pytest.raises(ValueError):
        SamplerSettings(block_cache_range=(1, 2), block_cache_every=0)
    from lemas_tts_tpu.cfm.sampler import make_cached_forward

    _, jmodel, jparams = build_pair()
    with pytest.raises(ValueError):
        make_cached_forward(jmodel, jparams, 0, 99)  # beyond depth


def test_parse_block_cache():
    from lemas_tts_tpu.cfm.sampler import block_cache_fields, parse_block_cache

    assert parse_block_cache("2-20:2") == ((2, 20), 2, 0, 0)
    assert parse_block_cache("4-18") == ((4, 18), 2, 0, 0)  # default period
    assert parse_block_cache("2-20:3+t6") == ((2, 20), 3, 0, 6)
    assert parse_block_cache("2-20:3+h2+t6") == ((2, 20), 3, 2, 6)
    assert block_cache_fields("2-20:3+t6") == {
        "block_cache_range": (2, 20), "block_cache_every": 3,
        "block_cache_warm_tail": 6}
    assert parse_block_cache(None) is None
    assert parse_block_cache("0") is None
    assert parse_block_cache("none") is None
    assert block_cache_fields("2-20:3") == {
        "block_cache_range": (2, 20), "block_cache_every": 3}
    assert block_cache_fields("") == {}
    # flagship-tuned specs degrade gracefully on smaller models
    assert block_cache_fields("2-20:2", depth=4) == {
        "block_cache_range": (2, 4), "block_cache_every": 2}
    assert block_cache_fields("2-20:2", depth=2) == {}
    # non-euler methods disable the cache instead of raising at settings
    # construction (a serving default must not 500 a legal per-request
    # ode_method override)
    assert block_cache_fields("2-20:2", depth=22, method="midpoint") == {}
    import pytest

    for bad in ("20-2:2", "2-20:0", "x-y:z", "2:3"):
        with pytest.raises(ValueError):
            parse_block_cache(bad)
