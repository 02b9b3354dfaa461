"""Real-asset validation runbook (``scripts/validate_assets.py``).

The runbook's job is to work FIRST TRY on the first machine that has the
pretrained assets (zero-egress CI never does), so these tests pin its
machinery with tiny fixtures: the dry run prints every stand-alone command,
asset-less invocations skip (not fail) each gated step, and a tiny torch
checkpoint flows through convert → smoke-infer end-to-end.
"""

import json

import numpy as np
import pytest

from lemas_tts_tpu.scripts.validate_assets import STEPS, main


def test_dry_run_prints_full_runbook(capsys, tmp_path):
    rc = main(["--ckpt", "model.safetensors", "--vocab_file", "vocab.txt",
               "--vocos", "vocos_dir", "--uvr5", "kim.onnx",
               "--ref_repo", "/ref", "--manifest", "cases.json",
               "--out", str(tmp_path / "v"), "--dry_run"])
    out = capsys.readouterr().out
    assert rc == 0
    for step in STEPS:
        assert f"# {step}" in out
    assert "convert_checkpoint --ckpt model.safetensors" in out
    assert "parity_check --capture" in out
    assert "--pick_mse" in out


def test_no_assets_all_skip(capsys, tmp_path):
    """With nothing on disk every step skips with a reason and the chain
    exits 0 — missing assets are not failures."""
    rc = main(["--out", str(tmp_path / "v")])
    out = capsys.readouterr().out
    assert rc == 0
    recs = [json.loads(ln[len("[step] "):]) for ln in out.splitlines()
            if ln.startswith("[step] ")]
    assert {r["step"] for r in recs} == set(STEPS)
    assert all(r["status"] == "skip" and r["reason"] for r in recs)


def test_unknown_step_rejected(tmp_path):
    assert main(["--out", str(tmp_path), "--only", "bogus"]) == 2


def test_convert_and_smoke_end_to_end(capsys, tmp_path):
    """Tiny torch EMA checkpoint → convert_cfm → smoke_infer produce a
    non-silent wav, exactly the chain a real checkpoint takes."""
    torch = pytest.importorskip("torch")
    from tests.torch_ref.dit_torch import DiTRef

    from lemas_tts_tpu.utils.audio_io import write_wav

    vocab = tmp_path / "vocab.txt"
    tokens = [" "] + list("abcdefghijklmnopqrstuvwxyz.")
    vocab.write_text("\n".join(tokens) + "\n")
    tref = DiTRef(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                  mel_dim=20, text_num_embeds=len(tokens), text_dim=32,
                  conv_layers=1)
    sd = {f"ema_model.transformer.{k}": v for k, v in tref.state_dict().items()}
    sd["ema_model.initted"] = torch.tensor(True)
    sd["ema_model.step"] = torch.tensor(1)
    ckpt = tmp_path / "ref.pt"
    torch.save(sd, str(ckpt))

    sr = 8000
    t = np.arange(int(0.6 * sr)) / sr
    ref = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    write_wav(str(tmp_path / "ref.wav"), ref, sr)

    out = tmp_path / "v"
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rc = main(["--ckpt", str(ckpt), "--use_ema",
                   "--vocab_file", str(vocab),
                   "--model", "tests/data/tiny.yaml",
                   "--ref_audio", str(tmp_path / "ref.wav"),
                   "--ref_text", "a reference.",
                   "--only", "convert_cfm,smoke_infer",
                   "--out", str(out)])
    outtxt = capsys.readouterr().out
    recs = {r["step"]: r for r in
            (json.loads(ln[len("[step] "):]) for ln in outtxt.splitlines()
             if ln.startswith("[step] "))}
    assert rc == 0, recs
    assert recs["convert_cfm"]["status"] == "pass"
    assert recs["smoke_infer"]["status"] == "pass"
    assert recs["smoke_infer"]["peak"] > 1e-4
    assert (out / "native_model").exists()
    assert (out / "smoke.wav").exists()


@pytest.mark.slow
def test_full_chain_runbook(capsys, tmp_path):
    """Round-5 integration drill (VERDICT r4 item 7): the WHOLE runbook
    chained end-to-end against synthetic reference-FORMAT assets — a torch
    EMA-schema CFM checkpoint (``utils_infer.py:204-246`` layout), a
    published-key Vocos ``pytorch_model.bin``, a torch MDX-Net state dict,
    and a pre-captured parity bundle — including BOTH serving-default
    reprobes at the checkpoint's geometry (``--probe_args``). The final
    machine-checkable JSON must show zero unexpected skips: only
    parity_capture (bundle provided) and phone_goldens (espeak absent in
    hermetic CI) may skip; everything else passes and leaves its artifact."""
    torch = pytest.importorskip("torch")
    from tests.torch_ref.dit_torch import DiTRef
    from tests.torch_ref.mdxnet_torch import ConvTDFNetTorch
    from tests.torch_ref.vocos_torch import VocosRef

    from lemas_tts_tpu.utils.audio_io import write_wav

    # ---- synthetic reference-format assets --------------------------------
    vocab = tmp_path / "vocab.txt"
    tokens = [" "] + list("abcdefghijklmnopqrstuvwxyz.")
    vocab.write_text("\n".join(tokens) + "\n")

    tref = DiTRef(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                  mel_dim=20, text_num_embeds=len(tokens), text_dim=32,
                  conv_layers=1)
    sd = {f"ema_model.transformer.{k}": v
          for k, v in tref.state_dict().items()}
    sd["ema_model.initted"] = torch.tensor(True)
    sd["ema_model.step"] = torch.tensor(1)
    ckpt = tmp_path / "model_last.pt"
    torch.save(sd, str(ckpt))

    vocos_dir = tmp_path / "vocos"
    vocos_dir.mkdir()
    vref = VocosRef(in_ch=20, dim=512, inter=1536, layers=8,
                    n_fft=256, hop=64)
    torch.save(vref.ckpt_state_dict(), str(vocos_dir / "pytorch_model.bin"))

    mdx = ConvTDFNetTorch(4, 24, 5, 2, 4, 3, 2, False)
    torch.save(mdx.state_dict(), str(tmp_path / "mdx.ckpt"))

    sr = 8000
    t = np.arange(int(0.8 * sr)) / sr
    ref_wav = tmp_path / "ref.wav"
    write_wav(str(ref_wav), (0.25 * np.sin(2 * np.pi * 200 * t))
              .astype(np.float32), sr)

    # ---- pre-captured parity bundle (what --capture writes; capture itself
    # needs torchaudio + the reference repo — the one env-blocked step) ----
    import warnings

    from lemas_tts_tpu.api import TTS
    from lemas_tts_tpu.config import SamplerConfig

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts = TTS(model="tests/data/tiny.yaml", ckpt_file=str(ckpt),
                  use_ema=True, vocab_file=str(vocab), device="cpu",
                  frontend=None,
                  vocoder_local_path=str(vocos_dir))
    bundle = tmp_path / "bundle"
    bundle.mkdir()
    rng = np.random.default_rng(3)
    duration = 160
    noise = rng.standard_normal((duration, 20)).astype(np.float32)
    _w, _sr, mel = tts.synth.synthesize_chunks(
        (0.25 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), sr,
        list("hello"), [list("worldly")],
        cfg=SamplerConfig(nfe_steps=2, cfg_strength=1.0,
                          sway_sampling_coef=-1.0),
        noise_override=noise, duration_override=[duration])
    np.save(bundle / "case0.mel.npy", mel.astype(np.float32))
    np.save(bundle / "case0.noise.npy", noise)
    (bundle / "captured.json").write_text(json.dumps({"cases": [{
        "name": "case0", "lang": "en", "ref_audio": str(ref_wav),
        "ref_units": list("hello"), "gen_units": list("worldly"),
        "nfe": 2, "cfg_strength": 1.0, "sway": -1.0,
        "duration": duration, "mel": "case0.mel.npy",
        "noise": "case0.noise.npy"}]}))

    # ---- the whole chain, one invocation ----------------------------------
    out = tmp_path / "v"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rc = main(["--ckpt", str(ckpt), "--use_ema",
                   "--vocab_file", str(vocab),
                   "--vocos", str(vocos_dir),
                   "--uvr5", str(tmp_path / "mdx.ckpt"),
                   "--model", "tests/data/tiny.yaml",
                   "--ref_audio", str(ref_wav), "--ref_text", "a reference.",
                   "--bundle", str(bundle),
                   "--probe_args",
                   "--dim 64 --depth 2 --heads 4 --mel_dim 20 "
                   "--vocab 28 --text_dim 32 --conv_layers 1 --n 64 --batch 2 --nfe 8",
                   "--threshold", "0.05",
                   "--out", str(out)])
    outtxt = capsys.readouterr().out
    recs = {r["step"]: r for r in
            (json.loads(ln[len("[step] "):]) for ln in outtxt.splitlines()
             if ln.startswith("[step] "))}
    final = json.loads(outtxt.strip().splitlines()[-1])

    assert rc == 0 and final["failed"] == [], (final, recs)
    expected_skips = {"parity_capture", "phone_goldens"}
    from lemas_tts_tpu.text import tokenizer as tok
    if tok.available():  # espeak-enabled env: goldens run too
        expected_skips.discard("phone_goldens")
    for step in STEPS:
        want = "skip" if step in expected_skips else "pass"
        assert recs[step]["status"] == want, (step, recs[step])
    # machine-checkable summary covers every step
    assert set(final["summary"]) == set(STEPS)
    # artifacts on disk
    assert (out / "native_model").exists()
    assert (out / "vocos_native").exists()
    assert (out / "uvr5_native").exists()
    assert (out / "smoke.wav").exists()
    assert (out / "parity_report.json").exists()
    # reprobes carried their measured numbers into the step records
    assert recs["reprobe_cutoff"]["mel_mse"] >= 0
    assert recs["reprobe_blockcache"]["mel_mse"] >= 0
