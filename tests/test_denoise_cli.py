"""Batch denoise CLI (reference ``uvr5/multiprocess_cuda_infer.py`` __main__):
dir walk + resume skip, vocal/background stem writing, mesh-sharded demix
parity with the single-device path."""

import numpy as np
import pytest

from lemas_tts_tpu.scripts import denoise as denoise_cli
from lemas_tts_tpu.utils.audio_io import read_audio, write_wav
from lemas_tts_tpu.uvr5.inference import MDXSeparator
from lemas_tts_tpu.uvr5.mdxnet import MDXConfig

TINY = MDXConfig(dim_c=4, dim_f=24, dim_t=16, n_fft=64, hop=16,
                 num_blocks=5, l=2, g=4, k=3, bn=2, bias=False, norm="group")


@pytest.fixture(scope="module")
def tiny_sep():
    return MDXSeparator.random_init(TINY, batch_size=4)


def _write_inputs(d, n=3, sr=44100, dur_s=0.05):
    rng = np.random.default_rng(7)
    paths = []
    for i in range(n):
        p = d / f"clip{i}.wav"
        write_wav(str(p), rng.uniform(-0.3, 0.3, int(sr * dur_s)).astype(np.float32), sr)
        paths.append(str(p))
    return paths


def test_collect_files_resume(tmp_path):
    src, out = tmp_path / "in", tmp_path / "out"
    src.mkdir()
    paths = _write_inputs(src)
    files = denoise_cli.collect_files(str(src), str(out))
    assert sorted(p for p, _ in files) == sorted(paths)
    # finished stems are skipped on re-run (reference walkFile :372)
    out.mkdir()
    (out / "clip1_vocal.wav").write_bytes(b"")
    files = denoise_cli.collect_files(str(src), str(out))
    assert all("clip1" not in p for p, _ in files) and len(files) == 2
    # single-file input
    assert denoise_cli.collect_files(paths[0], str(out)) == \
        [(paths[0], "clip0")]


def test_collect_files_subdir_no_collision(tmp_path):
    """Same basename in two subdirs must not clobber (output stems mirror
    the input tree; the reference's flat naming could collide)."""
    src, out = tmp_path / "in", tmp_path / "out"
    (src / "a").mkdir(parents=True)
    (src / "b").mkdir()
    for sub in ("a", "b"):
        write_wav(str(src / sub / "track.wav"),
                  np.zeros(1000, np.float32), 44100)
    files = denoise_cli.collect_files(str(src), str(out))
    stems = sorted(stem for _, stem in files)
    assert stems == ["a/track", "b/track"]


def test_process_files_writes_stems(tmp_path, tiny_sep):
    src, out = tmp_path / "in", tmp_path / "out"
    src.mkdir()
    files = _write_inputs(src, n=2)
    written = denoise_cli.process_files(
        tiny_sep, files, str(out), save_background=True, io_workers=2
    )
    assert len(written) == 2
    for i in range(2):
        voc, sr = read_audio(str(out / f"clip{i}_vocal.wav"))
        assert sr == 44100 and voc.shape[-1] > 0 and np.isfinite(voc).all()
        bg, _ = read_audio(str(out / f"clip{i}_background.wav"))
        assert bg.shape[-1] > 0


def test_main_end_to_end_and_resume(tmp_path, tiny_sep, monkeypatch):
    src, out = tmp_path / "in", tmp_path / "out"
    src.mkdir()
    _write_inputs(src, n=2)
    monkeypatch.setattr(denoise_cli, "build_separator", lambda args: tiny_sep)
    argv = ["-a", str(src), "-r", str(out), "--batch_size", "4"]
    written = denoise_cli.main(argv)
    assert len(written) == 2
    # second invocation: everything already done
    assert denoise_cli.main(argv) == []


def test_mesh_sharded_demix_matches_single_device(tiny_sep):
    from lemas_tts_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    sharded = MDXSeparator(TINY, tiny_sep.params, batch_size=3, mesh=mesh)
    if mesh.shape["data"] > 1:
        assert sharded.batch_size % mesh.shape["data"] == 0
    rng = np.random.default_rng(3)
    mix = rng.standard_normal((2, 4 * tiny_sep.gen_size + 11)).astype(np.float32)
    ref = tiny_sep.demix({0: mix})
    got = sharded.demix({0: mix})
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_vr_arc_path(tmp_path, monkeypatch):
    src, out = tmp_path / "in", tmp_path / "out"
    src.mkdir()
    files = _write_inputs(src, n=1, sr=8000, dur_s=0.5)
    import warnings

    from lemas_tts_tpu.uvr5.vr_network import VRSeparator

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sep = VRSeparator(n_fft=256, hop=128, nout=8, nout_lstm=16)
    written = denoise_cli.process_files(sep, files, str(out), io_workers=1)
    voc, sr = read_audio(written[0])
    assert sr == 8000 and voc.shape[-1] > 0 and np.isfinite(voc).all()
