"""Profiler CLI smoke: trace capture + xplane summary on CPU."""

import glob
import os
import pytest


@pytest.mark.slow
def test_profile_sampler_cli(tmp_path, capsys):
    from lemas_tts_tpu.scripts.profile_sampler import main

    rc = main(["--batch", "1", "--nfe", "2", "--frames", "128",
               "--text_len", "32", "--top", "5",
               "--logdir", str(tmp_path / "trace")])
    out = capsys.readouterr().out
    assert rc in (0, 1)  # 1 = backend wrote no xplane (acceptable on CPU)
    assert "ms/step" in out  # wall timing always reported
    if rc == 0:
        assert glob.glob(str(tmp_path / "trace" / "**" / "*.xplane.pb"),
                         recursive=True)


def test_summarize_existing_xplane(tmp_path, capsys):
    """--summarize parses a captured trace without re-running the model."""
    from lemas_tts_tpu.scripts.profile_sampler import main, summarize_xplane

    import jax
    import jax.numpy as jnp

    logdir = str(tmp_path / "t")
    jax.profiler.start_trace(logdir)
    jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    jax.profiler.stop_trace()
    pbs = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert pbs, "jax wrote no xplane trace"
    text = summarize_xplane(pbs[0], top=3)
    assert isinstance(text, str) and text
    assert main(["--summarize", pbs[0]]) == 0
    assert capsys.readouterr().out.strip()
