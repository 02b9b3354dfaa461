"""cfg_cutoff speed/quality probe CLI on CPU at tiny geometry."""

import json


def test_cutoff_probe_tiny(capsys):
    from lemas_tts_tpu.scripts.cutoff_probe import build_argparser, run_probe

    args = build_argparser().parse_args([
        "--nfe", "6", "--cfg", "2.0", "--sway", "1.0",
        "--cutoffs", "1e-12,0.8", "--batch", "1", "--n", "128",
        "--dim", "64", "--depth", "2", "--heads", "4",
    ])
    tiny, moderate = run_probe(args)

    # a cutoff below the smallest cfg_t is the identity: every step stays on
    # the CFG path and the trajectory is bit-identical
    assert tiny["active_steps"] == tiny["total_steps"] == 6
    assert tiny["fwd_cost_ratio"] == 1.0
    assert tiny["mel_mse"] == 0.0

    # a moderate cutoff truncates a strict suffix and changes the output
    assert 0 < moderate["active_steps"] < 6
    assert moderate["fwd_cost_ratio"] < 1.0
    assert moderate["mel_mse"] > 0.0
    assert moderate["rel_l2"] > 0.0

    # one JSON line per cutoff on stdout
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [l["cutoff"] for l in lines] == [1e-12, 0.8]
