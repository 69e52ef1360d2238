"""Profiling CLI (cli/profile_step.py): trace capture + aggregation."""

import json

from thermal_semantic_segmentation_tpu.cli import profile_step


def test_profile_step_seg(tmp_path, capsys):
    profile_step.main(["--step", "seg", "--batch_size", "2",
                       "--image_size", "32", "64", "--layers", "1,1,1,1",
                       "--bf16", "false", "--steps", "2", "--warmup", "1",
                       "--logdir", str(tmp_path / "trace")])
    out = capsys.readouterr().out
    # final line is the machine-readable summary
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["step"] == "seg" and summary["batch_size"] == 2
    assert summary["wall_ms_per_step"] > 0
    assert summary["device_ms_per_step"] > 0
    # the aggregation must surface actual XLA kernels, not just host frames
    per_op, _ = profile_step._aggregate_trace(str(tmp_path / "trace"))
    assert any("convolution" in op or "fusion" in op for op in per_op)
    # raw trace kept at the requested logdir
    assert (tmp_path / "trace").exists()


def test_profile_step_rejects_unknown():
    import pytest

    with pytest.raises(SystemExit):
        profile_step._build("nope", None)


def test_profile_step_fidelity_flags_parse():
    # the recipe's fidelity configuration is profileable (full execution is
    # exercised manually — a 256x512 UNet step is minutes on the CI host)
    args = profile_step.profile_parse().parse_args(
        ["--step", "gan", "--gan_cycle", "true", "--with_contour", "true",
         "--sem_loss", "true", "--ngf", "8", "--layers", "1,1,1,1"])
    assert args.gan_cycle and args.with_contour and args.sem_loss
