"""Stage-reuse guards in the on-chip gates (bench_all.py).

The gates run for hours over a flaky tunnel, so their resume logic — skip a
stage only when an EARLIER COMPLETED run proves it — is what keeps a killed
workdir from silently measuring an undertrained model. Pure-host logic,
pinned here so the chip runs never have to debug it.
"""

import os

import numpy as np
import pytest

import bench_all
from thermal_semantic_segmentation_tpu.core.checkpoint import save_checkpoint


def test_run_stage_once_skips_only_after_completion(tmp_path):
    marker_base = str(tmp_path / "stage.pth")
    calls = []

    bench_all._run_stage_once(marker_base, lambda: calls.append(1))
    assert calls == [1]
    # second invocation: the .done marker proves completion -> skipped
    bench_all._run_stage_once(marker_base, lambda: calls.append(2))
    assert calls == [1]

    # a stage that RAISES must not leave a marker (a killed run resumes)
    crash_base = str(tmp_path / "crash.pth")
    with pytest.raises(RuntimeError):
        bench_all._run_stage_once(crash_base,
                                  lambda: (_ for _ in ()).throw(RuntimeError()))
    assert not os.path.exists(crash_base + ".done")
    bench_all._run_stage_once(crash_base, lambda: calls.append(3))
    assert calls == [1, 3]


def test_gan_checkpoint_trained_rejects_baselines_and_junk(tmp_path):
    path = str(tmp_path / "g.pth")
    assert not bench_all._gan_checkpoint_trained(path)  # absent

    # a crashed gate workdir can hold a 1-step "baseline" ckpt: not trained
    save_checkpoint(path, {"epoch": 0, "g_vars": {}})
    assert not bench_all._gan_checkpoint_trained(path, min_epoch=5)
    save_checkpoint(path, {"epoch": 4, "g_vars": {}})
    assert not bench_all._gan_checkpoint_trained(path, min_epoch=5)
    save_checkpoint(path, {"epoch": 5, "g_vars": {}})
    assert bench_all._gan_checkpoint_trained(path, min_epoch=5)

    # corrupt file: unreadable must mean "not trained", never a crash
    with open(path, "wb") as f:
        f.write(b"not a checkpoint")
    assert not bench_all._gan_checkpoint_trained(path)


def test_evaluate_miou_parses_reference_output_format():
    from recipes.assert_miou import parse_miou

    # the exact line segmentation_evaluate prints (reference
    # segmentation_evaluate.py:88-94 format)
    text = ("target set class IoU road,parking: 0.9\n"
            "mean iou score: 0.8125\nsomething else\n")
    assert parse_miou(text) == pytest.approx(0.8125)
