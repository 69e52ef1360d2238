"""Preemption-safe training: SIGTERM -> resumable checkpoint -> clean exit.

Production TPU slices get preempted with a short SIGTERM grace window; the
trainers poll utils/preempt.GracefulShutdown each step, save a
``preempt_<name>`` checkpoint in the normal resumable schema, and return.
The reference loses everything since its last per-epoch torch.save.
"""

import os
import signal

import pytest

from tests.synthetic import make_freiburg_tree
from thermal_semantic_segmentation_tpu.utils.preempt import (GracefulShutdown,
                                                             NullShutdown)


def test_graceful_shutdown_flag_and_restore():
    before = signal.getsignal(signal.SIGTERM)
    with GracefulShutdown() as stop:
        assert not stop.requested
        signal.raise_signal(signal.SIGTERM)   # delivered synchronously
        assert stop.requested
        assert stop.signum == signal.SIGTERM
    assert signal.getsignal(signal.SIGTERM) is before


def test_graceful_shutdown_second_signal_escalates():
    """A second signal restores the original disposition and re-delivers,
    so a stuck run can still be killed the usual way."""
    hits = []

    def prev_handler(signum, frame):
        hits.append(signum)

    old = signal.signal(signal.SIGUSR1, prev_handler)
    try:
        with GracefulShutdown(signals=(signal.SIGUSR1,)) as stop:
            signal.raise_signal(signal.SIGUSR1)
            assert stop.requested and not hits
            signal.raise_signal(signal.SIGUSR1)  # escalation path
            assert hits == [signal.SIGUSR1]
    finally:
        signal.signal(signal.SIGUSR1, old)


def test_null_shutdown_is_inert():
    assert NullShutdown().requested is False


class PollCountingShutdown:
    """Fake: requests shutdown after the N-th poll (deterministic stand-in
    for a real mid-training SIGTERM)."""

    def __init__(self, after: int):
        self._poll = 0
        self._after = after
        self.signum = signal.SIGTERM

    @property
    def requested(self):
        self._poll += 1
        return self._poll > self._after


def test_seg_train_preempt_saves_resumable_checkpoint(tmp_path, monkeypatch):
    from thermal_semantic_segmentation_tpu.cli import segmentation_train
    from thermal_semantic_segmentation_tpu.cli._common import \
        load_seg_checkpoint
    from thermal_semantic_segmentation_tpu.cli.options import seg_parse
    from thermal_semantic_segmentation_tpu.utils.logging import get_logger

    root = make_freiburg_tree(str(tmp_path / "freiburg"), n_train=12,
                              n_test=2)
    monkeypatch.chdir(tmp_path)
    ckpt_dir = str(tmp_path / "ckpt")
    common = ["--freiburg_root", root, "--model_root_path", ckpt_dir,
              "-net_mode", "one_channel", "-dataset", "freiburg_ir",
              "-batch_size", "8", "-val_batch_size", "8"]

    # "preempt" after the first step of the first epoch (epochs=3 would
    # otherwise run three validation rounds)
    args = seg_parse().parse_args([
        "-epochs", "3", "--layers", "1,1,1,1",
        "-new_checkpoint_name", "pre.pth", *common])
    args.logdir = str(tmp_path / "logs")
    os.makedirs(args.logdir, exist_ok=True)
    segmentation_train.seg_main(args, get_logger(args.logdir),
                                shutdown=PollCountingShutdown(after=1))

    path = os.path.join(ckpt_dir, "preempt_pre.pth")
    assert os.path.exists(path), "preemption must leave a checkpoint behind"
    _, meta = load_seg_checkpoint(path)
    # interrupted during epoch 0 -> saved as epoch -1 -> resume redoes epoch 0
    assert int(meta["epoch"]) == -1
    assert [int(x) for x in meta["layers"]] == [1, 1, 1, 1]
    # the best-val checkpoint was never written (we stopped pre-validation)
    assert not os.path.exists(os.path.join(ckpt_dir, "pre.pth"))

    # resume from the preempt checkpoint through the real CLI: architecture
    # comes from the checkpoint meta, epoch restarts at 0
    segmentation_train.main([
        "-epochs", "1", "-max_steps", "1", "-load_model", "true",
        "-checkpoint_name", "preempt_pre.pth",
        "-new_checkpoint_name", "resumed.pth", *common])
    assert os.path.exists(os.path.join(ckpt_dir, "resumed.pth"))
