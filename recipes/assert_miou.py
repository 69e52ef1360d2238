"""Shared recipe gate: parse 'mean iou score: [x]' from an eval log and
assert it clears a threshold.

Usage: python recipes/assert_miou.py <eval_log_path> <min_miou>

The log format is the segmentation_evaluate CLI's output (which mirrors the
reference's print at segmentation_evaluate.py:151-155); the threshold 0.52 is
the reference's own best-run save bar (self_train_main.py:53), 0.9 is the
synthetic convergence gate (recipes/convergence_gate.sh).
"""

import re
import sys


def parse_miou(text: str) -> float:
    """The one parser for the eval CLI's 'mean iou score' line (also used
    by bench_all.py's accuracy gates — keep the format change surface
    single)."""
    m = re.search(r"mean iou score: \[?([0-9.eE+-]+)\]?", text)
    assert m, f"no mean iou in eval output:\n{text}"
    return float(m.group(1))


def main(log_path: str, min_miou: float) -> float:
    miou = parse_miou(open(log_path).read())
    print(f"[recipe] final mIoU = {miou:.4f} (threshold {min_miou})")
    assert miou >= min_miou, f"mIoU {miou:.4f} below threshold {min_miou}"
    print("[recipe] PASSED")
    return miou


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]))
