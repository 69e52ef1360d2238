#!/usr/bin/env bash
# Synthetic convergence gate: proves the framework can actually TRAIN a
# segmenter, end to end through the real CLIs, not just run steps.
#
#   1. Fabricate a learnable-by-construction Freiburg tree (labels are a
#      function of pixel intensity — tests/synthetic.py
#      make_learnable_freiburg_tree; a working framework reaches ~1.0 mIoU).
#   2. segmentation_train CLI (small --layers config, full 256x512 protocol).
#   3. segmentation_evaluate CLI on the synthetic IR test split.
#   4. Assert mean IoU >= MIN_MIOU (default 0.9) via recipes/assert_miou.py —
#      the same gate code full_pipeline.sh uses with the 0.52 reference
#      threshold (self_train_main.py:53).
#
# Runs in minutes on one chip (and on CPU for smoke):
#   recipes/convergence_gate.sh               # default: /tmp workdir
#   WORKDIR=/path STEPS=0 EPOCHS=4 recipes/convergence_gate.sh
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO}${PYTHONPATH:+:${PYTHONPATH}}"

WORKDIR=${WORKDIR:-$(mktemp -d /tmp/tss_convergence.XXXX)}
EPOCHS=${EPOCHS:-100}             # ~25 steps/epoch; the intensity rule needs
STEPS=${STEPS:-0}                 # ~2000+ steps to beat view memorization
BATCH=${BATCH:-8}
LAYERS=${LAYERS:-1,1,1,1}
LR=${LR:-0.003}
MIN_MIOU=${MIN_MIOU:-0.9}
N_TRAIN=${N_TRAIN:-256}
CKPT=${CKPT:-convergence_gate.pth}

cd "${WORKDIR}"
python -c "
import sys; sys.path.insert(0, '${REPO}')
from tests.synthetic import make_learnable_freiburg_tree
make_learnable_freiburg_tree('datasets/freiburg', n_train=${N_TRAIN}, n_test=8,
                             n_bands=3)
print('[gate] synthetic learnable tree at', '${WORKDIR}/datasets/freiburg')
"

run() {
  local mod=$1; shift
  echo "+ [gate] ${mod} $*"
  python -u -m "thermal_semantic_segmentation_tpu.cli.${mod}" "$@"
}

run segmentation_train -dataset freiburg_ir -net_mode one_channel \
    -epochs "${EPOCHS}" -batch_size "${BATCH}" -val_batch_size "${BATCH}" \
    -lr "${LR}" -max_steps "${STEPS}" --layers "${LAYERS}" \
    --decode_cache_mb 1024 -new_checkpoint_name "${CKPT}"

EVAL_LOG=$(mktemp)
run segmentation_evaluate -dataset freiburg_ir -checkpoint_name "${CKPT}" \
    --layers "${LAYERS}" | tee "${EVAL_LOG}"

python "${REPO}/recipes/assert_miou.py" "${EVAL_LOG}" "${MIN_MIOU}"
