#!/bin/bash
# Held-out-split eval closure on the TPU (VERDICT r3 item 4): build the
# 1600px synthetic scene, train 2k iters with split_test 4, render the
# splits, compute metrics. Artifacts land in output/demo/eval_heldout/.
set -e
cd "$(dirname "$0")/.."
if [ ! -d data/eval_scene/images ]; then
  python script/make_demo_scene.py --out data/eval_scene \
    --frames 16 --cameras 0 --height 1064 --width 1600 --points 150000
fi
echo "=== train ==="
python -u train.py --config configs/eval_heldout.yaml
echo "=== render ==="
python -u render.py --config configs/eval_heldout.yaml
echo "=== metrics ==="
python -u metrics.py --config configs/eval_heldout.yaml
echo "=== DONE ==="
