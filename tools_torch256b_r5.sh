#!/bin/bash
# Waits for the litehandnet 256^2 torch control to finish, then runs the
# resnet18 256^2 control (second native-resolution twin cell). Detached +
# checkpointed like the first.
set -u
cd /root/repo
while [ ! -f reports/twin_r5/litehandnet_256/torch.json ]; do sleep 60; done
WD=reports/twin_r5/resnet18_256
mkdir -p "$WD"
JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 nice -n 10 \
python -m litehandnet_tpu.tools.twin_accuracy --side torch \
  --family resnet \
  --refcfg config/resnet/_2_freihand2d_224x224_dark_resnet18.py \
  --mode heatmap --size 256 --train-n 2048 --eval-n 256 --batch 16 \
  --steps 1200 --lr 2e-3 --seed 20 --workdir "$WD" \
  >> "$WD/torch.log" 2>&1
echo "resnet18 256 control rc=$? $(date)" >> "$WD/torch.log"
