#!/bin/bash
# Round-5 256^2 flagship twin torch control (VERDICT r4 item 1), detached
# + checkpointed so a session death cannot lose the CPU-hours again.
set -u
cd /root/repo
WD=reports/twin_r5/litehandnet_256
mkdir -p "$WD"
JAX_PLATFORMS=cpu OMP_NUM_THREADS=1 nice -n 10 \
python -m litehandnet_tpu.tools.twin_accuracy --side torch \
  --family litehandnet \
  --refcfg config/litehandnet/_2_freihand_224x244_dark_h4_ca_none.py \
  --mode heatmap --size 256 --train-n 2048 --eval-n 256 --batch 16 \
  --steps 700 --lr 2e-3 --seed 10 --workdir "$WD" \
  >> "$WD/torch.log" 2>&1
echo "torch 256 control rc=$? $(date)" >> "$WD/torch.log"
