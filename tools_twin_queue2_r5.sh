#!/bin/bash
# Follow-up TPU twin queue: 'high' (bf16_3x) matmul replicates — per-step
# rounding perturbations of f32-like magnitude (~1e-6 rel), the clean null
# for a torch-f32-CPU vs flax-f32-TPU delta. Waits for queue 1.
set -u
cd /root/repo
while ! grep -q "TWIN QUEUE DONE" /tmp/twin_queue.log 2>/dev/null; do sleep 60; done
C=reports/twin_r5/chaos
flax() {
  local wd=$1 fam=$2 cfg=$3 steps=$4 seed=$5 size=$6; shift 6
  mkdir -p "$wd"
  echo "== flax $wd $* start $(date +%H:%M:%S)"
  python -m litehandnet_tpu.tools.twin_accuracy --side flax \
    --family "$fam" --refcfg "$cfg" --mode heatmap \
    --size "$size" --train-n 2048 --eval-n 256 --batch 16 \
    --steps "$steps" --lr 2e-3 --seed "$seed" --workdir "$wd" "$@" \
    >> "$wd/queue.log" 2>&1 || echo "!! FAILED rc=$? ($wd $*)"
  echo "== done $(date +%H:%M:%S)"
}
LHN_CFG=config/litehandnet/_2_freihand_224x244_dark_h4_ca_none.py
RES_CFG=config/resnet/_2_freihand2d_224x224_dark_resnet18.py
LHR_CFG=config/litehrnet/_2_freihand_224x244_dark_18.py
[ -f $C/litehandnet/flax_high.json ] || flax $C/litehandnet litehandnet $LHN_CFG 700 10 128 --matmul-precision high
[ -f $C/resnet18/flax_high.json ]   || flax $C/resnet18 resnet $RES_CFG 1200 20 128 --matmul-precision high
[ -f $C/litehrnet18/flax_high.json ] || flax $C/litehrnet18 litehrnet $LHR_CFG 1000 30 128 --matmul-precision high
echo "TWIN QUEUE 2 DONE $(date)"
