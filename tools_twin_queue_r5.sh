#!/bin/bash
# Round-5 TPU-side twin queue: per-step-rounding (bf16 matmul) replicates,
# widened init-chaos bands, and the resnet18 256^2 flax cell. Serialized --
# two processes sharing the tunnel corrupt each other's wall numbers.
set -u
cd /root/repo
C=reports/twin_r5/chaos

flax() { # workdir family refcfg steps seed size extra...
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

# 1) per-step-rounding replicates (same init, bf16-input matmuls)
[ -f $C/litehandnet/flax_default.json ] || flax $C/litehandnet litehandnet $LHN_CFG 700 10 128 --matmul-precision default
[ -f $C/resnet18/flax_default.json ]   || flax $C/resnet18 resnet $RES_CFG 1200 20 128 --matmul-precision default
[ -f $C/litehrnet18/flax_default.json ] || flax $C/litehrnet18 litehrnet $LHR_CFG 1000 30 128 --matmul-precision default
# 2) widen init-chaos bands
[ -f $C/resnet18/flax_pert2.json ] || flax $C/resnet18 resnet $RES_CFG 1200 20 128 --perturb 1e-6 --perturb-seed 2
[ -f $C/resnet18/flax_pert3.json ] || flax $C/resnet18 resnet $RES_CFG 1200 20 128 --perturb 1e-6 --perturb-seed 3
[ -f $C/litehandnet/flax_pert3.json ] || flax $C/litehandnet litehandnet $LHN_CFG 700 10 128 --perturb 1e-6 --perturb-seed 3
[ -f $C/litehandnet/flax_pert4.json ] || flax $C/litehandnet litehandnet $LHN_CFG 700 10 128 --perturb 1e-6 --perturb-seed 4
# 3) resnet18 256^2 native-resolution flax cell
[ -f reports/twin_r5/resnet18_256/flax.json ] || flax reports/twin_r5/resnet18_256 resnet $RES_CFG 1200 20 256
echo "TWIN QUEUE DONE $(date)"
