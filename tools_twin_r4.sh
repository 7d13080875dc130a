#!/bin/bash
# Round-4 TWIN_AUC driver: the 6 BASELINE §A families.
# Usage: tools_twin_r4.sh <side> <workdir> <steps_scale:full|smoke>
# Runs sequentially (1-core rig). Step counts tiered by measured s/step.
set -u
SIDE=$1; WD=$2; SCALE=${3:-full}
cd /root/repo

run() { # tag family refcfg mode steps seed
  local tag=$1 fam=$2 cfg=$3 mode=$4 steps=$5 seed=$6
  local tn=2048 en=256 batch=16
  if [ "$SCALE" = smoke ]; then steps=3; tn=32; en=16; batch=8; fi
  if [ -f "$WD/$tag/$SIDE.json" ]; then echo "== $tag $SIDE: exists, skip"; return; fi
  echo "== $tag $SIDE start $(date +%H:%M:%S)"
  mkdir -p "$WD/$tag"
  python -m litehandnet_tpu.tools.twin_accuracy --side "$SIDE" \
    --family "$fam" --refcfg "$cfg" --mode "$mode" \
    --size 128 --train-n $tn --eval-n $en --batch $batch \
    --steps "$steps" --lr 2e-3 --seed "$seed" \
    --workdir "$WD/$tag" > "$WD/$tag/$SIDE.log" 2>&1 \
    || echo "!! $tag $SIDE FAILED rc=$?"
  echo "== $tag $SIDE done $(date +%H:%M:%S)"
}

# step counts tiered by measured torch s/step at 128^2 b16 on this 1-core
# rig (litehandnet 6.3, resnet 1.2, lhr18 2.8, mnv2 1.7, srhand 2.8,
# lhr30 3.7) to fit the round budget; every run is >=700 steps = >=5.5
# epochs over the 2048-image corpus
run litehandnet litehandnet config/litehandnet/_2_freihand_224x244_dark_h4_ca_none.py heatmap 700 10
run resnet18    resnet      config/resnet/_2_freihand2d_224x224_dark_resnet18.py      heatmap 1200 20
run litehrnet18 litehrnet   config/litehrnet/_2_freihand_224x244_dark_18.py           heatmap 1000 30
run mobilenetv2 mobilenetv2 config/mobilenetv2/_1_freihand2d_224x224_dark.py          heatmap 1200 40
run srhandnet   srhandnet   config/srhandnet/_1_freihand2d_224x224_region.py          srhandnet 1000 50
run litehrnet30 litehrnet   config/litehrnet/_1_rhd2d_256x256_dark_30.py              heatmap 800 60
# 7th family beyond the BASELINE §A table: mynet (MS-Att hourglass, the
# reference's own architecture) — same protocol, measured ~6 s/step torch
run mynet       mynet       config/mynet/_2_freihand2d_224x224_dark.py                heatmap 700 70
echo "ALL $SIDE DONE $(date)"
