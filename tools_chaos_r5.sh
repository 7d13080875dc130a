#!/bin/bash
# Round-5 chaos-band replicates (VERDICT r4 Weak #1/#2): re-run the flax
# twin side with a 1e-6 RELATIVE init perturbation and fresh perturb
# seeds, everything else byte-identical to the round-4 protocol. The
# spread of final eval metrics across replicates IS the twin-chaos band —
# the null distribution a torch-vs-flax delta must exceed before it can
# be called semantic. Flax-side replicates are used because the two
# sides' train dynamics are parity-pinned per step
# (tests/test_train_dynamics_parity.py), so chaos amplification of an
# epsilon is a property of the shared trajectory, not of the framework;
# the torch control costs ~1-2 CPU-hours per replicate on this 1-core rig
# (which round 5 spends on the 256^2 flagship control instead).
set -u
cd /root/repo
WD=reports/twin_r5/chaos

run() { # tag family refcfg steps seed pseed
  local tag=$1 fam=$2 cfg=$3 steps=$4 seed=$5 pseed=$6
  if [ -f "$WD/$tag/flax_pert$pseed.json" ]; then
    echo "== $tag pert$pseed: exists, skip"; return
  fi
  mkdir -p "$WD/$tag"
  echo "== $tag pert$pseed start $(date +%H:%M:%S)"
  python -m litehandnet_tpu.tools.twin_accuracy --side flax \
    --family "$fam" --refcfg "$cfg" --mode heatmap \
    --size 128 --train-n 2048 --eval-n 256 --batch 16 \
    --steps "$steps" --lr 2e-3 --seed "$seed" \
    --perturb 1e-6 --perturb-seed "$pseed" \
    --workdir "$WD/$tag" > "$WD/$tag/flax_pert$pseed.log" 2>&1 \
    || echo "!! $tag pert$pseed FAILED rc=$?"
  echo "== $tag pert$pseed done $(date +%H:%M:%S)"
}

# litehrnet18: the family with the unexplained systematic delta -> 4
# replicates; litehandnet + resnet18: one well-behaved small-delta family
# each as cross-family controls -> 2 replicates each
run litehrnet18 litehrnet config/litehrnet/_2_freihand_224x244_dark_18.py 1000 30 1
run litehrnet18 litehrnet config/litehrnet/_2_freihand_224x244_dark_18.py 1000 30 2
run litehrnet18 litehrnet config/litehrnet/_2_freihand_224x244_dark_18.py 1000 30 3
run litehrnet18 litehrnet config/litehrnet/_2_freihand_224x244_dark_18.py 1000 30 4
run litehandnet litehandnet config/litehandnet/_2_freihand_224x244_dark_h4_ca_none.py 700 10 1
run litehandnet litehandnet config/litehandnet/_2_freihand_224x244_dark_h4_ca_none.py 700 10 2
run resnet18 resnet config/resnet/_2_freihand2d_224x224_dark_resnet18.py 1200 20 1
run resnet18 resnet config/resnet/_2_freihand2d_224x224_dark_resnet18.py 1200 20 2
echo "ALL CHAOS REPLICATES DONE $(date)"
