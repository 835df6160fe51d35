#!/bin/bash
# Low-batch serving frontier (VERDICT round-3 item 3): steps/s + effective
# MFU at b in {1,4,8} for the 128^2 SR3 chain — bf16 vs W8A8(all sites),
# each composed with DDIM S=50 (eta=1) and DeepCache(5,1); plus the
# attention-sites probe at b8/b32 (item 7). Task quality is batch-invariant
# and lives in results/quality_w8a8 (40k+EMA ckpt).
# Run on the TPU chip, detached:  setsid scripts/bench_lowbatch.sh > /tmp/lowbatch.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p results/serving_lowbatch
for B in 1 4 8; do
  timeout 2400 python scripts/bench_w8a8.py --batch $B --steps 100 \
    --updown --shortcut --ddim 50 --deepcache 5,1 --no_walker \
    --out results/serving_lowbatch/b${B}_allsites.json
done
# attention-sites probe (composes all+attn) at serving and throughput batch
for B in 8 32; do
  timeout 2400 python scripts/bench_w8a8.py --batch $B --steps 100 \
    --updown --shortcut --attn --no_walker \
    --out results/serving_lowbatch/b${B}_attnsites.json
done
echo DONE_LOWBATCH
