#!/bin/bash
# Round-5 TPU evidence pipeline — run on a healthy axon relay, quiet host.
# Each stage is a fresh process (per-process AOT artifacts / cache loads);
# logs under /tmp/r5_*.log. Stages ordered so a mid-pipeline relay death
# still leaves committed-cache value behind.
set -x
cd /root/repo

probe() {
  timeout -s KILL 120 python -c "
import jax, numpy as np, jax.numpy as jnp
print('probe:', np.asarray(jnp.arange(8).sum()))" || return 1
}

probe || { echo "TPU unreachable"; exit 1; }

# 1. AOT export pass: re-traces every big graph once, writes .jax_export
#    artifacts (new code salt) + persists all compiles (DP off: export is
#    the goal, warm timings come from stage 2)
ZKODST_AOT_EXPORT=1 ZKODST_BENCH_SCALE_INSTANCES=0 ZKODST_BENCH_REPEATS=2 \
  ZKODST_BENCH_DEADLINE=7200 \
  python bench.py > /tmp/r5_export_bench.log 2>&1
echo "export bench rc=$?"

# 2. Warm verify bench: fresh process, artifacts + caches hot — the
#    driver-shaped run (5 repeats, DP-scale 1024, golden + mock +
#    halo2ce gates)
ZKODST_BENCH_DEADLINE=5400 python bench.py > /tmp/r5_warm_bench.log 2>&1
echo "warm bench rc=$?"

# 3. Flagship halo2ce golden fixture (k=17, both modes re-proved)
python scripts/make_flagship_golden.py > /tmp/r5_flagship_golden.log 2>&1
echo "flagship golden rc=$?"

# 4. Evidence: PP A/B + IPA k=17 (constant-shape fold) — k18 separately
python scripts/record_evidence_r5.py --skip-k18 \
  > /tmp/r5_evidence.log 2>&1
echo "evidence rc=$?"

# 5. Roofline + component profile refresh (docs/PERF.md numbers)
python scripts/roofline.py > /tmp/r5_roofline.log 2>&1
echo "roofline rc=$?"
python scripts/profile_components.py > /tmp/r5_components.log 2>&1
echo "components rc=$?"

# 6. k=18 leg (setup ~40 min cold SRS; run last — most expendable)
python scripts/record_evidence_r5.py --skip-ipa \
  > /tmp/r5_evidence_k18.log 2>&1
echo "k18 rc=$?"
