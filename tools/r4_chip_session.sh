#!/bin/bash
# Round-4 measurement session: run every pending on-chip benchmark
# back-to-back the moment the device tunnel is healthy, logging each to
# its own file so a mid-run outage loses only one section.
#
#   bash tools/r4_chip_session.sh [outdir]   (default /tmp/r4bench)
#
# Sections (each independently fault-isolated):
#   1. bench.py                 — the round's headline JSON line
#   2. bench_dwconv             — conv vs scatter-mxu vs rowband lowerings
#   3. profile_model x4         — bs512 serving: base / rowband / int8 / both
#   4. bench_scorer auto        — 7-dataset sweep, windowed-vsd auto dispatch
#   5. bench_scorer full        — 7-dataset sweep, toolkit-exact full-image vsd
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-/tmp/r4bench}
mkdir -p "$OUT"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s)" | tee -a "$OUT/driver.log"
  /usr/bin/time -v timeout "$tmo" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  rc=$?
  echo "=== $name rc=$rc" | tee -a "$OUT/driver.log"
  tail -c 2000 "$OUT/$name.out" | tee -a "$OUT/driver.log"
}

run bench         1800 python bench.py
run dwconv        1800 python tools/bench_dwconv.py --batch-size 256
run prof_base     1200 python tools/profile_model.py \
    --config configs/gdrn/ycbv_convnext_base.py --batch-size 512
run prof_rowband  1200 python tools/profile_model.py \
    --config configs/gdrn/ycbv_convnext_base.py --batch-size 512 \
    --opts model.pose_net.backbone.dw_mode=auto_rowband
run prof_int8     1200 python tools/profile_model.py \
    --config configs/gdrn/ycbv_convnext_base.py --batch-size 512 \
    --opts model.pose_net.backbone.int8_mlp=True
run prof_both     1200 python tools/profile_model.py \
    --config configs/gdrn/ycbv_convnext_base.py --batch-size 512 \
    --opts model.pose_net.backbone.int8_mlp=True \
           model.pose_net.backbone.dw_mode=auto_rowband
run train_cli     2400 python tools/bench_train_cli.py --iters 60
run scorer_auto   3600 python tools/bench_scorer.py \
    --datasets lmo,tless,tudl,icbin,itodd,hb,ycbv --vsd-mode auto
run scorer_full   5400 python tools/bench_scorer.py \
    --datasets lmo,tless,tudl,icbin,itodd,hb,ycbv --vsd-mode full
echo "=== ALL DONE" | tee -a "$OUT/driver.log"
