#!/bin/bash
# Round-4 bench sequence (runs on a quiet box, strictly sequential so
# no phase contaminates another):
#   1. shared 640k-page repeat-mode corpus (bench_scaling layout)
#   2. seen-filter trio: 240k crawl at 8 pinned cores with the J1
#      stage on exact / sharded-bloom / sharded-cuckoo (2 reps each,
#      order-flipped) — verdict ask #7
#   3. analytics scale-stress over a 120k-page crawl of the diverse
#      corpus — verdict ask #4
#   4. three clean interleaved-solo scaling sessions at the frozen
#      round-4 code — verdict ask #5
set -u
cd /root/repo
OUT=benchruns/r04
mkdir -p $OUT
CORPUS=/tmp/bigweb-r04/pages
export SPARK_GRAFT_BENCH_PAGES_DIR=$CORPUS

if [ ! -d "$CORPUS" ]; then
  python scripts/bench_scaling.py --build "$CORPUS" || exit 1
fi

# --- 2. seen-filter trio ---------------------------------------------
SEENLOG=$OUT/seen_filter_240k.jsonl
if [ ! -s "$SEENLOG" ]; then
  for mode in "" bloom cuckoo cuckoo bloom ""; do
    SPARK_GRAFT_BENCH_SEEN_FILTER="$mode" \
      python scripts/bench_scaling.py --child 8 2>>$OUT/seen_filter_240k.stderr.log \
      | grep '^{' | sed "s/^{/{\"seen_filter\": \"${mode:-exact}\", /" >> "$SEENLOG"
  done
fi

# --- 3. analytics scale-stress ---------------------------------------
if [ ! -s "$OUT/scale_analytics.json" ]; then
  SPARK_GRAFT_SCALE_LIMIT=120000 SPARK_GRAFT_SCALE_DIR=/tmp/bigweb-r04-scale \
    python scripts/bench_scale_analytics.py $OUT/scale_analytics.json \
    2> $OUT/scale_analytics.stderr.log
fi

# --- 4. three clean scaling sessions ---------------------------------
for i in 1 2 3; do
  if [ ! -s "$OUT/seq_240k_3rep_s$i.json" ]; then
    python scripts/bench_scaling.py --seq 3 \
      > "$OUT/seq_240k_3rep_s$i.json" \
      2> "$OUT/seq_240k_3rep_s$i.stderr.log"
  fi
done
echo DONE
