#!/bin/bash
# Round-5 quiet-window hunter (judge directives #1 + #7): on a
# user-dominated window (window_probe good_window && docs/s floor),
# capture (a) the full headline bench -> BENCH/bench_quiet_r05.json and
# (b) a fresh pinned 8->32 scaling pair in the SAME window ->
# BENCH/scaling_results_8_32_pinned_r5.json.  Window forensics (pre/post
# probes) are recorded on both sides of each artifact; a capture whose
# window degraded mid-run goes to the *_attempt forensics file instead
# (a bad attempt must not clobber a good one).  Stops when BOTH
# artifacts have landed quiet.
cd "$(dirname "$0")/.." || exit 1
BOUT=BENCH/bench_quiet_r05.json
SOUT=BENCH/scaling_results_8_32_pinned_r5.json
MIN_DPS=${MIN_DPS:-5500}
goodprobe() {
  echo "$1" | python -c "
import json, sys
r = json.load(sys.stdin)
print(r['good_window'] and r['docs_per_sec'] >= $MIN_DPS)" 2>/dev/null
}
ATTEMPT=0
while true; do
  ATTEMPT=$((ATTEMPT + 1))
  if [ -f "$BOUT" ] && [ -f "$SOUT" ]; then
    echo "[bench_watch_r05] both artifacts captured; done"
    exit 0
  fi
  PRE=$(python BENCH/window_probe.py 2>/dev/null | tail -1)
  GOOD=$(goodprobe "$PRE")
  echo "[bench_watch_r05] attempt $ATTEMPT pre-probe: $PRE"
  if [ "$GOOD" = "True" ]; then
    if [ ! -f "$BOUT" ]; then
      BENCH=$(python bench.py 2>/dev/null | tail -1)
      POST=$(python BENCH/window_probe.py 2>/dev/null | tail -1)
      POSTGOOD=$(goodprobe "$POST")
      DEST=BENCH/bench_last_attempt_r05.json
      if [ "$POSTGOOD" = "True" ]; then DEST="$BOUT"; fi
      python - "$PRE" "$BENCH" "$POST" "$ATTEMPT" "$DEST" <<'EOF'
import json, sys
pre, bench, post, attempt, dest = sys.argv[1:6]
rec = {"attempt": int(attempt), "pre_probe": json.loads(pre),
       "bench": json.loads(bench), "post_probe": json.loads(post)}
with open(dest, "w") as f:
    json.dump(rec, f, indent=1)
print("captured ->", dest)
EOF
      if [ "$POSTGOOD" != "True" ]; then
        echo "[bench_watch_r05] window degraded mid-bench (post: $POST)"
        sleep 120; continue
      fi
      echo "[bench_watch_r05] quiet bench captured at attempt $ATTEMPT"
    fi
    # scaling pair in the same (still-quiet) window
    if [ ! -f "$SOUT" ]; then
      SPRE=$(python BENCH/window_probe.py 2>/dev/null | tail -1)
      SGOOD=$(goodprobe "$SPRE")
      if [ "$SGOOD" != "True" ]; then
        echo "[bench_watch_r05] window closed before scaling (probe: $SPRE)"
        sleep 120; continue
      fi
      SCALING_PIN=1 python BENCH/scaling.py /tmp/scale_corpus200k 1 200000 \
        > /tmp/scaling_r5_run.log 2>&1
      SPOST=$(python BENCH/window_probe.py 2>/dev/null | tail -1)
      SPOSTGOOD=$(goodprobe "$SPOST")
      if [ -f BENCH/scaling_results_8_32_pinned.json ]; then
        python - "$SPRE" "$SPOST" "$ATTEMPT" "$SPOSTGOOD" <<'EOF'
import json, sys
spre, spost, attempt, postgood = sys.argv[1:5]
rec = json.load(open("BENCH/scaling_results_8_32_pinned.json"))
rec["pre_probe"] = json.loads(spre)
rec["post_probe"] = json.loads(spost)
rec["attempt"] = int(attempt)
rec["post_window_good"] = postgood == "True"
dest = ("BENCH/scaling_results_8_32_pinned_r5.json" if postgood == "True"
        else "BENCH/scaling_last_attempt_r5.json")
with open(dest, "w") as f:
    json.dump(rec, f, indent=1)
print("captured ->", dest)
EOF
      fi
      if [ "$SPOSTGOOD" = "True" ]; then
        echo "[bench_watch_r05] quiet scaling pair captured"
      else
        echo "[bench_watch_r05] scaling window degraded (post: $SPOST)"
      fi
    fi
  fi
  sleep 180
done
