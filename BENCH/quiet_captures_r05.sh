#!/bin/bash
# Round-5 sequential quiet-window capturer — ONE process, one capture
# in flight at a time, priority order:
#   1. fast headline bench (headline whitelist + build_200k, ~4 min —
#      fits a typical window)            -> BENCH/bench_quiet_fast_r05.json
#   2. 200k pinned pair (post straggler fix), then 800k pinned pair (the input-size sweep that shows the
#      serial floor amortizing)          -> BENCH/scaling_results_8_32_pinned_800k_r5.json
#   3. full bench                        -> BENCH/bench_quiet_r05.json
# Window gate: BENCH/window_probe.py good_window + docs/s floor, probed
# before AND after each capture; degraded captures go to *_attempt
# files and never clobber a good one.  Exits when all three exist.
cd "$(dirname "$0")/.." || exit 1
FAST=BENCH/bench_quiet_fast_r05.json
S200=BENCH/scaling_results_8_32_pinned_r5.json
S800=BENCH/scaling_results_8_32_pinned_800k_r5.json
FULL=BENCH/bench_quiet_r05.json
MIN_DPS=${MIN_DPS:-5500}
goodprobe() {
  echo "$1" | python -c "
import json, sys
r = json.load(sys.stdin)
print(r['good_window'] and r['docs_per_sec'] >= $MIN_DPS)" 2>/dev/null
}

wrap_bench() { # $1 pre, $2 benchline, $3 post, $4 attempt, $5 dest
  python - "$1" "$2" "$3" "$4" "$5" <<'EOF'
import json, sys
pre, bench, post, attempt, dest = sys.argv[1:6]
if not bench.strip():
    raise SystemExit("empty bench output; not wrapping")
rec = {"attempt": int(attempt), "pre_probe": json.loads(pre),
       "bench": json.loads(bench), "post_probe": json.loads(post)}
with open(dest, "w") as f:
    json.dump(rec, f, indent=1)
print("captured ->", dest)
EOF
}

ATTEMPT=0
while true; do
  if [ -f "$FAST" ] && [ -f "$S200" ] && [ -f "$S800" ] && [ -f "$FULL" ]; then
    echo "[quiet_r05] all three artifacts captured; done"
    exit 0
  fi
  ATTEMPT=$((ATTEMPT + 1))
  PRE=$(python BENCH/window_probe.py 2>/dev/null | tail -1)
  GOOD=$(goodprobe "$PRE")
  echo "[quiet_r05] attempt $ATTEMPT pre-probe: $PRE"
  if [ "$GOOD" != "True" ]; then sleep 180; continue; fi

  if [ ! -f "$FAST" ]; then
    B=$(BENCH_FAST=1 BENCH_QUIET_WAIT_S=0 python bench.py 2>/dev/null | tail -1)
    POST=$(python BENCH/window_probe.py 2>/dev/null | tail -1)
    PG=$(goodprobe "$POST")
    DEST=BENCH/bench_fast_attempt_r05.json
    [ "$PG" = "True" ] && DEST="$FAST"
    wrap_bench "$PRE" "$B" "$POST" "$ATTEMPT" "$DEST" || true
    [ "$PG" = "True" ] && echo "[quiet_r05] FAST captured (attempt $ATTEMPT)" \
                       || echo "[quiet_r05] fast window degraded: $POST"
    continue   # re-probe before the next (longer) capture
  fi

  if [ ! -f "$S200" ]; then
    SCALING_PIN=1 python BENCH/scaling.py /tmp/scale_corpus200k 1 200000 \
      > /tmp/scaling200k_run.log 2>&1
    POST=$(python BENCH/window_probe.py 2>/dev/null | tail -1)
    PG=$(goodprobe "$POST")
    if [ -f BENCH/scaling_results_8_32_pinned.json ]; then
      python - "$PRE" "$POST" "$ATTEMPT" "$PG" <<'PYEOF'
import json, sys
pre, post, attempt, pg = sys.argv[1:5]
rec = json.load(open("BENCH/scaling_results_8_32_pinned.json"))
if rec.get("sf_dir") != "/tmp/scale_corpus200k":
    raise SystemExit("stale scaling file; not wrapping")
rec["pre_probe"] = json.loads(pre)
rec["post_probe"] = json.loads(post)
rec["attempt"] = int(attempt)
rec["post_window_good"] = pg == "True"
rec["note"] = "post load-balanced bucket placement"
dest = ("BENCH/scaling_results_8_32_pinned_r5.json" if pg == "True"
        else "BENCH/scaling200k_last_attempt.json")
with open(dest, "w") as f:
    json.dump(rec, f, indent=1)
print("captured ->", dest)
PYEOF
    fi
    [ -f "$S200" ] && echo "[quiet_r05] 200k pair captured (attempt $ATTEMPT)" \
                   || echo "[quiet_r05] 200k window degraded: $POST"
    continue
  fi

  if [ ! -f "$S800" ]; then
    SCALING_PIN=1 python BENCH/scaling.py /tmp/scale_corpus800k 1 800000 \
      > /tmp/scaling800k_run.log 2>&1
    POST=$(python BENCH/window_probe.py 2>/dev/null | tail -1)
    PG=$(goodprobe "$POST")
    if [ -f BENCH/scaling_results_8_32_pinned.json ]; then
      python - "$PRE" "$POST" "$ATTEMPT" "$PG" <<'EOF'
import json, sys
pre, post, attempt, pg = sys.argv[1:5]
rec = json.load(open("BENCH/scaling_results_8_32_pinned.json"))
if rec.get("sf_dir") != "/tmp/scale_corpus800k":
    raise SystemExit("stale scaling file; not wrapping")
rec["pre_probe"] = json.loads(pre)
rec["post_probe"] = json.loads(post)
rec["attempt"] = int(attempt)
rec["post_window_good"] = pg == "True"
dest = ("BENCH/scaling_results_8_32_pinned_800k_r5.json" if pg == "True"
        else "BENCH/scaling800k_last_attempt.json")
with open(dest, "w") as f:
    json.dump(rec, f, indent=1)
print("captured ->", dest)
EOF
    fi
    [ -f "$S800" ] && echo "[quiet_r05] 800k pair captured (attempt $ATTEMPT)" \
                   || echo "[quiet_r05] 800k window degraded: $POST"
    continue
  fi

  if [ ! -f "$FULL" ]; then
    B=$(BENCH_QUIET_WAIT_S=0 python bench.py 2>/dev/null | tail -1)
    POST=$(python BENCH/window_probe.py 2>/dev/null | tail -1)
    PG=$(goodprobe "$POST")
    DEST=BENCH/bench_last_attempt_r05.json
    [ "$PG" = "True" ] && DEST="$FULL"
    wrap_bench "$PRE" "$B" "$POST" "$ATTEMPT" "$DEST" || true
    [ "$PG" = "True" ] && echo "[quiet_r05] FULL captured (attempt $ATTEMPT)" \
                       || echo "[quiet_r05] full window degraded: $POST"
  fi
done
