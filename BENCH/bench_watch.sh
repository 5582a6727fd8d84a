#!/bin/bash
# Quiet-window bench hunter: the host intermittently makes guest minor
# page faults expensive (sys_frac > 0.7 on pure-userspace kernels; see
# machine_noise_probe.json + BASELINE.md). A bench.py run taken in such
# a window measures the host, not the engine. Loop: probe the window
# (BENCH/window_probe.py, good iff sys_frac < 0.25); on a good window
# run the full bench and record it with the probe context on both
# sides. Stops after the first quiet-window capture.
cd "$(dirname "$0")/.." || exit 1
OUT=BENCH/bench_quiet_r04.json
ATTEMPT=0
while true; do
  ATTEMPT=$((ATTEMPT + 1))
  PRE=$(python BENCH/window_probe.py 2>/dev/null | tail -1)
  GOOD=$(echo "$PRE" | python -c "import json,sys; print(json.load(sys.stdin)['good_window'])" 2>/dev/null)
  echo "[bench_watch] attempt $ATTEMPT pre-probe: $PRE"
  if [ "$GOOD" = "True" ]; then
    BENCH=$(python bench.py 2>/dev/null | tail -1)
    POST=$(python BENCH/window_probe.py 2>/dev/null | tail -1)
    # a capture whose window degraded mid-run goes to the forensics
    # file; OUT only ever holds a post-good capture (a bad attempt must
    # not clobber a good one)
    POSTGOOD=$(echo "$POST" | python -c "import json,sys; print(json.load(sys.stdin)['good_window'])" 2>/dev/null)
    DEST=BENCH/bench_last_attempt_r04.json
    if [ "$POSTGOOD" = "True" ]; then DEST="$OUT"; fi
    python - "$PRE" "$BENCH" "$POST" "$ATTEMPT" "$DEST" <<'EOF'
import json, sys
pre, bench, post, attempt, dest = sys.argv[1:6]
rec = {"attempt": int(attempt), "pre_probe": json.loads(pre),
       "bench": json.loads(bench), "post_probe": json.loads(post)}
with open(dest, "w") as f:
    json.dump(rec, f, indent=1)
print("captured ->", dest)
EOF
    if [ "$POSTGOOD" = "True" ]; then
      echo "[bench_watch] quiet-window bench captured at attempt $ATTEMPT"
      exit 0
    fi
    echo "[bench_watch] window degraded mid-run (post: $POST); retrying"
  fi
  sleep 120
done
