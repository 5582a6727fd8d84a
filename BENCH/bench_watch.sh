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
# sys_frac gates the HOST pathology; the docs/s floor additionally
# rejects windows where concurrent user-space load (e.g. a test-suite
# run) would contention-slow the bench without raising sys time.
# Quiet-window probes historically land 6.5-8k docs/s; storms 0.9-2k.
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
  PRE=$(python BENCH/window_probe.py 2>/dev/null | tail -1)
  GOOD=$(goodprobe "$PRE")
  echo "[bench_watch] attempt $ATTEMPT pre-probe: $PRE"
  if [ "$GOOD" = "True" ]; then
    BENCH=$(python bench.py 2>/dev/null | tail -1)
    POST=$(python BENCH/window_probe.py 2>/dev/null | tail -1)
    # a capture whose window degraded mid-run goes to the forensics
    # file; OUT only ever holds a post-good capture (a bad attempt must
    # not clobber a good one)
    POSTGOOD=$(goodprobe "$POST")
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
