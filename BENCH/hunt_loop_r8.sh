#!/bin/bash
# Round-8 hunt+strike runner (v4: single-pair full-weight strike) (protocol declared in BENCH/BASELINE.md
# 2026-08-18 12:43 UTC, before any r7 pair ran). Mechanics:
#   - one production-weight hunt pair every $SPACING seconds, appended
#     to BENCH/scaling_hunt_r8.json the moment it completes, until
#     $BUDGET pairs exist or $DEADLINE_UNIX passes (both fixed up
#     front; the loop runs to budget REGARDLESS of intermediate
#     results — no outcome-gated stopping);
#   - trigger v3 (declared before any pair): TWO CONSECUTIVE pairs
#     each with eff >= 0.75 AND steal < 2.0% in both windows fire ONE
#     1-pair full-weight strike (v4) (BENCH_SCALING_TRIALS=1), appended to
#     BENCH/scaling_strike_r8.json regardless of outcome; the trigger
#     then re-arms (needs two NEW qualifying pairs).
# The hunt honors BENCH/.hunt_hold (self-load gate) internally.
set -u
cd /root/repo
BUDGET=${1:-40}
SPACING=${2:-240}
DEADLINE_UNIX=${3:-$(date -u -d '2026-08-19 03:00' +%s)}
armed_at=0
while true; do
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE_UNIX" ]; then echo "deadline reached"; break; fi
  n=$(python -c "import json,os;p='BENCH/scaling_hunt_r8.json';print(len(json.load(open(p))['pairs']) if os.path.exists(p) else 0)")
  if [ "$n" -ge "$BUDGET" ]; then echo "budget reached ($n pairs)"; break; fi
  BENCH_HUNT_PAIRS=$((n+1)) BENCH_HUNT_SPACING_S=0 BENCH_HUNT_DEADLINE_MIN=90 \
    BENCH_HUNT_OUT=BENCH/scaling_hunt_r8.json \
    python bench.py --scaling-hunt > /dev/null 2>&1
  trig=$(python - <<'PY'
import json
ps = json.load(open('BENCH/scaling_hunt_r8.json'))['pairs']
def ok(p):
    return p['eff'] >= 0.75 and p['steal_pct_1'] < 2.0 and p['steal_pct_4'] < 2.0
print(1 if len(ps) >= 2 and ok(ps[-1]) and ok(ps[-2]) else 0)
PY
)
  if [ "$trig" = "1" ] && [ "$n" -ge "$armed_at" ]; then
    echo "$(date -u +%H:%M:%S) v4 trigger (two consecutive clean pairs) — 1-pair full-weight strike (v4)"
    BENCH_SCALING_TRIALS=1 BENCH_STRIKE_OUT=BENCH/scaling_strike_r8.json \
      python bench.py --scaling-strike > /dev/null 2>&1
    python -c "import json;s=json.load(open('BENCH/scaling_strike_r8.json'))['strikes'][-1];print('strike eff:',s['value'],'clean pairs:',s['n_clean_pairs'])"
    armed_at=$((n+2))
  fi
  sleep "$SPACING"
done
