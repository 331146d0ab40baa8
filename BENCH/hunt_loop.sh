#!/bin/bash
# Round-6 hunt+strike runner (protocol in BENCH/BASELINE.md, declared
# before any strike ran). Mechanics:
#   - one production-weight hunt pair every $SPACING seconds, appended
#     to BENCH/scaling_hunt_r6.json the moment it completes, until the
#     artifact holds $BUDGET pairs (budget fixed up front; the loop
#     runs to budget REGARDLESS of intermediate results — no
#     outcome-gated stopping);
#   - after each pair, the trigger rule (v2, declared at pair 14:
#     latest pair eff >= 0.75 AND steal < 2.0% in both its windows —
#     harmonized with the protocol's own pre-declared steal cut) may
#     fire ONE full 5-pair strike (--scaling-strike), appended to
#     BENCH/scaling_strike_r6.json regardless of outcome.
# The hunt honors BENCH/.hunt_hold (self-load gate) internally.
set -u
cd /root/repo
BUDGET=${1:-24}
SPACING=${2:-480}
while true; do
  n=$(python -c "import json;print(len(json.load(open('BENCH/scaling_hunt_r6.json'))['pairs']))")
  if [ "$n" -ge "$BUDGET" ]; then echo "budget reached ($n pairs)"; break; fi
  BENCH_HUNT_PAIRS=$((n+1)) BENCH_HUNT_SPACING_S=0 BENCH_HUNT_DEADLINE_MIN=90 \
    BENCH_HUNT_OUT=BENCH/scaling_hunt_r6.json \
    python bench.py --scaling-hunt > /dev/null 2>&1
  trig=$(python - <<'PY'
import json
p = json.load(open('BENCH/scaling_hunt_r6.json'))['pairs'][-1]
print(1 if (p['eff'] >= 0.75 and p['steal_pct_1'] < 2.0 and p['steal_pct_4'] < 2.0) else 0)
PY
)
  if [ "$trig" = "1" ]; then
    echo "$(date -u +%H:%M:%S) trigger fired after pair $((n+1)) — strike"
    python bench.py --scaling-strike > /dev/null 2>&1
    python -c "import json;s=json.load(open('BENCH/scaling_strike_r6.json'))['strikes'][-1];print('strike eff:',s['value'],'clean pairs:',s['n_clean_pairs'])"
  fi
  sleep "$SPACING"
done
