#!/bin/bash
# Run a heavy same-VM job (pytest, ad-hoc benches) under the hunt's
# self-load gate: create/refresh BENCH/.hunt_hold, wait for any
# in-flight hunt pair (.pair_running) to finish, run the command,
# remove the hold. Usage: BENCH/with_hold.sh <command...>
# Why: /proc/stat steal cannot see our own load (r4 lesson); r7
# pairs 2-4 were contaminated by ungated session jobs.
set -u
cd /root/repo
HOLD=BENCH/.hunt_hold
trap 'rm -f "$HOLD"' EXIT
touch "$HOLD"
for _ in $(seq 1 60); do
  [ -e BENCH/.pair_running ] || break
  sleep 5
done
"$@"
