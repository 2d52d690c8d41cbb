#!/bin/bash
# Rolling evidence guard for the live swingup run (round 5).
#
# The r5 box reset killed the builder session AND wiped runs/ — the only
# swingup evidence that survived was whatever the last harvest had
# committed. This loop makes the harvest cadence independent of the
# builder session: every INTERVAL seconds it re-exports the run's
# metrics into results/dmc_swingup/ (scripts/harvest_dmc_swingup.sh)
# and commits the refreshed artifacts. Commits are additive and the
# harvest is re-runnable, so the worst a crash can lose is one interval.
#
# Usage: nohup bash scripts/auto_harvest_loop.sh [interval_s] & (repo root)
set -u
INTERVAL="${1:-900}"
cd "$(dirname "$0")/.."
while true; do
  sleep "$INTERVAL"
  [ -f runs/dmc_swingup3/metrics.jsonl ] || continue
  if ! nice -n 10 bash scripts/harvest_dmc_swingup.sh \
      > /tmp/auto_harvest_last.log 2>&1; then
    echo "harvest failed $(date -u +%H:%M:%S)" >> /tmp/auto_harvest_err.log
    continue
  fi
  if git status --porcelain results/dmc_swingup | grep -q .; then
    step=$(python - <<'PYEOF'
import csv
rows = list(csv.DictReader(open("results/dmc_swingup/metrics.csv")))
steps = [float(r["_step"]) for r in rows if r.get("_step")]
rc = [float(r["agent/return_cum"]) for r in rows if r.get("agent/return_cum")]
print(f"{int(max(steps)) if steps else 0} (return_cum max {max(rc):.0f})"
      if rc else max(steps) if steps else 0)
PYEOF
)
    for _ in 1 2 3; do
      git add results/dmc_swingup && \
      git commit -q -m "Swingup run 3 rolling harvest: grad step ${step}

No-Verification-Needed: committed-results artifact refresh only" && break
      sleep 7
    done
  fi
done
