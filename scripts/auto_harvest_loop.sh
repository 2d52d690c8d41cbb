#!/bin/bash
# Rolling evidence guard for the live DMC runs (round 5).
#
# The r5 box resets killed the builder session AND wiped runs/ — the only
# evidence that survived was whatever the last harvest had committed.
# This loop makes the harvest cadence independent of the builder session:
# every INTERVAL seconds it re-exports each live run's metrics into
# results/ (scripts/harvest_dmc_{swingup,cheetah}.sh) and commits the
# refreshed artifacts. Commits are additive and the harvests are
# re-runnable, so the worst a crash can lose is one interval.
#
# Usage: nohup bash scripts/auto_harvest_loop.sh [interval_s] & (repo root)
set -u
INTERVAL="${1:-900}"
cd "$(dirname "$0")/.."

harvest_one() {  # $1 run-metrics file  $2 harvest script  $3 results dir  $4 label
  [ -f "$1" ] || return 0
  if ! nice -n 10 bash "$2" > /tmp/auto_harvest_last.log 2>&1; then
    echo "harvest $4 failed $(date -u +%H:%M:%S)" >> /tmp/auto_harvest_err.log
    return 0
  fi
  if git status --porcelain "$3" | grep -q .; then
    step=$(python - "$3/metrics.csv" <<'PYEOF'
import csv, sys
rows = list(csv.DictReader(open(sys.argv[1])))
steps = [float(r["_step"]) for r in rows if r.get("_step")]
rc = [float(r["agent/return_cum"]) for r in rows if r.get("agent/return_cum")]
print(f"{int(max(steps)) if steps else 0} (return_cum max {max(rc):.0f})"
      if rc else max(steps) if steps else 0)
PYEOF
)
    for _ in 1 2 3; do
      git add "$3" && \
      git commit -q -m "$4 rolling harvest: grad step ${step}

No-Verification-Needed: committed-results artifact refresh only" && break
      sleep 7
    done
  fi
}

while true; do
  sleep "$INTERVAL"
  harvest_one runs/dmc_swingup3/metrics.jsonl scripts/harvest_dmc_swingup.sh \
    results/dmc_swingup "Swingup run 3"
  harvest_one runs/dmc_cheetah_run/metrics.jsonl scripts/harvest_dmc_cheetah.sh \
    results/dmc_cheetah_run "Cheetah run"
done
