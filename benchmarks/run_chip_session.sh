#!/bin/bash
# One serialized chip session for the round-4 measurements
# (tunnel protocol: ONE process at a time, each under a generous timeout).
#
#   bash benchmarks/run_chip_session.sh [outdir]
#
# Order matters: the lever decision table first (decides fold_pt /
# half_stream / fused_epilogue defaults), then the escalation costs, then
# the closing r3_final table, then the compiled-Mosaic validation the
# judge flagged as builder-attested-only (tpu tests + fuzz), then bench.py
# for the driver JSON line.  After it finishes: flip any winning defaults
# in utils/config.py, re-run r3_final.py + bench.py if defaults changed,
# refresh BASELINE.md / NOTES.md.
set -u
OUT=${1:-/tmp/chip_session}
mkdir -p "$OUT"
OUT=$(cd "$OUT" && pwd)  # absolute: redirects below survive the cd
cd "$(dirname "$0")/.."

probe() {
  # Cheap liveness check between steps: if the tunnel died mid-session,
  # skip the remaining steps quickly instead of burning each step's full
  # 1800 s timeout (bench.py runs last and has its own bounded retry, so
  # a transient blip still gets the driver artifact a second chance).
  timeout 300 python -c "import jax; jax.devices()" > /dev/null 2>&1
}

run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/session.log"
  if ! probe; then
    echo "SKIPPED $name: tunnel probe failed" | tee -a "$OUT/session.log"
    return 1
  fi
  timeout 1800 "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  echo "rc=$rc" | tee -a "$OUT/session.log"
  tail -25 "$OUT/$name.log" | tee -a "$OUT/session.log"
}

run r3b_levers python benchmarks/r3b_levers.py
run diag_repair python benchmarks/diag_repair.py
run r3_final python benchmarks/r3_final.py
run tpu_tests python -m pytest tests/ -q -m tpu --no-header -p no:cacheprovider
run tpu_fuzz python benchmarks/tpu_fuzz.py
run bench python bench.py
echo "chip session done -> $OUT" | tee -a "$OUT/session.log"
