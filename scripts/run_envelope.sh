#!/bin/bash
# Multi-resolution speed envelope: the reference publishes speed at
# 5 resolutions x 5 GPUs (README.md "Measure compression speed",
# d3x3.cu:7-25 hint tables); this produces the repo's counterpart on
# the one attached TPU chip.  Writes one JSON line per (variant, res)
# to the log; scripts/collect_envelope.py assembles the artifact.
set -u
cd /root/repo
LOG=${1:-/tmp/bench_env.log}
: > "$LOG"
for RES in 1080p 2160p 720p 480p 240p; do
  echo "=== RES $RES ===" >> "$LOG"
  for V in dmci htl hts; do
    timeout 2400 python scripts/bench_variants.py "$V" --res "$RES" >> "$LOG" 2>&1
    echo "--- done $V $RES rc=$? ---" >> "$LOG"
  done
done
echo "=== ENVELOPE COMPLETE ===" >> "$LOG"
