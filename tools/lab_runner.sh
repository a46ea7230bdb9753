#!/bin/bash
# Sequential scatter-lab runs with per-mode budgets that survive slow
# tunnel compiles.  Usage: lab_runner.sh <out-file> <mode> [mode...]
cd /root/repo
out=$1; shift
probe() {
  # must prove the relay COMPUTES: a wedged relay still answers
  # default_backend() while every dispatch hangs
  timeout 90 python -c "import jax,jax.numpy as jnp,sys;x=jnp.ones((256,256));float((x@x).sum());sys.stdout.write(jax.default_backend())" 2>/dev/null | grep -q tpu
}
for mode in "$@"; do
  for attempt in 1 2 3; do
    until probe; do
      echo "probe down before $mode #$attempt $(date)" >> "$out"
      sleep 45
    done
    echo "=== $mode attempt $attempt $(date) ===" >> "$out"
    # capture THIS attempt's output separately: grepping the accumulated
    # out-file matches stale results from earlier runs/prefix modes
    tmp=$(mktemp)
    timeout 1500 python tools/scatter_lab.py --mode "$mode" 2>&1 \
      | grep -v Platform > "$tmp"
    cat "$tmp" >> "$out"
    # success = a timing line from THIS attempt (block modes emit one
    # block[<mode>] line at the end; probe modes emit their own op lines)
    if grep -q '"ms"' "$tmp"; then rm -f "$tmp"; break; fi
    rm -f "$tmp"
    echo "$mode attempt $attempt no result $(date)" >> "$out"
    sleep 20
  done
done
echo "lab_runner done $(date)" >> "$out"
