#!/bin/bash
# Persistently retry the scatter-lab measurements through relay flakes.
# Each mode is retried (with a liveness probe between attempts) until a
# result line lands.  Results accumulate in /tmp/scatter_lab_results.txt
cd /root/repo
out=/tmp/scatter_lab_results.txt
echo "persistent watch started $(date)" >> "$out"

probe() {
  # must prove the relay COMPUTES: a wedged relay still answers
  # default_backend() while every dispatch hangs
  timeout 90 python -c "import jax,jax.numpy as jnp,sys;x=jnp.ones((256,256));float((x@x).sum());sys.stdout.write(jax.default_backend())" 2>/dev/null | grep -q tpu
}

run_mode() {
  local mode=$1
  for attempt in 1 2 3 4 5 6 7 8; do
    until probe; do
      echo "probe down before $mode #$attempt $(date)" >> "$out"
      sleep 45
    done
    echo "=== $mode attempt $attempt $(date) ===" >> "$out"
    # per-attempt capture: the accumulated out-file holds stale results
    # (and prefix modes like 'ranksum' match 'ranksum+rsnogather' lines)
    local tmp
    tmp=$(mktemp)
    timeout 580 python tools/scatter_lab.py --mode "$mode" 2>&1 \
      | grep -v Platform > "$tmp"
    cat "$tmp" >> "$out"
    if grep -q "\"op\": \"block\[$mode\]" "$tmp"; then rm -f "$tmp"; return 0; fi
    rm -f "$tmp"
    echo "$mode attempt $attempt failed $(date)" >> "$out"
    sleep 20
  done
}

run_mode ranksum
run_mode rmw
echo "all done $(date)" >> "$out"
