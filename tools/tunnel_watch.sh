#!/bin/bash
# Poll the axon TPU tunnel; the moment a backend-init probe succeeds,
# fire the round-4 hardware campaign (tools/campaign_r4.sh) exactly once.
# Runs forever until the campaign has fired (tmux-resident).
#
# Usage: bash tools/tunnel_watch.sh [logdir]
set -u
LOG=${1:-/tmp/campaign_r4}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

n=0
while true; do
  n=$((n + 1))
  echo "[tunnel_watch] probe #$n $(date -u +%H:%M:%S)"
  if timeout 240 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; print(jax.devices())" \
      > "$LOG/probe.out" 2>&1; then
    echo "[tunnel_watch] TUNNEL UP: $(cat "$LOG/probe.out")"
    bash tools/campaign_r4.sh "$LOG" 2>&1 | tee "$LOG/campaign.log"
    echo "[tunnel_watch] campaign complete"
    exit 0
  fi
  echo "[tunnel_watch] down ($(tail -c 200 "$LOG/probe.out" | tr '\n' ' '))"
  sleep 240
done
