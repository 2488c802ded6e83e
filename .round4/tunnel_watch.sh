#!/bin/bash
# Poll the axon TPU tunnel; write a flag file the moment it answers.
cd /root/repo
while true; do
  if timeout 240 python -c "import jax; d=jax.devices(); assert d and d[0].platform=='tpu'" 2>/dev/null; then
    date -u +%FT%TZ > /root/repo/.round4/TUNNEL_UP
    exit 0
  fi
  date -u +%FT%TZ >> /root/repo/.round4/tunnel_attempts.log
  sleep 120
done
