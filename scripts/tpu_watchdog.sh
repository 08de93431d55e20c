#!/bin/bash
# The tunneled TPU backend wedged mid-session (every compile/execute RPC
# blocks in tcp recv; jax.devices() still answers).  Poll with a tiny jit
# probe and launch the regen queue the moment the path recovers.
cd /root/repo
LOG=logs_bg/watchdog.log
echo "=== watchdog start $(date -u +%H:%M:%S)" >> $LOG
for i in $(seq 1 200); do
  if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
print(float(jax.jit(lambda a:(a@a).sum())(x)))" >> $LOG 2>&1; then
    echo "=== TPU recovered at $(date -u +%H:%M:%S) (attempt $i); launching queue" >> $LOG
    bash scripts/regen_r2c2.sh >> logs_bg/regen_r2c2_driver.log 2>&1
    echo "=== queue exited $(date -u +%H:%M:%S)" >> $LOG
    exit 0
  fi
  echo "--- attempt $i failed $(date -u +%H:%M:%S)" >> $LOG
  sleep 20
done
echo "=== watchdog gave up $(date -u +%H:%M:%S)" >> $LOG
