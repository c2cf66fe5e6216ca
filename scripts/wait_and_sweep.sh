#!/bin/bash
# Wait for the TPU tunnel to come back, then resume the results sweep.
cd /root/repo
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "TPU back at $(date)"; break
  fi
  echo "TPU still down at $(date)"; sleep 60
done
exec python scripts/run_results_sweep.py
