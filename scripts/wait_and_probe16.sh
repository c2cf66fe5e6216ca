#!/bin/bash
# Wait for the TPU tunnel, then run probe16 (kernel decisions gate the
# full results-sweep regeneration, which runs after).
cd /root/repo
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "TPU back at $(date)"; break
  fi
  echo "TPU still down at $(date)"; sleep 60
done
exec timeout 3500 python scripts/exp_kernel_probe16.py
