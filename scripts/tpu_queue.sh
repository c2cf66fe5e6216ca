#!/bin/bash
# TPU job queue: waits for the tunneled chip to answer, then runs the
# round's hardware jobs in priority order, logging each to /tmp.
# The wait_and_*.sh pattern from round 2, promoted into a checked-in
# script (VERDICT r2 next-step #4): a flapping tunnel can no longer
# strand measurement work.
#
# Usage: nohup bash scripts/tpu_queue.sh [job ...] > /tmp/tpu_queue.log 2>&1 &
#   default jobs: probe16 constants spillgather sweep bench
set -u
cd "$(dirname "$0")/.."

# scripts/*.py import the package from the repo root; `python scripts/x.py`
# puts scripts/ (not the root) on sys.path, so the root must be on
# PYTHONPATH — and /root/.axon_site must stay on it or the axon backend
# breaks (CLAUDE.md environment rules).
export PYTHONPATH="$(pwd):/root/.axon_site"

JOBS=${@:-"probe17 constants meshcheck spillgather sweep bench"}

probe_tunnel() {
  timeout 180 python -c \
    "import jax; d=jax.devices(); import jax.numpy as jnp; \
     x=jnp.ones((256,256)); s=float((x@x).sum()); \
     print('UP', d[0].platform)" 2>/dev/null | grep -q UP
}

echo "$(date) waiting for tunnel..."
until probe_tunnel; do
  echo "$(date) tunnel down, retrying in 60s"
  sleep 60
done
echo "$(date) tunnel UP — starting jobs: $JOBS"

run_job() {
  local name=$1; shift
  echo "$(date) >>> $name: $*"
  timeout "$JOB_TIMEOUT" "$@" > "/tmp/tpu_${name}.log" 2>&1
  local rc=$?
  echo "$(date) <<< $name rc=$rc (log /tmp/tpu_${name}.log)"
  if [ $rc -ne 0 ]; then
    # Tunnel may have flapped mid-job; wait for it before the next one.
    until probe_tunnel; do
      echo "$(date) tunnel down after $name, retrying in 60s"
      sleep 60
    done
  fi
  return $rc
}

for job in $JOBS; do
  case $job in
    meshcheck)
      JOB_TIMEOUT=1800 run_job meshcheck python scripts/tpu_windowed_mesh_check.py ;;
    probe16)
      echo "probe16 superseded by probe17 (kernel replaced)" ;;
    probe17)
      JOB_TIMEOUT=3600 run_job probe17 python scripts/exp_kernel_probe17.py
      if [ $? -eq 0 ]; then
        python scripts/fit_probe17.py > /tmp/tpu_probe17_fit.log 2>&1 \
          && echo "$(date) probe17 fit written to results/probe17_fit.json"
      fi ;;
    probe18)
      JOB_TIMEOUT=3600 run_job probe18 python scripts/exp_kernel_probe18.py ;;
    sweepfix)
      python scripts/requeue_mismatches.py
      JOB_TIMEOUT=7200 run_job sweepfix python scripts/run_results_sweep.py ;;
    constants)
      JOB_TIMEOUT=2400 run_job constants python scripts/check_cost_constants.py ;;
    spillgather)
      JOB_TIMEOUT=3000 run_job spillgather python scripts/exp_spill_gather.py ;;
    kpad)
      JOB_TIMEOUT=2400 run_job kpad python scripts/exp_kpad_windowed.py ;;
    sweep)
      JOB_TIMEOUT=7200 run_job sweep python scripts/run_results_sweep.py ;;
    models)
      JOB_TIMEOUT=3600 run_job models python scripts/run_models_bench.py ;;
    kernels)
      JOB_TIMEOUT=3600 run_job kernels python scripts/test_tpu_kernels.py ;;
    bench)
      JOB_TIMEOUT=1800 run_job bench python bench.py ;;
    *)
      echo "unknown job $job" ;;
  esac
done
echo "$(date) queue complete"
