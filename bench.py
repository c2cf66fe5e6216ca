#!/usr/bin/env python
"""Headline benchmark: SpMM throughput on a cop20k_A-stats matrix, k=32.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Gnnz/s", "vs_baseline": N, ...}

Baseline: the reference's best measured SpMM throughput on cop20k_A
(row-wise, k=12, 60 cores: 2,624,331 nnz / 0.1023 s = 0.02565 Gnnz/s,
from ``results/cop20k_A.csv`` — see BASELINE.md). The reference never ran
k=32; its per-nnz throughput *falls* with k (0.105 s @ k=1 -> 0.102 s @
k=12 best), so comparing our k=32 rate against its best-any-k rate is
conservative in the reference's favor.

Runs on whatever backend JAX selects (the real TPU chip under axon;
CPU otherwise). No SuiteSparse download is possible here (zero egress), so
the matrix is a synthetic twin with cop20k_A's dims/nnz/symmetry
(``io/generate.py::cop20k_like``).
"""

import json
import os
import subprocess
import sys
import time

REFERENCE_GNNZ_PER_S = 2_624_331 / 0.1023 / 1e9  # best row-wise, k=12, 60 cores

_PROBE = ("import jax; d = jax.devices(); "
          "print('PLATFORM:' + d[0].platform)")


def wait_for_backend(max_wait_s: float = 1500.0,
                     probe_timeout_s: float = 180.0) -> bool:
    """Retry until the accelerator backend answers (the tunnel flaps:
    round 2's driver bench recorded rc=1 on a transient backend outage —
    VERDICT r2 Missing #1). Probes in a SUBPROCESS because a dead tunnel
    makes ``jax.devices()`` hang, not raise. Returns True when an
    accelerator is up; False -> caller falls back to CPU (honest record,
    ``device_kind`` says so)."""
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _PROBE],
                capture_output=True, text=True, timeout=probe_timeout_s,
            )
            out = proc.stdout.strip()
            if proc.returncode == 0 and "PLATFORM:" in out:
                platform = out.rsplit("PLATFORM:", 1)[1]
                if platform != "cpu":
                    print(f"# backend up ({platform}) after {attempt} "
                          "probe(s)", file=sys.stderr)
                    return True
                return False  # env pinned to CPU on purpose
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print(f"# backend still down after {attempt} probes / "
                  f"{max_wait_s:.0f}s — falling back to CPU",
                  file=sys.stderr)
            return False
        time.sleep(30)


def _reexec_cpu() -> "int":
    """Re-exec this script with the axon site dir stripped from
    PYTHONPATH. Setting ``JAX_PLATFORMS=cpu`` in-process is NOT enough:
    the axon sitecustomize registers the PJRT plugin at interpreter
    start, and with the tunnel down its initialization hangs ``import
    jax`` regardless of platform env vars (verified live during the
    2026-08-18 outage: the pre-fix fallback hung >14 min at 0.7 % CPU)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ) or os.path.dirname(os.path.abspath(__file__))
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["BENCH_CPU_FALLBACK"] = "1"  # skip the wait in the child
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                          env=env)
    return proc.returncode


def main() -> int:
    if not os.environ.get("BENCH_CPU_FALLBACK") and not wait_for_backend(
            max_wait_s=float(os.environ.get("BENCH_MAX_WAIT_S", "1500"))):
        return _reexec_cpu()

    import jax
    import jax.numpy as jnp

    from sparsematrixmultiplicationmpi_tpu.bench.harness import run_benchmark
    from sparsematrixmultiplicationmpi_tpu.io.generate import cop20k_like
    from sparsematrixmultiplicationmpi_tpu.parallel import Auto, make_mesh

    k = 32
    csr = cop20k_like(dtype="float32")
    mesh = make_mesh()  # all available chips (1 under the test harness)
    # Amortized steady-state timing: `inner` chained, data-dependent SpMMs
    # inside one compiled program — the per-iteration cost a solver/GNN
    # pipeline sees, with per-dispatch runtime latency (~25 ms through the
    # development tunnel) canceled by two-point calibration.
    # inner=20/iters=5: the two-point slope at inner=10/iters=3 once
    # returned a 2x-fast fluke (0.78 ms vs the stable ~1.45 ms kernel
    # plateau, round-5 session log) — longer chains and more endpoint
    # samples keep tunnel dispatch noise out of the slope.
    rec = run_benchmark(
        csr, k, Auto(), mesh, matrix_name="cop20k_like",
        warmup=2, iters=5, check=True, dtype=jnp.float32,
        amortized=True, inner=20,
    )
    result = {
        "metric": "spmm_gnnz_per_s_cop20k_k32",
        "value": round(rec.gnnz_per_s, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(rec.gnnz_per_s / REFERENCE_GNNZ_PER_S, 2),
        "execution_time_s": round(rec.execution_time, 6),
        "gflops": round(rec.gflops, 2),
        "roofline_fraction": round(rec.roofline_fraction or 0.0, 4),
        "correct": rec.correct,
        "devices": rec.devices,
        "device_kind": rec.device_kind,
        "nnz": rec.nnz,
        "k": rec.k,
        "dtype": rec.dtype,
    }
    print(json.dumps(result))
    # Also persist to results/ so the headline is a committed artifact,
    # not just driver stdout (VERDICT r2 Missing #1). stdout stays
    # exactly one JSON line (driver contract).
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "bench_headline.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=2)
    except OSError as e:
        print(f"# could not write results/bench_headline.json: {e}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
