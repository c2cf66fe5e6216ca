"""Sweep failure handling and kill-and-resume semantics."""

import csv

import pytest

from sparsematrixmultiplicationmpi_tpu.bench.harness import sweep
from sparsematrixmultiplicationmpi_tpu.io.generate import random_csr
from sparsematrixmultiplicationmpi_tpu.parallel.strategies import (
    STRATEGIES, Strategy,
)


class _Exploding(Strategy):
    name = "exploding"

    def prepare(self, csr, mesh):
        return None

    def spmm(self, operand, v, mesh, *, gather_result=True):
        raise RuntimeError("boom")


def test_failed_job_recorded_not_fatal(tmp_path):
    STRATEGIES["exploding"] = _Exploding
    try:
        mats = {"m": random_csr(30, 30, 150, seed=171)}
        records = sweep(mats, ks=[2], strategy_names=["row", "exploding"],
                        device_counts=[1], warmup=1, iters=1)
        assert len(records) == 2
        ok = {r.strategy: r for r in records}
        assert ok["row_wise"].correct is True
        assert ok["exploding"].correct is False
        assert ok["exploding"].gflops == 0.0
        # The failure is diagnosable from the record alone (round 2's one
        # real failure left no error string anywhere — VERDICT Missing #3).
        assert "RuntimeError" in ok["exploding"].error
        assert "boom" in ok["exploding"].error
    finally:
        del STRATEGIES["exploding"]


class _BadCtor(Strategy):
    name = "bad_ctor"

    def __init__(self):
        raise ValueError("ctor boom")

    def prepare(self, csr, mesh):  # pragma: no cover — never reached
        return None

    def spmm(self, operand, v, mesh, *, gather_result=True):
        raise NotImplementedError  # pragma: no cover


def test_strategy_construction_failure_recorded(tmp_path):
    """Round 2's fem_banded/k=12/auto failure escaped the per-job guard
    (it raised before run_benchmark) and silently dropped the row plus
    every job after it. Construction failures must now be recorded rows
    and the sweep must continue."""
    STRATEGIES["bad_ctor"] = _BadCtor
    try:
        path = str(tmp_path / "ckpt.csv")
        mats = {"m": random_csr(30, 30, 150, seed=174)}
        records = sweep(mats, ks=[2], strategy_names=["bad_ctor", "row"],
                        device_counts=[1], warmup=1, iters=1,
                        checkpoint_csv=path)
        assert [r.strategy for r in records] == ["bad_ctor", "row_wise"]
        assert records[0].correct is False
        assert "ctor boom" in records[0].error
        with open(path) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2 and "ctor boom" in rows[0]["error"]
    finally:
        del STRATEGIES["bad_ctor"]


def test_on_error_raise(tmp_path):
    STRATEGIES["exploding"] = _Exploding
    try:
        mats = {"m": random_csr(30, 30, 150, seed=172)}
        with pytest.raises(RuntimeError):
            sweep(mats, ks=[2], strategy_names=["exploding"],
                  device_counts=[1], warmup=1, iters=1, on_error="raise")
    finally:
        del STRATEGIES["exploding"]


def test_checkpoint_and_resume(tmp_path):
    path = str(tmp_path / "ckpt.csv")
    mats = {"m": random_csr(30, 30, 150, seed=173)}

    first = sweep(mats, ks=[2], strategy_names=["row"], device_counts=[1],
                  warmup=1, iters=1, checkpoint_csv=path)
    assert len(first) == 1
    with open(path) as f:
        assert len(list(csv.DictReader(f))) == 1

    # Resume with a widened sweep: the finished job is skipped, new jobs
    # append to the same CSV.
    second = sweep(mats, ks=[2], strategy_names=["row", "nnz"],
                   device_counts=[1], warmup=1, iters=1,
                   resume_from=path, checkpoint_csv=path)
    assert [r.strategy for r in second] == ["nnz"]
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert {r["strategy"] for r in rows} == {"row_wise", "nnz"}


def test_cli_sweep_resume(tmp_path, capsys):
    from sparsematrixmultiplicationmpi_tpu.cli import main as cli_main

    csv_path = str(tmp_path / "s.csv")
    rc = cli_main(["sweep", "synthetic:cage4", "--k", "1",
                   "--devices", "1", "--strategy", "row",
                   "--iters", "1", "--csv", csv_path])
    assert rc == 0
    with open(csv_path) as f:
        n_before = len(f.readlines())
    # Resume with an extra strategy: only the new job runs and appends.
    rc = cli_main(["sweep", "synthetic:cage4", "--k", "1",
                   "--devices", "1", "--strategy", "row", "nnz",
                   "--iters", "1", "--csv", csv_path, "--resume"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "nnz" in out
    with open(csv_path) as f:
        rows = f.readlines()
    assert len(rows) == n_before + 1


def test_sweep_watchdog_kills_hung_job(tmp_path):
    """A deliberately-hung job must be recorded as failed within the
    per-job timeout while the sweep continues — the in-process analog of
    the reference's 240 s qdel (batch_test.sh:88-92)."""
    import time

    from sparsematrixmultiplicationmpi_tpu.bench.harness import sweep
    from sparsematrixmultiplicationmpi_tpu.io.generate import random_csr
    from sparsematrixmultiplicationmpi_tpu.parallel.strategies import (
        STRATEGIES, RowWise,
    )

    class Hung(RowWise):
        name = "hung"

        def prepare(self, csr, mesh):
            time.sleep(60)
            return super().prepare(csr, mesh)

    STRATEGIES["hung"] = Hung
    try:
        mats = {"a": random_csr(30, 30, 120, seed=7)}
        t0 = time.time()
        records = sweep(mats, ks=[1], strategy_names=["hung", "row"],
                        device_counts=[1], warmup=1, iters=1,
                        job_timeout=2.0)
        elapsed = time.time() - t0
    finally:
        del STRATEGIES["hung"]
    assert elapsed < 30
    assert [r.strategy for r in records] == ["hung", "row_wise"]
    hung, ok = records
    assert hung.correct is False
    assert hung.execution_time != hung.execution_time  # NaN
    assert ok.correct is True


def test_sibling_sweep_keeps_other_tiers_failures(tmp_path):
    """The checkpoint rewrite on resume drops failed rows ONLY for jobs
    this sweep retries: a sibling sweep sharing the checkpoint (the
    results script's bf16 tier after the f32 tier) must not erase the
    other tier's failure records — otherwise failures become invisible
    in the final CSV/JSON/REPORT, the exact round-2 class again."""
    STRATEGIES["exploding"] = _Exploding
    try:
        path = str(tmp_path / "ckpt.csv")
        mats = {"m": random_csr(30, 30, 150, seed=175)}
        sweep(mats, ks=[2], strategy_names=["exploding"],
              device_counts=[1], warmup=1, iters=1, checkpoint_csv=path)
        # Sibling sweep: different matrix name, same shared checkpoint.
        mats2 = {"m2": random_csr(30, 30, 150, seed=176)}
        sweep(mats2, ks=[2], strategy_names=["row"], device_counts=[1],
              warmup=1, iters=1, resume_from=path, checkpoint_csv=path)
        with open(path) as f:
            rows = list(csv.DictReader(f))
        by_mat = {r["matrix"]: r for r in rows}
        assert "boom" in by_mat["m"]["error"]  # failure survived
        assert by_mat["m2"]["strategy"] == "row_wise"

        # A sweep that DOES cover the failed job drops the stale failed
        # row and records the retry exactly once (no duplicate keys).
        sweep(mats, ks=[2], strategy_names=["exploding"],
              device_counts=[1], warmup=1, iters=1,
              resume_from=path, checkpoint_csv=path)
        with open(path) as f:
            rows = list(csv.DictReader(f))
        m_rows = [r for r in rows if r["matrix"] == "m"]
        assert len(m_rows) == 1 and "boom" in m_rows[0]["error"]
    finally:
        del STRATEGIES["exploding"]


class _ExplodingAliased(_Exploding):
    name = "exploding_canonical"


def test_failed_row_uses_canonical_strategy_name(tmp_path):
    """Failed rows must carry the same canonical strategy name as
    successful ones ('row_wise', not the sweep alias 'row') so one
    strategy never splits into two labels in the artifacts."""
    STRATEGIES["expl_alias"] = _ExplodingAliased
    try:
        mats = {"m": random_csr(30, 30, 150, seed=177)}
        records = sweep(mats, ks=[2], strategy_names=["expl_alias"],
                        device_counts=[1], warmup=1, iters=1)
        assert records[0].strategy == "exploding_canonical"
        assert "boom" in records[0].error
    finally:
        del STRATEGIES["expl_alias"]


def test_backend_ok_gates_the_dead_backend_guard(tmp_path):
    """A failure streak with a HEALTHY backend (backend_ok() True) must
    keep sweeping — N consecutive failures alone cannot distinguish an
    outage from one persistently failing matrix, and aborting on the
    latter livelocks resume on the same rows forever."""
    STRATEGIES["exploding"] = _Exploding
    try:
        mats = {"m": random_csr(30, 30, 150, seed=178)}
        records = sweep(mats, ks=[1, 2, 3], strategy_names=["exploding"],
                        device_counts=[1], warmup=1, iters=1,
                        max_consecutive_failures=2,
                        backend_ok=lambda: True)
        assert len(records) == 3  # survived past the threshold
        assert all(r.error for r in records)

        # Dead backend (probe fails): abort at the threshold as before.
        with pytest.raises(RuntimeError, match="consecutive"):
            sweep(mats, ks=[1, 2, 3], strategy_names=["exploding"],
                  device_counts=[1], warmup=1, iters=1,
                  max_consecutive_failures=2,
                  backend_ok=lambda: False)
    finally:
        del STRATEGIES["exploding"]


def test_max_consecutive_failures_aborts_early(tmp_path):
    """The dead-backend guard: once N jobs fail back-to-back the sweep
    raises instead of burning the watchdog budget on every remaining job
    (round 2's tunnel outage class). Checkpointed rows survive; a
    successful job resets the counter."""
    STRATEGIES["exploding"] = _Exploding
    try:
        mats = {"m": random_csr(30, 30, 150, seed=171)}
        ckpt = str(tmp_path / "ck.csv")
        with pytest.raises(RuntimeError, match="consecutive"):
            sweep(mats, ks=[1, 2, 3], strategy_names=["exploding"],
                  device_counts=[1], warmup=1, iters=1,
                  checkpoint_csv=ckpt, max_consecutive_failures=2)
        with open(ckpt) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2  # aborted at the second failure
        assert all(r["error"] for r in rows)

        # Interleaved successes keep the sweep alive: ks x [row,
        # exploding] alternates ok/fail, so the threshold is never hit.
        records = sweep(mats, ks=[1, 2, 3],
                        strategy_names=["row", "exploding"],
                        device_counts=[1], warmup=1, iters=1,
                        max_consecutive_failures=2)
        assert len(records) == 6
    finally:
        del STRATEGIES["exploding"]
