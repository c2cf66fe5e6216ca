from .harness import (
    BenchRecord, roofline_bytes, roofline_seconds, run_benchmark, sweep,
    write_csv, write_json,
)

__all__ = [
    "BenchRecord", "roofline_bytes", "roofline_seconds", "run_benchmark",
    "sweep", "write_csv", "write_json",
]
