"""Compiled-HLO collective inspection.

The reference's communication story is auditable only by reading its MPI
call sites (``RowWise.cpp:85-87`` Gatherv, ``NonZeroElement.cpp:88``
Reduce). Here the collectives are inserted by XLA from sharding
annotations, so the audit tool inspects the *compiled* HLO: which
collective ops were actually emitted and how many bytes each moves. Used
by tests to pin the communication structure of every strategy (e.g.
``BandedRowWise`` must lower to neighbor ``collective-permute``s, never a
hidden all-gather) and by the scaling sweep to record per-strategy
communication volumes (the ``results_debug.csv`` comm-column analog,
derived from the program instead of wall clocks).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax
import numpy as np

__all__ = ["compiled_hlo", "collective_stats", "COLLECTIVE_OPS"]

COLLECTIVE_OPS = (
    "all-gather",
    "all-reduce",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

_SHAPE_RE = re.compile(r"\b([a-z]+\d+)\[([\d,]*)\]")


def compiled_hlo(fn, *args, **kwargs) -> str:
    """Compiled (post-SPMD-partitioning) HLO text of ``fn(*args)``."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    return lowered.compile().as_text()


def _shape_bytes(dtype_str: str, dims_str: str) -> int:
    try:
        itemsize = np.dtype(
            {"bf16": np.float32, "f32": np.float32, "f64": np.float64,
             "f16": np.float16, "s32": np.int32, "u32": np.uint32,
             "s64": np.int64, "u64": np.uint64, "s8": np.int8,
             "u8": np.uint8, "pred": np.bool_}.get(dtype_str, np.float32)
        ).itemsize
        if dtype_str in ("bf16", "f16"):
            itemsize = 2
    except TypeError:
        itemsize = 4
    n = 1
    if dims_str:
        for d in dims_str.split(","):
            n *= int(d)
    return n * itemsize


def collective_stats(hlo_text: str) -> Dict[str, Tuple[int, int]]:
    """Per-collective (count, output_bytes) aggregated over the module.

    Bytes are the op's per-shard output size — the payload each device
    materializes from the collective, a program-derived lower bound on
    link traffic (ring algorithms move (p-1)/p of it per hop).
    """
    stats: Dict[str, Tuple[int, int]] = {}
    for line in hlo_text.splitlines():
        stripped = line.strip()
        # Match op lines: "%name = TYPE[dims]{layout} op-name(...)" —
        # TYPE may be a tuple "(f32[8,4], f32[8])" when XLA's
        # collective-combiner merged several collectives into one
        # variadic op, so the shape scan must cover everything between
        # '=' and the op token, not stop at the first '(' (ADVICE r2).
        for op in COLLECTIVE_OPS:
            m = re.search(rf"\b{op}[.\d]*\(", stripped)
            if m and "=" in stripped:
                lhs = stripped.split("=", 1)[1]
                op_at = lhs.find(m.group(0))
                head = lhs[:op_at] if op_at >= 0 else lhs.split("(", 1)[0]
                nbytes = sum(
                    _shape_bytes(d, s) for d, s in _SHAPE_RE.findall(head)
                )
                cnt, total = stats.get(op, (0, 0))
                stats[op] = (cnt + 1, total + nbytes)
                break
    return stats
