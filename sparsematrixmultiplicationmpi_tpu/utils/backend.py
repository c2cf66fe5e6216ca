"""Backend introspection shared by the kernel dispatchers.

Every Pallas entry point auto-selects interpret mode on CPU backends
(tests / dryrun) and the compiled kernel on accelerators; this is the
one place that probe lives (it was copy-pasted across five dispatch
sites before round 3's cleanup).
"""

from __future__ import annotations

import jax

__all__ = ["on_cpu_backend"]


def on_cpu_backend() -> bool:
    """True when JAX's default backend is CPU (or unavailable — e.g. a
    dead accelerator plugin — in which case CPU semantics are the safe
    assumption for interpret-mode dispatch)."""
    try:
        return jax.devices()[0].platform == "cpu"
    except Exception:
        return True
