"""Format persistence — save/load prepared sparse formats.

The reference has no checkpoint story (SURVEY.md §5: batch results persist
only as PBS stdout). Here any container — including expensive-to-build
``BandedBlocks``/``BucketedELL`` layouts — round-trips through a single
``.npz`` file, so a production service converts once and loads the
compute-ready layout at startup.
"""

from __future__ import annotations

import json

import numpy as np

from .banded import BandedBlocks
from .matrix import BucketedELL, COO, CSR, ELL

__all__ = ["save_format", "load_format"]

_CLASSES = {c.__name__: c for c in (CSR, COO, ELL, BucketedELL, BandedBlocks)}


def _static_of(obj):
    import dataclasses

    out = {}
    for f in dataclasses.fields(obj):
        if f.metadata.get("static"):
            v = getattr(obj, f.name)
            out[f.name] = list(v) if isinstance(v, tuple) else v
    return out


def save_format(path: str, obj) -> None:
    """Serialize any framework container to ``.npz``."""
    import jax

    if type(obj).__name__ not in _CLASSES:
        raise TypeError(f"unsupported container: {type(obj)}")
    leaves, treedef = jax.tree_util.tree_flatten(obj)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = {
        "class": type(obj).__name__,
        "treedef": _treedef_spec(obj),
        "n_leaves": len(leaves),
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def _treedef_spec(obj):
    """Recursive static-structure spec (class + static fields + children)."""
    import dataclasses

    if type(obj).__name__ in _CLASSES:
        spec = {"class": type(obj).__name__, "static": _static_of(obj),
                "children": {}}
        for f in dataclasses.fields(obj):
            if f.metadata.get("static"):
                continue
            v = getattr(obj, f.name)
            if type(v).__name__ in _CLASSES:
                spec["children"][f.name] = _treedef_spec(v)
            elif isinstance(v, tuple):
                spec["children"][f.name] = [
                    _treedef_spec(x) if type(x).__name__ in _CLASSES else None
                    for x in v
                ]
            elif v is None:
                spec["children"][f.name] = {"class": "NoneType"}
        return spec
    return None


def _rebuild(spec, leaf_iter):
    import dataclasses

    cls = _CLASSES[spec["class"]]
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.metadata.get("static"):
            v = spec["static"][f.name]
            kwargs[f.name] = tuple(v) if isinstance(v, list) else v
            continue
        child = spec["children"].get(f.name)
        if child is None:
            kwargs[f.name] = next(leaf_iter)
        elif isinstance(child, list):
            kwargs[f.name] = tuple(
                _rebuild(c, leaf_iter) if c else next(leaf_iter)
                for c in child
            )
        elif child.get("class") == "NoneType":
            kwargs[f.name] = None
        else:
            kwargs[f.name] = _rebuild(child, leaf_iter)
    return cls(**kwargs)


def load_format(path: str):
    """Load a container saved by ``save_format``."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        leaves = [data[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    return _rebuild(meta["treedef"], iter(leaves))
