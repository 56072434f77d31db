"""Sampler-state checkpoint / resume.

The reference's only recovery mechanism is PolyChord's resume files
(passthrough flags, /root/reference/mcalf/cli.py:97-98); its jaxns path has
none (SURVEY.md section 5.3).  Here the nested sampler's carry
(:class:`mcalf_tpu.sampler.nested.NSState`) is an explicit pytree, so
checkpointing is just saving/loading that pytree -- one .npz per fit (or per
shard for sharded fleets).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from mcalf_tpu.sampler.nested import NSState

__all__ = ["save_state", "load_state", "latest_checkpoint"]

_FIELDS = NSState._fields


def save_state(path: str, state: NSState) -> None:
    """Save a sampler state pytree to ``path`` (.npz)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    # np.savez appends .npz to the name it writes.
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_state(path: str) -> NSState:
    """Load a sampler state pytree saved by :func:`save_state`."""
    with np.load(path) as z:
        missing = [f for f in _FIELDS if f not in z]
        if missing:
            raise ValueError(f"checkpoint {path!r} missing fields {missing}")
        return NSState(**{f: z[f] for f in _FIELDS})


def latest_checkpoint(directory: str, prefix: str = "ns_state") -> Optional[str]:
    """Most recent checkpoint file in ``directory`` matching
    ``<prefix>*.npz``, or None."""
    if not os.path.isdir(directory):
        return None
    cands = [
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.startswith(prefix) and f.endswith(".npz")
    ]
    return max(cands, key=os.path.getmtime) if cands else None
