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
from typing import Dict, Optional, Union

import numpy as np

from mcalf_tpu.sampler.nested import NSState

__all__ = [
    "save_state",
    "load_state",
    "latest_checkpoint",
    "prune_checkpoints",
    "problem_fingerprint",
]

_FIELDS = NSState._fields
_FP_PREFIX = "_fp_"

Fingerprint = Dict[str, Union[int, float, str]]


def problem_fingerprint(model, cfg, seed: int) -> Fingerprint:
    """Fingerprint identifying (problem, sampler config, seed) so a resumed
    checkpoint provably belongs to the current run.  Hashes the spectrum
    data and prior bounds; records the sampler shape parameters."""
    import hashlib

    h = hashlib.sha256()
    for arr in (model.wave, model.flux, model.noise, model.bounds):
        h.update(np.ascontiguousarray(np.asarray(arr, np.float64)).tobytes())
    r = cfg.resolved() if hasattr(cfg, "resolved") else cfg
    return {
        "ndim": int(r.ndim),
        "nlive": int(r.nlive),
        "num_delete": int(r.num_delete),
        "num_repeats": int(r.num_repeats),
        "max_samples": int(r.max_samples),
        "seed": int(seed),
        "data_hash": h.hexdigest(),
    }


def save_state(
    path: str, state: NSState, fingerprint: Optional[Fingerprint] = None
) -> None:
    """Save a sampler state pytree (plus an optional run fingerprint) to
    ``path`` (.npz)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    for k, v in (fingerprint or {}).items():
        arrays[_FP_PREFIX + k] = np.asarray(v)
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    # np.savez appends .npz to the name it writes.
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_state(
    path: str, fingerprint: Optional[Fingerprint] = None
) -> NSState:
    """Load a sampler state pytree saved by :func:`save_state`.

    When ``fingerprint`` is given, the checkpoint must carry a matching
    fingerprint: resuming a checkpoint from a different problem, sampler
    config, or seed silently produces wrong posteriors whenever the array
    shapes happen to coincide, so a mismatch raises instead."""
    with np.load(path) as z:
        missing = [f for f in _FIELDS if f not in z]
        # Fields added after a checkpoint was written are backfilled with
        # their init_state() defaults (so in-flight long fits survive
        # upgrades): dead_rank is purely diagnostic (-1 = unrecorded).
        backfillable = {"dead_rank", "live_cluster"}
        hard_missing = [f for f in missing if f not in backfillable]
        if hard_missing:
            raise ValueError(
                f"checkpoint {path!r} missing fields {hard_missing}"
            )
        if fingerprint is not None:
            for k, v in fingerprint.items():
                key = _FP_PREFIX + k
                if key not in z:
                    raise ValueError(
                        f"checkpoint {path!r} has no fingerprint field {k!r}; "
                        "refusing to resume (pass fingerprint=None to force)"
                    )
                have = z[key].item()
                if str(have) != str(v):
                    raise ValueError(
                        f"checkpoint {path!r} fingerprint mismatch on {k!r}: "
                        f"checkpoint has {have!r}, current run has {v!r}"
                    )
        fields = {f: z[f] for f in _FIELDS if f in z}
        if "dead_rank" not in fields:
            cap = int(fields["dead_logl"].shape[0])
            fields["dead_rank"] = np.full((cap,), -1, np.int32)
        if "live_cluster" not in fields:
            nlive = int(fields["live_logl"].shape[0])
            fields["live_cluster"] = np.zeros((nlive,), np.int32)
        return NSState(**fields)


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


def prune_checkpoints(
    directory: str, keep: int = 3, prefix: str = "ns_state"
) -> None:
    """Delete all but the ``keep`` most recent checkpoints in ``directory``
    (long fits otherwise accumulate one file per chunk, unbounded)."""
    if not os.path.isdir(directory):
        return
    cands = sorted(
        (
            os.path.join(directory, f)
            for f in os.listdir(directory)
            if f.startswith(prefix) and f.endswith(".npz")
        ),
        key=os.path.getmtime,
    )
    for p in cands[: max(0, len(cands) - keep)]:
        try:
            os.remove(p)
        except OSError:
            pass
