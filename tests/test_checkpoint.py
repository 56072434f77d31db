"""Checkpoint / resume: chunked stepping must be bit-identical to one shot,
and a reloaded checkpoint must continue to the same answer."""

import jax
import jax.numpy as jnp
import numpy as np

from mcalf_tpu.sampler import (
    NSConfig,
    finalize,
    init_state,
    is_done,
    nested_sample,
    run_steps,
)
import pytest

from mcalf_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_state,
    prune_checkpoints,
    save_state,
)


def _loglike(sigma=0.05, ndim=2):
    norm = -0.5 * ndim * np.log(2 * np.pi * sigma**2)

    def f(u):
        return (norm - 0.5 * jnp.sum((u - 0.5) ** 2, axis=-1) / sigma**2).astype(
            jnp.float32
        )

    return f


def test_chunked_equals_oneshot():
    ll = _loglike()
    cfg = NSConfig(ndim=2, nlive=100, max_samples=8000).resolved()
    one = nested_sample(ll, jax.random.PRNGKey(0), cfg)

    state = init_state(ll, jax.random.PRNGKey(0), cfg)
    while not is_done(state, cfg):
        state = run_steps(ll, state, cfg, 5)  # 5 outer steps per chunk
    chunked = finalize(ll, state, cfg)

    assert float(one.logz) == float(chunked.logz)
    assert int(one.n_like) == int(chunked.n_like)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    ll = _loglike()
    cfg = NSConfig(ndim=2, nlive=100, max_samples=8000).resolved()

    # Run half-way, checkpoint, reload, finish.
    state = init_state(ll, jax.random.PRNGKey(0), cfg)
    state = run_steps(ll, state, cfg, 10)
    path = str(tmp_path / "ns_state_0010.npz")
    save_state(path, state)
    assert latest_checkpoint(str(tmp_path)) == path

    loaded = load_state(path)
    for a, b in zip(state, loaded):
        assert np.array_equal(np.asarray(a), np.asarray(b)), "state mismatch"

    res_resumed = nested_sample(ll, jax.random.PRNGKey(99), cfg, state=loaded)
    res_straight = nested_sample(ll, jax.random.PRNGKey(0), cfg)
    assert float(res_resumed.logz) == float(res_straight.logz)


def test_fingerprint_mismatch_rejected(tmp_path):
    # Resuming a checkpoint from a different problem/config/seed must raise,
    # not silently continue the wrong run.
    ll = _loglike()
    cfg = NSConfig(ndim=2, nlive=100, max_samples=8000).resolved()
    state = init_state(ll, jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ns_state_0000.npz")
    fp = {"ndim": 2, "nlive": 100, "seed": 0, "data_hash": "abc"}
    save_state(path, state, fingerprint=fp)

    # matching fingerprint loads fine
    load_state(path, fingerprint=fp)
    # any field differing is rejected
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        load_state(path, fingerprint=dict(fp, seed=1))
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        load_state(path, fingerprint=dict(fp, data_hash="def"))
    # a legacy checkpoint without fingerprints is rejected when one is required
    save_state(path, state)
    with pytest.raises(ValueError, match="no fingerprint"):
        load_state(path, fingerprint=fp)
    # ...but loads when no check is requested
    load_state(path)


def test_legacy_checkpoint_missing_dead_rank_backfilled(tmp_path):
    # Checkpoints written before the dead_rank diagnostic field existed must
    # still resume (the field is backfilled with -1 = unrecorded), so
    # in-flight long fits survive upgrades.
    ll = _loglike()
    cfg = NSConfig(ndim=2, nlive=100, max_samples=8000).resolved()
    state = init_state(ll, jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ns_state_0000.npz")
    arrays = {
        f: np.asarray(getattr(state, f))
        for f in state._fields
        if f != "dead_rank"
    }
    np.savez(path, **arrays)
    loaded = load_state(path)
    assert loaded.dead_rank.shape == (8000,)
    assert np.all(loaded.dead_rank == -1)
    # ...but a genuinely essential field missing still raises
    arrays.pop("live_u")
    np.savez(path, **arrays)
    with pytest.raises(ValueError, match="missing fields"):
        load_state(path)


def test_prune_checkpoints(tmp_path):
    ll = _loglike()
    cfg = NSConfig(ndim=2, nlive=100, max_samples=8000).resolved()
    state = init_state(ll, jax.random.PRNGKey(0), cfg)
    import os
    import time

    for i in range(6):
        p = str(tmp_path / f"ns_state_{i:04d}.npz")
        save_state(p, state)
        os.utime(p, (time.time() + i, time.time() + i))
    prune_checkpoints(str(tmp_path), keep=2)
    left = sorted(f for f in os.listdir(tmp_path) if f.endswith(".npz"))
    assert left == ["ns_state_0004.npz", "ns_state_0005.npz"]
