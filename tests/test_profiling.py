"""Profiling/tracing hooks (utils/profiling.py -- the SURVEY section 5.1
subsystem the reference lacks): phase-timer registry semantics and the
jax.profiler trace round-trip producing TensorBoard-consumable artifacts."""

import os
import time

import jax
import jax.numpy as jnp

from mcalf_tpu.utils.profiling import (
    get_timings,
    phase_timer,
    reset_timings,
    trace,
)


def test_phase_timer_registry():
    reset_timings()
    with phase_timer("outer"):
        time.sleep(0.01)
        with phase_timer("inner"):
            time.sleep(0.01)
    with phase_timer("inner"):
        pass
    t = get_timings()
    assert set(t) == {"outer", "inner"}
    assert len(t["inner"]) == 2
    assert t["outer"][0] >= t["inner"][0] >= 0.01
    # exception-safe: the duration is recorded even when the block raises
    try:
        with phase_timer("boom"):
            raise RuntimeError
    except RuntimeError:
        pass
    assert len(get_timings()["boom"]) == 1
    reset_timings()
    assert get_timings() == {}


def test_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv("MCALF_TPU_TRACE_DIR", raising=False)
    with trace():  # must not require a profiler session
        jnp.square(jnp.arange(4.0)).block_until_ready()


def test_trace_writes_tensorboard_artifacts(tmp_path, monkeypatch):
    td = str(tmp_path / "traces")
    monkeypatch.setenv("MCALF_TPU_TRACE_DIR", td)
    with trace():
        jax.jit(lambda x: jnp.sum(x * x))(jnp.arange(64.0)).block_until_ready()
    found = []
    for root, _dirs, files in os.walk(td):
        found.extend(files)
    # jax.profiler.trace writes a plugins/profile/<ts>/ dir with .xplane.pb
    # (and friends) -- the TensorBoard profile plugin's input
    assert any(f.endswith((".xplane.pb", ".trace.json.gz")) for f in found), (
        found
    )
