"""warmup_executables contract: after the warmup call, a full
nested_sample fit at the same (model shape, NSConfig) must trigger ZERO
new backend compiles -- the time-to-first-result guarantee bench.py and
long-running services rely on (every executable on the fit path is
resident, including the jitted termination check and finalize)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcalf_tpu.sampler import NSConfig, nested_sample, warmup_executables


def _loglike_batch(u):
    # nontrivial correlated Gaussian so the fit runs many steps
    x = (u - 0.5) * 8.0
    return -0.5 * jnp.sum(x * x, axis=-1) - 0.1 * jnp.sum(
        x[:, :-1] * x[:, 1:], axis=-1
    )


def test_no_compiles_after_warmup():
    compiles = []

    def listener(key, *a, **kw):
        if key == "/jax/core/compile/backend_compile_duration":
            compiles.append(key)

    jax.monitoring.register_event_duration_secs_listener(listener)
    try:
        cfg = NSConfig(ndim=5, nlive=40, max_samples=1500, num_repeats=20)
        warmup_executables(_loglike_batch, jax.random.PRNGKey(7), cfg)
        n_warm = len(compiles)
        assert n_warm > 0  # the warmup itself built the executables
        res = nested_sample(_loglike_batch, jax.random.PRNGKey(3), cfg)
        assert np.isfinite(float(res.logz))
        assert len(compiles) == n_warm, (
            f"fit compiled {len(compiles) - n_warm} new programs after "
            "warmup_executables claimed residency"
        )
    finally:
        jax.monitoring.unregister_event_duration_listener(listener)
