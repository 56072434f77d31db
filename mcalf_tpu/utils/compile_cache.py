"""Persistent XLA-executable cache.

The flagship fit's wall-clock is roughly half one-time XLA compilation
(~46 s of ~92 s on the TPU v5e relay, BENCH_r04): the sampler compiles a
single chunk-agnostic executable per (model shape, NSConfig) and then
reuses it for every chunk and every seed.  Across *processes* that
executable is recompiled from scratch unless JAX's persistent
compilation cache is enabled -- which serializes the compiled TPU
executable to disk keyed on the HLO + jaxlib version + backend, so a
repeat fit (a resumed run, a re-plot, a parameter scan over seeds, CI)
skips straight to execution.

This is plumbing around ``jax.config``'s compilation-cache knobs, kept
in one place so the CLI (``[run] compile_cache``), ``bench.py``, and
library users enable it identically.  Verified working through the axon
TPU relay (the PJRT client serializes executables; a fresh process hits
the cache with no recompile).

The reference has no equivalent (its PolyChord/MultiNest solvers are
Fortran binaries with no JIT; its jaxns path recompiles every run,
/root/reference/mcalf/cli.py:233-280).
"""

from __future__ import annotations

import os
from typing import Optional

_OFF = {"", "0", "off", "none", "false"}


def enable_compile_cache(
    cache_dir: Optional[str] = None, min_compile_secs: float = 0.5
) -> Optional[str]:
    """Enable JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit argument, then the
    ``MCALF_TPU_COMPILE_CACHE`` environment variable.  A value in
    ``{'', '0', 'off', 'none', 'false'}`` (case-insensitive) disables
    the cache (returns None).  Only executables whose compile took longer than
    ``min_compile_secs`` are persisted -- tiny dispatch helpers stay
    out of the cache directory.  (Default 0.5 s: through the TPU relay
    the warmup path's mid-tier programs -- termination check, finalize,
    recluster -- compile in 0.5-2 s each, and persisting them trims the
    warm-start tail; sub-0.5 s eager dispatches still stay out.)

    Returns the resolved cache directory, or None when disabled.
    Idempotent; safe to call before or after backend initialization
    (the cache is consulted at compile time, not at import).
    """
    if cache_dir is None:
        cache_dir = os.environ.get("MCALF_TPU_COMPILE_CACHE", "")
    if cache_dir.strip().lower() in _OFF:
        return None
    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    # Make cache keys ENTRY-SCRIPT-INDEPENDENT.  The cache key hashes the
    # canonicalized (strip-debuginfo) StableHLO bytecode, but MLIR location
    # metadata nested inside opaque payloads -- the Mosaic kernel module
    # serialized into tpu_custom_call backend_config -- survives that pass,
    # and those locations embed the USER STACK, including the entry
    # script's filename (measured round 5: two scripts building the
    # identical flagship program produced equal-length canonical bytecode
    # differing only in location string tables, e.g. b"/tmp/canon_a.py" vs
    # b"/tmp/canon_b.py", so tools/warm_cache.py entries were invisible to
    # bench.py).  Dropping user frames from locations makes the canonical
    # bytes bit-identical across entry points; compile errors still carry
    # Python-side tracebacks (jax_traceback_filtering is untouched).
    jax.config.update("jax_traceback_in_locations_limit", 0)
    return cache_dir
