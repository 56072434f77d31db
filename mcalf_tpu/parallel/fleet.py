"""Multi-sightline / multi-model fitting sharded over the device mesh.

This is the framework's "data parallelism" (SURVEY.md sections 2.3, 5.8):
independent fit problems -- sightlines, candidate ncomp models, repeated
seeds -- are stacked on a leading axis (:mod:`mcalf_tpu.models.batched`) and
``shard_map``-ped over a 1-D ``jax.sharding.Mesh``.  Each device runs its own
complete nested-sampling ``while_loop`` to ITS OWN convergence (no lockstep
barrier, no collectives inside the hot loop -- the fits are embarrassingly
parallel, so the ICI only carries the final gather).  This replaces the
reference's host-MPI parallelism, which lives inside PolyChord/MultiNest
(/root/reference/mcalf/cli.py:37-41,116-118,158).

Multiple problems per device are handled with ``lax.map`` inside the shard
(sequential per device, parallel across devices).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mcalf_tpu.models.batched import stack_problems
from mcalf_tpu.models.forward import AbsorptionModel
from mcalf_tpu.models.jax_model import StaticSpec, loglike_cube_core
from mcalf_tpu.sampler.nested import NSConfig, NSResults, nested_sample_device

__all__ = ["make_mesh", "fit_many", "fit_stacked"]

_STATIC_KEYS = ("pidx", "comp_id", "is_fill")


def make_mesh(devices=None, axis_name: str = "batch") -> Mesh:
    """1-D mesh over all (or the given) devices.  For multi-host pods the
    caller should have run ``jax.distributed.initialize`` first; the mesh
    then spans hosts with the DCN axis folded into the same name."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


def _split_static(stacked: Dict[str, Any]):
    data = {k: jnp.asarray(v) for k, v in stacked.items() if k not in _STATIC_KEYS}
    tables = {k: jnp.asarray(stacked[k]) for k in _STATIC_KEYS}
    return data, tables


def fit_stacked(
    spec: StaticSpec,
    stacked: Dict[str, Any],
    config: NSConfig,
    seed: int = 43,
    mesh: Optional[Mesh] = None,
) -> NSResults:
    """Run one independent nested-sampling fit per stacked problem, sharded
    over the mesh.  Returns NSResults with a leading problem axis.

    The number of problems must be a multiple of the mesh size (pad with
    repeated problems if needed)."""
    mesh = mesh if mesh is not None else make_mesh()
    axis = mesh.axis_names[0]
    nprob = next(iter(v.shape[0] for k, v in stacked.items() if k not in _STATIC_KEYS))
    nd = mesh.devices.size
    if nprob % nd != 0:
        raise ValueError(
            f"number of problems ({nprob}) must be a multiple of mesh size ({nd})"
        )

    data, tables = _split_static(stacked)
    cfg = config.resolved()
    keys = jax.random.split(jax.random.PRNGKey(seed), nprob)

    def run_one(args):
        local_consts, key = args
        consts = dict(local_consts, **tables)
        ll = partial(loglike_cube_core, c=consts, s=spec)
        return nested_sample_device(lambda u: ll(u), key, cfg)

    def shard_body(local_data, local_keys):
        # local_data: pytree with leading axis nprob/nd; run fits
        # sequentially within the shard, in parallel across shards.
        return jax.lax.map(run_one, (local_data, local_keys))

    data_specs = jax.tree.map(lambda _: P(axis), data)
    fitter = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(data_specs, P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fitter(data, keys)


def fit_many(
    models: Sequence[AbsorptionModel],
    config: NSConfig,
    seed: int = 43,
    mesh: Optional[Mesh] = None,
    conv_mode: str = "same_edge",
) -> NSResults:
    """Fit a list of structurally identical problems across the mesh."""
    spec, stacked = stack_problems(models, conv_mode=conv_mode)
    return fit_stacked(spec, stacked, config, seed=seed, mesh=mesh)
