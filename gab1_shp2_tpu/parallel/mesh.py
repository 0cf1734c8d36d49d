"""Device-mesh sharding for ensemble workloads.

The scaling axis of this model family is the *ensemble* axis (parameter
sets; N up to 10k in the target workload).  The model state itself is
tiny (18 species x O(100) nodes), so there is nothing to tensor/pipeline
-shard — the right decomposition is pure data parallelism over ICI:

  * build a 1-D ``Mesh`` over all devices with axis ``"ensemble"``,
  * shard the batched parameter leaves over that axis,
  * ``jit(vmap(solve))`` — XLA partitions the batched program SPMD-style
    and inserts collectives only where cross-member reductions appear
    (quantile/summary stages), which ride ICI.

Multi-host: call ``jax.distributed.initialize()`` before building the
mesh and the same code spans DCN-connected hosts.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENSEMBLE_AXIS = "ensemble"


def ensemble_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A 1-D device mesh with a single ``"ensemble"`` axis."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (ENSEMBLE_AXIS,))


def shard_ensemble(tree, mesh: Mesh):
    """Place a pytree with a leading ensemble axis across the mesh."""
    sh = NamedSharding(mesh, P(ENSEMBLE_AXIS))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def run_sharded(fn: Callable, batched_args, mesh: Mesh, out_specs=P(ENSEMBLE_AXIS)):
    """jit ``vmap(fn)`` with the batch axis sharded over ``mesh``.

    ``fn`` maps one member's arguments to a pytree; the returned arrays
    keep the ensemble axis sharded (``out_specs``) so downstream
    reductions (means, quantiles) trigger XLA collectives over ICI
    instead of a host gather.
    """
    in_sh = NamedSharding(mesh, P(ENSEMBLE_AXIS))
    out_sh = NamedSharding(mesh, out_specs)
    args = jax.tree_util.tree_map(lambda a: jax.device_put(a, in_sh),
                                  batched_args)
    f = jax.jit(jax.vmap(fn), out_shardings=out_sh)
    return f(args)


def run_sharded_batch(batch_fn: Callable, batched_args, mesh: Mesh,
                      out_specs=P(ENSEMBLE_AXIS)):
    """Shard the *batch-aware* integrator over the mesh.

    Production path: each device runs one lane-minor batched program
    (``ops/batch_stiff.solve_stiff_batch``) on its local ensemble shard
    — ``shard_map`` hands ``batch_fn`` the local (N/n_devices,
    ...)-leading slice and reassembles the global batch axis.  Unlike
    :func:`run_sharded` (vmap of a per-member fn), the per-device
    program keeps the lane-minor layout that fills the vector tiles.
    """
    in_sh = NamedSharding(mesh, P(ENSEMBLE_AXIS))
    args = jax.tree_util.tree_map(lambda a: jax.device_put(a, in_sh),
                                  batched_args)
    # the per-shard program is purely lane-local (no cross-lane ops), but
    # its while_loop carries start from replicated constants, which the
    # varying-manual-axes checker rejects — skip the check
    smap = jax.shard_map(batch_fn, mesh=mesh, in_specs=P(ENSEMBLE_AXIS),
                         out_specs=out_specs, check_vma=False)
    f = jax.jit(smap)
    return f(args)


def pad_to_multiple(tree, multiple: int):
    """Pad the leading axis of every leaf up to a multiple of
    ``multiple`` (device count) by repeating the last member; returns
    (padded_tree, original_n)."""
    n = jax.tree_util.tree_leaves(tree)[0].shape[0]
    pad = (-n) % multiple

    def _pad(a):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)

    return jax.tree_util.tree_map(_pad, tree), n
