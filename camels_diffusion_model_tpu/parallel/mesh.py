"""Device mesh and sharding helpers (jax.sharding / pjit data parallelism).

The reference is strictly single-process single-GPU (SURVEY §2.8: no
torch.distributed / NCCL / MPI anywhere; SLURM requests exactly 1 GPU).
Multi-chip scaling is therefore a NEW first-class capability of this
framework, built the TPU-native way:

* a 1-D ``jax.sharding.Mesh`` over all local devices with a ``"data"`` axis;
* batches sharded on the leading axis (``NamedSharding(P("data"))``), model
  parameters and optimizer state replicated (``P()``);
* the jitted train/sample steps are ordinary ``jax.jit`` functions — XLA
  inserts the psum gradient reductions and BatchNorm's cross-chip batch
  statistics over ICI automatically from the sharding annotations.

Sampling sweeps (parameter grids, CFG sweeps, power-spectrum validation) are
embarrassingly parallel across the batch axis and use the same helpers.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Env vars that indicate a multi-process launch was configured (by the user
# or a cluster launcher).  Presence of any of these makes init failures FATAL
# instead of silently degrading to single-host training.
_DIST_ENV_VARS = (
    "CAMELS_DISTRIBUTED",
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def init_distributed(**kwargs) -> int:
    """Multi-host initialization (TPU pod slices): call once per process
    before any device use.  Returns the global device count; afterwards
    ``make_mesh()`` spans the whole slice (ICI within hosts, DCN across
    slices).

    Explicit semantics (a misconfigured launch must NOT silently fall back
    to single-host training):

    * Not configured — no kwargs and none of ``CAMELS_DISTRIBUTED`` /
      ``JAX_COORDINATOR_ADDRESS`` / ``COORDINATOR_ADDRESS`` set — no-op.
    * Configured — any kwarg given (``coordinator_address`` / ``num_processes``
      / ``process_id`` ...) or one of the env vars set — ``jax.distributed
      .initialize`` runs and any failure RAISES.  A repeat call on an
      already-initialized runtime is fine.
    """
    configured = bool(kwargs) or any(os.environ.get(v) for v in _DIST_ENV_VARS)
    if not configured:
        return len(jax.devices())
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise
    return len(jax.devices())


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    """A 1-D mesh over (the first ``n_devices``) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} present"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh's data axis."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def make_mesh_2d(
    n_data: int,
    n_space: int,
    axis_names: tuple = ("data", "space"),
) -> Mesh:
    """A 2-D (data x space) mesh for batch + spatial model parallelism.

    The growth path for maps whose activations exceed one chip's HBM
    (SURVEY §5: the reference "scales" resolution only by editing the model
    — initial.py:16-75 / main.py:15-85 hard-code 128x128 variants; it has
    no model parallelism of any kind).  NHWC activations are sharded
    (batch over ``data``, image height over ``space``); XLA's SPMD
    partitioner inserts the halo exchanges for the conv windows, the
    cross-shard reductions for GroupNorm/BatchNorm statistics and the
    bottleneck global pooling, all over ICI — no hand-written collectives.
    """
    devices = jax.devices()
    need = n_data * n_space
    if need > len(devices):
        raise ValueError(
            f"requested {n_data}x{n_space} mesh but only "
            f"{len(devices)} devices present"
        )
    return Mesh(
        np.array(devices[:need]).reshape(n_data, n_space), axis_names
    )


def spatial_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """NHWC activation sharding on a 2-D mesh: batch over the data axis,
    image height (axis 1) over the space axis."""
    if len(mesh.axis_names) < 2:
        raise ValueError("spatial_sharding needs a 2-D mesh (make_mesh_2d)")
    spec = P(
        mesh.axis_names[0], mesh.axis_names[1], *([None] * (ndim - 2))
    )
    return NamedSharding(mesh, spec)


def shard_batch_spatial(mesh: Mesh, x, *rest):
    """device_put an NHWC batch with (data, space) sharding; any remaining
    arrays (conditioning vectors, masks) are leading-axis data-sharded and
    replicated over the space axis."""
    xs = jax.device_put(x, spatial_sharding(mesh, np.ndim(x)))
    others = tuple(
        jax.device_put(a, batch_sharding(mesh, np.ndim(a))) for a in rest
    )
    return (xs, *others) if others else xs


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int):
    """Zero-pad the leading axis to a multiple (for even per-chip shards).

    Returns (padded, n_real)."""
    n = x.shape[0]
    rem = n % multiple
    if rem == 0:
        return x, n
    pad = multiple - rem
    return np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)]), n


def shard_batch(mesh: Mesh, *arrays):
    """device_put host batches with leading-axis sharding over the mesh."""
    out = tuple(
        jax.device_put(a, batch_sharding(mesh, np.ndim(a))) for a in arrays
    )
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """device_put a pytree fully replicated on every device of the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)
