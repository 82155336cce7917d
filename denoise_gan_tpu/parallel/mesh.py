"""Device mesh and sharding rules.

The reference is single-process/single-GPU (CUDA_VISIBLE_DEVICES pin,
/root/reference/train_srgan.py:15); parallelism is a new first-class
capability here (SURVEY.md §2 C19/C20).  Design:

* 1-D ``data`` axis over ICI for GAN training: the global batch is sharded on
  axis 0, parameters and optimizer state are replicated.  The train step is a
  single ``jax.jit`` with NamedSharding annotations — GSPMD inserts the grad
  all-reduce, and BatchNorm statistics are computed over the *global* batch
  automatically (a strict upgrade over per-replica stats).
* an optional ``space`` axis shards the H dimension of large frames for
  inference; GSPMD performs the conv halo exchanges over ICI (the image-domain
  analog of sequence/context parallelism, SURVEY.md §5).

Multi-host: call :func:`init_distributed` before anything else; per-host data
loading uses ``jax.process_index()`` file sharding in data/pipeline.py.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"

_DIST_INITIALIZED = False


def init_distributed() -> None:
    """Initialize JAX's multi-host runtime when launched under a cluster
    (no-op single-host).  TPU-native replacement for the reference's absent
    NCCL/MPI layer (SURVEY.md §2 C20).

    Cluster shape comes from ``JAX_COORDINATOR_ADDRESS`` plus (optionally)
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` — explicit values cover
    launchers jax's auto-detection doesn't know (e.g. the 2-process
    localhost dryrun, tools/dryrun_multihost.py); on TPU pods the two
    counts are auto-detected when unset."""
    global _DIST_INITIALIZED
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr or _DIST_INITIALIZED:
        return
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as exc:
        # Initialized by an earlier caller (idempotent, like the reference's
        # L0 prologue); anything else is a real failure.
        if "already initialized" not in str(exc).lower():
            raise
    _DIST_INITIALIZED = True


def make_mesh(num_devices: int = 0, space: int = 1,
              devices=None) -> Mesh:
    """Build a (data, space) mesh over the fastest-varying ICI axes.

    Args:
        num_devices: total devices to use; 0 = all visible.
        space: size of the spatial-sharding axis (1 = pure data parallel).
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_devices:
        devices = devices[:num_devices]
    n = len(devices)
    if n % space:
        raise ValueError(f"space={space} does not divide device count {n}")
    arr = np.asarray(devices).reshape(n // space, space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: sharded on axis 0 over 'data', H over 'space'."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Parameters / optimizer state: fully replicated."""
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Large-frame inference: shard H (axis 1 of NHWC) over every device so
    XLA spatially partitions the convs with automatic halo exchange."""
    total = mesh.devices.size
    flat = Mesh(mesh.devices.reshape(total), (SPACE_AXIS,))
    return NamedSharding(flat, P(None, SPACE_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Stage a host batch as a global array with the canonical batch
    sharding.  Single-process: a plain device_put.  Multi-process (each
    host holds its per-host shard from the per-host-sharded pipeline):
    assemble the GLOBAL batch via make_array_from_process_local_data —
    global batch = per-host batch x process_count."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    nproc = jax.process_count()
    if nproc == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x), (x.shape[0] * nproc, *x.shape[1:])),
        batch)
