"""Device-mesh utilities for SPMD scale-out.

The reference has no distributed backend (SURVEY.md §2: only a vestigial
nn.DataParallel hook). The TPU-native equivalent: a ``jax.sharding.Mesh``
over the batch ("data") axis — each trajectory's ODE solve is independent, so
data parallelism is the natural decomposition; XLA emits the gradient
all-reduce over ICI from the sharding annotations alone (no NCCL-style
hand-written collectives).

Axes:
  - ``data``  : batch/trajectory axis (primary; embarrassingly parallel)
  - ``model`` : reserved for tensor-parallel sharding of wide layers; the
    SLODE nets are far below the size where that pays, so it defaults to 1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the leading axis sharded over ``data``
    (scalars — e.g. an ``aux_mult`` override — replicate)."""
    out = {}
    for k, v in batch.items():
        spec = P("data") if np.ndim(v) >= 1 else P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def shard_stacked(mesh: Mesh, batches):
    """Device-put a stacked epoch (n_batches, B, ...) with the BATCH axis
    (axis 1) sharded over ``data`` — the scan axis stays unsharded; per-step
    scalars like ``aux_mult`` (n_batches,) replicate."""
    out = {}
    for k, v in batches.items():
        spec = P(None, "data") if np.ndim(v) >= 2 else P(None)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def pad_batch_to_multiple(batch, multiple: int):
    """Pad a batch so the leading dim divides the mesh data axis (delegates
    to the loader's padding/mask contract)."""
    from structured_latent_odes_tpu.data.loader import pad_to

    n = batch["observations"].shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n and "mask" in batch:
        return batch
    return pad_to(batch, target)
