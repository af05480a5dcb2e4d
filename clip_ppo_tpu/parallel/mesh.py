"""Device mesh construction and sharding rules.

The reference is single-process/single-GPU (SURVEY §2c); scaling here is
JAX-native: a 1-D ``dp`` mesh shards environments and the PPO batch across
chips, parameters are replicated, and GSPMD inserts the gradient psums —
no NCCL-style backend to port. A second ``tp`` axis is reserved for
sharding the CLIP ViT's attention heads / MLP for the large-encoder eval
sweeps (ViT-L/14).

Collectives ride ICI within a pod; multi-host DCN attaches through
``jax.distributed.initialize`` upstream of these helpers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(dp, tp)`` mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env/batch) axis across ``dp``."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put(x, sh: NamedSharding):
    """``jax.device_put`` that also works on multi-process meshes.

    When ``sh`` spans devices of other processes (DCN training), the host
    value — which every process holds identically, e.g. a state built
    from the same seed — is laid out shard-by-shard via
    ``make_array_from_callback``; each process materializes only its
    addressable blocks."""
    if not sh.is_fully_addressable:
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx]
        )
    return jax.device_put(x, sh)


def shard_env_state(mesh: Mesh, tree):
    """Place a batched pytree (leading axis = num_envs) on the dp axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: put(x, sh), tree)


def replicate_tree(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: put(x, sh), tree)
