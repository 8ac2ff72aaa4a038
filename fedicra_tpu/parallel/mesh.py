"""Device mesh construction for the client x data parallel layout.

The reference's parallelism is one OS process per client, one GPU each,
federated over gRPC (flower_runner.py:110-122). TPU-natively, clients are a
*mesh axis*: each client's local update runs on its own slice of the chip
mesh, per-client batches are further sharded over a data axis, and the
server's FedAvg reduction is a weighted mean over the client axis that XLA
lowers to psum over ICI — aggregation costs microseconds, not a gRPC
round-trip of the full state_dict.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    num_clients: Optional[int] = None,
    axis_names: Tuple[str, str] = ("client", "data"),
    devices=None,
) -> Mesh:
    """Build a (client, data) mesh from the available devices.

    The client axis gets min(num_clients, n_devices) devices (largest divisor
    of n_devices that is <= num_clients); the rest go to the data axis.
    When the default platform has fewer than n_devices devices, fall back to
    the host CPU backend (virtual multi-device testing).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            try:
                devices = jax.devices("cpu")
            except RuntimeError:
                pass
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if num_clients is None:
        num_clients = n
    # client axis: the largest divisor of n that also divides num_clients,
    # so every client-axis slice hosts the same number of clients
    c = 1
    for d in range(min(num_clients, n), 0, -1):
        if n % d == 0 and num_clients % d == 0:
            c = d
            break
    shape = (c, n // c)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def client_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis = client."""
    return NamedSharding(mesh, P("client"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, iters, B, ...]: K over 'client', B over 'data'."""
    return NamedSharding(mesh, P("client", None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
