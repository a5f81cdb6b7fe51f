"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    n_shards: int | None = None,
    n_data: int = 1,
    devices: list | None = None,
) -> Mesh:
    """A ("data", "shard") mesh. With one axis left None, it absorbs all
    remaining devices. On a v5e pod slice the shard axis should map to the
    ICI ring so the all-gather merge stays off DCN."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_shards is None:
        if n % n_data:
            raise ValueError(f"{n} devices not divisible by n_data={n_data}")
        n_shards = n // n_data
    use = n_data * n_shards
    if use > n:
        raise ValueError(f"need {use} devices, have {n}")
    arr = np.asarray(devices[:use]).reshape(n_data, n_shards)
    return Mesh(arr, ("data", "shard"))
