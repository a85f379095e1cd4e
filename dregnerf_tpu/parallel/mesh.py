"""Device mesh construction and sharding helpers.

The reference has no real distributed execution (SURVEY.md §2.4 — vestigial
DDP flags only); the TPU build's first-class parallelism is:
  * data parallel over rays within a train step (the ray axis is this
    workload's 'long sequence' — millions of rays in the visibility pass);
  * data parallel over scene-pairs for registration training;
  * an embarrassingly-parallel per-block NeRF fleet (one block per chip,
    no collectives — the analog of the reference's one-scene-per-GPU shell
    fan-out).

Collectives ride ICI via shard_map + psum; nothing here ever touches DCN
for the inner loop.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # fill trailing axes greedily with 1s unless n factors nicely
        shape = (n,) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def make_mesh_from_config(config) -> Mesh | None:
    """Honor the CLI's --mesh_shape: '' or product 1 -> None (single
    device); '8' -> 8-way data mesh; '4,2' -> (data, model). The trainers
    and extraction route through the DP/sharded paths when this is set."""
    spec = getattr(config, "mesh_shape", "") or ""
    if not spec.strip():
        return None
    dims = [int(x) for x in spec.split(",") if x.strip()]
    n = int(np.prod(dims))
    if n <= 1:
        return None
    avail = len(jax.devices())
    if n > avail:
        raise ValueError(
            f"--mesh_shape {spec} needs {n} devices, only {avail} visible"
        )
    names = ("data", "model")[: len(dims)]
    devices = np.asarray(jax.devices()[:n]).reshape(tuple(dims))
    return Mesh(devices, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
