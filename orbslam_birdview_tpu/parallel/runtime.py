"""Distributed runtime helpers: multi-host initialization and mesh layout.

The reference has no distributed layer at all (single process, 4 pthreads —
SURVEY §2.3). Here the scaling path is explicit:

- one chip: everything in this package works as-is;
- one host, N chips: `make_map_mesh()` shards landmarks/edges over ICI
  (parallel/sharded_ba.py) and batches frontend extraction;
- N hosts: `init_distributed()` brings up the jax.distributed runtime
  (DCN for cross-host collectives), after which the same mesh code spans
  the full slice.

Tests exercise the identical code on a virtual CPU mesh
(`xla_force_host_platform_device_count`).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize jax.distributed for a multi-host pod slice.

    On TPU pods the arguments auto-detect from the environment; pass them
    explicitly for CPU/GPU clusters. Safe to call once per process."""
    import jax

    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_count(), jax.process_index()


def make_map_mesh(n_devices: Optional[int] = None):
    """1-D 'map' mesh over all (or the first n) addressable devices — the
    landmark/edge sharding axis used by sharded_ba."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("map",))


def make_2d_mesh(data: int, map_: int):
    """(data, map) mesh: `data` for frame-batch parallel frontend work
    (multi-camera / multi-session), `map` for map-block sharding in BA."""
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[: data * map_]).reshape(data, map_)
    return Mesh(devices, ("data", "map"))


def partition_edges_by_point(e_pt: np.ndarray, n_points: int, n_shards: int):
    """Group BA edges by landmark block so each shard owns its landmarks'
    edges with LOCAL point indices (the layout sharded_ba expects).

    Returns (order (E,) permutation, local_pt (E,) int32, pts_per_shard)."""
    pts_per_shard = -(-n_points // n_shards)
    shard_of_edge = e_pt // pts_per_shard
    order = np.argsort(shard_of_edge, kind="stable")
    local_pt = (e_pt - shard_of_edge * pts_per_shard).astype(np.int32)
    return order, local_pt[order], pts_per_shard
