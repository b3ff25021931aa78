"""Multi-host (pod-slice) support: jax.distributed wiring + hybrid meshes.

The reference is strictly single-process/single-device (SURVEY.md §2f).
This module is the scale-out tier of the framework: process bootstrap via
``jax.distributed`` and hybrid ICI/DCN meshes so collectives ride the
intra-slice interconnect wherever possible.

Design (the v5e-16 / 2-host BASELINE.md config):
- tensor parallelism stays INSIDE a slice — its per-layer psums are
  latency-critical and must ride ICI;
- data parallelism (batch slots / replicas) crosses hosts over DCN —
  decode steps exchange nothing across DP ranks except scheduler metadata,
  so DCN latency never sits on the token path;
- each host runs its own request queue and continuous-batching scheduler
  over its local batch-slot shard; the jitted step functions are identical
  on every host (GSPMD requirement: all hosts execute the same program).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from llm_inference_engine_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["initialize_multihost", "make_multihost_mesh"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed (no-op if already initialized or if the
    environment provides everything — e.g. on Cloud TPU VMs all three
    arguments are auto-detected)."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process environment (tests, one host): nothing to do
        pass


def make_multihost_mesh(dp: int = 1, tp: int = 1,
                        devices: Optional[Sequence[jax.Device]] = None
                        ) -> Mesh:
    """(data=dp, model=tp) mesh laid out so the model axis never crosses
    hosts: devices are ordered host-major by jax, so reshaping
    [hosts*per_host] -> [dp, tp] keeps each tp group within one host's
    devices as long as tp divides the per-host device count — asserted
    here. Collectives on ``model`` then ride ICI; only ``data`` spans DCN.
    """
    if devices is None:
        devices = jax.devices()
    n = dp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices for dp={dp} tp={tp}, "
                         f"have {len(devices)}")
    devices = list(devices[:n])
    per_host: dict = {}
    for d in devices:
        per_host.setdefault(d.process_index, []).append(d)
    counts = {len(v) for v in per_host.values()}
    if len(counts) == 1:
        (c,) = counts
        if tp > c and tp % c != 0 and c % tp != 0:
            raise ValueError(
                f"tp={tp} does not tile the {c} devices per host; model-"
                f"axis collectives would cross DCN")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
