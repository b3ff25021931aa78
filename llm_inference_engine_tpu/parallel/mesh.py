"""Device mesh construction.

The reference has no distributed tier at all (SURVEY.md §2f: single device,
single stream, bs=1). This module is the TPU-native communication backend
that replaces what NCCL/MPI would have been on GPU: a ``jax.sharding.Mesh``
over which GSPMD/shard_map place XLA collectives on ICI (intra-slice) and
DCN (multi-host).

Axes:
- ``data``  — batch-slot parallelism (each rank owns a slice of the decode
  batch and of the KV cache's batch axis);
- ``model`` — tensor parallelism (column-sharded QKV/gate-up, row-sharded
  o/down with a psum after each, KV cache sharded over kv-head groups).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "local_config", "validate_mesh"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: int = 1, tp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data=dp, model=tp) mesh.

    ``devices`` defaults to ``jax.devices()``; pass
    ``jax.devices("cpu")`` for the virtual-device test/dryrun path.
    """
    if devices is None:
        devices = jax.devices()
    n = dp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices for dp={dp} tp={tp}, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def validate_mesh(config, engine_config, mesh: Mesh) -> None:
    """Static divisibility checks for the TP/DP layout."""
    tp = mesh.shape[MODEL_AXIS]
    dp = mesh.shape[DATA_AXIS]
    problems = []
    if config.num_kv_heads % tp:
        problems.append(f"num_kv_heads {config.num_kv_heads} % tp {tp}")
    if config.intermediate_size % tp:
        problems.append(
            f"intermediate_size {config.intermediate_size} % tp {tp}")
    if config.vocab_size % tp:
        problems.append(f"vocab_size {config.vocab_size} % tp {tp}")
    if engine_config.max_batch_size % dp:
        problems.append(
            f"max_batch_size {engine_config.max_batch_size} % dp {dp}")
    if problems:
        raise ValueError("mesh/config mismatch: " + "; ".join(problems))


def local_config(config, mesh: Mesh):
    """The per-rank model shape under tensor parallelism (what the local
    function inside shard_map computes with)."""
    tp = mesh.shape[MODEL_AXIS]
    return config.replace(
        num_heads=config.num_heads // tp,
        num_kv_heads=config.num_kv_heads // tp,
    )
