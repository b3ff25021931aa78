"""Intermediate-tensor dump / compare utilities.

Capability parity with the reference's debug tooling:
- ``saveTensor`` binary dumps of layer intermediates under SAVE_DATA
  (reference: src/utils/debug_utils.h:18-119, used at
  context_attention.cpp:193-304) -> ``TensorDumper`` (works inside jit via
  jax.debug.callback, or eagerly);
- the offline diff the reference only mentions (debug_utils.h:15 refers to
  a test_data_compare.cu that does not exist in its tree) -> ``compare_dumps``
  actually implemented;
- ``print_data`` device peeks under PRINT_DATA
  (reference: src/utils/cuda_debug_utils.cuh:7-25) -> ``peek``.

Dumps are .npy (self-describing) instead of raw bytes.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

__all__ = ["TensorDumper", "compare_dumps", "peek"]


class TensorDumper:
    """Dump named intermediates; enabled by constructing with a directory
    (or the LLM_TPU_SAVE_DATA env var), a no-op otherwise — mirroring the
    reference's compile-time SAVE_DATA gate as a runtime switch."""

    def __init__(self, directory: Optional[str] = None):
        self.directory = directory or os.environ.get("LLM_TPU_SAVE_DATA")
        self._counter = 0
        if self.directory:
            os.makedirs(self.directory, exist_ok=True)

    @property
    def enabled(self) -> bool:
        return bool(self.directory)

    def _path(self, name: str) -> str:
        self._counter += 1
        return os.path.join(self.directory, f"{self._counter:04d}_{name}.npy")

    def dump(self, name: str, value) -> None:
        """Eager dump (outside jit)."""
        if not self.enabled:
            return
        np.save(self._path(name), np.asarray(value))

    def dump_in_jit(self, name: str, value) -> None:
        """Dump from inside a jitted function (host callback; ordered so
        files appear in execution order)."""
        if not self.enabled:
            return
        path = self._path(name)
        jax.debug.callback(lambda x: np.save(path, np.asarray(x)), value,
                           ordered=True)


def compare_dumps(dir_a: str, dir_b: str, atol: float = 1e-3,
                  rtol: float = 1e-3) -> list[str]:
    """Diff two dump directories by matching file suffix (name after the
    counter). Returns list of mismatching names (empty = all close)."""

    def index(d):
        out = {}
        for f in sorted(os.listdir(d)):
            if f.endswith(".npy"):
                out[f.split("_", 1)[1]] = os.path.join(d, f)
        return out

    a, b = index(dir_a), index(dir_b)
    bad = []
    for name in sorted(set(a) & set(b)):
        x, y = np.load(a[name]), np.load(b[name])
        if x.shape != y.shape or not np.allclose(
                x.astype(np.float64), y.astype(np.float64), atol=atol,
                rtol=rtol):
            bad.append(name)
    bad += [f"missing:{n}" for n in sorted(set(a) ^ set(b))]
    return bad


def peek(name: str, value, num: int = 8) -> None:
    """Print the first elements of a device array from inside jit
    (reference print_data<<<1,1>>> equivalent)."""
    jax.debug.print(name + ": {}", value.ravel()[:num])
