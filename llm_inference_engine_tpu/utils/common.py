"""Small shared helpers (replaces reference src/utils/macro.h error macros and
grid math; TPU has no launch-config arithmetic, so what remains is tile math
and backend selection)."""

from __future__ import annotations

import functools

import jax


def cdiv(a: int, b: int) -> int:
    """Ceiling division (reference used CUDA grid rounding, e.g.
    repeat_kv.cu grid computation)."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_block_rows(n_rows: int, row_bytes: int,
                    target_bytes: int = 2 * 1024 * 1024) -> int:
    """Rows per Pallas grid step, honoring the TPU block constraint that the
    sublane dim be a multiple of 8 or span the full array."""
    t = max(1, target_bytes // max(1, row_bytes))
    if t >= n_rows:
        return n_rows          # full array: always legal
    return max(8, (t // 8) * 8)


@functools.lru_cache(None)
def _default_backend() -> str:
    return jax.default_backend()


def use_pallas(kernels: str = "auto") -> bool:
    """Whether to run Pallas kernels compiled (TPU) — otherwise either the
    pure-XLA path or interpret mode is used."""
    if kernels == "pallas":
        return True
    if kernels == "xla":
        return False
    return _default_backend() == "tpu"


_INTERPRET_OVERRIDE: bool | None = None


def set_pallas_interpret(value: bool | None) -> None:
    """Force (or un-force, with None) pallas interpret mode globally.

    Tests and the multi-chip CPU dryrun set this to True because they run on
    the CPU backend (possibly while a TPU backend is also registered, making
    ``jax.default_backend()`` unreliable as a signal)."""
    global _INTERPRET_OVERRIDE
    _INTERPRET_OVERRIDE = value


def pallas_interpret() -> bool:
    """Interpret-mode flag for pallas_call: True when not running on a real
    TPU backend (tests run on the CPU backend with a virtual device mesh)."""
    if _INTERPRET_OVERRIDE is not None:
        return _INTERPRET_OVERRIDE
    return _default_backend() != "tpu"


def cpu_devices(n: int | None = None):
    """The host CPU devices (used by tests/dryrun to build virtual meshes
    regardless of whether a TPU backend is also registered)."""
    devs = jax.devices("cpu")
    if n is not None:
        if len(devs) < n:
            raise RuntimeError(
                f"need {n} CPU devices, have {len(devs)}; set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n} before "
                "importing jax"
            )
        devs = devs[:n]
    return devs
