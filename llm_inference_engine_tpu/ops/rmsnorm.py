"""RMSNorm and fused add-residual + RMSNorm.

Capability parity with the reference's two norm kernels:
- ``launchRMSNorm`` (reference: src/kernels/rmsnorm.cu:130-159) — normalizes
  the hidden states and *keeps the pre-norm value* for the residual path
  (rmsnorm.cu:55 copies input to the residual buffer). Functionally: the
  caller here simply keeps its input array — no copy kernel needed.
- ``launchFusedAddBiasResidualAndRMSNorm``
  (reference: src/kernels/add_residual_and_rmsnorm.cu:170-201) — fused
  ``h = x + residual; y = rmsnorm(h) ; residual' = h`` in one pass over HBM.

TPU design: one Pallas kernel per fusion boundary, gridded over row blocks.
Rows are independent, so ragged final blocks are safe (out-of-bounds rows
compute garbage that is never written back). Accumulation is always f32 on
the VPU regardless of storage dtype (the reference similarly accumulated in
float, rmsnorm.cu:17-24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_engine_tpu.utils import (
    cdiv, pallas_interpret, pick_block_rows, use_pallas)

__all__ = ["rmsnorm", "rmsnorm_xla", "add_residual_rmsnorm", "add_residual_rmsnorm_xla"]


# ---------------------------------------------------------------------------
# XLA reference implementations (golden for tests; GSPMD fallback)
# ---------------------------------------------------------------------------

def rmsnorm_xla(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """y = x / rms(x) * weight, accumulating in f32."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def add_residual_rmsnorm_xla(
    x: jax.Array, residual: jax.Array, weight: jax.Array, eps: float = 1e-5
):
    """h = x + residual; return (rmsnorm(h), h)."""
    h = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    return rmsnorm_xla(h, weight, eps), h


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _rmsnorm_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * w_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _add_residual_rmsnorm_kernel(x_ref, r_ref, w_ref, o_ref, h_ref, *, eps: float):
    h = x_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)
    h_ref[:] = h.astype(h_ref.dtype)
    var = jnp.mean(jnp.square(h), axis=-1, keepdims=True)
    y = h * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * w_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _row_block(n_rows: int, hidden: int, dtype, n_bufs: int = 2) -> int:
    """Rows per grid step. ``n_bufs`` = row-blocks live in the kernel
    (inputs + outputs); the target keeps the DOUBLE-BUFFERED total well
    under the 16 MB scoped-VMEM limit with room for concurrently
    scheduled async copies — the fused add+norm kernel (4 row bufs) at
    2 MB blocks measured 16.04 MB scoped and OOM'd on hardware once the
    prefill dequant fusion overlapped it."""
    target = (8 * 1024 * 1024) // (2 * n_bufs)
    return pick_block_rows(n_rows, hidden * jnp.dtype(dtype).itemsize,
                           target_bytes=target)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def _rmsnorm_pallas(x, weight, eps: float, block_rows: int, interpret: bool):
    tokens, hidden = x.shape
    grid = (cdiv(tokens, block_rows),)
    return pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, hidden), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, weight)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def _add_residual_rmsnorm_pallas(x, residual, weight, eps, block_rows, interpret):
    tokens, hidden = x.shape
    grid = (cdiv(tokens, block_rows),)
    row_spec = pl.BlockSpec((block_rows, hidden), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_add_residual_rmsnorm_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
        ),
        grid=grid,
        in_specs=[
            row_spec,
            row_spec,
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(row_spec, row_spec),
        interpret=interpret,
    )(x, residual, weight)


# ---------------------------------------------------------------------------
# Dispatchers
# ---------------------------------------------------------------------------

def _as_2d(x):
    return x.reshape(-1, x.shape[-1]), x.shape


def rmsnorm(x, weight, eps: float = 1e-5, *, kernels: str = "auto"):
    """RMSNorm over the last axis. Accepts any leading batch dims."""
    if not use_pallas(kernels):
        return rmsnorm_xla(x, weight, eps)
    x2, shape = _as_2d(x)
    block = _row_block(x2.shape[0], x2.shape[1], x2.dtype)
    return _rmsnorm_pallas(x2, weight, eps, block, pallas_interpret()).reshape(shape)


def add_residual_rmsnorm(x, residual, weight, eps: float = 1e-5, *,
                         kernels: str = "auto"):
    """Fused residual add + RMSNorm. Returns (normed, new_residual)."""
    if not use_pallas(kernels):
        return add_residual_rmsnorm_xla(x, residual, weight, eps)
    x2, shape = _as_2d(x)
    r2, _ = _as_2d(residual)
    block = _row_block(x2.shape[0], x2.shape[1], x2.dtype, n_bufs=4)
    y, h = _add_residual_rmsnorm_pallas(x2, r2, weight, eps, block,
                                        pallas_interpret())
    return y.reshape(shape), h.reshape(shape)
