"""SwiGLU activation and residual add.

Capability parity with:
- ``launchSiluAndMul`` (reference: src/kernels/silu_and_mul.cu:61-82):
  ``silu(gate) * up`` over the packed gate/up projection output. The
  reference stores gate and up as two slices of one [bs, 2, inter] buffer
  (silu_and_mul.cu:36-40) because its GEMM is fused
  (src/layers/ffn.cpp:105); we keep the same packed [tokens, 2*inter]
  convention with gate = [:, :inter], up = [:, inter:].
- ``launchAddResidual`` (reference: src/kernels/add_residual.cu:51-76):
  plain elementwise residual add after the FFN down-projection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_engine_tpu.utils import (
    cdiv, pallas_interpret, pick_block_rows, use_pallas)

__all__ = ["silu_and_mul", "silu_and_mul_xla", "add_residual", "add_residual_xla"]


def silu_and_mul_xla(gate_up: jax.Array) -> jax.Array:
    """gate_up: [..., 2*inter] packed (gate then up) -> [..., inter]."""
    inter = gate_up.shape[-1] // 2
    gate = gate_up[..., :inter].astype(jnp.float32)
    up = gate_up[..., inter:].astype(jnp.float32)
    return (jax.nn.silu(gate) * up).astype(gate_up.dtype)


def add_residual_xla(x: jax.Array, residual: jax.Array) -> jax.Array:
    return (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)


def _silu_mul_kernel(g_ref, u_ref, o_ref):
    g = g_ref[:].astype(jnp.float32)
    u = u_ref[:].astype(jnp.float32)
    o_ref[:] = (jax.nn.silu(g) * u).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _silu_and_mul_pallas(gate_up, block_rows: int, interpret: bool):
    tokens, two_inter = gate_up.shape
    inter = two_inter // 2
    grid = (cdiv(tokens, block_rows),)
    return pl.pallas_call(
        _silu_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((tokens, inter), gate_up.dtype),
        grid=grid,
        in_specs=[
            # gate slice and up slice of the packed buffer as two views
            pl.BlockSpec((block_rows, inter), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, inter), lambda i: (i, 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, inter), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(gate_up, gate_up)


def silu_and_mul(gate_up: jax.Array, *, kernels: str = "auto") -> jax.Array:
    """SwiGLU: silu(gate) * up over packed [..., 2*inter] input.

    Decode-sized token counts skip the Pallas kernel: at B*T<=64 the
    elementwise math is ~0.5 MB and the launch costs ~12 us/layer
    (profiled on chip, docs/profile_decode_r04.log — ~5% of the whole
    decode step), while XLA fuses the slice+silu+mul into neighbors for
    free. Prefill-sized token counts skip it too: measured on v5e (r5,
    [tokens, 22016] bf16), Pallas 931/3649 us vs XLA 791/3107 us at
    4096/16384 tokens — the two strided gate/up view-DMAs lose to XLA's
    fused slice+silu+mul, and XLA additionally fuses into neighboring
    elementwise ops in the real layer. The Pallas kernel keeps only the
    mid-range where it measured faster (516 vs 593 us at 1024 tokens)."""
    tokens = 1
    for d in gate_up.shape[:-1]:
        tokens *= d
    if not use_pallas(kernels) or tokens <= 64 or tokens >= 2048:
        return silu_and_mul_xla(gate_up)
    shape = gate_up.shape
    x2 = gate_up.reshape(-1, shape[-1])
    inter = shape[-1] // 2
    block = pick_block_rows(
        x2.shape[0], shape[-1] * jnp.dtype(gate_up.dtype).itemsize)
    out = _silu_and_mul_pallas(x2, block, pallas_interpret())
    return out.reshape(*shape[:-1], inter)


def add_residual(x: jax.Array, residual: jax.Array, *, kernels: str = "auto"):
    """Residual add (XLA always: a single fused add is already optimal —
    a Pallas kernel would add nothing but launch overhead)."""
    del kernels
    return add_residual_xla(x, residual)
