"""Dense (and, via ops.quant, dequantizing) matrix multiplication.

Capability parity with ``launchLinearGemm`` / ``launchLinearStridedBatchGemm``
(reference: src/kernels/linear.cu:10-158, thin wrappers over cuBLAS
``cublasGemmEx`` with a column-major transpose trick). On TPU the MXU is
reached through ``jax.lax.dot_general`` — XLA tiles, pipelines, and fuses
elementwise epilogues automatically, so the unquantized path is deliberately
*not* a Pallas kernel (hand-writing it would only lose to XLA's matmul
library). The batched q@K^T / P@V GEMMs of the reference live inside the
flash-attention kernel (ops/attention.py) instead of being exposed.

Weights are stored [in, out] (canonicalized at load; the reference instead
carried an ``is_transposed`` flag into every GEMM call,
src/weights/includes/base_weights.h:31, context_attention.cpp:164).

Quantized weights (QuantizedLinear) dispatch to the fused dequant matmul
Pallas kernels in ops/quant.py — the capability the reference declared but
never built (README.md:36-39, base_weights.h:10 INT8_W).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["linear", "linear_xla"]


def linear_xla(x: jax.Array, w: jax.Array, bias: jax.Array | None = None,
               out_dtype: Any = None) -> jax.Array:
    """y = x @ w (+ bias). x: [..., in], w: [in, out] or [in, *out_dims]
    (trailing out dims are flattened — e.g. the [in, 2, I] gate|up stack)."""
    out_dtype = out_dtype or x.dtype
    if w.ndim > 2:
        w = w.reshape(w.shape[0], -1)
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def linear(x: jax.Array, w, bias=None, out_dtype=None, *,
           kernels: str = "auto", layer=None) -> jax.Array:
    """Matmul dispatcher. ``w`` is either a plain [in, out] array or a
    QuantizedTensor (see ops/quant.py). With ``layer`` (traced int32), a
    stacked-weight variant is used: quantized weights are indexed inside
    the Pallas kernel via scalar prefetch (never sliced in HBM); dense
    stacked weights fall back to a dynamic_index slice."""
    # Imported lazily to avoid a cycle (quant uses linear_xla as golden).
    from llm_inference_engine_tpu.ops import quant

    if isinstance(w, quant.QuantizedTensor):
        return quant.quantized_linear(x, w, bias=bias, out_dtype=out_dtype,
                                      kernels=kernels, layer=layer)
    if layer is not None:
        w = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
    return linear_xla(x, w, bias, out_dtype)
