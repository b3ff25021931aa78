"""Unit tests: rmsnorm + fused add-residual+rmsnorm.

Mirrors reference tests/unit_tests/test_rmsnorm.cu (CPU golden at 1e-3,
test_rmsnorm.cu:10-40) and test_add_residual_and_rmsnorm.cu — upgraded to
asserts over both a NumPy golden and the XLA implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from llm_inference_engine_tpu.ops.rmsnorm import (
    add_residual_rmsnorm, add_residual_rmsnorm_xla, rmsnorm, rmsnorm_xla)


def np_rmsnorm(x, w, eps):
    var = np.mean(x.astype(np.float64) ** 2, axis=-1, keepdims=True)
    return (x / np.sqrt(var + eps)) * w


@pytest.mark.parametrize("shape", [(64, 256), (13, 512), (3, 7, 128)])
@pytest.mark.parametrize("dtype", [np.float32])
def test_rmsnorm_matches_numpy(rng, shape, dtype):
    x = rng.normal(size=shape).astype(dtype)
    w = rng.normal(size=shape[-1:]).astype(dtype)
    eps = 1e-5
    got = np.asarray(rmsnorm(jnp.asarray(x), jnp.asarray(w), eps,
                             kernels="pallas"))
    want = np_rmsnorm(x, w, eps)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_rmsnorm_pallas_vs_xla(rng):
    x = jnp.asarray(rng.normal(size=(64, 4096)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4096,)).astype(np.float32))
    a = rmsnorm(x, w, 1e-5, kernels="pallas")
    b = rmsnorm_xla(x, w, 1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_add_residual_rmsnorm(rng):
    x = rng.normal(size=(33, 256)).astype(np.float32)
    r = rng.normal(size=(33, 256)).astype(np.float32)
    w = rng.normal(size=(256,)).astype(np.float32)
    y, h = add_residual_rmsnorm(jnp.asarray(x), jnp.asarray(r),
                                jnp.asarray(w), 1e-5, kernels="pallas")
    # the fused op must return the pre-norm sum as the new residual
    # (reference add_residual_and_rmsnorm.cu:71-83 semantics)
    np.testing.assert_allclose(np.asarray(h), x + r, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y), np_rmsnorm(x + r, w, 1e-5),
                               atol=1e-3, rtol=1e-3)


def test_add_residual_rmsnorm_pallas_vs_xla(rng):
    x = jnp.asarray(rng.normal(size=(16, 1024)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(16, 1024)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1024,)).astype(np.float32))
    y1, h1 = add_residual_rmsnorm(x, r, w, kernels="pallas")
    y2, h2 = add_residual_rmsnorm_xla(x, r, w)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
