"""Test harness: run everything on the CPU backend with 8 virtual devices.

Mirrors the reference's test strategy (SURVEY.md §4): per-kernel unit tests
against CPU golden references — here the golden is the pure-XLA
implementation of each op and the kernels run in Pallas interpret mode.
The 8-device virtual mesh exercises the sharding path without TPU hardware
(``xla_force_host_platform_device_count`` pattern, SNIPPETS.md [2]).
"""

import os

# must run before the first JAX backend initialization
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:  # prefer pure-CPU: the TPU tunnel must not eat test traffic
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

from llm_inference_engine_tpu.utils import set_pallas_interpret  # noqa: E402

set_pallas_interpret(True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng(request):
    # function-scoped + seeded from the test id (stable crc32, not str
    # hash — that is salted per process): every test gets the SAME draws
    # regardless of selection or order (a session-scoped stream made
    # marginal-tolerance tests flake depending on which tests ran before)
    import zlib
    return np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))


@pytest.fixture(scope="session", autouse=True)
def _verify_cpu():
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}")
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    yield
