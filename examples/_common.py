"""Shared example setup.

- repo root on sys.path so examples run from anywhere;
- goldens compare at fp32: force `highest` matmul precision (TPU MXU
  defaults to bf16 inputs, which would swamp the tolerances);
- off-TPU, Pallas kernels run in interpret mode.

Note: the environment may pin the backend via sitecustomize, so examples
that want CPU must use jax.config.update("jax_platforms", "cpu") *before*
backend init — env vars alone are not reliable here.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")

from llm_inference_engine_tpu.utils import set_pallas_interpret

if jax.default_backend() != "tpu":
    set_pallas_interpret(True)


def report(name: str, ok: bool, detail: str = "") -> None:
    status = "OK" if ok else "FAIL"
    print(f"[{status}] {name}" + (f" — {detail}" if detail else ""))
    if not ok:
        raise SystemExit(1)
