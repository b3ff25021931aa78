from llm_inference_engine_tpu.utils.checks import assert_finite, nan_guard
from llm_inference_engine_tpu.utils.common import (
    cdiv,
    round_up,
    use_pallas,
    pallas_interpret,
    pick_block_rows,
    set_pallas_interpret,
    cpu_devices,
)

__all__ = [
    "assert_finite",
    "nan_guard",
    "cdiv",
    "round_up",
    "use_pallas",
    "pallas_interpret",
    "pick_block_rows",
    "set_pallas_interpret",
    "cpu_devices",
]
