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
    "cdiv",
    "round_up",
    "use_pallas",
    "pallas_interpret",
    "pick_block_rows",
    "set_pallas_interpret",
    "cpu_devices",
]
