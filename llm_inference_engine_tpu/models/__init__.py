from llm_inference_engine_tpu.models import llama, weights  # noqa: F401

__all__ = ["llama", "weights"]
