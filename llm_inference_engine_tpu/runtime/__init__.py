from llm_inference_engine_tpu.runtime.engine import InferenceEngine, GenerationResult

__all__ = ["InferenceEngine", "GenerationResult"]
