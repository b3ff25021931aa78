from llm_inference_engine_tpu.runtime.engine import InferenceEngine, GenerationResult
from llm_inference_engine_tpu.runtime.prefix_cache import (
    PagedPrefixEntry, PagedPrefixStore, PrefixEntry, PrefixStore)

__all__ = ["InferenceEngine", "GenerationResult", "PrefixEntry",
           "PrefixStore", "PagedPrefixEntry", "PagedPrefixStore"]
