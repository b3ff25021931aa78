from llm_inference_engine_tpu.tokenizer.bpe import (
    BPETokenizer,
    load_tokenizer,
)

__all__ = ["BPETokenizer", "load_tokenizer"]
