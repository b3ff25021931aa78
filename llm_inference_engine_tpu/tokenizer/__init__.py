from llm_inference_engine_tpu.tokenizer.bpe import BPETokenizer
from llm_inference_engine_tpu.tokenizer.bpe import load_tokenizer as _load_py


def load_tokenizer(path: str, native: bool = True):
    """Load a tokenizer (HF tokenizer.json / sentencepiece .model /
    reference .bin vocab), upgrading BPE vocabs to the C++ trie/heap
    encoder (csrc/tokenizer.cc) when the native library is available."""
    tok = _load_py(path)
    if native and isinstance(tok, BPETokenizer):
        from llm_inference_engine_tpu.tokenizer.native import wrap_native
        tok = wrap_native(tok)
    return tok


__all__ = ["BPETokenizer", "load_tokenizer"]
