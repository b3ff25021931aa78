"""Offline quantizer: HF/reference checkpoint -> one pre-fused .npz.

    python -m llm_inference_engine_tpu.tools.quantize \
        --model llama2-7b --checkpoint /path/to/hf_dir \
        --mode int4 --out llama2-7b-int4.npz

The output loads directly: ``create_engine("llama2-7b", "llama2-7b-int4.npz")``
(or ``--checkpoint foo.npz`` on the chat CLI) — no fp16 staging and no
re-quantization at engine start. This is the export-side tool the reference
refers to but does not ship (torch2flm.py, tokenizer.h:137).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llm-tpu-quantize", description=__doc__)
    ap.add_argument("--model", required=True,
                    help="preset name or config JSON path")
    ap.add_argument("--checkpoint", required=True,
                    help="HF safetensors dir or reference .bin dir")
    ap.add_argument("--mode", choices=["int8", "int4", "none"],
                    default="int8")
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform for the quantization pass (cpu "
                         "default: no TPU needed, any model size)")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from llm_inference_engine_tpu.models.registry import _resolve_config
    from llm_inference_engine_tpu.models import weights as W

    cfg = _resolve_config(args.model)
    print(f"loading {args.checkpoint} ...", flush=True)
    if any(f.endswith(".safetensors") for f in os.listdir(args.checkpoint)):
        params = W.load_hf_safetensors(cfg, args.checkpoint)
    else:
        params = W.load_reference_bin(cfg, args.checkpoint)
    if args.mode != "none":
        print(f"quantizing to {args.mode} (group {args.group_size}) ...",
              flush=True)
        params = W.quantize_params(params, args.mode, args.group_size)
    W.save_params(params, args.out)
    sz = os.path.getsize(args.out) / 1e9
    print(f"wrote {args.out} ({sz:.2f} GB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
