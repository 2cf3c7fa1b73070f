"""Offline HF -> engine checkpoint conversion CLI
(reference convert_hf_checkpoint.py:24-169 counterpart).

  python scripts/convert_checkpoint.py --checkpoint_dir /ckpts/Meta-Llama-3.1-8B \
      [--model_name llama-3.1-8b] [--out model.npz] [--quantize int8|int4]

Writes a single .npz of the layer-stacked params pytree (bf16 by default).
With --quantize, additionally writes a pre-quantized state (the reference's
WeightOnlyInt8QuantHandler offline path, Engine/quantize.py:55-64, which the
reference never exposed as a CLI)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", type=Path, required=True)
    p.add_argument("--model_name", type=str, default=None)
    p.add_argument("--out", type=Path, default=None)
    p.add_argument("--quantize", choices=["int8", "int4"], default=None)
    args = p.parse_args()

    from magicdec_tpu.utils.checkpoint import convert_hf_checkpoint

    out = args.out or (args.checkpoint_dir / "model.npz")
    convert_hf_checkpoint(str(args.checkpoint_dir), str(out),
                          model_name=args.model_name)
    print(f"wrote {out}")

    if args.quantize:
        import numpy as np
        import jax

        from magicdec_tpu import quantization as Q
        from magicdec_tpu.utils.checkpoint import load_converted

        bits = 8 if args.quantize == "int8" else 4
        params = Q.quantize_params(load_converted(str(out)), bits=bits)
        qout = out.with_name(out.stem + f"-{args.quantize}.npz")
        flat = {}

        def flatten(prefix, tree):
            if tree is None:
                return
            if isinstance(tree, Q.QuantizedWeight):
                flat[prefix + "q"] = np.asarray(tree.q)
                flat[prefix + "scale"] = np.asarray(tree.scale)
                flat[prefix + "bits"] = np.asarray(tree.bits)
                return
            if isinstance(tree, dict):
                for k, v in tree.items():
                    flatten(f"{prefix}{k}.", v)
                return
            flat[prefix[:-1]] = np.asarray(tree)

        flatten("", params)
        np.savez(qout, **flat)
        print(f"wrote {qout}")


if __name__ == "__main__":
    main()
