"""RULER task jsonl generation CLI (reference Data/Ruler/prepare.py:24-31).

  python scripts/prepare_ruler.py --task niah_single --out niah.jsonl \
      --num_samples 16 --context_words 4000
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from magicdec_tpu.data.ruler.synthetic import TASKS, write_jsonl

    p = argparse.ArgumentParser()
    p.add_argument("--task", choices=sorted(TASKS), required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--context_words", type=int, default=2000)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()
    kw = dict(num_samples=args.num_samples, seed=args.seed)
    if "words_extraction" not in args.task:
        kw["context_words"] = args.context_words
    n = write_jsonl(args.task, args.out, **kw)
    print(f"wrote {n} samples to {args.out}")


if __name__ == "__main__":
    main()
