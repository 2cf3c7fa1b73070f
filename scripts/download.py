"""HF checkpoint downloader (reference download.py:12-30 counterpart).

  python scripts/download.py --repo_id meta-llama/Meta-Llama-3.1-8B \
      [--hf_token TOKEN] [--out_dir checkpoints]
"""

import argparse
import os


def hf_download(repo_id: str, out_dir: str = "checkpoints",
                hf_token: str = None) -> str:
    from huggingface_hub import snapshot_download

    local = os.path.join(out_dir, repo_id)
    os.makedirs(local, exist_ok=True)
    snapshot_download(repo_id, local_dir=local, token=hf_token,
                      ignore_patterns=["*.pth", "original/*"])
    return local


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--repo_id", type=str, required=True)
    p.add_argument("--out_dir", type=str, default="checkpoints")
    p.add_argument("--hf_token", type=str, default=os.environ.get("HF_TOKEN"))
    args = p.parse_args()
    print(hf_download(args.repo_id, args.out_dir, args.hf_token))
