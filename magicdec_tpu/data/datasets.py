"""Dataset converters (L6 layer; reference Data/data_converter.py).

Same windowing contract as the reference's ``convert_pg19_dataset``
(:42-56): take the first ``books`` documents, tokenize, drop a prefix, split
into ``seq_len`` windows, force BOS at window position 0, tile ``repeats``×.
Returns numpy int32 [N, seq_len] (the TPU engine consumes arrays, not torch
TensorDatasets).

The pg19 JSON blobs are stripped from the reference snapshot
(.MISSING_LARGE_BLOBS) and this environment has zero egress, so every loader
falls back to :func:`synthetic_long_context_dataset` when its source is
missing — benchmarks then measure identical compute on synthetic token
streams.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterable, List, Optional

import numpy as np


def _window(tokens: np.ndarray, seq_len: int, bos_id: Optional[int]) -> np.ndarray:
    n = len(tokens) // seq_len
    if n == 0:
        return np.empty((0, seq_len), np.int32)
    out = tokens[: n * seq_len].reshape(n, seq_len).astype(np.int32).copy()
    if bos_id is not None:
        out[:, 0] = bos_id  # reference forces BOS per window
    return out


def _dataset_from_texts(texts: Iterable[str], tokenizer, seq_len: int,
                        drop_prefix: int = 0, repeats: int = 1,
                        max_windows: Optional[int] = None) -> np.ndarray:
    bos = getattr(tokenizer, "bos_token_id", None)
    windows: List[np.ndarray] = []
    for text in texts:
        ids = np.asarray(tokenizer.encode(text), np.int32)
        ids = ids[drop_prefix:]
        w = _window(ids, seq_len, bos)
        if len(w):
            windows.append(w)
        if max_windows and sum(len(w) for w in windows) >= max_windows:
            break
    if not windows:
        return np.empty((0, seq_len), np.int32)
    data = np.concatenate(windows)[:max_windows]
    return np.tile(data, (repeats, 1))


def convert_pg19_dataset(tokenizer, seq_len: int, data_dir: str = "Data/pg19",
                         books: int = 50, drop_prefix: int = 8000,
                         repeats: int = 20) -> np.ndarray:
    """PG-19 loader (reference data_converter.py:42-56).  Falls back to the
    synthetic corpus when the json blobs are absent."""
    paths = sorted(glob.glob(os.path.join(data_dir, "*.json")))[:books]
    if not paths:
        vocab = getattr(tokenizer, "vocab_size", 32000)
        return synthetic_long_context_dataset(seq_len, num_seqs=books,
                                              vocab_size=vocab,
                                              bos_id=getattr(tokenizer, "bos_token_id", None))
    texts = []
    for p in paths:
        with open(p) as f:
            doc = json.load(f)
        texts.append(doc["text"] if isinstance(doc, dict) else str(doc))
    return _dataset_from_texts(texts, tokenizer, seq_len,
                               drop_prefix=drop_prefix, repeats=repeats)


def convert_c4_dataset(tokenizer, seq_len: int,
                       json_path: str = "Data/c4_small.json") -> np.ndarray:
    """C4 loader (reference data_converter.py:10-24 shape)."""
    if not os.path.exists(json_path):
        return synthetic_long_context_dataset(
            seq_len, num_seqs=64, vocab_size=getattr(tokenizer, "vocab_size", 32000),
            bos_id=getattr(tokenizer, "bos_token_id", None))
    with open(json_path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    texts = [r.get("text", "") for r in rows]
    return _dataset_from_texts(texts, tokenizer, seq_len)


def convert_wiki_dataset(tokenizer, seq_len: int, path: Optional[str] = None) -> np.ndarray:
    """Wikitext-style loader (reference :26-33); path to a local text file."""
    if path is None or not os.path.exists(path):
        return synthetic_long_context_dataset(
            seq_len, num_seqs=32, vocab_size=getattr(tokenizer, "vocab_size", 32000),
            bos_id=getattr(tokenizer, "bos_token_id", None))
    with open(path) as f:
        return _dataset_from_texts([f.read()], tokenizer, seq_len)


def convert_cnn_dataset(tokenizer, seq_len: int, path: Optional[str] = None) -> np.ndarray:
    """CNN/DailyMail-style loader (reference :34-40)."""
    return convert_wiki_dataset(tokenizer, seq_len, path)


def synthetic_long_context_dataset(seq_len: int, num_seqs: int = 32,
                                   vocab_size: int = 32000, seed: int = 0,
                                   bos_id: Optional[int] = 1) -> np.ndarray:
    """Structured synthetic token streams for zero-egress benchmarking.

    A Markov-ish mixture (repeated n-gram motifs + noise) rather than iid
    uniform tokens, so KV-compression drafting has realistic-ish locality.
    """
    rng = np.random.RandomState(seed)
    motifs = rng.randint(0, vocab_size, size=(64, 16))
    out = np.empty((num_seqs, seq_len), np.int32)
    for i in range(num_seqs):
        stream: List[np.ndarray] = []
        n = 0
        while n < seq_len:
            if rng.rand() < 0.7:
                m = motifs[rng.randint(len(motifs))]
            else:
                m = rng.randint(0, vocab_size, size=16)
            stream.append(m)
            n += len(m)
        seq = np.concatenate(stream)[:seq_len]
        out[i] = seq
    if bos_id is not None:
        out[:, 0] = bos_id
    return out


def batch_iterator(data: np.ndarray, batch_size: int):
    """shuffle=False, drop_last=True (reference baseline_benchmark.py:68)."""
    n = len(data) // batch_size
    for i in range(n):
        yield data[i * batch_size:(i + 1) * batch_size]
