"""ctypes bindings for the native host runtime (see runtime.cpp).

Compiled on first import with g++; falls back to pure-Python implementations
(same semantics) when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libmagicdec_runtime.so")
_SRC = os.path.join(_HERE, "runtime.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
        except Exception:
            return None
        i64, i32p, u8p, vp = (ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                              ctypes.POINTER(ctypes.c_uint8), ctypes.c_void_p)
        lib.md_window_pack.restype = i64
        lib.md_window_pack.argtypes = [i32p, i64, i64, ctypes.c_int32, i32p, i64]
        lib.md_tile_windows.restype = None
        lib.md_tile_windows.argtypes = [i32p, i64, i64, i64, i32p]
        lib.md_allocator_new.restype = vp
        lib.md_allocator_new.argtypes = [i64] * 4
        lib.md_allocator_free.argtypes = [vp]
        lib.md_allocator_free_pages.restype = i64
        lib.md_allocator_free_pages.argtypes = [vp]
        lib.md_allocator_admit.restype = i64
        lib.md_allocator_admit.argtypes = [vp, i64]
        lib.md_allocator_extend.restype = i64
        lib.md_allocator_extend.argtypes = [vp, i64, i64]
        lib.md_allocator_rollback.restype = i64
        lib.md_allocator_rollback.argtypes = [vp, i64, i64]
        lib.md_allocator_release.argtypes = [vp, i64]
        lib.md_allocator_tables.argtypes = [vp, i32p, i32p, u8p]
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.md_sched_new.restype = vp
        lib.md_sched_new.argtypes = [i64]
        lib.md_sched_free.argtypes = [vp]
        lib.md_sched_submit.argtypes = [vp, i64, i64]
        lib.md_sched_assign.restype = i64
        lib.md_sched_assign.argtypes = [vp, i64, i64p, i64p, i64]
        lib.md_sched_complete.restype = i64
        lib.md_sched_complete.argtypes = [vp, i64, i64]
        lib.md_sched_counts.argtypes = [vp, i64p]
        lib.md_sched_stats.argtypes = [vp, f64p]
        _lib = lib
        return _lib


def have_native() -> bool:
    return _load() is not None


def window_pack(tokens: np.ndarray, seq_len: int, bos_id: Optional[int],
                repeats: int = 1) -> np.ndarray:
    """Token stream -> [n*repeats, seq_len] windows with forced BOS
    (Data/data_converter.py:42-56 windowing contract)."""
    tokens = np.ascontiguousarray(tokens, dtype=np.int32)
    n = len(tokens) // seq_len
    lib = _load()
    if lib is None:
        out = tokens[: n * seq_len].reshape(n, seq_len).copy()
        if bos_id is not None:
            out[:, 0] = bos_id
        return np.tile(out, (repeats, 1))
    out = np.empty((n, seq_len), np.int32)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    wrote = lib.md_window_pack(p(tokens), len(tokens), seq_len,
                               -1 if bos_id is None else int(bos_id), p(out), n)
    out = out[:wrote]
    if repeats == 1:
        return out
    tiled = np.empty((wrote * repeats, seq_len), np.int32)
    lib.md_tile_windows(p(out), wrote, seq_len, repeats, p(tiled))
    return tiled


class PageAllocator:
    """Free-list KV page allocator for continuous batching (native-backed).

    Python fallback implements identical semantics for toolchain-free envs.
    """

    def __init__(self, total_pages: int, page_size: int, max_requests: int,
                 pages_per_request_cap: int):
        self.shape = (max_requests, pages_per_request_cap)
        self.page_size = page_size
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.md_allocator_new(
                total_pages, page_size, max_requests, pages_per_request_cap)
        else:
            self._free = list(range(total_pages))[::-1]
            self._table = np.full(self.shape, -1, np.int32)
            self._num = np.zeros(max_requests, np.int32)
            self._len = np.zeros(max_requests, np.int32)
            self._active = np.zeros(max_requests, np.uint8)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.md_allocator_free(self._h)
            self._h = None

    # -- native-or-python dispatch ------------------------------------
    def free_pages(self) -> int:
        if self._lib is not None:
            return int(self._lib.md_allocator_free_pages(self._h))
        return len(self._free)

    def admit(self, initial_len: int) -> int:
        if self._lib is not None:
            return int(self._lib.md_allocator_admit(self._h, initial_len))
        need = -(-initial_len // self.page_size)
        if need > self.shape[1] or len(self._free) < need:
            return -1
        for s in range(self.shape[0]):
            if not self._active[s]:
                self._active[s] = 1
                self._len[s] = initial_len
                self._num[s] = need
                for i in range(need):
                    self._table[s, i] = self._free.pop()
                return s
        return -1

    def extend(self, slot: int, n_tokens: int) -> int:
        if self._lib is not None:
            return int(self._lib.md_allocator_extend(self._h, slot, n_tokens))
        if slot < 0 or not self._active[slot]:
            return -1
        new_len = int(self._len[slot]) + n_tokens
        need = -(-new_len // self.page_size)
        if need > self.shape[1]:
            return -1
        while self._num[slot] < need:
            if not self._free:
                return -1
            self._table[slot, self._num[slot]] = self._free.pop()
            self._num[slot] += 1
        self._len[slot] = new_len
        return new_len

    def rollback(self, slot: int, n_tokens: int) -> int:
        if self._lib is not None:
            return int(self._lib.md_allocator_rollback(self._h, slot, n_tokens))
        if slot < 0 or not self._active[slot] or self._len[slot] < n_tokens:
            return -1
        self._len[slot] -= n_tokens
        return int(self._len[slot])

    def release(self, slot: int) -> None:
        if self._lib is not None:
            self._lib.md_allocator_release(self._h, slot)
            return
        if slot < 0 or not self._active[slot]:
            return
        for i in range(int(self._num[slot])):
            self._free.append(int(self._table[slot, i]))
            self._table[slot, i] = -1
        self._num[slot] = 0
        self._len[slot] = 0
        self._active[slot] = 0

    def tables(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(page_indices [R, cap] int32, lengths [R] int32, active [R] bool)"""
        if self._lib is not None:
            pt = np.empty(self.shape, np.int32)
            ln = np.empty(self.shape[0], np.int32)
            ac = np.empty(self.shape[0], np.uint8)
            self._lib.md_allocator_tables(
                self._h, pt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ln.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ac.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            return pt, ln, ac.astype(bool)
        return self._table.copy(), self._len.copy(), self._active.astype(bool)


class Scheduler:
    """FCFS continuous-batching request scheduler (native-backed, identical
    pure-Python fallback).  Drives engine/serving.py's slot recycling:
    submit(req_id) -> assign() pairs queued requests with free slots in
    ascending slot order -> complete(slot) frees and accounts latency.
    The reference has no request-level serving at all (SURVEY.md §2.2)."""

    def __init__(self, n_slots: int):
        self.n_slots = n_slots
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.md_sched_new(n_slots)
        else:
            self._q: list = []
            self._slot_req = [-1] * n_slots
            self._slot_start = [0] * n_slots
            self._served = 0
            self._sum_q = 0.0
            self._sum_s = 0.0

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.md_sched_free(self._h)
            self._h = None

    def submit(self, req_id: int, arrival_us: int = 0) -> None:
        if self._lib is not None:
            self._lib.md_sched_submit(self._h, req_id, arrival_us)
        else:
            self._q.append((req_id, arrival_us))

    def assign(self, now_us: int = 0, max_n: int = None) -> list:
        """[(req_id, slot), ...] FCFS into ascending free slots.  ``max_n``
        caps the number of assignments (admission-control callers pair each
        assignment with a page reservation — engine/serving.py)."""
        max_n = self.n_slots if max_n is None else min(max_n, self.n_slots)
        if self._lib is not None:
            out_r = np.empty(self.n_slots, np.int64)
            out_s = np.empty(self.n_slots, np.int64)
            p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
            n = self._lib.md_sched_assign(self._h, now_us, p(out_r), p(out_s),
                                          max_n)
            return list(zip(out_r[:n].tolist(), out_s[:n].tolist()))
        pairs = []
        for slot in range(self.n_slots):
            if len(pairs) >= max_n:
                break
            if self._slot_req[slot] >= 0 or not self._q:
                continue
            rid, arr = self._q.pop(0)
            self._sum_q += now_us - arr
            self._slot_req[slot] = rid
            self._slot_start[slot] = now_us
            pairs.append((rid, slot))
        return pairs

    def complete(self, slot: int, now_us: int = 0) -> int:
        if self._lib is not None:
            return int(self._lib.md_sched_complete(self._h, slot, now_us))
        if slot < 0 or self._slot_req[slot] < 0:
            return -1
        rid = self._slot_req[slot]
        self._slot_req[slot] = -1
        self._sum_s += now_us - self._slot_start[slot]
        self._served += 1
        return rid

    def counts(self) -> Tuple[int, int, int]:
        """(queued, running, served)."""
        if self._lib is not None:
            c = np.empty(3, np.int64)
            self._lib.md_sched_counts(
                self._h, c.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            return int(c[0]), int(c[1]), int(c[2])
        running = sum(r >= 0 for r in self._slot_req)
        return len(self._q), running, self._served

    def stats(self) -> Tuple[float, float]:
        """(mean queue us, mean service us)."""
        if self._lib is not None:
            s = np.empty(2, np.float64)
            self._lib.md_sched_stats(
                self._h, s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
            return float(s[0]), float(s[1])
        assigned = self._served + sum(r >= 0 for r in self._slot_req)
        return (self._sum_q / assigned if assigned else 0.0,
                self._sum_s / self._served if self._served else 0.0)
