"""Native host runtime (C++ via ctypes): window packing + page allocator.
Tests run against whichever backend loads; when g++ is present the native
path must agree with the Python fallback."""

import numpy as np

from magicdec_tpu import native


def test_native_compiles():
    assert native.have_native(), "g++ toolchain expected in this image"


def test_window_pack_matches_python():
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, 1000, size=10_000).astype(np.int32)
    out = native.window_pack(tokens, seq_len=128, bos_id=7, repeats=3)
    n = 10_000 // 128
    assert out.shape == (n * 3, 128)
    ref = tokens[: n * 128].reshape(n, 128).copy()
    ref[:, 0] = 7
    ref = np.tile(ref, (3, 1))
    np.testing.assert_array_equal(out, ref)


def test_window_pack_no_bos():
    tokens = np.arange(512, dtype=np.int32)
    out = native.window_pack(tokens, 256, None)
    np.testing.assert_array_equal(out.ravel(), tokens)


def test_page_allocator_lifecycle():
    a = native.PageAllocator(total_pages=16, page_size=128, max_requests=4,
                             pages_per_request_cap=8)
    assert a.free_pages() == 16
    s0 = a.admit(300)   # 3 pages
    s1 = a.admit(128)   # 1 page
    assert s0 != s1 and s0 >= 0 and s1 >= 0
    assert a.free_pages() == 12
    assert a.extend(s0, 100) == 400  # 400 tokens -> 4 pages
    assert a.free_pages() == 11
    # speculative rollback keeps pages, reduces length
    assert a.rollback(s0, 4) == 396
    pt, lens, active = a.tables()
    assert lens[s0] == 396 and lens[s1] == 128
    assert active[s0] and active[s1]
    assert (pt[s0][:4] >= 0).all() and (pt[s0][4:] == -1).all()
    a.release(s0)
    assert a.free_pages() == 15
    pt, lens, active = a.tables()
    assert not active[s0]


def test_page_allocator_oom_and_overflow():
    a = native.PageAllocator(total_pages=2, page_size=128, max_requests=2,
                             pages_per_request_cap=2)
    s = a.admit(256)
    assert s >= 0 and a.free_pages() == 0
    assert a.admit(128) == -1            # OOM
    assert a.extend(s, 1) == -1          # per-request cap overflow
    a.release(s)
    assert a.admit(128) >= 0
