"""Continuous-batching speculative serving engine (north-star extension).

The reference has no request-level serving: batch membership is fixed, all
requests share one length, and termination is batch-global
(SURVEY.md §2.2 "no dynamic page allocator and no continuous batching";
stop rule selfspec:211).  This engine serves a stream of requests through a
fixed number of batch slots:

- per-request termination (EOT or per-request token budget);
- finished slots are recycled: the next queued prompt is prefilled alone and
  its caches are spliced into the batch state at that slot;
- the speculation windows themselves run as one jitted program over the whole
  batch (inactive slots compute garbage that is masked out of commits), so
  serving costs the same per window as the fixed-batch engine.

Slot bookkeeping (lengths, admission) mirrors the native free-list allocator
(magicdec_tpu.native.PageAllocator) which manages true paged storage for the
multi-host roadmap; here slots own fixed cache regions, matching the
reference's allocator-free layout.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np

import flax.struct
import jax
import jax.numpy as jnp

from magicdec_tpu.engine.engine import _per_engine_cache, LongSpecEngine, SpecEngine
from magicdec_tpu.engine.state import SpecState


@flax.struct.dataclass
class ServingState:
    spec: SpecState
    active: jnp.ndarray       # [B] bool — slot holds a live request
    done: jnp.ndarray         # [B] bool — live request finished, awaiting drain


class ServingEngine(SpecEngine):
    """Self-spec engine with per-request lifecycle.

    ``serve(prompts)`` runs the whole stream to completion and returns each
    request's generated tokens.  Admission requires all prompts padded/bucketed
    to the same prefix length per admission call (reference-style equal-length
    batches within a step; ragged admission buckets are the caller's policy).

    The speculation window is the fixed-batch engine's own window step run with
    ``masks=(active, done)`` (engine.SpecEngine._finish_window): acceptance and
    termination become per-request, non-live slots are frozen.  Any draft-cache
    mode the base engine supports works here — streamingllm/snapkv self-spec,
    and all standalone-draft modes via ServingLongSpecEngine.
    """

    def _serving_shardings(self):
        """ServingState shardings under a mesh (None when meshless).  The
        spec tree reuses the engine's SpecState shardings; PagedServingEngine
        overrides _spec_state_shardings with the pool/table specs."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        d = NamedSharding(self.mesh, P("data"))
        return ServingState(spec=self._spec_state_shardings(),
                            active=d, done=d)

    def _spec_state_shardings(self):
        return self._spec_shardings

    @_per_engine_cache
    def _windows_fn(self, B: int, n_windows: int):
        window = self._window()

        def run(params, dparams, sst: ServingState) -> ServingState:
            def body(carry, _):
                spec, done = carry
                spec, done = window(params, dparams, spec,
                                    masks=(sst.active, done))
                return (spec, done), None

            (spec, done), _ = jax.lax.scan(body, (sst.spec, sst.done), None,
                                           length=n_windows)
            return ServingState(spec=spec, active=sst.active, done=done)

        return jax.jit(run, donate_argnums=(2,),
                       out_shardings=self._serving_shardings())

    # ------------------------------------------------------------------
    # admission / drain
    # ------------------------------------------------------------------

    def init_serving(self, B: int, prefix: int, rng=None) -> ServingState:
        """Empty batch of B slots sized for `prefix`-length prompts.  Under
        sampling (EngineConfig.temperature > 0) `rng` is the shared stream key;
        per-request salts are spliced in at admission."""
        rng, _ = self._sampling_args(B, rng, None)
        tcaches, dcaches = self._zero_caches(B)

        def zeros():  # distinct buffers: donation rejects aliased arguments
            return jnp.zeros((B,), jnp.int32)

        spec = SpecState(
            k=tcaches["k"], v=tcaches["v"],
            ks=tcaches.get("ks"), vs=tcaches.get("vs"),
            target_lens=zeros(), dk=dcaches["dk"], dv=dcaches["dv"],
            draft_fill=zeros(), draft_pos=zeros(), token0=zeros(),
            output=jnp.zeros((B, self._out_cap), jnp.int32),
            num_committed=zeros(), target_steps=jnp.zeros((), jnp.int32),
            done=jnp.zeros((), bool),
            db_tokens=jnp.zeros((B, 2), jnp.int32),
            db_update=jnp.ones((B,), jnp.int32),
            rng=rng,
            salt=jnp.zeros((B,), jnp.int32) if rng is not None else None)
        return ServingState(spec=spec, active=jnp.zeros((B,), bool),
                            done=jnp.zeros((B,), bool))

    def admit(self, sst: ServingState, slot: int, prompt: np.ndarray,
              salt: int = 0) -> ServingState:
        """Prefill one prompt alone and splice its state into `slot`.  `salt`
        is the request's noise-stream identity (unique per request, so a
        recycled slot never replays a previous occupant's Gumbel stream)."""
        return self.admit_many(sst, [(slot, prompt, salt)])

    def admit_many(self, sst: ServingState,
                   admissions: List[Tuple[int, np.ndarray, int]]) -> ServingState:
        """Batched admission: prefill a WAVE of queued prompts together and
        splice each into its slot (VERDICT r1 item 5 — the reference has no
        admission at all; round-1 serving prefilled one request at a time).

        ``admissions``: [(slot, prompt, salt), ...].  Prompts are grouped into
        equal-length buckets; each bucket prefills as ONE encode over a
        [k, P] batch (one jitted chunked-prefill program per (k, P) shape —
        shapes recur, so the jit cache amortizes), then one scatter splices
        the k requests' caches/carries into their slots.  Different buckets —
        and therefore arbitrary per-request lengths across the batch — coexist
        freely: every downstream structure is length-governed per slot.
        """
        buckets: Dict[int, List[Tuple[int, np.ndarray, int]]] = {}
        for slot, prompt, salt in admissions:
            buckets.setdefault(len(prompt), []).append((slot, prompt, salt))
        for plen, group in buckets.items():
            slots = jnp.asarray([g[0] for g in group], jnp.int32)
            prompts = jnp.asarray(np.stack([np.asarray(g[1]) for g in group]),
                                  jnp.int32)
            salts = jnp.asarray([g[2] for g in group], jnp.int32)
            stk = self.encode(prompts, rng=sst.spec.rng, salt=salts)
            fn = self._admit_fn(sst.active.shape[0], len(group))
            sst = fn(sst, stk, slots)
        return sst

    @_per_engine_cache
    def _admit_fn(self, B: int, k: int):
        def admit(sst: ServingState, stk: SpecState, slots) -> ServingState:
            spec = sst.spec
            upd = dict(
                k=spec.k.at[:, slots].set(stk.k),
                v=spec.v.at[:, slots].set(stk.v),
                dk=spec.dk.at[:, slots].set(stk.dk),
                dv=spec.dv.at[:, slots].set(stk.dv),
            )
            if spec.ks is not None:  # quantized target-cache scales [L,B,H,S]
                upd["ks"] = spec.ks.at[:, slots].set(stk.ks)
                upd["vs"] = spec.vs.at[:, slots].set(stk.vs)
            for name in ("target_lens", "draft_fill", "draft_pos", "token0",
                         "num_committed", "output", "db_tokens", "db_update"):
                upd[name] = getattr(spec, name).at[slots].set(
                    getattr(stk, name))
            if spec.salt is not None:
                upd["salt"] = spec.salt.at[slots].set(stk.salt)
            spec = spec.replace(**upd)
            return ServingState(spec=spec,
                                active=sst.active.at[slots].set(True),
                                done=sst.done.at[slots].set(False))

        return jax.jit(admit, donate_argnums=(0,),
                       out_shardings=self._serving_shardings())

    # ------------------------------------------------------------------
    # the serving loop
    # ------------------------------------------------------------------

    def serve(self, prompts: List[np.ndarray], B: int,
              windows_per_sync: int = 4, rng=None,
              total_pages: Optional[int] = None) -> List[np.ndarray]:
        """Run all prompts through B slots; returns generated tokens per
        request (in submission order).  Prompts may have ARBITRARY lengths:
        admission waves bucket queued prompts by length and prefill each
        bucket as one batch (admit_many); slots with different context
        lengths coexist, since caches/acceptance/termination are all
        length-governed per request.  `rng`: stream key when
        EngineConfig.temperature > 0 (each request samples from its own
        salt=request-id noise stream).

        Admission/slot lifecycle runs through the native FCFS scheduler and
        KV PageAllocator (magicdec_tpu.native, C++ with identical Python
        fallbacks): each admission reserves ceil((prompt + generation
        budget) / 128) pages and releases them at drain; when ``total_pages``
        is set below the full B x max_seq_len capacity, admission blocks
        FCFS until pages free (memory backpressure).  Per-request
        queue/service latencies and admission-wave batching stats land in
        ``self.last_serve_stats``."""
        import time

        from magicdec_tpu import native

        sst = self.init_serving(B, max(len(p) for p in prompts), rng=rng)
        sched = native.Scheduler(B)
        page_size = 128
        cap_pages = -(-self.ecfg.max_seq_len // page_size)
        reserve = self.ecfg.max_gen + self.ecfg.gamma + 2
        n_pages = B * cap_pages if total_pages is None else total_pages
        worst = -(-(max(len(p) for p in prompts) + reserve) // page_size)
        if n_pages < worst:
            raise ValueError(f"total_pages={n_pages} cannot hold the longest "
                             f"request ({worst} pages)")
        alloc = native.PageAllocator(n_pages, page_size, B, cap_pages)
        slot_pages: Dict[int, int] = {}   # batch slot -> allocator slot
        from collections import deque
        pending = deque(range(len(prompts)))  # FCFS mirror of the queue
        t0 = time.perf_counter_ns()
        now_us = lambda: (time.perf_counter_ns() - t0) // 1000
        for rid in range(len(prompts)):
            sched.submit(rid, now_us())
        results: Dict[int, np.ndarray] = {}
        waves, admitted, admit_s, min_free = 0, 0, 0.0, alloc.free_pages()

        def refill(sst):
            nonlocal waves, admitted, admit_s, min_free
            active = np.asarray(sst.active)
            done = np.asarray(sst.done)
            output = committed = None
            for slot in range(B):
                if active[slot] and done[slot]:
                    rid = sched.complete(slot, now_us())
                    alloc.release(slot_pages.pop(slot))
                    if output is None:  # one host readback for all drains
                        output = np.asarray(sst.spec.output)
                        committed = np.asarray(sst.spec.num_committed)
                    results[rid] = output[slot, : int(committed[slot])]
                    sst = ServingState(spec=sst.spec,
                                       active=sst.active.at[slot].set(False),
                                       done=sst.done.at[slot].set(False))
            wave = []
            while pending:
                need_len = len(prompts[pending[0]]) + reserve
                if alloc.free_pages() < -(-need_len // page_size):
                    break  # FCFS backpressure: head of line waits for pages
                got = sched.assign(now_us(), max_n=1)
                if not got:
                    break  # no free batch slot
                rid, slot = got[0]
                assert rid == pending.popleft()
                slot_pages[slot] = alloc.admit(need_len)
                assert slot_pages[slot] >= 0
                wave.append((slot, prompts[rid], rid))
            min_free = min(min_free, alloc.free_pages())
            if wave:
                t = time.perf_counter()
                sst = self.admit_many(sst, wave)
                admit_s += time.perf_counter() - t
                waves += 1
                admitted += len(wave)
            return sst

        sst = refill(sst)
        windows = self._windows_fn(B, windows_per_sync)
        while any(sched.counts()[:2]):
            sst = windows(self.params, self._draft_arg(), sst)
            sst = refill(sst)
        mean_q_us, mean_s_us = sched.stats()
        self.last_serve_stats = {"mean_queue_ms": mean_q_us / 1e3,
                                 "mean_service_ms": mean_s_us / 1e3,
                                 "served": sched.counts()[2],
                                 "admission_waves": waves,
                                 "mean_admissions_per_wave":
                                     admitted / max(waves, 1),
                                 "admission_time_s": admit_s,
                                 "min_free_pages": min_free}
        return [results[i] for i in range(len(prompts))]


class ServingLongSpecEngine(ServingEngine, LongSpecEngine):
    """Continuous-batching serving with a standalone draft model (reference
    execution mode 3, tests/*/longspec_benchmark.py — which the reference can
    only run with fixed batches and batch-global termination).  Inherits the
    per-request lifecycle from ServingEngine and the draft model / encode paths
    (full, streamingllm, or snapkv draft cache) from LongSpecEngine."""


class PagedServingEngine(ServingEngine):
    """Continuous-batching serving over a shared KV page POOL.

    The contiguous ServingEngine gives every slot a full [S, K] cache region,
    so HBM capacity is B * max_seq_len even when most requests are short.
    Here the target cache is a pool [L, P, page_size, Kc] (+ scale pools when
    kv_quant) and each slot maps its logical KV blocks to pool pages through
    ``SpecState.table`` [B, npr]: capacity is governed by the SUM of admitted
    request lengths.  This is the TPU-native completion of the reference's
    flashinfer paged wrappers (Engine/SnapKV/backend.py:42-115) — but where
    the reference re-plans its wrappers on the host every decode step, pages
    here are assigned by the native allocator (native/runtime.cpp) only at
    admission-wave boundaries, and the decode loop stays one jitted program
    reading through scalar-prefetched tables
    (ops/pallas/paged_attention.py).

    Mechanics:
    - pool page 0..B-1 are per-slot SCRATCH pages: drained (inactive) slots
      point their whole table at their scratch page, so the masked-out
      garbage appends that inactive slots still execute can never land in
      pages the allocator has reassigned to live requests;
    - admission prefills CONTIGUOUS (the admission wave's [k, S] caches are
      transient) and splices the result into the slot's freshly-allocated
      pages — so no paged prefill kernel is needed and the admission cost
      matches the contiguous engine's;
    - the decode/verify hot path runs the paged flash kernels + ONE aliased
      paged RMW append per forward (table-indexed twins of the contiguous
      kernels; bit-parity tested).

    The draft (budget-sized) caches stay contiguous per slot — they are ~2%
    of target-cache bytes and fully occupied by construction.
    """

    def _spec_state_shardings(self):
        """Paged SpecState shardings: pools shard their kv-head lane axis on
        the model axes, the table is replicated per shard (scalar-prefetched
        by the paged kernels)."""
        from magicdec_tpu.parallel import sharding as S

        axes = S.model_axes_of(self.mesh)
        return S._to_shardings(
            S.spec_state_pspecs(axes, self._draft_model_axes(self.mesh),
                                kv_quant=bool(self.ecfg.kv_quant),
                                sampled=self.ecfg.temperature > 0,
                                paged=True), self.mesh)

    @property
    def _npr(self) -> int:
        e = self.ecfg
        if e.max_seq_len % e.page_size:
            raise ValueError(f"max_seq_len {e.max_seq_len} must be a multiple "
                             f"of page_size {e.page_size}")
        # the paged append kernel RMWs 8-row blocks that must lie within one
        # page, and the quantized pools' 128-column scale block map
        # ((gc*cw) % ps // cw, ops/pallas/paged_attention.py) mis-addresses
        # when a page straddles a 128-column boundary — reject configs that
        # would silently corrupt appends instead of raising
        if e.page_size % 8:
            raise ValueError(f"page_size {e.page_size} must be a multiple of 8")
        if e.page_size > 128 and e.page_size % 128:
            raise ValueError(f"page_size {e.page_size} > 128 must be a "
                             f"multiple of 128")
        return e.max_seq_len // e.page_size

    def init_serving(self, B: int, prefix: int, rng=None,
                     total_pages: Optional[int] = None) -> ServingState:
        from magicdec_tpu.engine.engine import kv_quant_bits
        from magicdec_tpu.ops import paged_kv as PKV

        e, cfg = self.ecfg, self.cfg
        ps = e.page_size
        npr = self._npr
        P = (B * npr if total_pages is None else total_pages) + B  # + scratch
        bits = kv_quant_bits(e.kv_quant)
        lane = cfg.n_kv_head * cfg.head_dim // (2 if bits == 4 else 1)
        dt = jnp.int8 if bits else e.cache_dtype
        pool_k = PKV.alloc_pool(cfg.n_layer, P, ps, lane, dt)
        pool_v = jnp.zeros_like(pool_k)
        sk = sv = None
        if bits:
            sk = PKV.alloc_scale_pool(cfg.n_layer, P, cfg.n_kv_head, ps,
                                      e.kv_scale_dtype)
            sv = jnp.zeros_like(sk)
        dk = jnp.zeros(self._cache_shape(B, self._draft_cap, self._draft_cfg()),
                       e.cache_dtype)
        dv = jnp.zeros_like(dk)
        # Page-group geometry: the pool's page axis shards over the data
        # axis (sharding.pool_pspec) into `data` contiguous partitions of
        # Pl pages each — a group's partition holds its own B_local slots'
        # scratch pages (local ids 0..B_local-1) followed by its share of
        # the user pages.  Page-table entries are GROUP-LOCAL ids, so each
        # shard_map shard addresses its local pool directly and appends can
        # never touch another group's pages.  data == 1 (and meshless)
        # degenerates to the old global layout bit-for-bit.
        data = self.mesh.shape.get("data", 1) if self.mesh is not None else 1
        if B % data or (P - B) % data:
            raise ValueError(
                f"paged serving over data={data}: slots B={B} and pool "
                f"pages {P - B} must both divide by the data axis")
        self._pgeom = (data, B // data, P // data)  # (data, B_local, Pl)
        table = jnp.tile((jnp.arange(B, dtype=jnp.int32) % (B // data))[:, None],
                         (1, npr))
        if self.mesh is not None:
            if data > 1:
                from magicdec_tpu.ops.shard import FlashShard
                if not isinstance(self._backend_t, FlashShard):
                    raise NotImplementedError(
                        "paged serving with a data axis > 1 requires "
                        "attn_backend='flash' (group-local page-table ids "
                        "only resolve inside the shard_map'd kernels; the "
                        "jnp GSPMD path sees global arrays)")
            sh = self._spec_state_shardings()
            pool_k = jax.device_put(pool_k, sh.k)
            pool_v = jax.device_put(pool_v, sh.v)
            if bits:
                sk = jax.device_put(sk, sh.ks)
                sv = jax.device_put(sv, sh.vs)
            dk = jax.device_put(dk, sh.dk)
            dv = jax.device_put(dv, sh.dv)

        rng, _ = self._sampling_args(B, rng, None)

        def zeros():
            return jnp.zeros((B,), jnp.int32)

        spec = SpecState(
            k=pool_k, v=pool_v, ks=sk, vs=sv, table=table,
            target_lens=zeros(), dk=dk, dv=dv,
            draft_fill=zeros(), draft_pos=zeros(), token0=zeros(),
            output=jnp.zeros((B, self._out_cap), jnp.int32),
            num_committed=zeros(), target_steps=jnp.zeros((), jnp.int32),
            done=jnp.zeros((), bool),
            db_tokens=jnp.zeros((B, 2), jnp.int32),
            db_update=jnp.ones((B,), jnp.int32),
            rng=rng,
            salt=jnp.zeros((B,), jnp.int32) if rng is not None else None)
        return ServingState(spec=spec, active=jnp.zeros((B,), bool),
                            done=jnp.zeros((B,), bool))

    def admit_many(self, sst: ServingState, admissions) -> ServingState:
        """admissions: [(slot, prompt, salt, table_row [npr] int32), ...] —
        table_row holds the slot's page ids (allocator pages offset past the
        scratch pages; unused tail entries = the slot's scratch page)."""
        buckets: Dict[int, list] = {}
        for slot, prompt, salt, trow in admissions:
            buckets.setdefault(len(prompt), []).append((slot, prompt, salt, trow))
        data = self._pgeom[0]
        for plen, group in buckets.items():
            slots = jnp.asarray([g[0] for g in group], jnp.int32)
            prompts_np = [np.asarray(g[1]) for g in group]
            salts_np = [g[2] for g in group]
            # the admission encode's out_shardings batch-shard over data:
            # pad the wave to a data-multiple (repeat the last prompt) and
            # splice only the real rows — arbitrary bucket sizes otherwise
            # cannot divide the data axis
            pad = (-len(group)) % data
            prompts_np += [prompts_np[-1]] * pad
            salts_np += [salts_np[-1]] * pad
            prompts = jnp.asarray(np.stack(prompts_np), jnp.int32)
            salts = jnp.asarray(salts_np, jnp.int32)
            tables = jnp.asarray(np.stack([np.asarray(g[3]) for g in group]),
                                 jnp.int32)
            stk = self.encode(prompts, rng=sst.spec.rng, salt=salts)
            # splice only the pages the allocator actually assigned: the
            # slot's table tail entries all alias its scratch page, and a
            # scatter with duplicate indices would rely on JAX's
            # nondeterministic duplicate .set ordering (plus write full
            # per-slot capacity to HBM regardless of prompt length)
            reserve = self.ecfg.max_gen + self.ecfg.gamma + 2
            n_used = -(-(plen + reserve) // self.ecfg.page_size)
            fn = self._admit_fn(sst.active.shape[0], len(group), n_used,
                                self._pgeom)
            sst = fn(sst, stk, slots, tables)
        return sst

    @_per_engine_cache
    def _admit_fn(self, B: int, k: int, n_used: int, pgeom):
        ps = self.ecfg.page_size
        npr = self._npr
        _, Bl, Pl = pgeom  # table entries are group-local (see init_serving)

        def admit(sst: ServingState, stk: SpecState, slots, tables):
            spec = sst.spec
            if stk.token0.shape[0] != k:
                # admit_many padded the encode batch to a data-multiple:
                # splice only the k real rows
                upd = {f: getattr(stk, f)[:, :k]
                       for f in ("k", "v", "ks", "vs", "dk", "dv")
                       if getattr(stk, f) is not None}
                upd.update({f: getattr(stk, f)[:k]
                            for f in ("target_lens", "draft_fill",
                                      "draft_pos", "token0", "num_committed",
                                      "output", "db_tokens", "db_update",
                                      "salt")
                            if getattr(stk, f) is not None})
                stk = stk.replace(**upd)

            def to_pages(c):  # [L, k, S, Kc] -> [L, k*n_used, ps, Kc]
                L, kk, S, Kc = c.shape
                return (c.reshape(L, kk, npr, ps, Kc)[:, :, :n_used]
                        .reshape(L, kk * n_used, ps, Kc))

            def to_scale_pages(s):  # [L, k, H, S] -> [L, k*n_used, H, ps]
                L, kk, H, S = s.shape
                return (s.reshape(L, kk, H, npr, ps)[:, :, :, :n_used]
                        .transpose(0, 1, 3, 2, 4).reshape(L, kk * n_used, H, ps))

            # the pool scatter runs under plain jit on the GLOBAL pool:
            # lift local ids to global with the slot's group offset
            flat = (tables[:, :n_used]
                    + ((slots // Bl) * Pl)[:, None]).reshape(-1)
            upd = dict(
                k=spec.k.at[:, flat].set(to_pages(stk.k)),
                v=spec.v.at[:, flat].set(to_pages(stk.v)),
                dk=spec.dk.at[:, slots].set(stk.dk),
                dv=spec.dv.at[:, slots].set(stk.dv),
                table=spec.table.at[slots].set(tables),
            )
            if spec.ks is not None:
                upd["ks"] = spec.ks.at[:, flat].set(to_scale_pages(stk.ks))
                upd["vs"] = spec.vs.at[:, flat].set(to_scale_pages(stk.vs))
            for name in ("target_lens", "draft_fill", "draft_pos", "token0",
                         "num_committed", "output", "db_tokens", "db_update"):
                upd[name] = getattr(spec, name).at[slots].set(
                    getattr(stk, name))
            if spec.salt is not None:
                upd["salt"] = spec.salt.at[slots].set(stk.salt)
            spec = spec.replace(**upd)
            return ServingState(spec=spec,
                                active=sst.active.at[slots].set(True),
                                done=sst.done.at[slots].set(False))

        return jax.jit(admit, donate_argnums=(0,),
                       out_shardings=self._serving_shardings())

    def serve(self, prompts: List[np.ndarray], B: int,
              windows_per_sync: int = 4, rng=None,
              total_pages: Optional[int] = None) -> List[np.ndarray]:
        """Paged serve loop: same lifecycle as ServingEngine.serve, but the
        native PageAllocator's tables become the DEVICE page tables (real
        paged storage, not just accounting), and drained slots repoint at
        their scratch page before their pages are reused."""
        import time

        from magicdec_tpu import native

        e = self.ecfg
        ps = e.page_size
        npr = self._npr
        reserve = e.max_gen + e.gamma + 2
        n_pages = B * npr if total_pages is None else total_pages
        worst = -(-(max(len(p) for p in prompts) + reserve) // ps)
        data_axis = (self.mesh.shape.get("data", 1)
                     if self.mesh is not None else 1)
        # capacity is PER data group: a request must fit one group's page
        # partition (n_pages // data), not the whole pool — otherwise it is
        # never admittable and the serve loop would spin forever
        if n_pages // data_axis < worst:
            raise ValueError(
                f"total_pages={n_pages} over data={data_axis} groups cannot "
                f"hold the longest request ({worst} pages per group needed)")
        sst = self.init_serving(B, max(len(p) for p in prompts), rng=rng,
                                total_pages=n_pages)
        # One native Scheduler + PageAllocator PER data group: each group
        # owns B_local slots and its own page partition (table entries are
        # group-local — init_serving).  data == 1 is one group over
        # everything, the original layout.
        data, Bl, _Pl = self._pgeom
        npg = n_pages // data  # divisibility validated by init_serving
        scheds = [native.Scheduler(Bl) for _ in range(data)]
        allocs = [native.PageAllocator(npg, ps, Bl, npr) for _ in range(data)]
        slot_pages: Dict[int, Tuple[int, int]] = {}  # slot -> (group, aslot)
        from collections import deque
        pending = deque(range(len(prompts)))
        t0 = time.perf_counter_ns()
        now_us = lambda: (time.perf_counter_ns() - t0) // 1000
        # all requests arrive now; they are submitted to a group's scheduler
        # at admission time with their ORIGINAL arrival stamp, so queue-time
        # stats measure real waiting regardless of the grouping
        arrivals = {rid: now_us() for rid in range(len(prompts))}
        results: Dict[int, np.ndarray] = {}
        waves, admitted, admit_s = 0, 0, 0.0
        min_free = sum(a.free_pages() for a in allocs)
        group_of = lambda slot: slot // Bl

        def group_slots_free(g):
            return Bl - sum(1 for s in slot_pages if group_of(s) == g)

        def table_row(g: int, aslot: int, slot: int) -> np.ndarray:
            pt, _, _ = allocs[g].tables()
            row = pt[aslot].copy()
            row[row >= 0] += Bl          # local pages 0..Bl-1 are scratch
            row[row < 0] = slot % Bl     # unused tail -> scratch (never read)
            return row.astype(np.int32)

        def refill(sst):
            nonlocal waves, admitted, admit_s, min_free
            active = np.asarray(sst.active)
            done = np.asarray(sst.done)
            output = committed = None
            drained = []
            for slot in range(B):
                if active[slot] and done[slot]:
                    g, aslot = slot_pages.pop(slot)
                    rid = scheds[g].complete(slot % Bl, now_us())
                    allocs[g].release(aslot)
                    if output is None:
                        output = np.asarray(sst.spec.output)
                        committed = np.asarray(sst.spec.num_committed)
                    results[rid] = output[slot, : int(committed[slot])]
                    drained.append(slot)
            if drained:
                idx = jnp.asarray(drained, jnp.int32)
                scratch = jnp.tile((idx % Bl)[:, None], (1, npr))
                sst = ServingState(
                    spec=sst.spec.replace(
                        table=sst.spec.table.at[idx].set(scratch)),
                    active=sst.active.at[idx].set(False),
                    done=sst.done.at[idx].set(False))
            wave = []
            while pending:
                rid = pending[0]
                need_len = len(prompts[rid]) + reserve
                need_pages = -(-need_len // ps)
                # strict FCFS (head-blocking, like the single-group path):
                # place the head request in the group with the most free
                # pages that has a free slot, or stop refilling
                cands = [g for g in range(data)
                         if group_slots_free(g) > 0
                         and allocs[g].free_pages() >= need_pages]
                if not cands:
                    break
                g = max(cands, key=lambda g: allocs[g].free_pages())
                scheds[g].submit(rid, arrivals[rid])
                got = scheds[g].assign(now_us(), max_n=1)
                assert got and got[0][0] == rid
                slot = g * Bl + got[0][1]
                aslot = allocs[g].admit(need_len)
                assert aslot >= 0
                slot_pages[slot] = (g, aslot)
                pending.popleft()
                wave.append((slot, prompts[rid], rid, table_row(g, aslot, slot)))
            min_free = min(min_free, sum(a.free_pages() for a in allocs))
            if wave:
                t = time.perf_counter()
                sst = self.admit_many(sst, wave)
                admit_s += time.perf_counter() - t
                waves += 1
                admitted += len(wave)
            return sst

        sst = refill(sst)
        windows = self._windows_fn(B, windows_per_sync)
        while pending or slot_pages:
            sst = windows(self.params, self._draft_arg(), sst)
            sst = refill(sst)
        served = sum(s.counts()[2] for s in scheds)
        qs = [s.stats() for s in scheds]
        ns = [s.counts()[2] for s in scheds]
        wmean = lambda i: (sum(q[i] * n for q, n in zip(qs, ns))
                           / max(sum(ns), 1))
        self.last_serve_stats = {"mean_queue_ms": wmean(0) / 1e3,
                                 "mean_service_ms": wmean(1) / 1e3,
                                 "served": served,
                                 "admission_waves": waves,
                                 "mean_admissions_per_wave":
                                     admitted / max(waves, 1),
                                 "admission_time_s": admit_s,
                                 "total_pages": n_pages,
                                 "min_free_pages": min_free}
        return [results[i] for i in range(len(prompts))]


class PagedServingLongSpecEngine(PagedServingEngine, LongSpecEngine):
    """Paged continuous-batching serving with a standalone draft model
    (reference execution mode 3 + the paged pool): pool/table lifecycle from
    PagedServingEngine, draft model + encode paths (full / streamingllm /
    snapkv draft cache) from LongSpecEngine."""
