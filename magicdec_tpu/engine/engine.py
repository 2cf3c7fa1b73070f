"""TPU-native speculative decoding engine.

Re-architecture of the reference's L3+L5 layers (LMBackend + driver scripts):
where the reference exposes mutable single-step primitives and rolls page
tables back on the host every window (SURVEY.md §1, §2.4), this engine owns the
entire control loop on-device:

- ``encode``           — chunked prefill as one jitted lax.scan program
                         (reference: per-chunk host ``plan()`` + kernel launch,
                         Engine/SnapKV/backend.py:231-287);
- ``generate``         — the full draft-gamma/verify/accept/rollback loop as a
                         single jitted lax.while_loop (reference: host Python
                         loop, tests/SnapKV/selfspec_benchmark.py:120-211);
- ``generate_baseline``— autoregressive decoding as one jitted lax.scan.

Greedy acceptance semantics match the reference exactly (engine/spec.py).
Both self-speculation variants are supported: "snapkv" (top-k compressed draft
cache refreshed by verify) and "streamingllm" (sink+window draft cache with the
double-buffer bonus path).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from magicdec_tpu.config import ModelConfig
from magicdec_tpu.engine import spec as spec_ops
from magicdec_tpu.engine.state import BaselineState, SpecState
from magicdec_tpu.models import llama as M


def _per_engine_cache(fn):
    """Per-INSTANCE memo for jit-builder methods.

    functools.lru_cache on a method keys `self` in a CLASS-level cache,
    pinning the whole engine — params plus quantized draft copies, multi-GB
    at 8B scale — for process lifetime even after the driver drops it (the
    CLAUDE.md driver-held-refs hazard).  This cache lives in the instance's
    __dict__ and dies with the engine."""
    import functools as _ft

    attr = "_cache_" + fn.__name__

    @_ft.wraps(fn)
    def wrapper(self, *args, **kw):
        key = args + tuple(sorted(kw.items()))
        cache = self.__dict__.setdefault(attr, {})
        if key not in cache:
            cache[key] = fn(self, *args, **kw)
        return cache[key]

    return wrapper


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def kv_quant_bits(kv_quant) -> int:
    """EngineConfig.kv_quant -> bits (0 = dense cache_dtype cache)."""
    if not kv_quant:
        return 0
    if kv_quant is True or kv_quant == "int8":
        return 8
    if kv_quant == "int4":
        return 4
    raise ValueError(f"kv_quant must be False/True/'int8'/'int4', got {kv_quant!r}")


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    mode: str = "streamingllm"         # "streamingllm" | "snapkv"
    gamma: int = 3
    draft_budget: int = 257            # reference constraint: budget % 128 == 1
    max_seq_len: int = 2048
    chunk_size: int = 128              # draft-eviction granularity (reference)
    prefill_chunk_size: int = 0        # target prefill chunk (0 = chunk_size);
                                       # larger chunks feed the MXU better
    window_size: int = 32              # snapkv observation window
    sink_size: int = 16                # streamingllm attention sink
    kernel_size: int = 5               # snapkv pooling kernel
    pooling: str = "avgpool"
    max_gen: int = 80                  # reference stop rule: selfspec:193
    eot_ids: Tuple[int, ...] = (-1,)
    cache_dtype: Any = jnp.bfloat16
    attn_backend: str = "jnp"          # "jnp" | "flash" (Pallas TPU kernels)
    kv_quant: Any = False              # quantized target KV cache with
                                       # per-(token, head) scales: False,
                                       # True/"int8" (half the decode HBM
                                       # traffic — the long-context
                                       # bottleneck), or "int4" (quarter,
                                       # adjacent-head nibble packing —
                                       # ops.kv_cache.pack_int4_heads;
                                       # requires an even kv-head count).
                                       # Draft cache stays in cache_dtype.
    kv_scale_dtype: Any = jnp.float32  # dtype of the quantized cache's
                                       # per-(token, head) scale arrays; bf16
                                       # halves scale memory/traffic (~12% of
                                       # an int4 cache) at ~0.4% relative
                                       # scale rounding — spec==AR parity is
                                       # unaffected (both paths read the same
                                       # stored scale)
    draft_quant_head: bool = True      # False: the quantized draft copy
                                       # SHARES the target's bf16 lm_head
                                       # buffer (no copy) — saves ~0.5 GB on
                                       # a 1B model at ~0.3 ms/draft step,
                                       # the difference between fitting and
                                       # crashing at 32k context
    draft_quant: Any = False           # quantize the *draft pass's* weights
                                       # (False | "int8" | "int4").  Draft
                                       # decode at large batch is weight-HBM
                                       # bound (the compressed cache is tiny),
                                       # so an int8 draft copy nearly halves
                                       # the per-draft-step time while the
                                       # output stays EXACTLY the target's
                                       # (greedy parity / coupled-Gumbel
                                       # exactness only depend on the verify
                                       # pass, which keeps full precision —
                                       # draft quality only moves acceptance).
                                       # Self-spec: drafts with a quantized
                                       # copy of the target weights; longspec:
                                       # quantizes the standalone draft.
    fuse_exec: bool = True             # meshless engines: concat wq|wk|wv and
                                       # w1|w3 into single dots at init
                                       # (models.llama.fuse_exec_params;
                                       # bit-identical, fewer small kernels)
    prefill_max_call_tokens: int = 8192  # > 0: split prefill across multiple
                                       # device calls of at most this many
                                       # tokens each (donated cache state, so
                                       # no copies).  The monolithic
                                       # one-program encode hard-crashes the
                                       # remote TPU worker when a single
                                       # call's EXECUTION runs too long
                                       # (measured: 32k ctx at B=32 — a 64
                                       # x 512-chunk scan, minutes of device
                                       # time — dies; the identical work as
                                       # 8-chunk calls passes).  Only
                                       # activates for meshless streamingllm
                                       # self-spec with prefix > this value
                                       # (and any baseline encode); 0 forces
                                       # the single-program encode.
    page_size: int = 2048              # paged serving (PagedServingEngine)
                                       # page rows.  TPU-native paging wants
                                       # BIG pages: the page is the decode
                                       # kernel's KV block, and small blocks
                                       # leave it MXU-latency-bound
                                       # (ops/attention._pick_block_s);
                                       # fragmentation at 2048 rows is cheap
                                       # next to bandwidth.
    temperature: float = 0.0           # > 0 enables Gumbel-coupled sampling:
                                       # every committed token is an EXACT
                                       # categorical sample from the (top-p
                                       # filtered) target distribution, and the
                                       # spec output stream is token-identical
                                       # to baseline sampling with the same rng
                                       # (ops/sampling.py coupled_gumbel). The
                                       # reference only ever decodes greedily
                                       # (SURVEY.md §2.2).
    top_p: float = 1.0


class SpecEngine:
    """Self-speculation engine (one weight set, two caches).

    ``params``/``cfg`` follow magicdec_tpu.models.llama.  All jitted callables
    are cached per input shape.
    """

    ALLOWED_MODES = ("streamingllm", "snapkv")
    _SELF_SPEC = True  # LongSpecEngine overrides: draft_quant targets the
                       # standalone draft weights there, not a target copy

    def __init__(self, params, cfg: ModelConfig, ecfg: EngineConfig, mesh=None):
        if mesh is None and ecfg.fuse_exec:
            # one QKV dot + one gate/up dot per layer (separate tensors exist
            # for GSPMD head sharding, which meshless engines don't need)
            params = M.fuse_exec_params(params, cfg)
        if mesh is not None:
            # non-divisible kv-head counts pad to the mesh (zero heads whose
            # contribution is exactly +0.0 — single-device outputs preserved
            # bit-for-bit; reference behavior: Engine/tp.py:36-52 uneven
            # round-robin split).  Before draft_quant: quantizing the padded
            # zeros is well-defined for every scheme, padding a group-wise
            # quantized weight is not.
            from magicdec_tpu.parallel import sharding as S
            params, cfg = S.pad_heads_for_tp(params, cfg, mesh,
                                             S.model_axes_of(mesh))
        self.params = params
        self.cfg = cfg
        self.ecfg = ecfg
        if ecfg.mode not in self.ALLOWED_MODES:
            raise ValueError(ecfg.mode)
        if (ecfg.mode == "streamingllm"
                and ecfg.draft_budget - ecfg.sink_size < ecfg.chunk_size):
            raise ValueError(
                f"streamingllm eviction needs draft_budget - sink_size >= "
                f"chunk_size (got {ecfg.draft_budget} - {ecfg.sink_size} < "
                f"{ecfg.chunk_size}); the reference uses budget = 128k+1")
        # rounded so the draft cache length tiles for the flash kernels
        # (budget is 128k+1 per the reference contract, hence not a multiple)
        self._draft_cap = _round_up(
            ecfg.draft_budget + ecfg.max_gen + ecfg.gamma + 2, 128)
        self._out_cap = ecfg.max_gen + ecfg.gamma + 2
        self._eot = jnp.asarray(ecfg.eot_ids, dtype=jnp.int32)
        self._dq_params = None
        if ecfg.draft_quant and self._SELF_SPEC:
            from magicdec_tpu import quantization as Q
            if mesh is not None and Q._MATMUL_BACKEND != "jnp":
                raise NotImplementedError(
                    "draft_quant under a mesh requires the jnp quant-matmul "
                    "backend (set_matmul_backend('jnp')): GSPMD partitions "
                    "the fused dequant-dot like a dense one, but the pallas "
                    "kernel is an opaque custom call")
            self._dq_params = Q.quantize_params(
                params, bits=kv_quant_bits(ecfg.draft_quant),
                include_head=ecfg.draft_quant_head,
                materialize_tied_head=ecfg.draft_quant_head)
            if mesh is not None:
                from magicdec_tpu.parallel import sharding as S
                self._dq_params = S.shard_quant_params(
                    self._dq_params, cfg, mesh, S.model_axes_of(mesh))
        self.mesh = mesh
        self._spec_shardings = None
        self._baseline_shardings = None
        # the backend threaded to target/draft forward passes: the plain
        # string on one device, a FlashShard (shard_map-wrapped kernels,
        # ops/shard.py) per cache sharding under a mesh
        self._backend_t = ecfg.attn_backend
        self._backend_d = ecfg.attn_backend
        if mesh is not None:
            from magicdec_tpu.parallel import sharding as S
            axes = S.model_axes_of(mesh)
            daxes = self._draft_model_axes(mesh)
            S.validate_mesh(cfg, mesh, axes)
            if kv_quant_bits(ecfg.kv_quant) == 4:
                model = 1
                for a in axes:
                    model *= mesh.shape[a]
                if (cfg.n_kv_head // model) % 2:
                    raise ValueError(
                        "kv_quant='int4' packs adjacent kv-head pairs: each "
                        f"model shard needs an even local head count, got "
                        f"{cfg.n_kv_head} heads / {model} shards")
            if ecfg.attn_backend == "flash":
                from magicdec_tpu.ops.shard import FlashShard
                self._backend_t = FlashShard(mesh, tuple(axes))
                self._backend_d = FlashShard(mesh, tuple(daxes))
            self.params = S.shard_params(params, cfg, mesh, axes)
            sampled = ecfg.temperature > 0
            self._spec_shardings = S._to_shardings(
                S.spec_state_pspecs(axes, daxes, kv_quant=ecfg.kv_quant,
                                    sampled=sampled), mesh)
            self._baseline_shardings = S._to_shardings(
                S.baseline_state_pspecs(axes, kv_quant=ecfg.kv_quant,
                                        sampled=sampled), mesh)
            self._cache_sharding = jax.sharding.NamedSharding(mesh, S.cache_pspec(axes))
            self._draft_cache_sharding = jax.sharding.NamedSharding(
                mesh, S.cache_pspec(daxes))
            self._scale_sharding = jax.sharding.NamedSharding(
                mesh, S.scale_pspec(axes))

    # ------------------------------------------------------------------
    # allocation
    # ------------------------------------------------------------------

    def _cache_shape(self, B: int, S: int, cfg=None):
        # [L, B, S, Hkv*hd]: head axis folded minor so hd=64 models tile
        # without 2x lane padding (ops/kv_cache.py)
        c = cfg or self.cfg
        return (c.n_layer, B, S, c.n_kv_head * c.head_dim)

    def _draft_cfg(self):
        return self.cfg

    def _draft_model_axes(self, mesh):
        """Self-spec shares the target's weights, hence its sharding."""
        from magicdec_tpu.parallel import sharding as S
        return S.model_axes_of(mesh)

    def _zero_target_caches(self, B: int) -> dict:
        """Target cache dict: {'k','v'} bf16, plus {'ks','vs'} scale arrays
        when kv_quant (int8 data — or int4 head-pair-packed into half the
        lanes — with f32 per-(token, head) scales)."""
        e, cfg = self.ecfg, self.cfg
        bits = kv_quant_bits(e.kv_quant)
        shape = self._cache_shape(B, e.max_seq_len)
        if bits == 4:
            if cfg.n_kv_head % 2:
                raise ValueError(
                    f"kv_quant='int4' packs adjacent kv-head pairs and needs "
                    f"an even kv-head count, got {cfg.n_kv_head}")
            shape = shape[:-1] + (shape[-1] // 2,)
        dt = jnp.int8 if bits else e.cache_dtype
        k = jnp.zeros(shape, dt)
        caches = {"k": k, "v": jnp.zeros_like(k)}
        if e.kv_quant:
            s = jnp.zeros((cfg.n_layer, B, cfg.n_kv_head, e.max_seq_len),
                          e.kv_scale_dtype)
            caches.update(ks=s, vs=jnp.zeros_like(s))
        if self.mesh is not None:
            caches["k"] = jax.lax.with_sharding_constraint(caches["k"], self._cache_sharding)
            caches["v"] = jax.lax.with_sharding_constraint(caches["v"], self._cache_sharding)
            if e.kv_quant:
                caches["ks"] = jax.lax.with_sharding_constraint(caches["ks"], self._scale_sharding)
                caches["vs"] = jax.lax.with_sharding_constraint(caches["vs"], self._scale_sharding)
        return caches

    def _zero_caches(self, B: int):
        """(target cache dict, draft cache dict)."""
        e, dt = self.ecfg, self.ecfg.cache_dtype
        dk = jnp.zeros(self._cache_shape(B, self._draft_cap, self._draft_cfg()), dt)
        dv = jnp.zeros_like(dk)
        if self.mesh is not None:
            dk = jax.lax.with_sharding_constraint(dk, self._draft_cache_sharding)
            dv = jax.lax.with_sharding_constraint(dv, self._draft_cache_sharding)
        return self._zero_target_caches(B), {"dk": dk, "dv": dv}

    @staticmethod
    def _state_tcaches(st) -> dict:
        """The target-cache dict carried in a state pytree."""
        c = {"k": st.k, "v": st.v}
        if st.ks is not None:
            c.update(ks=st.ks, vs=st.vs)
        if getattr(st, "table", None) is not None:  # paged serving pools
            c["table"] = st.table
        return c

    def _hinted(self, B: int) -> ModelConfig:
        """TARGET cfg with the decode-rows execution hint (ModelConfig
        .decode_rows = B * (gamma + 1), the max rows any decode/verify/
        baseline pass sees): row-resident Pallas matmul kernels route on
        this instead of the live M, so the baseline pass (M = B) and the
        verify pass (M = B * (gamma + 1)) take identical kernels per row —
        the greedy spec == AR golden contract (ADVICE r4).  Draft passes
        keep the unhinted cfg (live-M routing; draft numerics only steer
        acceptance).  Meshless only: under a mesh the pallas kernels are
        opaque custom calls GSPMD cannot partition, so mesh engines keep
        jnp dots everywhere."""
        if self.mesh is not None:
            return self.cfg
        return dataclasses.replace(self.cfg,
                                   decode_rows=B * (self.ecfg.gamma + 1))

    # ------------------------------------------------------------------
    # sampling (Gumbel-coupled; EngineConfig.temperature > 0)
    # ------------------------------------------------------------------

    def _sampling_args(self, B: int, rng, salt):
        """Normalize encode()'s sampling arguments; (None, None) when greedy."""
        if self.ecfg.temperature <= 0:
            return None, None
        if rng is None:
            raise ValueError("EngineConfig.temperature > 0 requires an rng "
                             "key: encode(input_ids, rng=jax.random.PRNGKey(s))")
        salt = (jnp.arange(B, dtype=jnp.int32) if salt is None
                else jnp.asarray(salt, jnp.int32))
        # copy the key: it rides the state pytree through donated jits (jit
        # passes unmodified inputs through, so without the copy the caller's
        # own key buffer would be donated and deleted).
        return jnp.array(rng), salt

    def _sample_spec(self, st, idx):
        """head_sample spec for candidate tokens at output-stream rows `idx`
        [B, T] of state `st`; None in greedy mode (argmax head)."""
        e = self.ecfg
        if e.temperature <= 0:
            return None
        return {"key": st.rng, "salt": st.salt, "idx": idx,
                "temperature": e.temperature, "top_p": e.top_p}

    def _head_token(self, params, x_last, rng, salt):
        """Prefill's first generated token from the last hidden state [B, D]:
        greedy argmax, or the stream-slot-0 coupled-Gumbel sample."""
        B = x_last.shape[0]
        cfg = self._hinted(B)  # token0 must match the verify/baseline heads
        if self.ecfg.temperature <= 0:
            return M.head_argmax(params, cfg, x_last[:, None])[:, 0]
        spec = {"key": rng, "salt": salt,
                "idx": jnp.zeros((B, 1), jnp.int32),
                "temperature": self.ecfg.temperature, "top_p": self.ecfg.top_p}
        return M.head_sample(params, cfg, x_last[:, None], spec)[:, 0]

    # ------------------------------------------------------------------
    # prefill (encode)
    # ------------------------------------------------------------------

    def encode(self, input_ids: jnp.ndarray, rng=None, salt=None) -> SpecState:
        """Prefill both caches from [B, prefix] prompts; returns ready state.

        rng/salt only apply under sampling (EngineConfig.temperature > 0):
        rng is the stream PRNG key, salt [B] the per-request noise-stream
        identity (defaults to arange(B); serving passes request ids)."""
        B, prefix = input_ids.shape
        rng, salt = self._sampling_args(B, rng, salt)
        part = self._split_part_size(prefix)
        if part is not None:
            return self._encode_split(jnp.asarray(input_ids, jnp.int32),
                                      rng, salt, part)
        fn = self._encode_fn(B, prefix)
        return fn(self.params, self._draft_arg(),
                  jnp.asarray(input_ids, jnp.int32), rng, salt)

    def _split_part_size(self, prefix: int):
        """Tokens per device call for split prefill, or None for the
        monolithic single-program encode.  Split applies when
        EngineConfig.prefill_max_call_tokens > 0 and the engine is meshless
        (a single device call whose EXECUTION runs for minutes hard-crashes
        the remote TPU worker — round-3 root cause; the bounded-call
        discipline is mode-agnostic since round 5):

        - streamingllm self-spec: the prefix divides into equal parts that
          are multiples of both chunk sizes (bench shapes always do);
        - snapkv self-spec: the PRE-WINDOW prefix (prefix - window_size)
          splits into Cp-multiple parts; the observation-window chunk stays
          in the bounded tail call (_snapkv_window_fn + per-layer
          compression calls).
        LongSpecEngine overrides with the standalone-draft variants."""
        e = self.ecfg
        if (not e.prefill_max_call_tokens or self.mesh is not None
                or not self._SELF_SPEC):
            return None
        C = e.chunk_size
        Cp = e.prefill_chunk_size or C
        if e.mode == "snapkv":
            pre = prefix - e.window_size
            part = (e.prefill_max_call_tokens // Cp) * Cp
            if part <= 0 or pre <= part or pre % Cp != 0:
                return None
            return part
        if e.mode != "streamingllm":
            return None
        import math
        lcm = Cp * C // math.gcd(Cp, C)
        part = (e.prefill_max_call_tokens // lcm) * lcm
        if part <= 0 or prefix % lcm != 0 or prefix <= part:
            return None
        return part

    def _draft_arg(self):
        """The draft pass's weights, passed as an explicit jit ARGUMENT
        everywhere (None = draft shares the target's traced params).  Closing
        over a separate weight pytree instead would bake it into the program
        as multi-GB constants — re-uploaded per compile and over the remote
        compiler's request-size limit (HTTP 413)."""
        return self._dq_params

    @_per_engine_cache
    def _encode_fn(self, B: int, prefix: int):
        e, cfg = self.ecfg, self.cfg
        C = e.chunk_size
        Cp = e.prefill_chunk_size or e.chunk_size
        assert prefix + e.max_gen + e.gamma + 2 <= e.max_seq_len, \
            "max_seq_len too small for prefix + generation"

        def target_prefill(params, tokens, caches):
            """Chunked target prefill over tokens [B, P]; returns
            (caches, lens, last hidden state [B, D])."""
            P = tokens.shape[1]
            n_full, rem = P // Cp, P % Cp
            lens = jnp.zeros((B,), jnp.int32)
            x_last = None
            if n_full:
                xs = jnp.moveaxis(tokens[:, :n_full * Cp].reshape(B, n_full, Cp), 1, 0)

                def body(carry, chunk):
                    caches, lens = carry
                    x, caches = M.forward_target(params, cfg, chunk, lens, caches,
                                                 head="none",
                                                 backend=self._backend_t)
                    return (caches, lens + Cp), x[:, -1]

                (caches, lens), last_hidden = jax.lax.scan(body, (caches, lens), xs)
                x_last = last_hidden[-1]
            if rem:
                x, caches = M.forward_target(params, cfg, tokens[:, n_full * Cp:],
                                             lens, caches, head="none",
                                             backend=self._backend_t)
                lens = lens + rem
                x_last = x[:, -1]
            return caches, lens, x_last

        if e.mode == "snapkv":
            # reference constraint: last chunk is exactly the observation
            # window (tests/SnapKV/selfspec_benchmark.py:37-40)
            assert prefix % C == e.window_size % C and prefix >= e.window_size, \
                f"snapkv prefill requires prefix ≡ window (mod {C})"

            def encode(params, dparams, tokens, rng, salt):
                tcaches, dcaches = self._zero_caches(B)
                caches, lens, _ = target_prefill(params, tokens[:, :-e.window_size],
                                                 tcaches)
                caches = {**caches, **dcaches}
                x, caches = M.forward_prefill_snapkv_last(
                    params, cfg, tokens[:, prefix - e.window_size:], lens, caches,
                    ctx_len=prefix, window=e.window_size, budget=e.draft_budget,
                    kernel_size=e.kernel_size, pooling=e.pooling,
                    backend=self._backend_t, head="none")
                lens = lens + e.window_size
                token0 = self._head_token(params, x[:, -1], rng, salt)
                return self._fresh_state(caches, lens, token0,
                                         draft_fill=jnp.full((B,), e.draft_budget, jnp.int32),
                                         draft_pos=lens, rng=rng, salt=salt)
        else:
            def encode(params, dparams, tokens, rng, salt):
                tcaches, dcaches = self._zero_caches(B)
                caches, lens, x_last = target_prefill(params, tokens, tcaches)
                token0 = self._head_token(params, x_last, rng, salt)

                # second pass: draft prefill with sink+window eviction, run
                # with the *draft* weights (== target, or the quantized copy
                # under draft_quant, so decode queries match prefilled keys)
                dparams = params if dparams is None else dparams
                dcfg = self._draft_cfg()
                n_full = prefix // C
                rem = prefix - n_full * C
                fill = jnp.zeros((), jnp.int32)
                if n_full:
                    xs = jnp.moveaxis(tokens[:, :n_full * C].reshape(B, n_full, C), 1, 0)

                    def body(carry, chunk):
                        dcaches, fill = carry
                        _, dcaches = M.forward_streaming_draft_chunk(
                            dparams, dcfg, chunk, fill, dcaches,
                            budget=e.draft_budget, sink=e.sink_size)
                        return (dcaches, jnp.minimum(fill + C, e.draft_budget)), None

                    (dcaches, fill), _ = jax.lax.scan(body, (dcaches, fill), xs)
                if rem:
                    _, dcaches = M.forward_streaming_draft_chunk(
                        dparams, dcfg, tokens[:, n_full * C:], fill, dcaches,
                        budget=e.draft_budget, sink=e.sink_size)
                    fill = jnp.minimum(fill + rem, e.draft_budget)
                dcaches = M.streaming_finalize_draft(dcfg, dcaches, budget=e.draft_budget)
                draft_fill = jnp.broadcast_to(jnp.minimum(fill, e.draft_budget), (B,))
                caches = {**caches, **dcaches}
                return self._fresh_state(caches, lens, token0,
                                         draft_fill=draft_fill.astype(jnp.int32),
                                         draft_pos=draft_fill.astype(jnp.int32),
                                         rng=rng, salt=salt)

        return jax.jit(encode, out_shardings=self._spec_shardings)

    def _fresh_state(self, caches, lens, token0, *, draft_fill, draft_pos,
                     rng=None, salt=None) -> SpecState:
        B = lens.shape[0]
        e = self.ecfg
        output = jnp.zeros((B, self._out_cap), jnp.int32)
        db_tokens = jnp.stack([token0, jnp.zeros_like(token0)], axis=1)
        return SpecState(
            ks=caches.get("ks"), vs=caches.get("vs"),
            k=caches["k"], v=caches["v"], target_lens=lens,
            dk=caches["dk"], dv=caches["dv"],
            draft_fill=draft_fill, draft_pos=draft_pos,
            token0=token0, output=output,
            num_committed=jnp.zeros((B,), jnp.int32),
            target_steps=jnp.zeros((), jnp.int32),
            done=jnp.zeros((), bool),
            db_tokens=db_tokens,
            db_update=jnp.ones((B,), jnp.int32),
            rng=rng, salt=salt,
        )

    # ------------------------------------------------------------------
    # split prefill: several donated device calls instead of one program
    # (EngineConfig.prefill_max_call_tokens — a single call whose execution
    # runs for minutes hard-crashes the remote worker; measured at 32k/B=32)
    # ------------------------------------------------------------------

    def _encode_split(self, tokens, rng, salt, part: int) -> SpecState:
        B, prefix = tokens.shape
        e = self.ecfg
        # same capacity contract as _encode_fn: without it an over-capacity
        # prefix would silently clamp-truncate appends at the cache end
        assert prefix + e.max_gen + e.gamma + 2 <= e.max_seq_len, \
            "max_seq_len too small for prefix + generation"
        if e.mode == "snapkv":
            return self._encode_split_snapkv(tokens, rng, salt, part)
        tcaches, dcaches = self._zero_caches(B)
        quant = tcaches.get("ks") is not None
        state = [tcaches["k"], tcaches["v"]]
        if quant:
            state += [tcaches["ks"], tcaches["vs"]]
        state += [dcaches["dk"], dcaches["dv"],
                  jnp.zeros((B,), jnp.int32),                 # lens
                  jnp.zeros((), jnp.int32),                   # draft fill
                  jnp.zeros((B, self.cfg.dim),
                            self.params["final_norm"].dtype)]  # x_last
        n_parts, rem = divmod(prefix, part)
        fn = self._prefill_part_fn(B, part)
        for i in range(n_parts):
            state = list(fn(self.params, self._draft_arg(),
                            tokens[:, i * part:(i + 1) * part], *state))
        if rem:
            state = list(self._prefill_part_fn(B, rem)(
                self.params, self._draft_arg(), tokens[:, n_parts * part:],
                *state))
        return self._encode_tail_fn(B)(self.params, rng, salt, *state)

    @_per_engine_cache
    def _prefill_part_fn(self, B: int, T: int):
        """One split-prefill device call: target scan over T//Cp chunks +
        streaming-draft scan over T//C chunks, cache state donated."""
        e, cfg = self.ecfg, self.cfg
        C = e.chunk_size
        Cp = e.prefill_chunk_size or C
        assert T % Cp == 0 and T % C == 0, (T, Cp, C)
        quant = bool(e.kv_quant)

        def part(params, dparams, toks, *state):
            if quant:
                k, v, ks, vs, dk, dv, lens, fill, x_last = state
                caches = {"k": k, "v": v, "ks": ks, "vs": vs}
            else:
                k, v, dk, dv, lens, fill, x_last = state
                caches = {"k": k, "v": v}
            xs = jnp.moveaxis(toks.reshape(B, T // Cp, Cp), 1, 0)

            def tbody(carry, chunk):
                caches, lens = carry
                x, caches = M.forward_target(params, cfg, chunk, lens, caches,
                                             head="none",
                                             backend=self._backend_t)
                return (caches, lens + Cp), x[:, -1]

            (caches, lens), last_h = jax.lax.scan(tbody, (caches, lens), xs)
            x_last = last_h[-1]

            dparams2 = params if dparams is None else dparams
            dcfg = self._draft_cfg()
            dcaches = {"dk": dk, "dv": dv}
            xsd = jnp.moveaxis(toks.reshape(B, T // C, C), 1, 0)

            def dbody(carry, chunk):
                dcaches, fill = carry
                _, dcaches = M.forward_streaming_draft_chunk(
                    dparams2, dcfg, chunk, fill, dcaches,
                    budget=e.draft_budget, sink=e.sink_size)
                return (dcaches, jnp.minimum(fill + C, e.draft_budget)), None

            (dcaches, fill), _ = jax.lax.scan(dbody, (dcaches, fill), xsd)
            out = [caches["k"], caches["v"]]
            if quant:
                out += [caches["ks"], caches["vs"]]
            out += [dcaches["dk"], dcaches["dv"], lens, fill, x_last]
            return tuple(out)

        n_cache = 6 if quant else 4
        return jax.jit(part, donate_argnums=tuple(range(3, 3 + n_cache)))

    @_per_engine_cache
    def _encode_tail_fn(self, B: int):
        """head token + draft-cache finalize + fresh SpecState (split encode)."""
        e = self.ecfg
        quant = bool(e.kv_quant)

        def tail(params, rng, salt, *state):
            if quant:
                k, v, ks, vs, dk, dv, lens, fill, x_last = state
                caches = {"k": k, "v": v, "ks": ks, "vs": vs}
            else:
                k, v, dk, dv, lens, fill, x_last = state
                caches = {"k": k, "v": v}
            token0 = self._head_token(params, x_last, rng, salt)
            dcaches = M.streaming_finalize_draft(self._draft_cfg(),
                                                 {"dk": dk, "dv": dv},
                                                 budget=e.draft_budget)
            draft_fill = jnp.broadcast_to(jnp.minimum(fill, e.draft_budget),
                                          (B,)).astype(jnp.int32)
            caches = {**caches, **dcaches}
            return self._fresh_state(caches, lens, token0,
                                     draft_fill=draft_fill,
                                     draft_pos=draft_fill, rng=rng, salt=salt)

        n_cache = 6 if quant else 4
        return jax.jit(tail, donate_argnums=tuple(range(3, 3 + n_cache)))

    def _encode_split_snapkv(self, tokens, rng, salt, part: int) -> SpecState:
        """Split snapkv self-spec prefill: the pre-window prefix runs as
        bounded donated target-prefill calls (_baseline_part_fn — identical
        chunk boundaries to the monolithic encode); the observation-window
        chunk + head ride one bounded tail call that COLLECTS the per-layer
        window queries; the draft-KV compression then runs as per-layer
        bounded calls (at 32k/B=32 the compress score traffic is ~14 GB per
        layer — all layers in one call executes for minutes and hard-crashes
        the remote worker, the round-3 per-call limit)."""
        B, prefix = tokens.shape
        e = self.ecfg
        caches = self._zero_target_caches(B)
        quant = caches.get("ks") is not None
        state = [caches["k"], caches["v"]]
        if quant:
            state += [caches["ks"], caches["vs"]]
        state += [jnp.zeros((B,), jnp.int32),
                  jnp.zeros((B, self.cfg.dim), self.params["final_norm"].dtype)]
        pre = prefix - e.window_size
        n_parts, rem = divmod(pre, part)
        fn = self._baseline_part_fn(B, part)
        for i in range(n_parts):
            state = list(fn(self.params, tokens[:, i * part:(i + 1) * part],
                            *state))
        if rem:
            state = list(self._baseline_part_fn(B, rem)(
                self.params, tokens[:, n_parts * part:pre], *state))
        st, qs = self._snapkv_window_fn(B, prefix)(
            self.params, tokens[:, pre:], rng, salt, *state)
        return self._snapkv_compress_split(st, qs, prefix, self.cfg,
                                           quant=quant)

    def _snapkv_compress_split(self, st, qs, prefix: int, mcfg,
                               *, quant: bool, caches=None) -> SpecState:
        """Per-layer bounded compression calls over the appended cache (see
        _encode_split_snapkv), filling st.dk/st.dv slots [0, budget)."""
        comp = self._snapkv_layer_compress_fn(
            st.token0.shape[0], prefix, mcfg, quant)
        src = caches if caches is not None else self._state_tcaches(st)
        dks, dvs = [], []
        L = mcfg.n_layer
        for l in range(L):
            args = [qs[l], src["k"][l], src["v"][l]]
            args += [src["ks"][l], src["vs"][l]] if quant else [None, None]
            dk_l, dv_l = comp(*args)
            dks.append(dk_l)
            dvs.append(dv_l)
        dk_new = jnp.stack(dks)
        dv_new = jnp.stack(dvs)
        fill = self._snapkv_fill_draft_fn()
        dk, dv = fill(st.dk, st.dv, dk_new, dv_new)
        return st.replace(dk=dk, dv=dv)

    @_per_engine_cache
    def _snapkv_window_fn(self, B: int, prefix: int):
        """Observation-window chunk (target forward + append + per-layer
        window-query collection) + head token + fresh SpecState with
        still-empty draft slots — the bounded tail of the split snapkv
        encode (compression follows per layer)."""
        e, cfg = self.ecfg, self.cfg
        quant = bool(e.kv_quant)

        def tail(params, wtoks, rng, salt, *state):
            if quant:
                k, v, ks, vs, lens, _x_last = state
                caches = {"k": k, "v": v, "ks": ks, "vs": vs}
            else:
                k, v, lens, _x_last = state
                caches = {"k": k, "v": v}
            x, caches, qs = M.forward_prefill_snapkv_window(
                params, cfg, wtoks, lens, caches, backend=self._backend_t)
            dt = e.cache_dtype
            dk = jnp.zeros(self._cache_shape(B, self._draft_cap,
                                             self._draft_cfg()), dt)
            caches = {**caches, "dk": dk, "dv": jnp.zeros_like(dk)}
            lens = lens + e.window_size
            token0 = self._head_token(params, x[:, -1], rng, salt)
            st = self._fresh_state(
                caches, lens, token0,
                draft_fill=jnp.full((B,), e.draft_budget, jnp.int32),
                draft_pos=lens, rng=rng, salt=salt)
            return st, qs

        n_cache = 4 if quant else 2
        return jax.jit(tail, donate_argnums=tuple(range(4, 4 + n_cache)))

    @_per_engine_cache
    def _snapkv_layer_compress_fn(self, B: int, prefix: int, mcfg,
                                  quant: bool):
        """ONE layer's snapkv compression as its own jitted call (reused for
        every layer — identical shapes).  q_l [B, W, Hq*hd]; kc/vc the
        layer's cache slice (quantized or dense); returns the layer's
        (dk, dv) [B, budget, Kc] draft rows."""
        from magicdec_tpu.ops.snapkv import snapkv_compress

        e = self.ecfg
        dt = e.cache_dtype

        def comp(q_l, kc, vc, ks, vs):
            q = q_l.reshape(B, e.window_size, mcfg.n_head, mcfg.head_dim)
            dk, dv = snapkv_compress(
                q, kc, vc, ctx_len=prefix, window=e.window_size,
                budget=e.draft_budget, kernel_size=e.kernel_size,
                pooling=e.pooling, k_scale=ks, v_scale=vs)
            return (dk.reshape(B, e.draft_budget, -1).astype(dt),
                    dv.reshape(B, e.draft_budget, -1).astype(dt))

        return jax.jit(comp)

    @_per_engine_cache
    def _snapkv_fill_draft_fn(self):
        budget = self.ecfg.draft_budget

        def fill(dk, dv, dk_new, dv_new):
            return (dk.at[:, :, :budget].set(dk_new),
                    dv.at[:, :, :budget].set(dv_new))

        return jax.jit(fill, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    # speculative generation (one jitted while_loop)
    # ------------------------------------------------------------------

    def generate(self, state: SpecState) -> Tuple[SpecState, Dict[str, Any]]:
        fn = self._generate_fn(state.token0.shape[0])
        state = fn(self.params, self._draft_arg(), state)
        stats = {
            "output": state.output,
            "num_committed": state.num_committed,
            "gen_tokens": state.num_committed - 1,  # reference metric excludes
                                                    # the prefill-produced token
            "target_steps": state.target_steps,
        }
        return state, stats

    def _window(self):
        """The speculation-window step for this engine's draft-cache mode."""
        return (self._window_snapkv if self.ecfg.mode == "snapkv"
                else self._window_streaming)

    @_per_engine_cache
    def _generate_fn(self, B: int):
        e = self.ecfg
        window = self._window()

        def gen(params, dparams, st: SpecState) -> SpecState:
            max_steps = e.max_gen + 1  # every window commits >= 1 token

            def cond(st):
                return (~st.done) & (st.target_steps < max_steps)

            return jax.lax.while_loop(
                cond, functools.partial(window, params, dparams), st)

        return jax.jit(gen, donate_argnums=(2,))

    def _finish_window(self, st: SpecState, tokens_buffer, target_tokens,
                       caches, *, draft_fill, draft_pos, masks=None):
        """Shared acceptance / commit / termination logic.

        Fixed-batch mode (``masks=None``): termination is batch-global like the
        reference stop rule (tests/SnapKV/selfspec_benchmark.py:193); returns
        the new state.  Serving mode (``masks=(active, done_vec)``): acceptance
        and termination are per-request, non-live slots' lengths/carries are
        frozen; returns ``(state, done_vec)``.
        """
        e = self.ecfg
        accept, bonus, eot_accepted = spec_ops.greedy_accept(
            target_tokens, tokens_buffer, self._eot)
        if masks is not None:
            active, done_vec = masks
            live = active & ~done_vec
            accept = jnp.where(live, accept, 0).astype(jnp.int32)
        output = spec_ops.commit_tokens(st.output, st.num_committed,
                                        tokens_buffer, accept)
        committed = st.num_committed + accept
        if masks is None:
            done = (eot_accepted.any()
                    | spec_ops.is_eot(bonus, self._eot).any()
                    | (committed.max() >= e.max_gen))
            output = jnp.where(done, spec_ops.write_at(output, committed, bonus),
                               output)
            committed = committed + done.astype(jnp.int32)
            done_flag = done
        else:
            newly_done = live & (eot_accepted
                                 | spec_ops.is_eot(bonus, self._eot)
                                 | (committed >= e.max_gen))
            output = jnp.where(newly_done[:, None],
                               spec_ops.write_at(output, committed, bonus),
                               output)
            committed = committed + newly_done.astype(jnp.int32)
            done_vec = done_vec | newly_done
            done_flag = jnp.all(done_vec | ~active)

        gamma = e.gamma
        full = accept == gamma + 1
        db_tokens = jnp.stack([
            jnp.where(full, tokens_buffer[:, gamma], bonus),
            jnp.where(full, bonus, jnp.zeros_like(bonus)),
        ], axis=1)
        db_update = jnp.where(full, 2, 1).astype(jnp.int32)
        new_fill, new_pos, token0 = draft_fill(accept), draft_pos(accept), bonus
        if masks is not None:
            new_fill = jnp.where(live, new_fill, st.draft_fill)
            new_pos = jnp.where(live, new_pos, st.draft_pos)
            token0 = jnp.where(live, token0, st.token0)
            db_tokens = jnp.where(live[:, None], db_tokens, st.db_tokens)
            db_update = jnp.where(live, db_update, st.db_update)

        st = st.replace(
            k=caches["k"], v=caches["v"], dk=caches["dk"], dv=caches["dv"],
            ks=caches.get("ks"), vs=caches.get("vs"),
            target_lens=st.target_lens + accept,
            draft_fill=new_fill, draft_pos=new_pos,
            token0=token0, output=output, num_committed=committed,
            target_steps=st.target_steps + 1, done=done_flag,
            db_tokens=db_tokens, db_update=db_update,
        )
        return st if masks is None else (st, done_vec)

    def _window_snapkv(self, params, dparams, st: SpecState, masks=None):
        """SnapKV self-spec window (reference tests/SnapKV/selfspec:120-211).

        Drafts at *real* rope positions; verify dual-appends the target's KV
        into the draft cache, overwriting the speculated slots."""
        e = self.ecfg
        cfg = self._hinted(st.token0.shape[0])
        dparams = params if dparams is None else dparams
        dcfg = self._draft_cfg()
        f0 = st.draft_fill
        n0 = st.num_committed  # token0 = the candidate for output slot n0

        def draft_body(carry, _):
            dk, dv, fill, pos, tok, sidx = carry
            nxt, dc = M.forward_draft(dparams, dcfg, tok[:, None], fill, pos,
                                      {"dk": dk, "dv": dv},
                                      backend=self._backend_d,
                                      sample=self._sample_spec(st, sidx[:, None]))
            nxt = nxt[:, 0]
            return (dc["dk"], dc["dv"], fill + 1, pos + 1, nxt, sidx + 1), nxt

        (dk, dv, _, _, _, _), drafted = jax.lax.scan(
            draft_body, (st.dk, st.dv, f0, st.draft_pos, st.token0, n0 + 1),
            None, length=e.gamma)
        tokens_buffer = jnp.concatenate(
            [st.token0[:, None], jnp.moveaxis(drafted, 0, 1)], axis=1)

        caches = {**self._state_tcaches(st), "dk": dk, "dv": dv}
        # target_tokens[i] is the candidate for output slot n0 + i + 1
        idx_v = n0[:, None] + 1 + jnp.arange(e.gamma + 1, dtype=jnp.int32)[None]
        target_tokens, caches = M.forward_verify_snapkv(
            params, cfg, tokens_buffer, st.target_lens, f0, caches,
            backend=self._backend_t, sample=self._sample_spec(st, idx_v))

        return self._finish_window(
            st, tokens_buffer, target_tokens, caches,
            draft_fill=lambda acc: f0 + acc,
            draft_pos=lambda acc: st.draft_pos + acc, masks=masks)

    def _draft_model(self, params):
        """(params, cfg) used for draft steps — self-spec shares the target's
        weights (or a quantized copy, EngineConfig.draft_quant);
        LongSpecEngine overrides with the standalone draft."""
        if self._dq_params is not None:
            return self._dq_params, self.cfg
        return params, self.cfg

    def _window_streaming(self, params, dparams, st: SpecState, masks=None):
        """Double-buffer speculation window.

        Used by StreamingLLM self-spec (tests/StreamingLLM/selfspec:121-224)
        and by every standalone-draft (longspec) mode
        (tests/SnapKV/longspec_benchmark.py:157-295): the first draft step
        consumes the 2-token double buffer (bonus + carried last-draft token
        after a fully-accepted window); draft-cache advance is capped at gamma.
        Draft rope positions are draft_fill + delta, where delta = draft_pos -
        draft_fill stays constant across windows (0 for slot-position caches,
        prefix - budget for SnapKV-compressed real-position caches)."""
        e = self.ecfg
        cfg = self._hinted(st.token0.shape[0])
        dparams = params if dparams is None else dparams
        dcfg = self._draft_cfg()
        f0 = st.draft_fill
        delta = st.draft_pos - st.draft_fill
        dcaches = {"dk": st.dk, "dv": st.dv}
        n0 = st.num_committed  # token0 = the candidate for output slot n0

        # db_tokens[j] sits at output slot n0 - db_update + 1 + j (full-accept
        # windows carry [last drafted, bonus], others [bonus, 0]), so nxt2[j]
        # is the candidate for the NEXT slot: n0 + (2 - db_update) + j.  Only
        # the selected row db_update-1 (always slot n0 + 1) is consumed.
        idx2 = (n0 + 2 - st.db_update)[:, None] + jnp.arange(2, dtype=jnp.int32)[None]
        nxt2, dcaches = M.forward_draft(dparams, dcfg, st.db_tokens, f0,
                                        f0 + delta, dcaches,
                                        backend=self._backend_d,
                                        sample=self._sample_spec(st, idx2))
        tok1 = jnp.take_along_axis(nxt2, (st.db_update - 1)[:, None], axis=1)[:, 0]
        fill = f0 + st.db_update

        def draft_body(carry, _):
            dk, dv, fill, tok, sidx = carry
            nxt, dc = M.forward_draft(dparams, dcfg, tok[:, None], fill,
                                      fill + delta, {"dk": dk, "dv": dv},
                                      backend=self._backend_d,
                                      sample=self._sample_spec(st, sidx[:, None]))
            nxt = nxt[:, 0]
            return (dc["dk"], dc["dv"], fill + 1, nxt, sidx + 1), nxt

        (dk, dv, _, _, _), drafted = jax.lax.scan(
            draft_body, (dcaches["dk"], dcaches["dv"], fill, tok1, n0 + 2),
            None, length=e.gamma - 1)
        drafted = jnp.concatenate([tok1[:, None], jnp.moveaxis(drafted, 0, 1)], axis=1)
        tokens_buffer = jnp.concatenate([st.token0[:, None], drafted], axis=1)

        caches = self._state_tcaches(st)
        # target_tokens[i] is the candidate for output slot n0 + i + 1
        idx_v = n0[:, None] + 1 + jnp.arange(e.gamma + 1, dtype=jnp.int32)[None]
        target_tokens, caches = M.forward_target(
            params, cfg, tokens_buffer, st.target_lens, caches,
            backend=self._backend_t, sample=self._sample_spec(st, idx_v))
        caches = {**caches, "dk": dk, "dv": dv}

        gamma = e.gamma
        fill_after = lambda acc: f0 + st.db_update - 1 + jnp.minimum(acc, gamma)
        return self._finish_window(
            st, tokens_buffer, target_tokens, caches,
            draft_fill=fill_after,
            draft_pos=lambda acc: fill_after(acc) + delta, masks=masks)

    # ------------------------------------------------------------------
    # autoregressive baseline (tests/baseline_benchmark.py equivalent)
    # ------------------------------------------------------------------

    def encode_baseline(self, input_ids: jnp.ndarray, rng=None,
                        salt=None) -> BaselineState:
        B, prefix = input_ids.shape
        rng, salt = self._sampling_args(B, rng, salt)
        e = self.ecfg
        C = e.prefill_chunk_size or e.chunk_size
        part = 0
        if e.prefill_max_call_tokens and self.mesh is None:
            part = (e.prefill_max_call_tokens // C) * C
        # ragged prefixes (e.g. snapkv's k*128+window) split too: the final
        # remainder part runs its full chunks + sub-chunk tail inside one
        # bounded call (_baseline_part_fn), same boundaries as monolithic
        if part and prefix > part:
            return self._encode_baseline_split(
                jnp.asarray(input_ids, jnp.int32), rng, salt, part)
        fn = self._encode_baseline_fn(B, prefix)
        return fn(self.params, jnp.asarray(input_ids, jnp.int32), rng, salt)

    def _encode_baseline_split(self, tokens, rng, salt, part: int) -> BaselineState:
        """Split baseline prefill (see _encode_split)."""
        B, prefix = tokens.shape
        e = self.ecfg
        assert prefix + e.max_gen + e.gamma + 2 <= e.max_seq_len, \
            "max_seq_len too small for prefix + generation"
        caches = self._zero_target_caches(B)
        quant = caches.get("ks") is not None
        state = [caches["k"], caches["v"]]
        if quant:
            state += [caches["ks"], caches["vs"]]
        state += [jnp.zeros((B,), jnp.int32),
                  jnp.zeros((B, self.cfg.dim), self.params["final_norm"].dtype)]
        n_parts, rem = divmod(prefix, part)
        fn = self._baseline_part_fn(B, part)
        for i in range(n_parts):
            state = list(fn(self.params, tokens[:, i * part:(i + 1) * part],
                            *state))
        if rem:
            state = list(self._baseline_part_fn(B, rem)(
                self.params, tokens[:, n_parts * part:], *state))
        return self._baseline_tail_fn(B)(self.params, rng, salt, *state)

    @_per_engine_cache
    def _baseline_part_fn(self, B: int, T: int, which: str = "target",
                          quant: Optional[bool] = None):
        """One bounded chunked-prefill device call over T tokens, cache state
        donated: (params, toks, k, v, [ks, vs,] lens, x_last) -> same state.

        The building block of EVERY split prefill (baseline, snapkv
        self-spec pre-window, longspec target AND full/snapkv draft —
        ``which`` = "draft" selects the draft cfg/backend; ``quant``
        overrides the cache-quantization flag, e.g. the longspec draft cache
        is always dense).  T may be ragged: full Cp chunks then one
        remainder forward — the same chunk boundaries the monolithic encode
        produces, so split == monolithic stays bit-exact."""
        e = self.ecfg
        cfg = self.cfg if which == "target" else self._draft_cfg()
        backend = self._backend_t if which == "target" else self._backend_d
        C = e.prefill_chunk_size or e.chunk_size
        if quant is None:
            quant = bool(e.kv_quant)
        n_full, rem = divmod(T, C)

        def part(params, toks, *state):
            if quant:
                k, v, ks, vs, lens, x_last = state
                caches = {"k": k, "v": v, "ks": ks, "vs": vs}
            else:
                k, v, lens, x_last = state
                caches = {"k": k, "v": v}
            if n_full:
                xs = jnp.moveaxis(
                    toks[:, :n_full * C].reshape(B, n_full, C), 1, 0)

                def body(carry, chunk):
                    caches, lens = carry
                    x, caches = M.forward_target(params, cfg, chunk, lens,
                                                 caches, head="none",
                                                 backend=backend)
                    return (caches, lens + C), x[:, -1]

                (caches, lens), last_h = jax.lax.scan(body, (caches, lens), xs)
                x_last = last_h[-1]
            if rem:
                x, caches = M.forward_target(params, cfg, toks[:, n_full * C:],
                                             lens, caches, head="none",
                                             backend=backend)
                lens = lens + rem
                x_last = x[:, -1]
            out = [caches["k"], caches["v"]]
            if quant:
                out += [caches["ks"], caches["vs"]]
            return tuple(out + [lens, x_last])

        n_cache = 4 if quant else 2
        return jax.jit(part, donate_argnums=tuple(range(2, 2 + n_cache)))

    @_per_engine_cache
    def _baseline_tail_fn(self, B: int):
        quant = bool(self.ecfg.kv_quant)

        def tail(params, rng, salt, *state):
            if quant:
                k, v, ks, vs, lens, x_last = state
            else:
                k, v, lens, x_last = state
                ks = vs = None
            token0 = self._head_token(params, x_last, rng, salt)
            output = jnp.zeros((B, self._out_cap), jnp.int32)
            output = spec_ops.write_at(output, jnp.zeros((B,), jnp.int32), token0)
            return BaselineState(ks=ks, vs=vs, k=k, v=v, lens=lens,
                                 token0=token0, output=output,
                                 num_committed=jnp.ones((B,), jnp.int32),
                                 rng=rng, salt=salt)

        n_cache = 4 if quant else 2
        return jax.jit(tail, donate_argnums=tuple(range(3, 3 + n_cache)))

    @_per_engine_cache
    def _encode_baseline_fn(self, B: int, prefix: int):
        e, cfg = self.ecfg, self.cfg
        C = e.prefill_chunk_size or e.chunk_size

        def encode(params, tokens, rng, salt):
            caches = self._zero_target_caches(B)
            n_full, rem = prefix // C, prefix % C
            lens = jnp.zeros((B,), jnp.int32)
            x_last = None
            if n_full:
                xs = jnp.moveaxis(tokens[:, :n_full * C].reshape(B, n_full, C), 1, 0)

                def body(carry, chunk):
                    caches, lens = carry
                    x, caches = M.forward_target(params, cfg, chunk, lens, caches,
                                                 head="none",
                                                 backend=self._backend_t)
                    return (caches, lens + C), x[:, -1]

                (caches, lens), last_h = jax.lax.scan(body, (caches, lens), xs)
                x_last = last_h[-1]
            if rem:
                x, caches = M.forward_target(params, cfg, tokens[:, n_full * C:],
                                             lens, caches, head="none",
                                             backend=self._backend_t)
                lens = lens + rem
                x_last = x[:, -1]
            token0 = self._head_token(params, x_last, rng, salt)
            output = jnp.zeros((B, self._out_cap), jnp.int32)
            output = spec_ops.write_at(output, jnp.zeros((B,), jnp.int32), token0)
            return BaselineState(ks=caches.get("ks"), vs=caches.get("vs"),
                                 k=caches["k"], v=caches["v"], lens=lens,
                                 token0=token0, output=output,
                                 num_committed=jnp.ones((B,), jnp.int32),
                                 rng=rng, salt=salt)

        return jax.jit(encode, out_shardings=self._baseline_shardings)

    def generate_baseline(self, state: BaselineState,
                          max_new: Optional[int] = None) -> Tuple[BaselineState, Dict[str, Any]]:
        max_new = max_new if max_new is not None else self.ecfg.max_gen
        fn = self._generate_baseline_fn(state.token0.shape[0], max_new)
        state = fn(self.params, state)
        return state, {"output": state.output, "num_committed": state.num_committed,
                       "gen_tokens": state.num_committed - 1}

    @_per_engine_cache
    def _generate_baseline_fn(self, B: int, max_new: int):
        # hinted like the spec windows: baseline steps (M = B) must take the
        # same target kernels as verify (M = B * (gamma + 1)) — see _hinted
        cfg = self._hinted(B)

        def gen(params, st: BaselineState) -> BaselineState:
            def body(carry, _):
                caches, lens, tok, out, n = carry
                # the produced token is the candidate for output slot n
                nxt, caches = M.forward_target(params, cfg, tok[:, None], lens,
                                               caches,
                                               backend=self._backend_t,
                                               sample=self._sample_spec(st, n[:, None]))
                nxt = nxt[:, 0]
                out = spec_ops.write_at(out, n, nxt)
                return (caches, lens + 1, nxt, out, n + 1), None

            (caches, lens, tok, out, n), _ = jax.lax.scan(
                body, (self._state_tcaches(st), st.lens, st.token0, st.output,
                       st.num_committed),
                None, length=max_new - 1)
            return BaselineState(ks=caches.get("ks"), vs=caches.get("vs"),
                                 k=caches["k"], v=caches["v"], lens=lens,
                                 token0=tok, output=out, num_committed=n,
                                 rng=st.rng, salt=st.salt)

        return jax.jit(gen, donate_argnums=(1,))


class LongSpecEngine(SpecEngine):
    """Standalone-draft speculation (reference execution mode 3,
    tests/{SnapKV,StreamingLLM}/longspec_benchmark.py): a separate smaller
    draft checkpoint speculates gamma tokens, optionally over a compressed KV
    cache; the target verifies gamma+1 tokens against its full cache.

    ``ecfg.mode`` selects the draft cache:
      - "full":          classic spec decode, draft keeps its entire KV
                         (reference draft_budget == -1, backend_draft.py:15-21)
      - "snapkv":        draft prefills its full cache, compresses it via the
                         observation-window top-k at the last chunk
      - "streamingllm":  draft prefills straight into a sink+window cache
                         (model_draft.py:102-144)
    The decode window is the shared double-buffer path; draft advance is
    capped at gamma and there is no verify-time refresh (longspec:244-256).
    """

    ALLOWED_MODES = ("streamingllm", "snapkv", "full")
    _SELF_SPEC = False

    def __init__(self, params, cfg: ModelConfig, draft_params,
                 draft_cfg: ModelConfig, ecfg: EngineConfig, mesh=None):
        if mesh is None and ecfg.fuse_exec:
            draft_params = M.fuse_exec_params(draft_params, draft_cfg)
        if mesh is not None:
            # standalone draft pads to ITS model axes (the inner sub-mesh
            # under a 3-axis mesh) — see SpecEngine.__init__ / pad_heads_for_tp
            from magicdec_tpu.parallel import sharding as S
            draft_params, draft_cfg = S.pad_heads_for_tp(
                draft_params, draft_cfg, mesh, S.draft_axes_of(mesh))
        self._dq_longspec_pending = False
        if ecfg.draft_quant:
            from magicdec_tpu import quantization as Q
            if mesh is not None and Q._MATMUL_BACKEND != "jnp":
                raise NotImplementedError(
                    "draft_quant under a mesh requires the jnp quant-matmul "
                    "backend (set_matmul_backend('jnp')): GSPMD partitions "
                    "the fused dequant-dot like a dense one, but the pallas "
                    "kernel is an opaque custom call")
            draft_params = Q.quantize_params(
                draft_params, bits=kv_quant_bits(ecfg.draft_quant),
                include_head=ecfg.draft_quant_head,
                materialize_tied_head=ecfg.draft_quant_head)
            self._dq_longspec_pending = mesh is not None
        self.draft_params = draft_params
        self.draft_cfg = draft_cfg
        super().__init__(params, cfg, ecfg, mesh=mesh)
        if ecfg.mode == "full":
            self._draft_cap = ecfg.max_seq_len
        if mesh is not None:
            from magicdec_tpu.parallel import sharding as S
            daxes = S.draft_axes_of(mesh)
            S.validate_mesh(draft_cfg, mesh, daxes)
            shard = (S.shard_quant_params if self._dq_longspec_pending
                     else S.shard_params)
            self.draft_params = shard(self.draft_params, draft_cfg, mesh,
                                      daxes)

    def _draft_cfg(self):
        return self.draft_cfg

    def _draft_model_axes(self, mesh):
        """Standalone draft runs TP over the inner model sub-axis only
        (reference --draft_rank_group, SURVEY.md §2.3 mode 4)."""
        from magicdec_tpu.parallel import sharding as S
        return S.draft_axes_of(mesh)

    # ------------------------------------------------------------------
    # split prefill (bounded donated device calls — the round-3 crash
    # discipline, mode-agnostic since round 5): target parts, then draft
    # parts per draft-cache mode, then one tail call
    # ------------------------------------------------------------------

    def _split_part_size(self, prefix: int):
        e = self.ecfg
        if not e.prefill_max_call_tokens or self.mesh is not None:
            return None
        C = e.chunk_size
        Cp = e.prefill_chunk_size or C
        if e.mode == "streamingllm":
            import math
            lcm = Cp * C // math.gcd(Cp, C)
            part = (e.prefill_max_call_tokens // lcm) * lcm
            if part <= 0 or prefix % lcm != 0 or prefix <= part:
                return None
            return part
        part = (e.prefill_max_call_tokens // Cp) * Cp
        if e.mode == "snapkv":
            # prefix itself is ragged (k*C + window) — the target part
            # loop's ragged remainder call absorbs the window tokens
            pre = prefix - e.window_size
            if part <= 0 or pre <= part or pre % Cp != 0:
                return None
            return part
        # mode == "full": draft prefills the same token stream with Cp chunks
        if part <= 0 or prefix <= part:
            return None
        return part

    def _encode_split(self, tokens, rng, salt, part: int) -> SpecState:
        B, prefix = tokens.shape
        e = self.ecfg
        assert prefix + e.max_gen + e.gamma + 2 <= e.max_seq_len, \
            "max_seq_len too small for prefix + generation"
        dcfg, dt = self.draft_cfg, e.cache_dtype
        C = e.chunk_size
        if e.mode == "snapkv":
            # DRAFT phase FIRST: its temp full cache (bf16, ~ctx rows) is
            # this encode's single biggest buffer — compress and free it
            # BEFORE the target cache exists, or the two coexist and blow
            # the HBM ceiling (measured at 8B+1B 16k/B=8: the monolithic
            # program interleaves the lifetimes, a split must do it by
            # ordering).  Same computations, bit-identical results.
            pre = prefix - e.window_size
            d_xdt0 = self.draft_params["final_norm"].dtype
            fk = jnp.zeros(self._cache_shape(B, _round_up(prefix, C), dcfg),
                           dt)
            dstate = [fk, jnp.zeros_like(fk), jnp.zeros((B,), jnp.int32),
                      jnp.zeros((B, dcfg.dim), d_xdt0)]
            dn, drem = divmod(pre, part)
            dfn = self._baseline_part_fn(B, part, which="draft", quant=False)
            for i in range(dn):
                dstate = list(dfn(self.draft_params,
                                  tokens[:, i * part:(i + 1) * part],
                                  *dstate))
                self._drain(dstate[2])
            if drem:
                dstate = list(self._baseline_part_fn(
                    B, drem, which="draft", quant=False)(
                        self.draft_params, tokens[:, dn * part:pre], *dstate))
            fk, fv, flens = dstate[0], dstate[1], dstate[2]
            dstate = None
            qs, fk, fv = self._longspec_snapkv_window_fn(B)(
                self.draft_params, tokens[:, pre:], flens, fk, fv)
            comp = self._snapkv_layer_compress_fn(B, prefix, dcfg, False)
            dks, dvs = [], []
            for l in range(dcfg.n_layer):
                dk_l, dv_l = comp(qs[l], fk[l], fv[l], None, None)
                dks.append(dk_l)
                dvs.append(dv_l)
            dk_new, dv_new = jnp.stack(dks), jnp.stack(dvs)
            fk = fv = qs = None  # free the temp cache before target phase
            # DRAIN the draft phase before the target phase allocates: jax
            # dispatch is async, so without this barrier the host enqueues
            # the target parts (allocating their caches) while the temp
            # fk/fv are still referenced by queued compress calls — the two
            # phases' buffers coexist and blow the HBM ceiling, defeating
            # the ordering (see _drain).
            self._drain(dk_new[0, 0, 0])
            tstate = self._longspec_target_parts(tokens, part)
            return self._longspec_tail_fn(B, prefix, "snapkv")(
                self.params, rng, salt, dk_new, dv_new, *tstate)
        # phase 1: TARGET parts over the full prefix (ragged tail handled
        # inside _baseline_part_fn — same chunk boundaries as monolithic)
        tstate = self._longspec_target_parts(tokens, part)

        # phase 2: DRAFT parts per draft-cache mode
        n_parts, rem = divmod(prefix, part)
        d_xdt = self.draft_params["final_norm"].dtype
        if e.mode == "full":
            dk = jnp.zeros(self._cache_shape(B, self._draft_cap, dcfg), dt)
            dstate = [dk, jnp.zeros_like(dk), jnp.zeros((B,), jnp.int32),
                      jnp.zeros((B, dcfg.dim), d_xdt)]
            dfn = self._baseline_part_fn(B, part, which="draft", quant=False)
            for i in range(n_parts):
                dstate = list(dfn(self.draft_params,
                                  tokens[:, i * part:(i + 1) * part], *dstate))
                self._drain(dstate[2])
            if rem:
                dstate = list(self._baseline_part_fn(
                    B, rem, which="draft", quant=False)(
                        self.draft_params, tokens[:, n_parts * part:], *dstate))
            dk, dv, dlens = dstate[0], dstate[1], dstate[2]
            return self._longspec_tail_fn(B, prefix, "full")(
                self.params, rng, salt, dlens, *tstate, dk, dv)
        if e.mode == "streamingllm":
            dk = jnp.zeros(self._cache_shape(B, self._draft_cap, dcfg), dt)
            dstate = [dk, jnp.zeros_like(dk), jnp.zeros((), jnp.int32)]
            dfn = self._stream_draft_part_fn(B, part)
            for i in range(n_parts):
                dstate = list(dfn(self.draft_params,
                                  tokens[:, i * part:(i + 1) * part], *dstate))
                self._drain(dstate[2])
            if rem:
                dstate = list(self._stream_draft_part_fn(B, rem)(
                    self.draft_params, tokens[:, n_parts * part:], *dstate))
            dk, dv, fill = dstate
            return self._longspec_tail_fn(B, prefix, "streamingllm")(
                self.params, rng, salt, fill, *tstate, dk, dv)
        raise AssertionError(e.mode)  # snapkv handled above (draft first)

    @staticmethod
    def _drain(x) -> None:
        """Host readback that forces the queued device work to finish —
        dispatch on this backend allocates a call's temp buffers at ENQUEUE,
        so back-to-back part calls stack their multi-GB transients unless
        the queue drains between them (block_until_ready does not sync
        through the remote relay; only a readback does).  ~28 ms per drain,
        noise next to a multi-second prefill part at 8B scale."""
        import numpy as _np
        _np.asarray(jax.device_get(x)).ravel()[:1]

    def _longspec_target_parts(self, tokens, part: int):
        """Bounded donated TARGET prefill parts over the full prefix; returns
        the running state list (caches..., lens, x_last).  Drained per call
        (see _drain — 8B part transients are ~1.5-2 GB each)."""
        B, prefix = tokens.shape
        caches = self._zero_target_caches(B)
        quant = caches.get("ks") is not None
        tstate = [caches["k"], caches["v"]]
        if quant:
            tstate += [caches["ks"], caches["vs"]]
        tstate += [jnp.zeros((B,), jnp.int32),
                   jnp.zeros((B, self.cfg.dim),
                             self.params["final_norm"].dtype)]
        n_parts, rem = divmod(prefix, part)
        fn = self._baseline_part_fn(B, part)
        for i in range(n_parts):
            tstate = list(fn(self.params, tokens[:, i * part:(i + 1) * part],
                             *tstate))
            self._drain(tstate[-2])
        if rem:
            tstate = list(self._baseline_part_fn(B, rem)(
                self.params, tokens[:, n_parts * part:], *tstate))
        return tstate

    @_per_engine_cache
    def _longspec_snapkv_window_fn(self, B: int):
        """Draft observation-window chunk on the TEMP full cache: forward +
        append + per-layer window-query collection (no state assembly —
        compression and the target phase follow)."""
        dcfg = self.draft_cfg

        def win(draft_params, wtoks, flens, fk, fv):
            _, full, qs = M.forward_prefill_snapkv_window(
                draft_params, dcfg, wtoks, flens, {"k": fk, "v": fv},
                backend=self._backend_d)
            return qs, full["k"], full["v"]

        return jax.jit(win, donate_argnums=(3, 4))

    @_per_engine_cache
    def _stream_draft_part_fn(self, B: int, T: int):
        """Bounded streaming-draft prefill part (sink+window eviction carry),
        draft cache donated."""
        e, dcfg = self.ecfg, self.draft_cfg
        C = e.chunk_size
        n_full, rem = divmod(T, C)

        def part(draft_params, toks, dk, dv, fill):
            dcaches = {"dk": dk, "dv": dv}
            if n_full:
                xs = jnp.moveaxis(
                    toks[:, :n_full * C].reshape(B, n_full, C), 1, 0)

                def body(carry, chunk):
                    dcaches, fill = carry
                    _, dcaches = M.forward_streaming_draft_chunk(
                        draft_params, dcfg, chunk, fill, dcaches,
                        budget=e.draft_budget, sink=e.sink_size)
                    return (dcaches,
                            jnp.minimum(fill + C, e.draft_budget)), None

                (dcaches, fill), _ = jax.lax.scan(body, (dcaches, fill), xs)
            if rem:
                _, dcaches = M.forward_streaming_draft_chunk(
                    draft_params, dcfg, toks[:, n_full * C:], fill, dcaches,
                    budget=e.draft_budget, sink=e.sink_size)
                fill = jnp.minimum(fill + rem, e.draft_budget)
            return dcaches["dk"], dcaches["dv"], fill

        return jax.jit(part, donate_argnums=(2, 3))

    @_per_engine_cache
    def _longspec_tail_fn(self, B: int, prefix: int, mode: str):
        """head token + draft finalize + fresh SpecState for the split
        longspec encode.  Signature varies by mode (lru key includes it)."""
        e, dcfg = self.ecfg, self.draft_cfg
        quant = bool(e.kv_quant)
        n_t = 4 if quant else 2

        def unpack_t(state):
            if quant:
                k, v, ks, vs, lens, x_last = state[:6]
                return {"k": k, "v": v, "ks": ks, "vs": vs}, lens, x_last, state[6:]
            k, v, lens, x_last = state[:4]
            return {"k": k, "v": v}, lens, x_last, state[4:]

        if mode == "full":
            def tail(params, rng, salt, dlens, *state):
                caches, lens, x_last, rest = unpack_t(state)
                dk, dv = rest
                token0 = self._head_token(params, x_last, rng, salt)
                caches = {**caches, "dk": dk, "dv": dv}
                return self._fresh_state(caches, lens, token0,
                                         draft_fill=dlens, draft_pos=dlens,
                                         rng=rng, salt=salt)
            # donate the target cache arrays AND dk/dv (after lens, x_last)
            return jax.jit(tail, donate_argnums=tuple(range(4, 4 + n_t))
                           + (6 + n_t, 7 + n_t))
        if mode == "streamingllm":
            def tail(params, rng, salt, fill, *state):
                caches, lens, x_last, rest = unpack_t(state)
                dk, dv = rest
                token0 = self._head_token(params, x_last, rng, salt)
                dcaches = M.streaming_finalize_draft(dcfg, {"dk": dk, "dv": dv},
                                                     budget=e.draft_budget)
                draft_fill = jnp.broadcast_to(
                    jnp.minimum(fill, e.draft_budget), (B,)).astype(jnp.int32)
                caches = {**caches, **dcaches}
                return self._fresh_state(caches, lens, token0,
                                         draft_fill=draft_fill,
                                         draft_pos=draft_fill,
                                         rng=rng, salt=salt)
            return jax.jit(tail, donate_argnums=tuple(range(4, 4 + n_t))
                           + (6 + n_t, 7 + n_t))

        # snapkv: the draft's compressed rows (dk_new/dv_new [L, B, budget,
        # Kc], built by the draft-first phase) land in fresh draft buffers;
        # head token + state assembly
        def tail(params, rng, salt, dk_new, dv_new, *state):
            caches, lens, x_last, rest = unpack_t(state)
            assert not rest
            token0 = self._head_token(params, x_last, rng, salt)
            dt = e.cache_dtype
            dk = jnp.zeros(self._cache_shape(B, self._draft_cap, dcfg), dt)
            dv = jnp.zeros_like(dk)
            budget = e.draft_budget
            caches = {**caches,
                      "dk": dk.at[:, :, :budget].set(dk_new),
                      "dv": dv.at[:, :, :budget].set(dv_new)}
            return self._fresh_state(
                caches, lens, token0,
                draft_fill=jnp.full((B,), budget, jnp.int32),
                draft_pos=lens, rng=rng, salt=salt)
        # donate the target cache arrays (after dk_new/dv_new at 3, 4)
        return jax.jit(tail, donate_argnums=tuple(range(5, 5 + n_t)))

    def _draft_model(self, params):
        return self.draft_params, self.draft_cfg

    def _draft_arg(self):
        return self.draft_params

    def _window(self):
        # every longspec mode uses the double-buffer window; ecfg.mode selects
        # the draft cache built at encode time, not the decode step
        return self._window_streaming

    @_per_engine_cache
    def _encode_fn(self, B: int, prefix: int):
        e, cfg, dcfg = self.ecfg, self.cfg, self.draft_cfg
        C = e.chunk_size
        Cp = e.prefill_chunk_size or e.chunk_size
        assert prefix + e.max_gen + e.gamma + 2 <= e.max_seq_len

        def chunked_prefill(params, mcfg, tokens, caches, *, backend):
            P = tokens.shape[1]
            n_full, rem = P // Cp, P % Cp
            lens = jnp.zeros((B,), jnp.int32)
            x_last = None
            if n_full:
                xs = jnp.moveaxis(tokens[:, :n_full * Cp].reshape(B, n_full, Cp), 1, 0)

                def body(carry, chunk):
                    caches, lens = carry
                    x, caches = M.forward_target(params, mcfg, chunk, lens,
                                                 caches, head="none",
                                                 backend=backend)
                    return (caches, lens + Cp), x[:, -1]

                (caches, lens), last_h = jax.lax.scan(body, (caches, lens), xs)
                x_last = last_h[-1]
            if rem:
                x, caches = M.forward_target(params, mcfg, tokens[:, n_full * Cp:],
                                             lens, caches, head="none",
                                             backend=backend)
                lens = lens + rem
                x_last = x[:, -1]
            return caches, lens, x_last

        def encode(params, draft_params, tokens, rng, salt):
            e_ = e
            dt = e.cache_dtype
            caches, lens, x_last = chunked_prefill(params, cfg, tokens,
                                                   self._zero_target_caches(B),
                                                   backend=self._backend_t)
            token0 = self._head_token(params, x_last, rng, salt)

            dk = jnp.zeros(self._cache_shape(B, self._draft_cap, dcfg), dt)
            dv = jnp.zeros_like(dk)
            if self.mesh is not None:
                dk = jax.lax.with_sharding_constraint(dk, self._draft_cache_sharding)
                dv = jax.lax.with_sharding_constraint(dv, self._draft_cache_sharding)

            if e_.mode == "full":
                dcaches, dlens, _ = chunked_prefill(draft_params, dcfg, tokens,
                                                    {"k": dk, "v": dv},
                                                    backend=self._backend_d)
                dcaches = {"dk": dcaches["k"], "dv": dcaches["v"]}
                draft_fill = dlens
                draft_pos = dlens
            elif e_.mode == "streamingllm":
                dcaches = {"dk": dk, "dv": dv}
                n_full, rem = prefix // C, prefix % C
                fill = jnp.zeros((), jnp.int32)
                if n_full:
                    xs = jnp.moveaxis(tokens[:, :n_full * C].reshape(B, n_full, C), 1, 0)

                    def body(carry, chunk):
                        dcaches, fill = carry
                        _, dcaches = M.forward_streaming_draft_chunk(
                            draft_params, dcfg, chunk, fill, dcaches,
                            budget=e_.draft_budget, sink=e_.sink_size)
                        return (dcaches, jnp.minimum(fill + C, e_.draft_budget)), None

                    (dcaches, fill), _ = jax.lax.scan(body, (dcaches, fill), xs)
                if rem:
                    _, dcaches = M.forward_streaming_draft_chunk(
                        draft_params, dcfg, tokens[:, n_full * C:], fill, dcaches,
                        budget=e_.draft_budget, sink=e_.sink_size)
                    fill = jnp.minimum(fill + rem, e_.draft_budget)
                dcaches = M.streaming_finalize_draft(dcfg, dcaches,
                                                     budget=e_.draft_budget)
                draft_fill = jnp.broadcast_to(fill, (B,)).astype(jnp.int32)
                draft_pos = draft_fill
            else:  # snapkv-compressed standalone draft
                assert prefix % C == e_.window_size % C and prefix >= e_.window_size
                # temporary full draft-model cache, used only to build the
                # compressed set (reference model_draft.py gen_draft_kv :345)
                fk = jnp.zeros(self._cache_shape(B, _round_up(prefix, C), dcfg), dt)
                fv = jnp.zeros_like(fk)
                full, flens, _ = chunked_prefill(
                    draft_params, dcfg, tokens[:, :-e_.window_size],
                    {"k": fk, "v": fv}, backend=self._backend_d)
                full = {**full, "dk": dk, "dv": dv}
                _, full = M.forward_prefill_snapkv_last(
                    draft_params, dcfg, tokens[:, prefix - e_.window_size:],
                    flens, full, ctx_len=prefix, window=e_.window_size,
                    budget=e_.draft_budget, kernel_size=e_.kernel_size,
                    pooling=e_.pooling, backend=self._backend_d)
                dcaches = {"dk": full["dk"], "dv": full["dv"]}
                draft_fill = jnp.full((B,), e_.draft_budget, jnp.int32)
                draft_pos = lens  # real positions
            caches = {**caches, **dcaches}
            return self._fresh_state(caches, lens, token0,
                                     draft_fill=draft_fill, draft_pos=draft_pos,
                                     rng=rng, salt=salt)

        return jax.jit(encode, out_shardings=self._spec_shardings)
