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

from magicdec_tpu.engine import spec as spec_ops
from magicdec_tpu.engine.engine import EngineConfig, SpecEngine
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
    """

    # ------------------------------------------------------------------
    # per-request window (overrides the batch-global commit logic)
    # ------------------------------------------------------------------

    def _finish_window_serving(self, st: SpecState, active, done,
                               tokens_buffer, target_tokens, caches, *,
                               draft_fill, draft_pos):
        e = self.ecfg
        gamma = e.gamma
        draft = tokens_buffer[:, 1:]
        match = target_tokens[:, :gamma] == draft
        eot = spec_ops.is_eot(draft, self._eot)
        acc = jnp.cumprod((match & ~eot).astype(jnp.int32), axis=1)
        accept = acc.sum(axis=1) + 1
        live = active & ~done
        accept = jnp.where(live, accept, 0).astype(jnp.int32)

        bonus = jnp.take_along_axis(target_tokens,
                                    jnp.maximum(accept - 1, 0)[:, None],
                                    axis=1)[:, 0]
        eot_accepted_b = (eot & acc.astype(bool)).any(axis=1)

        output = spec_ops.commit_tokens(st.output, st.num_committed,
                                        tokens_buffer, accept)
        committed = st.num_committed + accept
        newly_done = live & (eot_accepted_b
                             | spec_ops.is_eot(bonus, self._eot)
                             | (committed >= e.max_gen))
        output = jnp.where(newly_done[:, None],
                           spec_ops.write_at(output, committed, bonus), output)
        committed = committed + newly_done.astype(jnp.int32)
        done = done | newly_done

        full = accept == gamma + 1
        db_tokens = jnp.stack([
            jnp.where(full, tokens_buffer[:, gamma], bonus),
            jnp.where(full, bonus, jnp.zeros_like(bonus)),
        ], axis=1)
        db_update = jnp.where(full, 2, 1).astype(jnp.int32)

        spec = st.replace(
            k=caches["k"], v=caches["v"], dk=caches["dk"], dv=caches["dv"],
            target_lens=st.target_lens + accept,
            draft_fill=draft_fill(accept), draft_pos=draft_pos(accept),
            token0=bonus, output=output, num_committed=committed,
            target_steps=st.target_steps + 1,
            done=jnp.all(done | ~active),
            db_tokens=db_tokens, db_update=db_update,
        )
        return spec, done

    @functools.lru_cache(maxsize=8)
    def _windows_fn(self, B: int, n_windows: int):
        e = self.ecfg
        if e.mode != "streamingllm":
            raise NotImplementedError("serving engine: streamingllm self-spec")

        def run(params, sst: ServingState) -> ServingState:
            def body(carry, _):
                spec, done = carry
                spec2, done = self._window_streaming_serving(
                    params, spec, sst.active, done)
                return (spec2, done), None

            (spec, done), _ = jax.lax.scan(body, (sst.spec, sst.done), None,
                                           length=n_windows)
            return ServingState(spec=spec, active=sst.active, done=done)

        return jax.jit(run, donate_argnums=(1,))

    def _window_streaming_serving(self, params, st: SpecState, active, done):
        e, cfg = self.ecfg, self.cfg
        from magicdec_tpu.models import llama as M

        dparams, dcfg = self._draft_model(params)
        f0 = st.draft_fill
        delta = st.draft_pos - st.draft_fill
        dcaches = {"dk": st.dk, "dv": st.dv}
        nxt2, dcaches = M.forward_draft(dparams, dcfg, st.db_tokens, f0,
                                        f0 + delta, dcaches,
                                        backend=e.attn_backend)
        tok1 = jnp.take_along_axis(nxt2, (st.db_update - 1)[:, None], axis=1)[:, 0]
        fill = f0 + st.db_update

        def draft_body(carry, _):
            dk, dv, fill, tok = carry
            nxt, dc = M.forward_draft(dparams, dcfg, tok[:, None], fill,
                                      fill + delta, {"dk": dk, "dv": dv},
                                      backend=e.attn_backend)
            nxt = nxt[:, 0]
            return (dc["dk"], dc["dv"], fill + 1, nxt), nxt

        (dk, dv, _, _), drafted = jax.lax.scan(
            draft_body, (dcaches["dk"], dcaches["dv"], fill, tok1),
            None, length=e.gamma - 1)
        drafted = jnp.concatenate([tok1[:, None], jnp.moveaxis(drafted, 0, 1)],
                                  axis=1)
        tokens_buffer = jnp.concatenate([st.token0[:, None], drafted], axis=1)

        caches = {"k": st.k, "v": st.v}
        target_tokens, caches = M.forward_target(
            params, cfg, tokens_buffer, st.target_lens, caches,
            backend=e.attn_backend)
        caches = {**caches, "dk": dk, "dv": dv}

        gamma = e.gamma
        fill_after = lambda acc: f0 + jnp.where(
            acc > 0, st.db_update - 1 + jnp.minimum(acc, gamma), 0)
        return self._finish_window_serving(
            st, active, done, tokens_buffer, target_tokens, caches,
            draft_fill=fill_after,
            draft_pos=lambda acc: fill_after(acc) + delta)

    # ------------------------------------------------------------------
    # admission / drain
    # ------------------------------------------------------------------

    def init_serving(self, B: int, prefix: int) -> ServingState:
        """Empty batch of B slots sized for `prefix`-length prompts."""
        k, v, dk, dv = self._zero_caches(B)

        def zeros():  # distinct buffers: donation rejects aliased arguments
            return jnp.zeros((B,), jnp.int32)

        spec = SpecState(
            k=k, v=v, target_lens=zeros(), dk=dk, dv=dv,
            draft_fill=zeros(), draft_pos=zeros(), token0=zeros(),
            output=jnp.zeros((B, self._out_cap), jnp.int32),
            num_committed=zeros(), target_steps=jnp.zeros((), jnp.int32),
            done=jnp.zeros((), bool),
            db_tokens=jnp.zeros((B, 2), jnp.int32),
            db_update=jnp.ones((B,), jnp.int32))
        return ServingState(spec=spec, active=jnp.zeros((B,), bool),
                            done=jnp.zeros((B,), bool))

    def admit(self, sst: ServingState, slot: int, prompt: np.ndarray) -> ServingState:
        """Prefill one prompt alone and splice its state into `slot`."""
        st1 = self.encode(jnp.asarray(prompt, jnp.int32)[None])
        fn = self._admit_fn(sst.active.shape[0])
        return fn(sst, st1, jnp.asarray(slot, jnp.int32))

    @functools.lru_cache(maxsize=4)
    def _admit_fn(self, B: int):
        def admit(sst: ServingState, st1: SpecState, slot) -> ServingState:
            spec = sst.spec
            upd = dict(
                k=jax.lax.dynamic_update_index_in_dim(spec.k, st1.k[:, 0], slot, 1),
                v=jax.lax.dynamic_update_index_in_dim(spec.v, st1.v[:, 0], slot, 1),
                dk=jax.lax.dynamic_update_index_in_dim(spec.dk, st1.dk[:, 0], slot, 1),
                dv=jax.lax.dynamic_update_index_in_dim(spec.dv, st1.dv[:, 0], slot, 1),
            )
            for name in ("target_lens", "draft_fill", "draft_pos", "token0",
                         "num_committed"):
                upd[name] = getattr(spec, name).at[slot].set(
                    getattr(st1, name)[0])
            upd["output"] = spec.output.at[slot].set(st1.output[0])
            upd["db_tokens"] = spec.db_tokens.at[slot].set(st1.db_tokens[0])
            upd["db_update"] = spec.db_update.at[slot].set(st1.db_update[0])
            spec = spec.replace(**upd)
            return ServingState(spec=spec,
                                active=sst.active.at[slot].set(True),
                                done=sst.done.at[slot].set(False))

        return jax.jit(admit, donate_argnums=(0,))

    # ------------------------------------------------------------------
    # the serving loop
    # ------------------------------------------------------------------

    def serve(self, prompts: List[np.ndarray], B: int,
              windows_per_sync: int = 4) -> List[np.ndarray]:
        """Run all prompts through B slots; returns generated tokens per
        request (in submission order).  All prompts must share one length
        (callers bucket/pad upstream, as the reference's equal-length batches
        do)."""
        prefix = len(prompts[0])
        assert all(len(p) == prefix for p in prompts)
        sst = self.init_serving(B, prefix)
        queue = list(enumerate(prompts))
        slot_req: Dict[int, int] = {}
        results: Dict[int, np.ndarray] = {}

        def refill(sst):
            active = np.asarray(sst.active).copy()
            done = np.asarray(sst.done)
            for slot in range(B):
                if active[slot] and done[slot]:
                    rid = slot_req.pop(slot)
                    n = int(np.asarray(sst.spec.num_committed)[slot])
                    results[rid] = np.asarray(sst.spec.output)[slot, :n]
                    sst = ServingState(spec=sst.spec,
                                       active=sst.active.at[slot].set(False),
                                       done=sst.done.at[slot].set(False))
                    active[slot] = False
            for slot in range(B):
                if not active[slot] and queue:
                    rid, prompt = queue.pop(0)
                    sst = self.admit(sst, slot, prompt)
                    slot_req[slot] = rid
                    active[slot] = True
            return sst

        sst = refill(sst)
        windows = self._windows_fn(B, windows_per_sync)
        while slot_req or queue:
            sst = windows(self.params, sst)
            sst = refill(sst)
        return [results[i] for i in range(len(prompts))]
