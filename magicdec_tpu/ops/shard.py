"""Mesh execution of the Pallas hot path (shard_map wrappers).

The flash attention kernels and the aliased in-place appends are opaque
custom calls over the full stacked [L, B, S, Hkv*hd] cache, which GSPMD
cannot partition on its own.  The reference runs its flashinfer kernels under
8-way tensor parallelism as the default operating mode
(Engine/tp.py:202-207 + Engine/SnapKV/backend.py:42-115); the TPU-native
equivalent is ``shard_map``: both kernel families are embarrassingly parallel
over (batch, kv-head) — each mesh shard owns whole kv heads of the cache
(parallel/sharding.cache_pspec) and a batch slice, so the unmodified kernels
run on the local shard with no cross-shard softmax and no collectives.

``FlashShard`` rides in the ``backend`` parameter already threaded through
the model layer: engines under a mesh pass ``backend=FlashShard(mesh, axes)``
instead of the string "flash" (axes = the mesh axes sharding the kv-head
dimension of the cache at hand — the target's model axes, or the draft
sub-mesh's inner axis).  Dispatch helpers below keep string backends working
unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class FlashShard:
    """Flash backend bound to a mesh: kernels run per-shard via shard_map.

    axes: mesh axes sharding kv heads (compound for the submesh layout);
    data: the batch-sharding axis name.
    """

    mesh: Mesh
    axes: Tuple[str, ...] = ("model",)
    data: str = "data"

    @property
    def m(self):
        return self.axes if len(self.axes) > 1 else self.axes[0]


def backend_kind(backend) -> str:
    """'jnp' | 'flash' — FlashShard counts as flash."""
    return "flash" if isinstance(backend, FlashShard) else backend


def attend_cache_sharded(fs: FlashShard, q, caches, base_lens, *, layer,
                         prefix: str = "", fresh=None):
    """ops.attention.attend_cache over a sharded stacked cache.

    Per-shard shapes keep whole kv heads (Hq/Hkv ratio, int4 head pairing and
    the BlockSpec tiling are all preserved locally), so the local call is the
    plain meshless flash path; block sizes are picked from LOCAL lane widths,
    which only makes the KV blocks taller.
    """
    from magicdec_tpu.ops import attention as attn_ops

    quant = (prefix + "ks") in caches and caches.get(prefix + "ks") is not None
    keys = ("k", "v", "ks", "vs") if quant else ("k", "v")
    sub = {s: caches[prefix + s] for s in keys}
    m, d = fs.m, fs.data
    cache_spec = P(None, d, None, m)    # [L, B, S, Hkv*hd or packed]
    scale_spec = P(None, d, m, None)    # [L, B, Hkv, S]
    sub_specs = {"k": cache_spec, "v": cache_spec}
    if quant:
        sub_specs.update(ks=scale_spec, vs=scale_spec)
    fresh_specs = None
    if fresh is not None:
        fresh_specs = {"k": P(d, None, m), "v": P(d, None, m)}   # [B, T, Kc]
        if "ks" in fresh:
            fresh_specs.update(ks=P(d, m, None), vs=P(d, m, None))  # [B,Hkv,T]
    q_spec = P(d, None, m, None)        # [B, T, Hq, hd]

    def local(q, sub, lens, layer, fresh):
        c = {prefix + s: v for s, v in sub.items()}
        return attn_ops.attend_cache(q, c, lens, layer=layer, backend="flash",
                                     prefix=prefix, fresh=fresh)

    return jax.shard_map(
        local, mesh=fs.mesh,
        in_specs=(q_spec, sub_specs, P(d), P(), fresh_specs),
        out_specs=q_spec, check_vma=False,
    )(q, sub, base_lens, jnp.asarray(layer, jnp.int32), fresh)


def attend_cache_paged_sharded(fs: FlashShard, q, caches, base_lens, *,
                               layer, prefix: str = "", fresh=None):
    """ops.attention._attend_cache_paged over sharded page POOLS.

    Pools [L, P, ps, Kc] shard their folded kv-head lane axis on the model
    axes (each model shard owns whole heads) and their PAGE axis on data
    (each data group owns its own slots' pages; page-table entries are
    GROUP-LOCAL ids — see sharding.pool_pspec); the scale pools
    [L, P, H, ps] shard likewise; the per-group page table [B_local, npr]
    and lengths ride the data axis (scalar-prefetched by the kernels).
    data=1 reproduces the reference's sole operating mode of 8-way TP
    (Engine/tp.py:202-207)."""
    from magicdec_tpu.ops import attention as attn_ops

    quant = caches.get(prefix + "ks") is not None
    keys = ("k", "v", "ks", "vs", "table") if quant else ("k", "v", "table")
    sub = {s: caches[prefix + s] for s in keys}
    m, d = fs.m, fs.data
    # the page axis shards over data (each data group owns its own slots'
    # pages; table entries are group-local ids — see sharding.pool_pspec)
    pool_spec = P(None, d, None, m)       # [L, P, ps, Kc or packed]
    spool_spec = P(None, d, m, None)      # [L, P, Hkv, ps]
    sub_specs = {"k": pool_spec, "v": pool_spec, "table": P(d, None)}
    if quant:
        sub_specs.update(ks=spool_spec, vs=spool_spec)
    fresh_specs = None
    if fresh is not None:
        fresh_specs = {"k": P(d, None, m), "v": P(d, None, m)}
        if "ks" in fresh:
            fresh_specs.update(ks=P(d, m, None), vs=P(d, m, None))
    q_spec = P(d, None, m, None)

    def local(q, sub, lens, layer, fresh):
        c = {prefix + s: v for s, v in sub.items()}
        return attn_ops._attend_cache_paged(q, c, lens, layer=layer,
                                            backend="flash", prefix=prefix,
                                            fresh=fresh)

    return jax.shard_map(
        local, mesh=fs.mesh,
        in_specs=(q_spec, sub_specs, P(d), P(), fresh_specs),
        out_specs=q_spec, check_vma=False,
    )(q, sub, base_lens, jnp.asarray(layer, jnp.int32), fresh)


def append_paged_rows_sharded(fs: FlashShard, pool_k, pool_v, rows_k, rows_v,
                              write_pos, table, scale_k=None, scale_v=None,
                              srows_k=None, srows_v=None):
    """ops.pallas.paged_attention.append_paged_rows_inplace per shard (each
    shard RMWs its own heads of its own data group's pages; table entries
    are group-local ids — see sharding.pool_pspec)."""
    from magicdec_tpu.ops import pallas as PL
    from magicdec_tpu.ops.pallas import paged_attention as PGA

    m, d = fs.m, fs.data
    quant = scale_k is not None
    pspec = P(None, d, None, m)
    sspec = P(None, d, m, None)
    rspec = P(None, d, None, m)           # rows [L, B, T, Kc]
    srspec = P(None, d, m, None)          # scale rows [L, B, Hkv, T]
    in_specs = (pspec, pspec, rspec, rspec, P(d), P(d, None))
    out_specs = (pspec, pspec)
    args = (pool_k, pool_v, rows_k, rows_v, write_pos, table)
    if quant:
        in_specs += (sspec, sspec, srspec, srspec)
        out_specs += (sspec, sspec)
        args += (scale_k, scale_v, srows_k, srows_v)

    interp = PL.use_interpret()

    def local(pk, pv, rk, rv, pos, tab, *scales):
        out = PGA.append_paged_rows_inplace(pk, pv, rk, rv, pos, tab,
                                            *(scales if scales else (None,) * 4),
                                            interpret=interp)
        return tuple(out)

    return jax.shard_map(local, mesh=fs.mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(*args)


def append_all_rows_sharded(fs: FlashShard, cache_k, cache_v, rows_k, rows_v,
                            write_pos, scale_k=None, scale_v=None,
                            srows_k=None, srows_v=None):
    """ops.kv_cache.append_all_rows_inplace per shard (aliased RMW stays local
    — appends touch only the shard's own rows/heads)."""
    from magicdec_tpu.ops import kv_cache as kv_ops
    from magicdec_tpu.ops import pallas as PL

    m, d = fs.m, fs.data
    quant = scale_k is not None
    cspec = P(None, d, None, m)
    sspec = P(None, d, m, None)
    in_specs = (cspec, cspec, cspec, cspec, P(d))
    out_specs = (cspec, cspec)
    args = (cache_k, cache_v, rows_k, rows_v, write_pos)
    if quant:
        in_specs += (sspec, sspec, sspec, sspec)
        out_specs += (sspec, sspec)
        args += (scale_k, scale_v, srows_k, srows_v)

    interp = PL.use_interpret()

    def local(ck, cv, rk, rv, pos, *scales):
        out = kv_ops.append_all_rows_inplace(ck, cv, rk, rv, pos, *scales,
                                             interpret=interp)
        return tuple(out)

    return jax.shard_map(local, mesh=fs.mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(*args)
