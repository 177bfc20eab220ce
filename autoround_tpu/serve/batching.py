"""Continuous batching engine: slot-based scheduling over a shared KV cache.

New capability (BASELINE.json north star; the reference has no serving
engine at all): requests join and leave a fixed-size batch independently —
a prefill fills a free slot's KV region while other slots keep decoding,
and every decode step advances all active slots at their own positions.

TPU-shaped design decisions:
  * fixed max_batch / max_seq → exactly two compiled executables
    (per prompt bucket + one decode step), no recompiles as requests churn;
  * per-slot lengths are a traced (B,) vector — RoPE positions, causal
    masks, and KV appends are all vectorized over slots (scatter on the
    length index), so an idle slot costs a masked lane, not a branch;
  * prompts pad to power-of-two buckets to bound prefill compilations.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..utils.logger import logger
from .engine import QuantizedLlama, _block_with_cache, _final_fwd_packed

__all__ = ["ContinuousBatchingEngine", "Request"]


@dataclass
class Request:
    rid: int
    prompt: List[int]
    max_new_tokens: int
    slot: Optional[int] = None
    generated: List[int] = field(default_factory=list)
    done: bool = False


class _BatchCache(NamedTuple):
    k: jax.Array        # (L, B, T, n_kv, hd)
    v: jax.Array
    lengths: jax.Array  # (B,) int32
    last_token: jax.Array  # (B,) int32


class ContinuousBatchingEngine:
    """Wraps a ``QuantizedLlama`` with slot scheduling.

    Usage::

        eng = ContinuousBatchingEngine(qmodel, max_batch=8, max_seq=256)
        rid = eng.submit([1, 2, 3], max_new_tokens=16)
        while eng.pending():
            for rid, tok in eng.step():
                ...
        tokens = eng.result(rid)
    """

    def __init__(self, model: QuantizedLlama, max_batch: int = 8,
                 max_seq: int = 512,
                 prompt_buckets: Tuple[int, ...] = (16, 32, 64, 128, 256),
                 eos_token: Optional[int] = None,
                 sampling: Optional["SamplingParams"] = None):
        self.m = model
        self.cfg = model.cfg
        self.B = max_batch
        self.T = max_seq
        self.buckets = tuple(sorted(prompt_buckets))
        self.eos = eos_token
        # one SamplingParams for the whole batcher (greedy when None);
        # the key advances per jitted call so restarts are deterministic
        self.sampling = sampling
        self._rng = jax.random.PRNGKey(sampling.seed if sampling else 0)
        cfg = self.cfg
        from ..models.deepseek import DeepseekConfig
        from ..models.minimax import MiniMaxConfig
        from ..models.qwen3next import Qwen3NextConfig
        if isinstance(cfg, (Qwen3NextConfig, MiniMaxConfig)):
            raise NotImplementedError(
                f"continuous batching for {type(cfg).__name__} needs "
                "per-slot conv/recurrent state buffers — use the "
                "single-batch engine (QuantizedLlama.generate)")
        self._mla = (isinstance(cfg, DeepseekConfig)
                     and bool(cfg.kv_lora_rank))
        if self._mla:
            # compressed latents: k holds c_kv, v the shared rope sub-head
            kshape = (cfg.num_layers, self.B, self.T, 1, cfg.kv_lora_rank)
            vshape = (cfg.num_layers, self.B, self.T, 1,
                      cfg.qk_rope_head_dim)
        else:
            kshape = vshape = (cfg.num_layers, self.B, self.T,
                               cfg.num_kv_heads, cfg.hd)
        self.cache = _BatchCache(
            k=jnp.zeros(kshape, cfg.dtype),
            v=jnp.zeros(vshape, cfg.dtype),
            lengths=jnp.zeros((self.B,), jnp.int32),
            last_token=jnp.zeros((self.B,), jnp.int32),
        )
        self._free = list(range(self.B))
        self._slot_req: Dict[int, Request] = {}
        self._requests: Dict[int, Request] = {}
        self._next_rid = 0
        self._prefill_c = jax.jit(self._prefill_impl,
                                  static_argnames=("bucket",))
        self._decode_c = jax.jit(self._decode_impl)

    # ---------------------------------------------------------------- jitted
    def _prefill_impl(self, params, packed, cache, tokens, true_len, slot,
                      rng, *, bucket):
        """Run one prompt (1, bucket) and insert its KV at ``slot``."""
        cfg = self.cfg
        from ..models.registry import get_model_fns
        x = llama.embed_fwd(params, tokens, cfg)
        cos, sin = get_model_fns(cfg).rope_tables(cfg, bucket)
        cl, slo = (llama.rope_tables(cfg, bucket, local=True)
                   if getattr(cfg, "rope_local_theta", 0.0)
                   else (cos, sin))
        new_k, new_v = cache.k, cache.v
        for i in range(cfg.num_layers):
            ci, si = ((cl, slo) if llama.layer_is_sliding(cfg, i)
                      else (cos, sin))
            lf = QuantizedLlama._make_linear_fn(packed, i,
                                                self.m.packed_kinds)
            if self._mla:
                from ..models import deepseek
                x, c_kv, k_rope = deepseek.block_with_cache(
                    params["blocks"][i], x, ci, si, cfg, None, None, lf)
                k_new = c_kv[:, :, None, :]       # (1, bucket, 1, r)
                v_new = k_rope
            else:
                x, k_new, v_new = _block_with_cache(
                    params["blocks"][i], x, ci, si, cfg, None, None, lf,
                    packed=packed, block_idx=i,
                    splits_table=self.m.fused_splits,
                    kinds=self.m.packed_kinds)
            new_k = jax.lax.dynamic_update_slice(
                new_k, k_new.astype(new_k.dtype)[None],
                (i, slot, 0, 0, 0))
            new_v = jax.lax.dynamic_update_slice(
                new_v, v_new.astype(new_v.dtype)[None],
                (i, slot, 0, 0, 0))
        # last valid token's logits
        h_last = jax.lax.dynamic_slice_in_dim(x, true_len - 1, 1, axis=1)
        logits = _final_fwd_packed(params, packed, h_last, cfg,
                                   self.m.packed_kinds)[:, 0]
        lengths = cache.lengths.at[slot].set(true_len)
        from .sampling import sample_token
        tok = sample_token(logits, rng, self.sampling)[0]
        return tok, _BatchCache(new_k, new_v, lengths,
                                cache.last_token.at[slot].set(tok))

    def _decode_impl(self, params, packed, cache, active, rng):
        """One decode step for every slot; inactive slots are frozen.

        Built on ``engine._block_with_cache`` (single source of truth for
        block semantics) so qk_norm / sandwich norms / norm_offset /
        softcap / sliding window / online R4 all behave identically to the
        single-chip engine — the per-slot (B,) position vector drives
        per-slot KV scatter and masking inside the shared block."""
        cfg = self.cfg
        B = self.B
        from ..models.registry import get_model_fns
        tokens = cache.last_token                      # (B,)
        pos = cache.lengths                            # (B,)
        x = llama.embed_fwd(params, tokens[:, None], cfg)  # (B, 1, H)
        cos, sin = get_model_fns(cfg).rope_tables(cfg, 1, positions=pos)
        cl, slo = (llama.rope_tables(cfg, 1, positions=pos, local=True)
                   if getattr(cfg, "rope_local_theta", 0.0)
                   else (cos, sin))
        # rope_tables with positions (B,) gives (B, rd); lift to (B, 1, rd)
        cos, sin = cos[:, None, :], sin[:, None, :]
        cl, slo = cl[:, None, :], slo[:, None, :]
        new_k, new_v = cache.k, cache.v
        bidx = jnp.arange(B)
        for i in range(cfg.num_layers):
            ci, si = ((cl, slo) if llama.layer_is_sliding(cfg, i)
                      else (cos, sin))
            lf = QuantizedLlama._make_linear_fn(packed, i,
                                                self.m.packed_kinds)
            if self._mla:
                from ..models import deepseek
                x, c_kv, k_rope = deepseek.block_with_cache(
                    params["blocks"][i], x, ci, si, cfg,
                    (new_k[i], new_v[i]), pos, lf)
                k_new = c_kv[:, :, None, :]            # (B, 1, 1, r)
                v_new = k_rope
            else:
                x, k_new, v_new = _block_with_cache(
                    params["blocks"][i], x, ci, si, cfg,
                    (new_k[i], new_v[i]), pos, lf,
                    packed=packed, block_idx=i,
                    splits_table=self.m.fused_splits,
                    kinds=self.m.packed_kinds)
            new_k = new_k.at[i, bidx, pos].set(
                k_new[:, 0].astype(new_k.dtype))
            new_v = new_v.at[i, bidx, pos].set(
                v_new[:, 0].astype(new_v.dtype))
        logits = _final_fwd_packed(params, packed, x, cfg,
                                   self.m.packed_kinds)[:, 0]  # (B, V)
        from .sampling import sample_token
        toks = sample_token(logits, rng, self.sampling)
        act = active.astype(jnp.int32)
        new_lengths = cache.lengths + act
        new_last = jnp.where(active, toks, cache.last_token)
        return toks, _BatchCache(new_k, new_v, new_lengths, new_last)

    # ------------------------------------------------------------- scheduling
    def submit(self, prompt, max_new_tokens: int = 32) -> int:
        rid = self._next_rid
        self._next_rid += 1
        req = Request(rid=rid, prompt=list(map(int, prompt)),
                      max_new_tokens=max_new_tokens)
        self._requests[rid] = req
        if not self._free:
            raise RuntimeError("no free slots (increase max_batch)")
        slot = self._free.pop(0)
        req.slot = slot
        self._slot_req[slot] = req
        bucket = next(b for b in self.buckets if b >= len(req.prompt))
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, : len(req.prompt)] = req.prompt
        self._rng, k = jax.random.split(self._rng)
        tok, self.cache = self._prefill_c(
            self.m.params, self.m.packed, self.cache,
            jnp.asarray(tokens), jnp.asarray(len(req.prompt), jnp.int32),
            jnp.asarray(slot, jnp.int32), k, bucket=bucket)
        req.generated.append(int(tok))
        self._maybe_finish(req)
        return rid

    def _maybe_finish(self, req: Request) -> None:
        if req.done:
            return
        if (len(req.generated) >= req.max_new_tokens
                or (self.eos is not None and req.generated
                    and req.generated[-1] == self.eos)):
            req.done = True
            self._free.append(req.slot)
            del self._slot_req[req.slot]
            req.slot = None

    def pending(self) -> bool:
        return bool(self._slot_req)

    def step(self) -> List[Tuple[int, int]]:
        """One decode step; returns [(rid, new_token)] for active slots."""
        if not self._slot_req:
            return []
        active = np.zeros((self.B,), bool)
        for slot in self._slot_req:
            active[slot] = True
        self._rng, k = jax.random.split(self._rng)
        toks, self.cache = self._decode_c(
            self.m.params, self.m.packed, self.cache, jnp.asarray(active),
            k)
        toks = np.asarray(toks)
        out = []
        for slot, req in list(self._slot_req.items()):
            t = int(toks[slot])
            req.generated.append(t)
            out.append((req.rid, t))
            self._maybe_finish(req)
        return out

    def result(self, rid: int) -> List[int]:
        return self._requests[rid].generated
