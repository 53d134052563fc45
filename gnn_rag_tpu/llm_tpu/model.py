"""LLaMA-family decoder-only LM in flax.

Architecture: pre-RMSNorm blocks, rotary position embeddings with an optional
"condense" ratio (position interpolation — the TPU-native equivalent of the
reference's CondenseRotaryEmbedding monkey patch,
llm/src/llms/language_models/longchat/llama_condense_monkey_patch.py:18-55),
grouped-query attention, SwiGLU MLP. Weight layout matches utils in
convert_hf.py for loading local HF LLaMA checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    intermediate: int = 11008
    rope_theta: float = 10000.0
    rope_condense: float = 1.0      # >1 extends context by interpolation
    max_seq_len: int = 4096
    norm_eps: float = 1e-5
    dtype: str = "bfloat16"
    use_flash: bool = True          # Pallas flash attention when shapes allow
    tie_embeddings: bool = False    # logits = h @ tok_emb.T (no lm_head).
                                    # LLaMA itself unties, but tying is what
                                    # makes RARE-token copying learnable for
                                    # the closed-vocab trained reader: random
                                    # 384-dim embeddings are quasi-orthogonal,
                                    # so routing an attended token's embedding
                                    # to the residual already yields the right
                                    # argmax — with untied heads both matrices
                                    # would need training for every entity id.
    remat: bool = False             # rematerialise each block's activations
                                    # in backward (jax.checkpoint): trades
                                    # FLOPs for HBM, required for 16k-context
                                    # training on a single 16GB chip
    quant: str = "none"             # "int8": weight-only per-channel int8
                                    # projections (llm_tpu.quant) — halves
                                    # the bytes the bs=1 decode GEMV streams;
                                    # params come from quant.quantize_params

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @classmethod
    def tiny(cls, vocab_size: int = 512, **kw) -> "LlamaConfig":
        return cls(vocab_size=vocab_size, dim=64, n_layers=2, n_heads=4,
                   n_kv_heads=2, intermediate=128, max_seq_len=512,
                   dtype="float32", **kw)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


def rope_frequencies(head_dim: int, positions: jnp.ndarray, theta: float,
                     condense: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions: [B, L] int32 -> (cos, sin) [B, L, head_dim/2]."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                           dtype=jnp.float32) / head_dim))
    t = positions.astype(jnp.float32) / condense   # position interpolation
    freqs = t[..., None] * inv_freq[None, None, :]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x: [B, L, H, D]; cos/sin: [B, L, D/2]."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _reference_attention(q, k, v, causal_offset, kv_valid=None):
    """q [B,L,H,D], k/v [B,S,H,D]; causal mask with kv offset.

    kv_valid [B, S] (optional): 0 marks kv slots that must never be attended
    (left-padded prompt positions in batched decoding)."""
    B, L, H, D = q.shape
    S = k.shape[1]
    scores = jnp.einsum("blhd,bshd->bhls", q, k) / jnp.sqrt(D).astype(q.dtype)
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (L, S), 0) + causal_offset
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (L, S), 1)
    mask = (k_pos <= q_pos)[None, None]
    if kv_valid is not None:
        mask = jnp.logical_and(mask, (kv_valid > 0)[:, None, None, :])
    scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhls,bshd->blhd", probs, v)


class TDense(nn.Module):
    """Linear layer with TRANSPOSED kernel storage: kernel [out, in], the
    HF orientation. The TPU decode-loop GEMV wants the contraction (in)
    axis minor in the weight's layout; a [in, out] kernel's default layout
    {1,0} has `out` minor, so XLA inserts a relayout copy of EVERY weight
    as an HLO temp inside the decode program — 3.1GB at 7B, which OOMed
    bs>=4 and speculative decoding next to 12.55GB of resident params.
    [out, in] storage is already {in-minor}, so no copies are generated
    (verified via compiled.memory_analysis(): 1030MB -> ~0 temp at
    n_layers=2/dim=4096). Bonus: HF checkpoints import without transposes
    (convert_hf.py)."""

    features: int
    dtype: jnp.dtype = jnp.float32       # compute dtype (flax convention)
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal", in_axis=1, out_axis=0),
            (self.features, x.shape[-1]), self.param_dtype)
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        return jax.lax.dot_general(
            x, kernel, (((x.ndim - 1,), (1,)), ((), ())))


def _dense_general(cfg: LlamaConfig):
    """TDense (transposed-kernel linear), or the int8 weight-only drop-in
    under quant="int8" (llm_tpu.quant.QuantDenseGeneral; params from
    quant.quantize_params)."""
    if cfg.quant == "int8":
        from .quant import QuantDenseGeneral

        def make(features, use_bias=False, name=None, dtype=jnp.bfloat16):
            assert not use_bias
            return QuantDenseGeneral(features=features, dtype=dtype,
                                     name=name)
        return make

    def make(features, use_bias=False, name=None, dtype=jnp.bfloat16):
        assert not use_bias
        return TDense(features=features, dtype=dtype, name=name)
    return make


class Attention(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, cos, sin, kv_cache=None, cache_index=None,
                 kv_valid=None):
        cfg = self.cfg
        B, L, _ = x.shape
        H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
        dt = getattr(jnp, cfg.dtype)
        dense = _dense_general(cfg)
        # 2-D transposed kernels (TDense [out, in]), head split on the
        # ACTIVATION — see TDense for the layout/memory rationale.
        q = dense(H * D, use_bias=False, name="q_proj",
                  dtype=dt)(x).reshape(B, L, H, D)
        k = dense(KV * D, use_bias=False, name="k_proj",
                  dtype=dt)(x).reshape(B, L, KV, D)
        v = dense(KV * D, use_bias=False, name="v_proj",
                  dtype=dt)(x).reshape(B, L, KV, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if kv_cache is not None:
            # decode step: write new k/v at cache_index, attend to the cache
            ck, cv = kv_cache
            ck = jax.lax.dynamic_update_slice(ck, k, (0, cache_index, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v, (0, cache_index, 0, 0))
            k_all, v_all = ck, cv
            offset = cache_index
            new_cache = (ck, cv)
        else:
            k_all, v_all = k, v
            offset = 0
            new_cache = None

        # GQA: repeat kv heads
        if KV != H:
            rep = H // KV
            k_all = jnp.repeat(k_all, rep, axis=2)
            v_all = jnp.repeat(v_all, rep, axis=2)

        use_flash = (cfg.use_flash and kv_cache is None and kv_valid is None
                     and jax.default_backend() == "tpu" and D % 128 == 0)
        if use_flash:
            from .flash_attention import flash_attention
            # pad the sequence up to the kernel's 128 tile (SFT naturally
            # produces L = max_seq_len - 1). Trailing pad KEYS sit at
            # positions >= L, which no real causal query attends; pad QUERY
            # rows are garbage but sliced away.
            Lp = -(-L // 128) * 128
            if Lp != L:
                pad = ((0, 0), (0, Lp - L), (0, 0), (0, 0))
                out = flash_attention(jnp.pad(q, pad), jnp.pad(k_all, pad),
                                      jnp.pad(v_all, pad))[:, :L]
            else:
                out = flash_attention(q, k_all, v_all)
        else:
            out = _reference_attention(q, k_all, v_all, offset, kv_valid)
        out = dense(cfg.dim, use_bias=False, name="o_proj",
                    dtype=dt)(out.reshape(B, L, H * D))
        return out, new_cache


class MLP(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = getattr(jnp, cfg.dtype)
        dense = _dense_general(cfg)
        gate = dense(cfg.intermediate, use_bias=False, name="gate_proj",
                     dtype=dt)(x)
        up = dense(cfg.intermediate, use_bias=False, name="up_proj",
                   dtype=dt)(x)
        return dense(cfg.dim, use_bias=False, name="down_proj",
                     dtype=dt)(jax.nn.silu(gate) * up)


class Block(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, cos, sin, kv_cache=None, cache_index=None,
                 kv_valid=None):
        attn_out, new_cache = Attention(self.cfg, name="attn")(
            RMSNorm(self.cfg.norm_eps, name="input_norm")(x),
            cos, sin, kv_cache, cache_index, kv_valid)
        x = x + attn_out
        x = x + MLP(self.cfg, name="mlp")(
            RMSNorm(self.cfg.norm_eps, name="post_attn_norm")(x))
        return x, new_cache


class LlamaLM(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray,
                 positions: Optional[jnp.ndarray] = None,
                 kv_caches=None, cache_index=None, kv_valid=None,
                 return_hidden: bool = False):
        """tokens [B, L] -> logits [B, L, V]. With kv_caches (list of per-layer
        (k, v) buffers) performs incremental decoding at cache_index.
        kv_valid [B, S]: optional validity mask over kv slots (0 = never
        attend; used for left-padded batched decoding).
        return_hidden=True returns the final-norm hidden states [B, L, dim]
        INSTEAD of logits (lm_head not applied) — used by the chunked
        cross-entropy in sft.py so the [L, vocab] fp32 logits never
        materialise at long context."""
        cfg = self.cfg
        B, L = tokens.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
            if cache_index is not None:
                positions = positions + cache_index
        emb = nn.Embed(cfg.vocab_size, cfg.dim, name="tok_emb",
                       dtype=getattr(jnp, cfg.dtype))
        x = emb(tokens)
        cos, sin = rope_frequencies(cfg.head_dim, positions, cfg.rope_theta,
                                    cfg.rope_condense)
        cos = cos.astype(x.dtype)
        sin = sin.astype(x.dtype)
        new_caches = []
        # remat only pays off in training (no kv cache); decoding keeps the
        # plain blocks so cache pytrees pass through unwrapped
        block_cls = Block
        if cfg.remat and kv_caches is None:
            block_cls = nn.remat(Block, prevent_cse=False)
        for i in range(cfg.n_layers):
            cache_i = kv_caches[i] if kv_caches is not None else None
            x, new_cache = block_cls(cfg, name=f"layer_{i}")(
                x, cos, sin, cache_i, cache_index, kv_valid)
            new_caches.append(new_cache)
        x = RMSNorm(cfg.norm_eps, name="final_norm")(x)
        caches = new_caches if kv_caches is not None else None
        if return_hidden:
            return x, caches
        if cfg.tie_embeddings:
            # f32 matmul against the f32 embedding param (Embed.attend would
            # round both sides to cfg.dtype — bf16 logits over a 30k+ vocab)
            logits = x.astype(jnp.float32) @ emb.embedding.astype(
                jnp.float32).T
        else:
            logits = _dense_general(cfg)(
                cfg.vocab_size, use_bias=False, name="lm_head",
                dtype=jnp.float32)(x.astype(jnp.float32))
        return logits, caches

    def init_kv_cache(self, batch_size: int, max_len: int):
        cfg = self.cfg
        shape = (batch_size, max_len, cfg.n_kv_heads, cfg.head_dim)
        dtype = getattr(jnp, cfg.dtype)
        return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
                for _ in range(cfg.n_layers)]
