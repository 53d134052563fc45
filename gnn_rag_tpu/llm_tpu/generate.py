"""Decoding for the TPU LLM: jitted batched greedy and beam search.

The whole decode loop lives on device inside ``lax.while_loop`` /
``lax.fori_loop`` — one host round-trip per *generation*, not per token
(round 1 dispatched every token from the host, unusable at the
gen_rule_path.py:71-99 scale of thousands of questions). Prompts are
batched LEFT-padded so every row's last prompt token sits at the same slot;
RoPE positions and attention validity are per-row exact via an explicit
kv-slot mask.

Beam search mirrors what rag/gen_rule_path needs from HF generate
(reference: llm/src/qa_prediction/gen_rule_path.py:71-99): N beams, N
returned sequences, per-sequence scores (sum log-prob / length, HF's
``sequences_scores`` with length_penalty 1.0) plus softmax-normalised
scores.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .model import LlamaLM

NEG_INF = -1e30


def _left_pad(prompts: List[List[int]], pad_to_multiple: int = 32,
              pad_id: int = 0, budget: Optional[int] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Left-pad a ragged prompt batch -> (tokens [B, L], mask [B, L]).

    L rounds up to a bucket (bounding recompiles across ragged batches)
    unless that would overflow ``budget`` (max_len - max_new_tokens)."""
    L = max(len(p) for p in prompts)
    Lb = -(-L // pad_to_multiple) * pad_to_multiple
    L = Lb if budget is None or Lb <= budget else L
    B = len(prompts)
    toks = np.full((B, L), pad_id, np.int32)
    mask = np.zeros((B, L), np.float32)
    for i, p in enumerate(prompts):
        toks[i, L - len(p):] = p
        mask[i, L - len(p):] = 1.0
    return toks, mask


class Decoder:
    """Batched KV-cache decoder over a LlamaLM.

    ``greedy_batch``/``beam_search_batch`` jit-compile once per
    (batch, prompt-bucket, max_new, num_beams) shape; single-prompt
    ``greedy``/``beam_search`` wrap them.
    """

    def __init__(self, model: LlamaLM, params, max_len: int = 512):
        self.model = model
        self.params = params
        self.max_len = max_len
        self._greedy = jax.jit(self._greedy_impl, static_argnums=(3, 4))
        self._beam = jax.jit(self._beam_impl, static_argnums=(3, 4, 5))

    # ------------------------------------------------------------- helpers
    def _prefill(self, params, tokens, mask):
        B, L = tokens.shape
        caches = self.model.init_kv_cache(B, self.max_len)
        positions = (jnp.cumsum(mask, axis=1) - 1.0) * mask   # pads -> 0
        kv_valid = jnp.zeros((B, self.max_len), jnp.float32)
        kv_valid = jax.lax.dynamic_update_slice(kv_valid, mask, (0, 0))
        logits, caches = self.model.apply(
            params, tokens, positions=positions.astype(jnp.int32),
            kv_caches=caches, cache_index=0, kv_valid=kv_valid)
        return logits, caches, kv_valid

    def _decode_one(self, params, cur, caches, kv_valid, slot, positions):
        """One token for every row: cur [B,1] at cache slot ``slot``."""
        kv_valid = jax.lax.dynamic_update_slice(
            kv_valid, jnp.ones_like(cur, jnp.float32), (0, slot))
        logits, caches = self.model.apply(
            params, cur, positions=positions, kv_caches=caches,
            cache_index=slot, kv_valid=kv_valid)
        return logits[:, -1], caches, kv_valid

    # ------------------------------------------------------------- greedy
    def _greedy_impl(self, params, tokens, mask, max_new: int, eos_id: int):
        B, L = tokens.shape
        logits, caches, kv_valid = self._prefill(params, tokens, mask)
        true_len = jnp.sum(mask, axis=1).astype(jnp.int32)    # [B]
        first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        out = jnp.zeros((B, max_new), jnp.int32)
        out = out.at[:, 0].set(first)
        done = first == eos_id

        def cond(state):
            i, _, _, _, done, _ = state
            return jnp.logical_and(i < max_new, ~jnp.all(done))

        def body(state):
            i, cur, caches, kv_valid, done, out = state
            slot = L + i - 1
            pos = (true_len + i - 1)[:, None]
            nxt_logits, caches, kv_valid = self._decode_one(
                params, cur[:, None], caches, kv_valid, slot, pos)
            nxt = jnp.argmax(nxt_logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, eos_id, nxt)
            out = jax.lax.dynamic_update_slice_in_dim(
                out, nxt[:, None], i, axis=1)
            done = jnp.logical_or(done, nxt == eos_id)
            return i + 1, nxt, caches, kv_valid, done, out

        _, _, _, _, done, out = jax.lax.while_loop(
            cond, body, (jnp.asarray(1), first, caches, kv_valid, done, out))
        return out

    def greedy_batch(self, prompts: List[List[int]], max_new_tokens: int = 128,
                     eos_id: Optional[int] = None) -> List[List[int]]:
        toks, mask = _left_pad(prompts, budget=self.max_len - max_new_tokens)
        assert toks.shape[1] + max_new_tokens <= self.max_len, (
            toks.shape, max_new_tokens, self.max_len)
        out = np.asarray(self._greedy(self.params, jnp.asarray(toks),
                                      jnp.asarray(mask), max_new_tokens,
                                      -1 if eos_id is None else eos_id))
        res = []
        for row in out:
            seq = row.tolist()
            if eos_id is not None and eos_id in seq:
                seq = seq[: seq.index(eos_id) + 1]
            res.append(seq)
        return res

    def greedy(self, prompt_tokens: List[int], max_new_tokens: int = 128,
               eos_id: Optional[int] = None) -> List[int]:
        return self.greedy_batch([prompt_tokens], max_new_tokens, eos_id)[0]

    # ------------------------------------------------------------- beam
    def _beam_impl(self, params, tokens, mask, num_beams: int, max_new: int,
                   eos_id: int):
        B, L = tokens.shape
        K = num_beams
        V = self.model.cfg.vocab_size
        logits, caches, kv_valid = self._prefill(params, tokens, mask)
        true_len = jnp.sum(mask, axis=1).astype(jnp.int32)

        lp0 = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        beam_scores, first = jax.lax.top_k(lp0, K)            # [B, K]
        beam_toks = jnp.zeros((B, K, max_new), jnp.int32)
        beam_toks = beam_toks.at[:, :, 0].set(first)

        # beams share the prompt cache: repeat rows K times -> [B*K, ...]
        caches = jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, K, axis=0), caches)
        kv_valid = jnp.repeat(kv_valid, K, axis=0)
        true_rep = jnp.repeat(true_len, K, axis=0)

        fin_scores = jnp.full((B, K), NEG_INF, jnp.float32)
        fin_toks = jnp.zeros((B, K, max_new), jnp.int32)
        fin_lens = jnp.ones((B, K), jnp.int32)
        batch_idx = jnp.arange(B)

        def body(i, state):
            caches, kv_valid, beam_scores, beam_toks, fin_scores, fin_toks, \
                fin_lens = state
            cur = beam_toks[:, :, i - 1].reshape(B * K, 1)
            slot = L + i - 1
            pos = (true_rep + i - 1)[:, None]
            nxt_logits, caches, kv_valid = self._decode_one(
                params, cur, caches, kv_valid, slot, pos)
            lp = jax.nn.log_softmax(nxt_logits.astype(jnp.float32), axis=-1)
            cand = beam_scores[:, :, None] + lp.reshape(B, K, V)
            top_s, top_i = jax.lax.top_k(cand.reshape(B, K * V), 2 * K)
            tok = (top_i % V).astype(jnp.int32)               # [B, 2K]
            src = top_i // V
            is_eos = tok == eos_id

            # candidate buffers: source beam's tokens with position i set
            cand_toks = jnp.take_along_axis(beam_toks, src[:, :, None],
                                            axis=1)           # [B, 2K, T]
            cand_toks = jax.lax.dynamic_update_slice_in_dim(
                cand_toks, tok[:, :, None], i, axis=2)

            # finished hypotheses: eos candidates ranked < K (HF beam rule);
            # normalised score = sum logprob / generated length (incl eos)
            rank_ok = jnp.arange(2 * K)[None, :] < K
            eos_norm = jnp.where(jnp.logical_and(is_eos, rank_ok),
                                 top_s / (i + 1.0), NEG_INF)
            all_s = jnp.concatenate([fin_scores, eos_norm], axis=1)
            all_t = jnp.concatenate([fin_toks, cand_toks], axis=1)
            all_l = jnp.concatenate(
                [fin_lens, jnp.full((B, 2 * K), i + 1, jnp.int32)], axis=1)
            fin_scores, keep = jax.lax.top_k(all_s, K)
            fin_toks = all_t[batch_idx[:, None], keep]
            fin_lens = all_l[batch_idx[:, None], keep]

            # continuing beams: best K non-eos candidates
            cont_s = jnp.where(is_eos, NEG_INF, top_s)
            beam_scores, pick = jax.lax.top_k(cont_s, K)      # [B, K]
            src_k = jnp.take_along_axis(src, pick, axis=1)
            beam_toks = jnp.take_along_axis(cand_toks, pick[:, :, None],
                                            axis=1)
            flat_src = (batch_idx[:, None] * K + src_k).reshape(-1)
            caches = jax.tree_util.tree_map(lambda x: x[flat_src], caches)
            return (caches, kv_valid, beam_scores, beam_toks, fin_scores,
                    fin_toks, fin_lens)

        state = (caches, kv_valid, beam_scores, beam_toks, fin_scores,
                 fin_toks, fin_lens)
        state = jax.lax.fori_loop(1, max_new, body, state)
        _, _, beam_scores, beam_toks, fin_scores, fin_toks, fin_lens = state

        # finalize: running beams enter at length max_new (HF finalize rule)
        all_s = jnp.concatenate([fin_scores, beam_scores / max_new], axis=1)
        all_t = jnp.concatenate([fin_toks, beam_toks], axis=1)
        all_l = jnp.concatenate(
            [fin_lens, jnp.full((B, K), max_new, jnp.int32)], axis=1)
        out_s, keep = jax.lax.top_k(all_s, K)
        out_t = all_t[batch_idx[:, None], keep]
        out_l = all_l[batch_idx[:, None], keep]
        return out_t, out_l, out_s

    def beam_search_batch(self, prompts: List[List[int]], num_beams: int = 3,
                          max_new_tokens: int = 128,
                          eos_id: Optional[int] = None
                          ) -> List[Tuple[List[List[int]], np.ndarray,
                                          np.ndarray]]:
        """Returns per prompt: (sequences, scores, norm_scores)."""
        toks, mask = _left_pad(prompts, budget=self.max_len - max_new_tokens)
        assert toks.shape[1] + max_new_tokens <= self.max_len, (
            toks.shape, max_new_tokens, self.max_len)
        out_t, out_l, out_s = self._beam(
            self.params, jnp.asarray(toks), jnp.asarray(mask), num_beams,
            max_new_tokens, -1 if eos_id is None else eos_id)
        out_t = np.asarray(out_t)
        out_l = np.asarray(out_l)
        out_s = np.asarray(out_s, np.float64)
        res = []
        for b in range(len(prompts)):
            seqs = [out_t[b, k, : out_l[b, k]].tolist()
                    for k in range(num_beams)]
            scores = out_s[b]
            e = np.exp(scores - scores.max())
            res.append((seqs, scores, e / e.sum()))
        return res

    def beam_search(self, prompt_tokens: List[int], num_beams: int = 3,
                    max_new_tokens: int = 128,
                    eos_id: Optional[int] = None
                    ) -> Tuple[List[List[int]], np.ndarray, np.ndarray]:
        return self.beam_search_batch([prompt_tokens], num_beams,
                                      max_new_tokens, eos_id)[0]


class SpeculativeDecoder:
    """Greedy speculative decoding (draft-and-verify), single sequence.

    A small DRAFT model proposes ``gamma`` tokens from its own kv cache;
    the TARGET model scores all of them in ONE chunked forward (γ+1
    positions through its kv cache) and the longest agreeing prefix is
    accepted plus one bonus token from the target's own argmax — so the
    output is EXACTLY the target's greedy continuation, but the target
    runs once per accepted-run instead of once per token. bs=1 by design:
    speculation is the low-batch-latency lever (at bs>=8 the weight
    stream is already amortised; batch rows would also accept different
    lengths, needing per-row cache frontiers the kv layout doesn't have).

    New capability (serving): the reference decodes token-by-token through
    HF pipelines (llama.py:15-36). Combine with weight-only int8
    (llm_tpu.quant) for the full low-latency single-chip serving story.

    Exactness contract (tested): for any draft, output == Decoder.greedy
    of the target. Draft and target must share the tokenizer/vocab.
    """

    def __init__(self, target: LlamaLM, target_params, draft: LlamaLM,
                 draft_params, max_len: int = 512, gamma: int = 4):
        assert target.cfg.vocab_size == draft.cfg.vocab_size
        assert gamma >= 1, "speculation needs at least one draft token"
        self.target = target
        self.tp = target_params
        self.draft = draft
        self.dp = draft_params
        self.max_len = max_len
        self.gamma = int(gamma)
        self._run = jax.jit(self._spec_impl, static_argnums=(3, 4))

    # ------------------------------------------------------------------
    def _chunk_forward(self, model, params, caches, tokens_1xc, start_slot):
        """Forward C tokens at slots [start, start+C) of the kv cache.
        Validity = everything up to and including this chunk."""
        C = tokens_1xc.shape[1]
        positions = (start_slot + jnp.arange(C, dtype=jnp.int32))[None, :]
        kv_valid = (jnp.arange(self.max_len, dtype=jnp.int32)[None, :]
                    < start_slot + C).astype(jnp.float32)
        logits, caches = model.apply(params, tokens_1xc, positions=positions,
                                     kv_caches=caches,
                                     cache_index=start_slot,
                                     kv_valid=kv_valid)
        return logits, caches

    def _spec_impl(self, tp, dp, tokens, max_new: int, eos_id: int):
        """tokens [1, L] (exact prompt, no padding)."""
        L = tokens.shape[1]
        gamma = self.gamma
        caches_t = self.target.init_kv_cache(1, self.max_len)
        caches_d = self.draft.init_kv_cache(1, self.max_len)
        logits_t, caches_t = self._chunk_forward(self.target, tp, caches_t,
                                                 tokens, 0)
        _, caches_d = self._chunk_forward(self.draft, dp, caches_d,
                                          tokens, 0)
        first = jnp.argmax(logits_t[0, -1]).astype(jnp.int32)
        cap = max_new + gamma + 1
        out = jnp.zeros(cap, jnp.int32).at[0].set(first)
        state = (jnp.asarray(1, jnp.int32),       # n_out emitted
                 first,                           # last accepted token
                 caches_t, caches_d,
                 first == eos_id,                 # done
                 out,
                 jnp.asarray(0, jnp.int32),       # target forwards
                 jnp.asarray(0, jnp.int32))       # accepted draft tokens

    # loop invariant: the last accepted token `cur` sits at slot
    # L + n_out - 1 and is NOT yet in either cache.

        def cond(st):
            n_out, _, _, _, done, _, _, _ = st
            return jnp.logical_and(n_out < max_new, ~done)

        def body(st):
            n_out, cur, caches_t, caches_d, done, out, n_fwd, n_acc = st
            s = L + n_out - 1

            # ---- draft proposes gamma tokens autoregressively. One EXTRA
            # step (gamma+1 total, prediction discarded) consumes the last
            # draft token so the draft cache covers slot s+gamma — without
            # it, a fully-accepted round leaves a hole the next round's
            # attention would read as zeros.
            def d_step(g, dst):
                d_cur, caches_d, drafts = dst
                lg, caches_d = self._chunk_forward(
                    self.draft, dp, caches_d, d_cur[None, None], s + g)
                nxt = jnp.argmax(lg[0, -1]).astype(jnp.int32)
                return nxt, caches_d, drafts.at[g].set(nxt)

            d0 = (cur, caches_d, jnp.zeros(gamma + 1, jnp.int32))
            _, caches_d, drafts = jax.lax.fori_loop(0, gamma + 1, d_step, d0)
            drafts = drafts[:gamma]

            # ---- target verifies the whole run in one chunk forward
            chunk = jnp.concatenate([cur[None], drafts])[None, :]  # [1, γ+1]
            lg_t, caches_t = self._chunk_forward(self.target, tp,
                                                 caches_t, chunk, s)
            preds = jnp.argmax(lg_t[0], axis=-1).astype(jnp.int32)  # [γ+1]

            # longest prefix of drafts matching the target's argmax
            agree = preds[:gamma] == drafts
            k = jnp.argmin(jnp.concatenate(
                [agree, jnp.zeros(1, bool)]).astype(jnp.int32))  # 0..γ
            # emit drafts[:k] + bonus preds[k]; truncate at the first eos
            emitted = jnp.where(jnp.arange(gamma + 1) < k,
                                jnp.concatenate([drafts, drafts[-1:]]),
                                preds[jnp.minimum(k, gamma)])
            is_eos = emitted == eos_id
            first_eos = jnp.argmax(jnp.concatenate(
                [is_eos, jnp.ones(1, bool)]).astype(jnp.int32))
            n_emit = jnp.minimum(k + 1, first_eos + 1).astype(jnp.int32)
            out = jax.lax.dynamic_update_slice(out, emitted, (n_out,))
            new_done = first_eos < n_emit
            return (n_out + n_emit, emitted[n_emit - 1], caches_t, caches_d,
                    new_done, out, n_fwd + 1, n_acc + k)

        n_out, _, _, _, _, out, n_fwd, n_acc = jax.lax.while_loop(
            cond, body, state)
        return out, n_out, n_fwd, n_acc

    # ------------------------------------------------------------------
    def greedy(self, prompt_tokens: List[int], max_new_tokens: int = 128,
               eos_id: Optional[int] = None) -> List[int]:
        toks = jnp.asarray(np.asarray(prompt_tokens, np.int32)[None, :])
        assert toks.shape[1] + max_new_tokens + self.gamma + 1 <= self.max_len
        out, n_out, n_fwd, n_acc = self._run(
            self.tp, self.dp, toks, max_new_tokens,
            -1 if eos_id is None else eos_id)
        n = min(int(n_out), max_new_tokens)
        seq = np.asarray(out)[:n].tolist()
        if eos_id is not None and eos_id in seq:
            seq = seq[: seq.index(eos_id) + 1]
        self.last_stats = {"target_forwards": int(n_fwd) + 1,
                           "draft_accepted": int(n_acc),
                           "tokens": len(seq)}
        return seq
