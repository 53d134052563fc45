"""Decoding for the TPU LLM: greedy and beam search with a KV cache.

Beam search mirrors what rag/gen_rule_path needs from HF generate
(reference: llm/src/qa_prediction/gen_rule_path.py:71-99): N beams, N
returned sequences, per-sequence scores (mean log-prob, HF's
``sequences_scores`` with length_penalty 1.0) plus softmax-normalised scores.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .model import LlamaLM


class Decoder:
    def __init__(self, model: LlamaLM, params, max_len: int = 512):
        self.model = model
        self.params = params
        self.max_len = max_len

        @jax.jit
        def _prefill(params, tokens, caches):
            logits, caches = model.apply(params, tokens, kv_caches=caches,
                                         cache_index=0)
            return logits, caches

        @jax.jit
        def _step(params, tok, caches, index):
            logits, caches = model.apply(params, tok, kv_caches=caches,
                                         cache_index=index)
            return logits[:, -1], caches

        self._prefill = _prefill
        self._step = _step

    # ------------------------------------------------------------------
    def greedy(self, prompt_tokens: List[int], max_new_tokens: int = 128,
               eos_id: Optional[int] = None) -> List[int]:
        tokens = jnp.asarray([prompt_tokens], jnp.int32)
        caches = self.model.init_kv_cache(1, self.max_len)
        logits, caches = self._prefill(self.params, tokens, caches)
        cur = int(jnp.argmax(logits[0, len(prompt_tokens) - 1]))
        out = [cur]
        index = len(prompt_tokens)
        for _ in range(max_new_tokens - 1):
            if eos_id is not None and cur == eos_id:
                break
            logits, caches = self._step(
                self.params, jnp.asarray([[cur]], jnp.int32), caches,
                jnp.asarray(index, jnp.int32))
            cur = int(jnp.argmax(logits[0]))
            out.append(cur)
            index += 1
        return out

    # ------------------------------------------------------------------
    def beam_search(self, prompt_tokens: List[int], num_beams: int = 3,
                    max_new_tokens: int = 128,
                    eos_id: Optional[int] = None
                    ) -> Tuple[List[List[int]], np.ndarray, np.ndarray]:
        """Returns (sequences, scores, norm_scores): num_beams generated
        token lists, their mean log-probs, and softmax-normalised scores."""
        Lp = len(prompt_tokens)
        tokens = jnp.asarray([prompt_tokens], jnp.int32)
        caches = self.model.init_kv_cache(1, self.max_len)
        logits, caches = self._prefill(self.params, tokens, caches)
        logprobs = jax.nn.log_softmax(logits[0, Lp - 1])
        top = jnp.argsort(-logprobs)[:num_beams]
        beam_scores = np.asarray(logprobs[top], np.float64)
        beams = [[int(t)] for t in np.asarray(top)]
        finished: List[Tuple[List[int], float]] = []
        # replicate cache across beams
        caches = jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, num_beams, axis=0), caches)
        index = Lp
        for _ in range(max_new_tokens - 1):
            last = jnp.asarray([[b[-1]] for b in beams], jnp.int32)
            logits, caches = self._step(self.params, last, caches,
                                        jnp.asarray(index, jnp.int32))
            lp = np.asarray(jax.nn.log_softmax(logits, axis=-1), np.float64)
            cand_scores = beam_scores[:, None] + lp      # [n_beams, V]
            flat = cand_scores.reshape(-1)
            order = np.argsort(-flat)[: 2 * num_beams]
            new_beams, new_scores, origins = [], [], []
            for idx in order:
                b, tok = divmod(int(idx), lp.shape[-1])
                seq = beams[b] + [tok]
                if eos_id is not None and tok == eos_id:
                    finished.append((seq, flat[idx] / len(seq)))
                    continue
                new_beams.append(seq)
                new_scores.append(flat[idx])
                origins.append(b)
                if len(new_beams) == num_beams:
                    break
            if not new_beams or len(finished) >= num_beams:
                break
            beams = new_beams
            beam_scores = np.asarray(new_scores)
            reorder = jnp.asarray(origins, jnp.int32)
            caches = jax.tree_util.tree_map(lambda x: x[reorder], caches)
            index += 1
        for b, s in zip(beams, beam_scores):
            finished.append((b, s / len(b)))
        finished.sort(key=lambda x: -x[1])
        finished = finished[:num_beams]
        seqs = [f[0] for f in finished]
        scores = np.asarray([f[1] for f in finished])
        e = np.exp(scores - scores.max())
        return seqs, scores, e / e.sum()
