"""SFT trainer: completion-only cross-entropy on TPU meshes.

The JAX equivalent of the reference's trl SFTTrainer +
DataCollatorForCompletionOnlyLM + deepspeed ZeRO-3 launch
(llm/src/joint_training/joint_finetuning.py:84-185, scripts/train.sh:8-32):

* loss masked to the tokens AFTER the response template ("[/INST]"), like
  DataCollatorForCompletionOnlyLM (joint_finetuning.py:131-134);
* special-token additions resize the embedding with mean init, matching
  smart_tokenizer_and_embedding_resize semantics;
* dp batch sharding + megatron-style tp parameter sharding (sharding.py)
  instead of NCCL ZeRO;
* orbax checkpointing with last-checkpoint auto-resume
  (joint_finetuning.py:146-170).
"""

from __future__ import annotations

import dataclasses
import os
import re
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.checkpoint import load_pytree, save_pytree
from .model import LlamaConfig, LlamaLM
from .sharding import shard_llm_params

SEP, BOP, EOP, PAD = "<SEP>", "<PATH>", "</PATH>", "<PAD>"
RESPONSE_TEMPLATE = "[/INST]"


def resize_embeddings(params: dict, old_vocab: int, new_vocab: int) -> dict:
    """Mean-init rows for added tokens (reference training_utils semantics:
    new embeddings = mean of existing ones)."""
    if new_vocab == old_vocab:
        return params
    p = params["params"]
    emb = np.asarray(p["tok_emb"]["embedding"])
    mean = emb.mean(axis=0, keepdims=True)
    extra = np.repeat(mean, new_vocab - old_vocab, axis=0)
    p["tok_emb"]["embedding"] = jnp.asarray(np.concatenate([emb, extra]))
    head = np.asarray(p["lm_head"]["kernel"])          # TDense: [V, D]
    mean_h = head.mean(axis=0, keepdims=True)
    extra_h = np.repeat(mean_h, new_vocab - old_vocab, axis=0)
    p["lm_head"]["kernel"] = jnp.asarray(np.concatenate([head, extra_h], 0))
    return params


def completion_mask(token_ids: Sequence[int],
                    template_ids: Sequence[int]) -> np.ndarray:
    """1.0 for label positions strictly after the LAST occurrence of the
    response template (DataCollatorForCompletionOnlyLM behaviour)."""
    ids = list(token_ids)
    t = list(template_ids)
    mask = np.zeros(len(ids), np.float32)
    last = -1
    for i in range(len(ids) - len(t) + 1):
        if ids[i:i + len(t)] == t:
            last = i
    if last >= 0:
        mask[last + len(t):] = 1.0
    return mask


def pack_examples(texts: List[str], tokenize: Callable[[str], List[int]],
                  template_ids: Sequence[int], max_len: int, pad_id: int):
    """texts -> (tokens [N, max_len], loss_mask [N, max_len])."""
    toks = np.full((len(texts), max_len), pad_id, np.int32)
    mask = np.zeros((len(texts), max_len), np.float32)
    for i, text in enumerate(texts):
        ids = tokenize(text)[:max_len]
        toks[i, :len(ids)] = ids
        mask[i, :len(ids)] = completion_mask(ids, template_ids)[:len(ids)]
    return toks, mask


def chunked_completion_loss(model, params, tokens, loss_mask,
                            chunk: int = 2048):
    """Completion-only NLL with the vocab projection applied per sequence
    chunk under lax.scan + jax.checkpoint.

    At long context the [L, vocab] float32 logits (and their softmax/grad
    twins) dominate peak HBM — ~1 GB per 8k tokens at V=32000, several copies
    live at once through autodiff. Scanning chunks of the final hidden states
    through the lm_head keeps only [chunk, vocab] alive; the checkpoint makes
    the backward recompute each chunk's logits instead of stashing them."""
    hidden, _ = model.apply(params, tokens[:, :-1], return_hidden=True)
    if getattr(model.cfg, "tie_embeddings", False):
        w = params["params"]["tok_emb"]["embedding"]     # [V, D] (tied)
    else:
        w = params["params"]["lm_head"]["kernel"]        # TDense: [V, D]
    targets, mask = tokens[:, 1:], loss_mask[:, 1:]
    B, L, D = hidden.shape
    pad = (-L) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    n = (L + pad) // chunk
    hidden = jnp.moveaxis(hidden.reshape(B, n, chunk, D), 1, 0)
    targets = jnp.moveaxis(targets.reshape(B, n, chunk), 1, 0)
    mask = jnp.moveaxis(mask.reshape(B, n, chunk), 1, 0)

    @jax.checkpoint
    def chunk_nll(h_c, t_c, m_c):
        logits = jnp.einsum("bcd,vd->bcv", h_c.astype(jnp.float32), w)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, t_c[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * m_c)

    def body(acc, xs):
        return acc + chunk_nll(*xs), None

    total, _ = jax.lax.scan(body, jnp.float32(0.0), (hidden, targets, mask))
    return total / jnp.maximum(jnp.sum(mask), 1.0)


@dataclass
class SFTConfig:
    output_dir: str = "saved_models/sft"
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    warmup_steps: int = 10
    total_steps: int = 1000
    batch_size: int = 8
    max_seq_len: int = 2048
    grad_clip: float = 1.0
    save_every: int = 200
    seed: int = 0
    dp: int = 1
    tp: int = 1
    # experiment reporting, HF-Trainer style (llm/scripts/train.sh:29
    # passes --report_to wandb): "wandb" logs step/loss/lr if the wandb
    # package is importable, anything else (or wandb absent) is a no-op.
    report_to: str = "none"
    # >0: compute the loss with chunked_completion_loss over this many
    # tokens at a time (long-context HBM saver); 0 = dense lm_head
    loss_chunk: int = 0


class SFTTrainer:
    def __init__(self, model_cfg: LlamaConfig, cfg: SFTConfig,
                 params=None, mesh=None):
        self.model = LlamaLM(model_cfg)
        self.cfg = cfg
        self.mesh = mesh
        if params is None:
            dummy = jnp.zeros((1, 8), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(cfg.seed), dummy)
        if mesh is not None:
            params = shard_llm_params(mesh, params)
        self.params = params

        warmup = min(cfg.warmup_steps, max(cfg.total_steps // 10, 1))
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, warmup, max(cfg.total_steps, warmup + 1))
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(schedule, weight_decay=cfg.weight_decay))
        self.opt_state = self.tx.init(self.params)
        self.step = 0

        def train_step(params, opt_state, tokens, loss_mask):
            def loss_fn(p):
                if cfg.loss_chunk > 0:
                    return chunked_completion_loss(self.model, p, tokens,
                                                   loss_mask, cfg.loss_chunk)
                logits, _ = self.model.apply(p, tokens[:, :-1])
                targets = tokens[:, 1:]
                mask = loss_mask[:, 1:]
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(logp, targets[..., None],
                                           axis=-1)[..., 0]
                return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._reporter = self._init_reporter()

    def _init_reporter(self):
        if self.cfg.report_to != "wandb":
            return None
        try:
            import wandb
        except ImportError:
            print("report_to=wandb requested but wandb is not installed; "
                  "continuing without reporting")
            return None
        wandb.init(project=os.environ.get("WANDB_PROJECT", "gnn-rag-tpu"),
                   config=dataclasses.asdict(self.cfg), resume="allow")
        return wandb

    # ------------------------------------------------------------------
    def _batch_indices(self, N: int, step: int) -> np.ndarray:
        """Epoch-shuffled sampling WITHOUT replacement (HF Trainer epoch
        semantics): the example stream is the concatenation of per-epoch
        permutations, each derived deterministically from (seed, epoch), so
        every example is seen exactly once per N/batch_size steps and a
        resumed run continues the same stream."""
        B = self.cfg.batch_size
        pos = step * B
        idx = np.empty(B, dtype=np.int64)
        got = 0
        while got < B:
            epoch, off = divmod(pos + got, N)
            # small dict cache (keyed by (epoch, N), keeps the last two
            # epochs) so a batch straddling an epoch boundary doesn't
            # regenerate the N-element permutation every lookup alternation
            cache = getattr(self, "_perm_cache", None)
            if cache is None:
                cache = self._perm_cache = {}
            perm = cache.get((epoch, N))
            if perm is None:
                perm = np.random.default_rng(
                    (self.cfg.seed, epoch)).permutation(N)
                cache[(epoch, N)] = perm
                for k in list(cache)[:-2]:
                    del cache[k]
            take = min(B - got, N - off)
            idx[got:got + take] = perm[off:off + take]
            got += take
        return idx

    def train(self, tokens: np.ndarray, loss_mask: np.ndarray,
              steps: Optional[int] = None, log_every: int = 50,
              resume: bool = True):
        """tokens/loss_mask: [N, L] host arrays; epoch-shuffled batches."""
        cfg = self.cfg
        if resume:
            self.maybe_resume()
        N = tokens.shape[0]
        steps = steps if steps is not None else cfg.total_steps
        losses = []
        while self.step < steps:
            idx = self._batch_indices(N, self.step)
            batch_tok = jnp.asarray(tokens[idx])
            batch_mask = jnp.asarray(loss_mask[idx])
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                sh = NamedSharding(self.mesh, P("dp"))
                batch_tok = jax.device_put(batch_tok, sh)
                batch_mask = jax.device_put(batch_mask, sh)
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, batch_tok, batch_mask)
            losses.append(float(loss))
            self.step += 1
            if self._reporter is not None:
                self._reporter.log({"train/loss": losses[-1],
                                    "train/step": self.step})
            if self.step % log_every == 0:
                print(f"step {self.step}: loss {np.mean(losses[-log_every:]):.4f}")
            if self.step % cfg.save_every == 0:
                self.save()
        return losses

    # ------------------------------------------------------------------
    def _ckpt_path(self, step: int) -> str:
        return os.path.join(self.cfg.output_dir, f"checkpoint-{step}")

    def save(self):
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        save_pytree(self._ckpt_path(self.step), self.params)

    def last_checkpoint(self) -> Optional[int]:
        if not os.path.isdir(self.cfg.output_dir):
            return None
        steps = []
        for name in os.listdir(self.cfg.output_dir):
            m = re.fullmatch(r"checkpoint-(\d+)(\.msgpack)?", name)
            if m:
                steps.append(int(m.group(1)))
        return max(steps) if steps else None

    def maybe_resume(self) -> bool:
        """Auto-resume from the latest checkpoint (joint_finetuning.py:146-170)."""
        last = self.last_checkpoint()
        if last is None:
            return False
        from ..utils.checkpoint import validate_shapes
        self.params = validate_shapes(
            load_pytree(self._ckpt_path(last), self.params),
            self.params, context=self._ckpt_path(last))
        self.step = last
        return True
