"""Trainer: epoch loop, Adam + exponential decay, gradient clipping, best-H1/F1
checkpointing, final test eval.

Functional JAX re-design of Trainer_KBQA (reference: gnn/train_model.py:24-253):
the whole optimisation step — forward, loss, grads, clip, Adam update — is one
jitted function; host work is batch assembly and metric aggregation only.
"""

from __future__ import annotations

import math
import os
import time
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.loader import KGQADataset
from ..models import ReaRev
from ..models import base as model_base
from ..utils.checkpoint import load_pytree, save_pytree
from ..utils.logging import create_logger
from .evaluate import Evaluator
from .metrics import train_f1_device


def build_model(cfg: Config, num_entity: int, num_kb_relation: int,
                num_word: int = 0):
    name = cfg.model.model_name
    if name == "ReaRev":
        return ReaRev(cfg=cfg.model, num_entity=num_entity,
                      num_relation=num_kb_relation, num_word=num_word)
    if name == "NSM":
        from ..models.nsm import NSM
        return NSM(cfg=cfg.model, num_entity=num_entity,
                   num_relation=num_kb_relation, num_word=num_word)
    if name == "GraftNet":
        from ..models.graftnet import GraftNet
        return GraftNet(cfg=cfg.model, num_entity=num_entity,
                        num_relation=num_kb_relation, num_word=num_word)
    raise ValueError(f"unknown model {name}")


class Trainer:
    def __init__(self, cfg: Config, *, train_data: Optional[KGQADataset],
                 valid_data: KGQADataset, test_data: KGQADataset,
                 num_entity: int, num_kb_relation: int, num_word: int = 0,
                 rel_hidden=None, rel_hidden_inv=None, rel_text_mask=None,
                 entity_emb=None, word_emb=None, relation_emb=None,
                 id2entity: Optional[dict] = None, logger=None,
                 decode_question=None, mesh=None,
                 lm_source: Optional[str] = None):
        self.cfg = cfg
        self.mesh = mesh
        # weight provenance: stamped into checkpoint metadata and the .info
        # sidecar so a silent random-init fallback is always visible
        self.lm_source = lm_source
        self.train_data = train_data
        self.valid_data = valid_data
        self.test_data = test_data
        self.num_entity = num_entity
        self.rel_args = tuple(
            jnp.asarray(x) if x is not None else None
            for x in (rel_hidden, rel_hidden_inv, rel_text_mask,
                      entity_emb, word_emb, relation_emb))
        self.logger = logger or create_logger("trainer", cfg.train.checkpoint_dir,
                                              config=cfg.model)
        self.model = build_model(cfg, num_entity, num_kb_relation, num_word)

        # --- init params on the two SMALLEST sample graphs, under jit:
        # unjitted flax init dispatches every op eagerly (minutes of remote
        # round-trips at real shapes through the TPU tunnel), and parameter
        # shapes don't depend on the graph bucket anyway ---
        sample = (train_data or test_data)
        smallest = np.argsort([r.n_facts for r in sample.records])[:2]
        init_batch = sample.make_batch(smallest)
        self.rng = jax.random.PRNGKey(cfg.train.seed)
        self.rng, init_rng = jax.random.split(self.rng)
        self.params = jax.jit(self.model.init)(init_rng, init_batch,
                                               *self.rel_args)

        # --- optimiser: clip -> Adam with per-epoch exponential decay
        #     (train_model.py:89-94,133-134) ---
        steps_per_epoch = max(
            1, math.ceil((train_data.num_data if train_data else 1)
                         / cfg.train.batch_size))
        if cfg.train.decay_rate > 0:
            schedule = optax.exponential_decay(
                cfg.train.lr, transition_steps=steps_per_epoch,
                decay_rate=cfg.train.decay_rate, staircase=True)
        else:
            schedule = cfg.train.lr
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.train.gradient_clip),
            optax.adam(schedule))
        self.opt_state = self.tx.init(self.params)

        num_iter = {"ReaRev": cfg.model.num_iter, "NSM": cfg.model.num_step,
                    "GraftNet": cfg.model.num_layer}[cfg.model.model_name]
        self.evaluator = Evaluator(eps=cfg.model.eps, num_entity=num_entity,
                                   id2entity=id2entity or {},
                                   num_iter=num_iter)
        self.decode_question = decode_question
        self.best_h1 = 0.0
        self.best_f1 = 0.0
        from concurrent.futures import ThreadPoolExecutor
        self._prefetch = ThreadPoolExecutor(max_workers=1)
        # kernel-layout batches feed the fused Pallas path on TPU; fact
        # dropout is applied on-device through each layout's perm map, so
        # the fused path stays active under fact_drop > 0
        self.build_layout = jax.default_backend() == "tpu"

        if self.mesh is not None:
            # dp question sharding + tp sharding of large tables; params and
            # optimizer state placed once, batches placed per step
            from ..parallel.mesh import replicate, shard_params
            self.params = shard_params(self.mesh, self.params)
            self.opt_state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x) if hasattr(x, "ndim") else x,
                self.opt_state)
            self.rel_args = tuple(
                replicate(self.mesh, (a,))[0] if a is not None else None
                for a in self.rel_args)

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._eval_step_impl)
        # instruction-attention eval step (opt-in .info extension); GraftNet
        # has no instruction decoder to export
        self._eval_step_attn = (
            jax.jit(partial(self._eval_step_impl, return_attn=True))
            if cfg.model.model_name != "GraftNet" else None)

    # ------------------------------------------------------------------ steps
    def _train_step_impl(self, params, opt_state, rng, batch, valid_w, acc):
        """One optimisation step. All per-step metrics (H1 and the
        eps-cumulative training F1, base_model.py:249-285) are computed ON
        DEVICE and folded into the running ``acc`` scalars — the loop never
        fetches a per-step array, so dispatch pipelines through the TPU
        tunnel instead of paying a host round trip every step (each fetch
        costs a ~30ms RTT, and can block for minutes behind other tenants
        on a shared chip)."""
        def loss_fn(p):
            loss, pred, pred_dist = self.model.apply(
                p, batch, *self.rel_args, training=True,
                rngs={"dropout": rng})
            return loss, (pred, pred_dist)

        (loss, (pred, pred_dist)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        h1 = model_base.calc_h1(pred_dist, batch.answer_dist)
        f1 = train_f1_device(pred_dist, batch.answer_dist, h1,
                             batch.entity_gids, batch.seed_dist,
                             self.num_entity, self.cfg.model.eps)
        loss_sum, h1_sum, f1_sum, n = acc
        acc = (loss_sum + loss, h1_sum + jnp.vdot(h1, valid_w),
               f1_sum + jnp.vdot(f1, valid_w), n + jnp.sum(valid_w))
        return params, opt_state, acc

    def _eval_step_impl(self, params, batch, return_attn: bool = False):
        return self.model.apply(params, batch, *self.rel_args, training=False,
                                return_attn=return_attn)

    # ------------------------------------------------------------------ loops
    def train_epoch(self):
        """One epoch. Returns (mean_loss, mean_h1, mean_f1) as floats.

        The loop is fully asynchronous: batch assembly runs in a prefetch
        thread, every step's metrics accumulate in device scalars, and the
        only host<->device synchronisation is ONE fetch of the four
        accumulator scalars at epoch end (vs the reference, whose epoch loop
        copies per-step arrays to the host, train_model.py:209-233)."""
        cfg = self.cfg.train
        data = self.train_data
        rng_np = np.random.default_rng(int(jax.random.randint(
            self.rng, (), 0, 2**31 - 1)))
        self.rng, _ = jax.random.split(self.rng)
        data.reset_batches(is_sequential=False, rng=rng_np,
                           bucket_size=cfg.batch_size if cfg.bucket_batches
                           else None)
        num_batches = math.ceil(data.num_data / cfg.batch_size)
        build_layout = self.build_layout

        # one-deep host prefetch: batch assembly overlaps the device step —
        # the async dispatch returns before the TPU finishes, so the next
        # make_batch runs while the chip computes
        def build(it):
            idx = data.batch_indices(it, cfg.batch_size)
            return idx, data.make_batch(idx, batch_pad_to=cfg.batch_size,
                                        build_layout=build_layout)

        zero = jnp.zeros((), jnp.float32)
        acc = (zero, zero, zero, zero)
        if num_batches == 0:
            return 0.0, 0.0, 0.0
        fut = self._prefetch.submit(build, 0)
        try:
            for it in range(num_batches):
                idx, batch = fut.result()
                if it + 1 < num_batches:
                    fut = self._prefetch.submit(build, it + 1)
                if self.mesh is not None:
                    from ..parallel.mesh import shard_batch
                    batch = shard_batch(self.mesh, batch)
                valid_w = np.zeros(batch.answer_dist.shape[0], np.float32)
                valid_w[: len(idx)] = 1.0
                self.rng, step_rng = jax.random.split(self.rng)
                self.params, self.opt_state, acc = self._train_step(
                    self.params, self.opt_state, step_rng, batch, valid_w,
                    acc)
        except Exception:
            if it + 1 < num_batches:
                fut.cancel()
            raise
        loss_sum, h1_sum, f1_sum, n = jax.device_get(acc)
        n = max(float(n), 1.0)
        return float(loss_sum) / num_batches, float(h1_sum) / n, float(f1_sum) / n

    def evaluate(self, data: KGQADataset, test_batch_size: Optional[int] = None,
                 write_info: bool = False, info_path: Optional[str] = None,
                 write_attention: bool = False):
        bs = test_batch_size or self.cfg.train.test_batch_size

        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            def forward(b):
                return self._eval_step(self.params, shard_batch(self.mesh, b))
        else:
            def forward(b):
                return self._eval_step(self.params, b)

        attn_forward = None
        if write_attention and self._eval_step_attn is not None:
            if self.mesh is not None:
                from ..parallel.mesh import shard_batch

                def attn_forward(b):
                    return self._eval_step_attn(self.params,
                                                shard_batch(self.mesh, b))
            else:
                def attn_forward(b):
                    return self._eval_step_attn(self.params, b)

        return self.evaluator.evaluate(
            data, forward, bs,
            write_info=write_info, info_path=info_path,
            build_layout=self.build_layout,
            decode_question=self.decode_question,
            batch_pad_to=bs if self.mesh is not None else None,
            attn_forward_fn=attn_forward)

    def train(self, start_epoch: int = 0, end_epoch: Optional[int] = None):
        cfg = self.cfg.train
        end_epoch = cfg.num_epoch - 1 if end_epoch is None else end_epoch
        for epoch in range(start_epoch, end_epoch + 1):
            st = time.time()
            if epoch == start_epoch and cfg.profile_dir:
                from ..utils.profiling import trace
                with trace(cfg.profile_dir):
                    loss, h1, f1 = self.train_epoch()
                self.logger.info("profiler trace written to %s",
                                 cfg.profile_dir)
            else:
                loss, h1, f1 = self.train_epoch()
            self.logger.info("Epoch: %d, loss: %.4f, time: %.1fs",
                             epoch + 1, loss, time.time() - st)
            self.logger.info("Training h1: %.4f, f1: %.4f", h1, f1)
            if (epoch + 1) % cfg.eval_every == 0:
                eval_f1, eval_h1, eval_em = self.evaluate(self.valid_data)
                self.logger.info("EVAL F1: %.4f, H1: %.4f, EM: %.4f",
                                 eval_f1, eval_h1, eval_em)
                if epoch > cfg.warmup_epoch:
                    if eval_h1 > self.best_h1:
                        self.best_h1 = eval_h1
                        self.save_ckpt("h1")
                    if eval_f1 > self.best_f1:
                        self.best_f1 = eval_f1
                        self.save_ckpt("f1")
                test_f1, test_h1, test_em = self.evaluate(self.test_data)
                self.logger.info("TEST F1: %.4f, H1: %.4f, EM: %.4f",
                                 test_f1, test_h1, test_em)
        self.save_ckpt("final")
        self.evaluate_best()

    def evaluate_best(self):
        for reason in ("h1", "f1", "final"):
            path = self._ckpt_path(reason)
            try:
                self.load_ckpt(path)
            except Exception:
                continue
            f1, h1, em = self.evaluate(self.test_data)
            self.logger.info("Best %s evaluation — TEST F1: %.4f, H1: %.4f, EM: %.4f",
                             reason, f1, h1, em)

    def evaluate_single(self, ckpt_path: Optional[str] = None,
                        info_path: Optional[str] = None,
                        write_attention: bool = False):
        """Eval-only entry (train_model.py:201-207): dev metrics + test .info."""
        if ckpt_path:
            self.load_ckpt(ckpt_path)
        ev = self.evaluate(self.valid_data)
        self.logger.info("EVAL F1: %.4f, H1: %.4f, EM: %.4f", *ev)
        info_path = info_path or os.path.join(
            self.cfg.train.checkpoint_dir,
            f"{self.cfg.train.experiment_name}_test.info")
        # provenance sidecar (NOT a header line inside the .info — the LLM
        # half consumes .info by line order, predict_answer.py:63-66)
        self._write_provenance(info_path + ".meta.json")
        te = self.evaluate(self.test_data, write_info=True, info_path=info_path,
                           write_attention=write_attention)
        self.logger.info("TEST F1: %.4f, H1: %.4f, EM: %.4f", *te)
        return ev, te

    # ------------------------------------------------------------------ ckpts
    def _ckpt_path(self, reason: str) -> str:
        os.makedirs(self.cfg.train.checkpoint_dir, exist_ok=True)
        return os.path.join(self.cfg.train.checkpoint_dir,
                            f"{self.cfg.train.experiment_name}-{reason}.ckpt")

    def save_ckpt(self, reason: str = "h1"):
        path = self._ckpt_path(reason)
        save_pytree(path, self.params)
        self._write_provenance(path + ".meta.json")
        self.logger.info("Best %s, saved model as %s", reason, path)

    def _write_provenance(self, path: str):
        import json
        meta = {"experiment_name": self.cfg.train.experiment_name,
                "model": self.cfg.model.model_name,
                "lm": self.cfg.model.lm,
                "lm_weight_source": self.lm_source or "unspecified"}
        try:
            with open(path, "w") as f:
                json.dump(meta, f, indent=1)
        except OSError:
            pass

    def seed_submodule(self, name: str, src_params):
        """Overlay a flax param subtree (e.g. the in-model LM at
        params['params'][name]) with externally loaded weights — the
        lm_frozen=0 path starts from the pretrained encoder and finetunes
        (bert_encoder.py:80-83). Shapes must match the in-model module."""
        sub = src_params["params"] if "params" in src_params else src_params
        cur = self.params["params"].get(name)
        if cur is None:
            raise KeyError(f"model has no trainable submodule {name!r} "
                           "(is lm_frozen=0 and lm != lstm?)")
        def _check(a, b):
            if a.shape != b.shape:
                raise ValueError(f"seed_submodule({name!r}): shape mismatch "
                                 f"{a.shape} vs {b.shape}")
            return 0
        jax.tree_util.tree_map(_check, cur, sub)  # raises on mismatch
        new_params = dict(self.params)
        new_params["params"] = dict(self.params["params"])
        new_params["params"][name] = jax.tree_util.tree_map(jnp.asarray, sub)
        self.params = new_params
        self.opt_state = self.tx.init(self.params)

    def load_ckpt(self, path: str):
        # partial overlay mirrors the reference's strict=False load
        # (train_model.py:252)
        self.params = load_pytree(path, self.params, partial=True)
