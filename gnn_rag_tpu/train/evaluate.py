"""Evaluator: batched inference, retrieval metrics, and `.info` export.

The `.info` JSONL is the contract between the GNN retriever and the LLM
reader (reference: gnn/evaluate.py:140-240 writes it; llm predict_answer.py
consumes it by line order). Format per line:

    {"question": <decoded question>, "0": {}, ..., "<num_iter-1>": {},
     "answers": [<mid>...], "precison": p, "recall": r, "f1": f,
     "hit": h, "em": em, "cand": [[<mid>, prob], ...]}

(the "precison" misspelling is part of the format, evaluate.py:213).
"""

from __future__ import annotations

import json
import math
import os
from typing import Callable, List, Optional, Sequence

import numpy as np

from ..data.loader import KGQADataset
from .metrics import extract_candidates, f1_and_hits_eval


class Evaluator:
    """Runs a jitted forward over a dataset split and scores retrieval.

    forward_fn(batch) -> (loss, pred, pred_dist) — typically
    ``jax.jit(lambda b: model.apply(params, b, ...))``.
    """

    def __init__(self, *, eps: float, num_entity: int, id2entity: dict,
                 id2relation: Optional[dict] = None, num_iter: int = 3,
                 entity_names: Optional[Sequence[str]] = None):
        self.eps = eps
        self.num_entity = num_entity
        self.id2entity = id2entity
        self.id2relation = id2relation or {}
        self.num_iter = num_iter
        self.entity_names = entity_names  # 'sr-' datasets map ids->names (evaluate.py:81-86)

    def _name(self, gid: int):
        ent = self.id2entity.get(gid, gid)
        if self.entity_names is not None:
            return self.entity_names[ent] if isinstance(ent, int) else ent
        return ent

    def evaluate(self, data: KGQADataset, forward_fn: Callable,
                 test_batch_size: int = 20, write_info: bool = False,
                 info_path: Optional[str] = None,
                 decode_question: Optional[Callable[[np.ndarray], str]] = None,
                 build_layout: bool = False,
                 batch_pad_to: Optional[int] = None,
                 attn_forward_fn: Optional[Callable] = None):
        """Returns (mean_f1, mean_hit, mean_em); optionally writes `.info`.

        attn_forward_fn(batch) -> (loss, pred, pred_dist, attn[B, J, L]):
        when given (and writing info), the per-iteration slots "0".."J-1"
        carry {"attention": [...]} over the question tokens instead of the
        shipped-artifact empty dicts (opt-in interpretability extension of
        evaluate.py:106-137)."""
        data.reset_batches(is_sequential=True)
        num_batches = math.ceil(data.num_data / test_batch_size)
        if num_batches == 0:
            return 0.0, 0.0, 0.0
        ignore_prob = (1 - self.eps) / data.max_local_entity  # evaluate.py:156
        f1s, hits, ems, precisions, recalls, losses = [], [], [], [], [], []
        fout = open(info_path, "w") if (write_info and info_path) else None
        case_ct = {}

        # one-deep host prefetch: assemble the next batch while the device
        # runs this one (mirrors Trainer.train_epoch)
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=1)

        def build(it):
            idx = data.batch_indices(it, test_batch_size)
            return idx, data.make_batch(idx, build_layout=build_layout,
                                        batch_pad_to=batch_pad_to)

        # phase 1 — dispatch every forward WITHOUT fetching: results stay on
        # device (a few MB for a whole split) and the chip pipelines batches
        # back-to-back; each device->host fetch pays a tunnel round trip, so
        # they all happen in phase 2 after the last dispatch
        staged = []
        fut = pool.submit(build, 0)
        try:
            for it in range(num_batches):
                idx, batch = fut.result()
                if it + 1 < num_batches:
                    fut = pool.submit(build, it + 1)
                attn = None
                if write_info and attn_forward_fn is not None:
                    loss, pred, pred_dist, attn = attn_forward_fn(batch)
                else:
                    loss, pred, pred_dist = forward_fn(batch)
                staged.append((idx, batch, loss, pred_dist, attn))
        finally:
            pool.shutdown(wait=False, cancel_futures=True)

        # phase 2 — host-side metric extraction
        for idx, batch, loss, pred_dist, attn in staged:
            pred_dist = np.asarray(pred_dist)
            if attn is not None:
                attn = np.asarray(attn)
            losses.append(float(loss))
            answers_batch = data.answers_for(idx)
            gids = np.asarray(batch.entity_gids)
            qents = np.asarray(batch.query_entities)

            for b in range(len(idx)):
                cand2prob = extract_candidates(
                    pred_dist[b], gids[b], qents[b], self.num_entity, ignore_prob)
                answers = answers_batch[b]
                p, r, f1, hit, em, case, retrieved = f1_and_hits_eval(
                    answers, cand2prob, self.eps)
                case_ct[case] = case_ct.get(case, 0) + 1
                f1s.append(f1); hits.append(hit); ems.append(em)
                precisions.append(p); recalls.append(r)
                if fout is not None:
                    rec = data.records[idx[b]]
                    q = (decode_question(rec.q_token_ids)
                         if decode_question else rec.question)
                    obj = {"question": q}
                    for j in range(self.num_iter):
                        obj[str(j)] = {}
                    if attn is not None:
                        # attention over the question's real tokens only
                        L = len(rec.q_token_ids)
                        for j in range(min(self.num_iter, attn.shape[1])):
                            obj[str(j)] = {"attention":
                                           [round(float(a), 6) for a in
                                            attn[b, j, :L]]}
                    obj["answers"] = [self._name(a) for a in answers]
                    obj["precison"] = p
                    obj["recall"] = r
                    obj["f1"] = f1
                    obj["hit"] = hit
                    obj["em"] = em
                    obj["cand"] = [[self._name(c), prob] for c, prob in retrieved]
                    fout.write(json.dumps(obj) + "\n")

        if fout is not None:
            fout.close()
        return (float(np.mean(f1s)) if f1s else 0.0,
                float(np.mean(hits)) if hits else 0.0,
                float(np.mean(ems)) if ems else 0.0)
