"""Multi-chip scaling study -> docs/multichip_study_r05.json.

(The driver owns MULTICHIP_r0N.json at the repo root and overwrites it with
its own dryrun capture each round, so this study's artifact lives in docs/.)

Runs the production Trainer at realistic GNN shapes (E>=1024, F>=4096) over a
ladder of device meshes on an 8-device virtual CPU mesh (the environment has
one physical TPU chip; GSPMD sharding is validated structurally here and the
driver re-runs `__graft_entry__.dryrun_multichip` independently).

What it measures per mesh (dp x tp in {1x1, 2x1, 4x1, 8x1, 4x2, 2x4}):

* correctness — first-epoch loss and post-epoch sharded-eval F1/H1 must match
  the single-device run (same seed => same batch order and dropout stream;
  GSPMD reductions may reorder float adds, so tolerance is 1e-3);
* balance — per-device FLOPs from XLA cost analysis: an even partition shows
  total FLOPs ~constant across meshes (work split, not duplicated);
* communication — collective ops (all-reduce / all-gather / reduce-scatter /
  collective-permute) counted in the compiled train-step HLO;
* step time — wall clock per train step. CAVEAT: all 8 virtual devices share
  ONE host core, so with a fixed global batch the ideal result is a FLAT step
  time (same total work); the increase over the 1x1 baseline is the
  GSPMD/collective overhead, which is the honest scaling signal measurable
  without real multi-chip hardware.

Reference has no GNN parallelism at all (single CUDA device,
gnn/train_model.py:38); this study covers SURVEY.md §2.3's dp/tp goals.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces TPU otherwise

import numpy as np  # noqa: E402

B_GLOBAL = 16
N_QUESTIONS = 32
E_MAX, F_MAX = 1024, 4096
NUM_REL = 64
WORD_DIM = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_trainer(mesh):
    import jax

    from gnn_rag_tpu.config import Config, ModelConfig, TrainConfig
    from gnn_rag_tpu.train.trainer import Trainer
    from gnn_rag_tpu.utils.synthetic import random_records, random_rel_hidden

    rng = np.random.default_rng(0)
    ds = random_records(rng, n_questions=N_QUESTIONS, num_relation=NUM_REL,
                        n_entities_max=E_MAX, n_facts_max=F_MAX,
                        num_entity_global=50_000)
    ds.q_hidden = [np.random.default_rng(7 + i).standard_normal(
        (len(r.q_token_ids), WORD_DIM)).astype(np.float32) * 0.5
        for i, r in enumerate(ds.records)]
    rel = random_rel_hidden(rng, NUM_REL + 1, 6, WORD_DIM)
    cfg = Config(
        model=ModelConfig(entity_dim=32, num_iter=2, num_ins=2, num_gnn=2,
                          linear_dropout=0.2),
        train=TrainConfig(batch_size=B_GLOBAL, test_batch_size=B_GLOBAL,
                          lr=1e-3, seed=11,
                          checkpoint_dir=tempfile.mkdtemp()))
    return Trainer(cfg, train_data=ds, valid_data=ds, test_data=ds,
                   num_entity=50_000, num_kb_relation=NUM_REL,
                   rel_hidden=rel[0], rel_hidden_inv=rel[1],
                   rel_text_mask=rel[2], mesh=mesh), ds


def collective_stats(trainer, ds):
    """Compile the train step at the dataset's bucket shape; count
    collectives + total FLOPs from XLA's own analysis."""
    import jax

    idx = ds.batch_indices(0, B_GLOBAL)
    batch = ds.make_batch(idx, batch_pad_to=B_GLOBAL)
    if trainer.mesh is not None:
        from gnn_rag_tpu.parallel.mesh import shard_batch
        batch = shard_batch(trainer.mesh, batch)
    import jax.numpy as jnp
    rng = jax.random.PRNGKey(0)
    valid_w = np.ones(B_GLOBAL, np.float32)
    zero = jnp.zeros((), jnp.float32)
    lowered = trainer._train_step.lower(trainer.params, trainer.opt_state,
                                        rng, batch, valid_w, (zero,) * 4)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    flops = compiled.cost_analysis().get("flops", 0.0)
    counts = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        n = sum(line.lstrip().startswith(("%" + op, op))
                or f" {op}(" in line for line in hlo.splitlines()
                if op in line)
        if n:
            counts[op] = n
    return counts, flops


def run_mesh(dp: int, tp: int):
    import jax

    from gnn_rag_tpu.parallel.mesh import make_mesh

    n = dp * tp
    mesh = None if n == 1 else make_mesh(
        dp=dp, tp=tp, devices=jax.devices()[:n])
    trainer, ds = build_trainer(mesh)
    ctx = mesh if mesh is not None else _nullctx()
    with ctx:
        colls, flops = collective_stats(trainer, ds)
        t0 = time.perf_counter()
        loss, h1, f1 = trainer.train_epoch()   # epoch 1: includes compiles
        compile_epoch_s = time.perf_counter() - t0
        # timed epochs (warm)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            trainer.train_epoch()
            times.append(time.perf_counter() - t0)
        steps = int(np.ceil(N_QUESTIONS / B_GLOBAL))
        step_ms = 1e3 * min(times) / steps
        ev = trainer.evaluate(ds)
    out = {
        "mesh": f"dp{dp}xtp{tp}",
        "devices": n,
        "epoch1_loss": round(float(loss), 6),
        "epoch1_h1": round(float(np.mean(h1)), 4),
        "eval_f1": round(float(ev[0]), 4),
        "eval_h1": round(float(ev[1]), 4),
        "train_step_ms": round(step_ms, 1),
        "compile_epoch_s": round(compile_epoch_s, 1),
        "train_step_flops_total": flops,
        "collectives_in_train_hlo": colls,
    }
    log(json.dumps(out))
    return out


class _nullctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def run_sft_mesh(dp: int, tp: int):
    """Sharded LLM SFT step over the mesh (llm_tpu/sharding.py): loss parity
    with the single-device run + train-step collectives (VERDICT r2 #7:
    the study previously covered only the GNN trainer)."""
    import jax

    from gnn_rag_tpu.llm_tpu.model import LlamaConfig
    from gnn_rag_tpu.llm_tpu.sft import SFTConfig, SFTTrainer
    from gnn_rag_tpu.parallel.mesh import make_mesh

    n = dp * tp
    mesh = None if n == 1 else make_mesh(dp=dp, tp=tp,
                                         devices=jax.devices()[:n])
    mcfg = LlamaConfig(vocab_size=512, dim=64, n_layers=2, n_heads=4,
                       n_kv_heads=4, intermediate=128, max_seq_len=64)
    cfg = SFTConfig(batch_size=8, seed=3, learning_rate=1e-3,
                    output_dir=tempfile.mkdtemp(), total_steps=6,
                    save_every=10_000)
    tr = SFTTrainer(mcfg, cfg, mesh=mesh)
    rng = np.random.default_rng(5)
    toks = rng.integers(1, 512, (32, 64)).astype(np.int32)
    lm = (rng.random((32, 64)) > 0.4).astype(np.float32)
    t0 = time.perf_counter()
    losses = tr.train(toks, lm, steps=6, resume=False)
    wall = time.perf_counter() - t0
    # collectives from the compiled step HLO
    import jax.numpy as jnp
    bt, bm = jnp.asarray(toks[:8]), jnp.asarray(lm[:8])
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        sh = NamedSharding(mesh, P("dp"))
        bt, bm = jax.device_put(bt, sh), jax.device_put(bm, sh)
    hlo = tr._train_step.lower(tr.params, tr.opt_state, bt, bm
                               ).compile().as_text()
    colls = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute"):
        c = sum(op in line for line in hlo.splitlines())
        if c:
            colls[op] = c
    return {"mesh": f"dp{dp}xtp{tp}", "devices": n,
            "final_loss": round(float(losses[-1]), 6),
            "wall_s_6steps": round(wall, 2),
            "collectives_in_train_hlo": colls}


def main():
    meshes = [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2), (2, 4)]
    rows = [run_mesh(dp, tp) for dp, tp in meshes]
    # dp2 diagnostic (r02 anomaly: +208% step time at dp2x1): re-time dp2
    # a second time after everything is warm to separate a real GSPMD cost
    # from one-off scheduling noise on the oversubscribed single-core host
    rows_dp2_repeat = run_mesh(2, 1)
    base = rows[0]
    for r in rows[1:]:
        r["loss_matches_1x1"] = bool(
            abs(r["epoch1_loss"] - base["epoch1_loss"]) < 1e-3)
        r["eval_matches_1x1"] = bool(
            abs(r["eval_f1"] - base["eval_f1"]) < 1e-3
            and abs(r["eval_h1"] - base["eval_h1"]) < 1e-3)
        r["step_overhead_vs_1x1_pct"] = round(
            100.0 * (r["train_step_ms"] / base["train_step_ms"] - 1.0), 1)
    sft_rows = [run_sft_mesh(dp, tp) for dp, tp in
                [(1, 1), (2, 1), (2, 4), (4, 2)]]
    sft_base = sft_rows[0]
    for r in sft_rows[1:]:
        # relative tolerance: GSPMD reduction order perturbs the f32 sum at
        # ~1e-4 relative; the GNN rows' 1e-3 absolute happened to cover it
        # only because those losses are order-1 differences apart
        r["loss_matches_1x1"] = bool(
            abs(r["final_loss"] - sft_base["final_loss"])
            < 1e-3 * abs(sft_base["final_loss"]))
    result = {
        "ok": all(r.get("loss_matches_1x1", True)
                  and r.get("eval_matches_1x1", True) for r in rows)
        and all(r.get("loss_matches_1x1", True) for r in sft_rows),
        "shapes": {"global_batch": B_GLOBAL, "E_max": E_MAX, "F_max": F_MAX,
                   "questions": N_QUESTIONS, "entity_dim": 32},
        "note": ("8 virtual devices on one host core: fixed global batch => "
                 "ideal scaling is FLAT step time; overhead_pct isolates "
                 "GSPMD/collective cost. Metrics parity across meshes proves "
                 "the sharded trainer+evaluator compute the same function."),
        "meshes": rows,
        "dp2_repeat_diagnostic": rows_dp2_repeat,
        "sft_meshes": sft_rows,
    }
    out_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            "multichip_study_r05.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
