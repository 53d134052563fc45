"""SFT pipeline: data prep, completion masking, tiny-model training, resume,
and rule-path generation round trip."""

import json
import os

import numpy as np
import pytest

from gnn_rag_tpu.finetune import data_prep
from gnn_rag_tpu.llm_tpu.model import LlamaConfig
from gnn_rag_tpu.llm_tpu.sft import (SFTConfig, SFTTrainer, completion_mask,
                                     pack_examples, resize_embeddings)
from gnn_rag_tpu.rag.gen_rule_path import (GenRulePathConfig, gen_prediction,
                                           parse_prediction)

GRAPH = [["Jamaica", "language_spoken", "English"],
         ["Jamaica", "located_in", "Caribbean"]]
SAMPLE = {"id": "q1", "question": "what do they speak in jamaica",
          "answer": ["English"], "q_entity": ["Jamaica"],
          "a_entity": ["English"], "graph": GRAPH, "choices": []}


def test_extract_relation_paths():
    recs = data_prep.extract_relation_paths(SAMPLE)
    assert {"question": SAMPLE["question"], "path": ["language_spoken"]} in recs


def test_preprocess_align_and_qa(tmp_path):
    align = tmp_path / "align.jsonl"
    n = data_prep.build_align_dataset([SAMPLE], str(tmp_path / "raw.jsonl"))
    assert n == 1
    raw = [json.loads(l) for l in open(tmp_path / "raw.jsonl")]
    data_prep.preprocess_align(raw, str(align))
    rec = json.loads(open(align).readline())
    assert "<PATH>language_spoken</PATH>" in rec["text"]
    assert rec["text"].startswith("[INST]")

    qa = tmp_path / "qa.jsonl"
    data_prep.preprocess_qa([SAMPLE], str(qa))
    rec = json.loads(open(qa).readline())
    assert "Reasoning Paths:" in rec["text"]
    assert rec["text"].rstrip("</s>").endswith("English")


def test_completion_mask():
    ids = [5, 6, 7, 99, 98, 1, 2, 3]
    mask = completion_mask(ids, [99, 98])
    assert mask.tolist() == [0, 0, 0, 0, 0, 1, 1, 1]
    assert completion_mask([1, 2, 3], [99, 98]).sum() == 0


def test_parse_prediction():
    preds = ["<PATH>a.b.c<SEP>d.e.f</PATH>", "no path here",
             "<PATH>x</PATH> trailing"]
    assert parse_prediction(preds) == [["a.b.c", "d.e.f"], ["x"]]


@pytest.mark.e2e
def test_sft_overfits_and_resumes(tmp_path):
    rng = np.random.default_rng(0)
    V, L, N = 64, 32, 8
    template = [60, 61]
    tokens = np.zeros((N, L), np.int32)
    for i in range(N):
        prompt = rng.integers(1, 50, 10)
        answer = [50 + (i % 8)] * 4
        seq = list(prompt) + template + answer
        tokens[i, :len(seq)] = seq
    mask = np.stack([
        np.asarray(completion_mask(tokens[i].tolist(), template))
        for i in range(N)])

    cfg = SFTConfig(output_dir=str(tmp_path / "sft"), learning_rate=5e-3,
                    total_steps=60, batch_size=8, save_every=30, seed=0)
    trainer = SFTTrainer(LlamaConfig.tiny(vocab_size=V), cfg)
    losses = trainer.train(tokens, mask, steps=60, log_every=1000)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    # resume from checkpoint-60
    trainer2 = SFTTrainer(LlamaConfig.tiny(vocab_size=V), cfg)
    assert trainer2.maybe_resume()
    assert trainer2.step == 60


def test_sft_epoch_sampling_without_replacement(tmp_path):
    """One pass over N/batch_size steps must touch every example exactly
    once (HF Trainer epoch semantics, not iid sampling with replacement),
    and a resumed trainer must continue the same deterministic stream."""
    cfg = SFTConfig(output_dir=str(tmp_path / "sft"), total_steps=10,
                    batch_size=4, seed=3)
    trainer = SFTTrainer(LlamaConfig.tiny(vocab_size=32), cfg)
    N = 12  # 3 steps per epoch
    epoch0 = np.concatenate([trainer._batch_indices(N, s) for s in range(3)])
    assert sorted(epoch0.tolist()) == list(range(N))
    epoch1 = np.concatenate([trainer._batch_indices(N, s) for s in range(3, 6)])
    assert sorted(epoch1.tolist()) == list(range(N))
    assert epoch0.tolist() != epoch1.tolist()  # reshuffled between epochs
    # straddling batch (N not divisible by B) still covers 2 epochs exactly
    covered = np.concatenate([trainer._batch_indices(10, s) for s in range(5)])
    assert sorted(covered.tolist()) == sorted(list(range(10)) * 2)
    # deterministic resume: a fresh trainer reproduces step 4's batch
    trainer2 = SFTTrainer(LlamaConfig.tiny(vocab_size=32), cfg)
    np.testing.assert_array_equal(trainer2._batch_indices(N, 4),
                                  trainer._batch_indices(N, 4))


def test_resize_embeddings():
    import jax
    from gnn_rag_tpu.llm_tpu.model import LlamaLM
    cfg = LlamaConfig.tiny(vocab_size=32)
    model = LlamaLM(cfg)
    import jax.numpy as jnp
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    params = jax.tree_util.tree_map(np.asarray, params)
    params = resize_embeddings(params, 32, 36)
    assert params["params"]["tok_emb"]["embedding"].shape[0] == 36
    assert params["params"]["lm_head"]["kernel"].shape[0] == 36


def test_gen_rule_path_with_stub(tmp_path):
    qa_path = tmp_path / "qa.jsonl"
    with open(qa_path, "w") as f:
        f.write(json.dumps(SAMPLE) + "\n")

    def stub_generate(text, num_beams=3, max_new_tokens=100, do_sample=False):
        return {"paths": ["<PATH>language_spoken</PATH>"] * num_beams,
                "scores": [0.0] * num_beams,
                "norm_scores": [1.0 / num_beams] * num_beams}

    cfg = GenRulePathConfig(data_path=str(qa_path),
                            output_path=str(tmp_path / "out"),
                            prompt_path="prompts/llama2.txt", n_beam=2)
    out = gen_prediction(cfg, stub_generate)
    rec = json.loads(open(out).readline())
    assert rec["prediction"] == [["language_spoken"], ["language_spoken"]]
    assert ["language_spoken"] in rec["ground_paths"]


def test_chunked_loss_matches_dense():
    """chunked_completion_loss (scan + checkpoint over vocab chunks) must
    equal the dense lm_head loss in value AND gradient — it exists purely to
    cut peak HBM at long context."""
    import jax
    import jax.numpy as jnp
    from gnn_rag_tpu.llm_tpu.model import LlamaLM
    from gnn_rag_tpu.llm_tpu.sft import chunked_completion_loss

    cfg = LlamaConfig.tiny(vocab_size=48)
    model = LlamaLM(cfg)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, 48, (2, 20)), jnp.int32)
    mask = jnp.asarray((rng.random((2, 20)) > 0.3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), tokens[:, :-1])

    def dense(p):
        logits, _ = model.apply(p, tokens[:, :-1])
        tgt, m = tokens[:, 1:], mask[:, 1:]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

    def chunked(p):
        # chunk=8 does not divide L-1=19: exercises the padded tail
        return chunked_completion_loss(model, p, tokens, mask, chunk=8)

    ld, gd = jax.value_and_grad(dense)(params)
    lc, gc = jax.value_and_grad(chunked)(params)
    np.testing.assert_allclose(float(lc), float(ld), rtol=1e-5)
    flat_d = jax.tree_util.tree_leaves(gd)
    flat_c = jax.tree_util.tree_leaves(gc)
    for a, b in zip(flat_c, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
