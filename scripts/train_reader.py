"""Train a REAL (tiny) on-chip LLM reader and close the RAG loop.

VERDICT r2 #5: every RAG number so far came from the candidate-echoing mock
reader. This script SFTs a small LlamaLM (byte-level tokenizer, no external
assets) on SynthQSP ground-truth-path QA examples — the exact data recipe of
the reference's joint finetune (llm/src/joint_training/joint_finetuning.py +
preprocess_qa.py: llama2 prompt with reasoning paths, completion-only loss
after the [/INST] template) — then saves a checkpoint the rag.llms registry
serves via the `llama_tpu` backend. scripts/eval_trained.py --reader_path
re-runs the full RAG eval with this TRAINED reader next to the mock numbers.

Usage: python scripts/train_reader.py [--steps 3000] [--out checkpoints/reader_tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_texts(data_dir: str, split: str, budget: int, tok) -> list:
    """SynthQSP split -> llama2 QA SFT texts with ground-truth paths
    (finetune.data_prep.preprocess_qa flow, in memory)."""
    from gnn_rag_tpu.finetune.data_prep import format_qa_example
    from gnn_rag_tpu.rag.prompt_builder import PromptBuilder

    builder = PromptBuilder("prompts/llama2_predict.txt", add_rule=True,
                            use_true=True, maximun_token=budget,
                            tokenize=lambda t: len(tok.encode(t)))
    texts = []
    with open(os.path.join(data_dir, f"{split}.json")) as f:
        for line in f:
            q = json.loads(line)
            answers = [a["text"] for a in q["answers"]]
            ex = {"id": q["id"], "question": q["question"],
                  "answer": answers, "q_entity": q["entities"],
                  "a_entity": answers, "graph": q["subgraph"]["tuples"],
                  "choices": []}
            texts.append(format_qa_example(ex, builder)["text"])
    return texts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/synthqsp")
    ap.add_argument("--out", default="checkpoints/reader_tiny")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--max_seq", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--layers", type=int, default=6)
    args = ap.parse_args()

    from gnn_rag_tpu.llm_tpu.model import LlamaConfig
    from gnn_rag_tpu.llm_tpu.sft import SFTConfig, SFTTrainer, pack_examples
    from gnn_rag_tpu.rag.llms.llama_tpu import ByteTokenizer

    tok = ByteTokenizer()
    budget = args.max_seq - 160       # leave room for the answer span
    t0 = time.time()
    texts = build_texts(args.data, "train", budget, tok)
    log(f"{len(texts)} SFT texts in {time.time()-t0:.0f}s; packing...")

    def tokenize(text: str):
        # trailing reference eos marker -> the byte tokenizer's eos id, so
        # greedy decoding terminates like a real </s>-trained model
        if text.endswith("</s>"):
            return tok.encode(text[:-4]) + [tok.eos_id]
        return tok.encode(text)

    template_ids = tok.encode("[/INST]", add_bos=False)
    tokens, loss_mask = pack_examples(texts, tokenize, template_ids,
                                      args.max_seq, tok.pad_id)
    kept = float((loss_mask.sum(1) > 0).mean())
    log(f"packed: {tokens.shape}, completion coverage {kept:.3f}")

    mcfg = LlamaConfig(vocab_size=tok.vocab_size, dim=args.dim,
                       n_layers=args.layers, n_heads=6, n_kv_heads=6,
                       intermediate=1024, max_seq_len=args.max_seq,
                       dtype="bfloat16")
    cfg = SFTConfig(output_dir=args.out, learning_rate=3e-4,
                    warmup_steps=100, total_steps=args.steps, batch_size=8,
                    max_seq_len=args.max_seq, save_every=args.steps,
                    seed=0)
    tr = SFTTrainer(mcfg, cfg)
    t0 = time.time()
    losses = tr.train(tokens, loss_mask, steps=args.steps, log_every=200,
                      resume=False)
    wall = time.time() - t0
    log(f"SFT: {args.steps} steps in {wall/60:.1f} min, "
        f"loss {losses[0]:.3f} -> {np.mean(losses[-50:]):.3f}")

    # save serving bundle: checkpoint/ + config.json for rag.llms.llama_tpu
    os.makedirs(args.out, exist_ok=True)
    from gnn_rag_tpu.utils.checkpoint import save_pytree
    save_pytree(os.path.join(args.out, "checkpoint"), tr.params)
    import dataclasses
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(mcfg), f, indent=1)
    with open(os.path.join(args.out, "train_meta.json"), "w") as f:
        json.dump({"steps": args.steps, "wall_min": round(wall / 60, 1),
                   "loss_first": round(float(losses[0]), 4),
                   "loss_final_mean50": round(float(np.mean(losses[-50:])),
                                              4),
                   "n_texts": len(texts),
                   "tokens_per_s": round(args.steps * 8 * args.max_seq
                                         / wall)}, f, indent=1)
    log(f"saved reader bundle to {args.out}")


if __name__ == "__main__":
    main()
