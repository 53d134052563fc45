"""Post-training evidence run for the reference-scale proxy benchmarks.

Consumes the checkpoint trained by
  python main.py ReaRev ... --data_folder data/synthqsp/ (or synthcwq with
  the reference CWQ hyperparameters num_iter 2 / num_ins 3,
  scripts/rearev_cwq.sh) and produces docs/training_r02.json /
  docs/training_cwq_r02.json:

 1. eval-only CLI pass on the chip loading the best-H1 checkpoint, exporting
    the `.info` contract file WITH per-iteration instruction attention
    (reference evaluate.py:140-240 + write_info);
 2. test-split H1 / F1 / EM + answer-recall@k of the exported candidates;
 3. the full second stage at scale: .info -> reasoning-path extraction ->
    prompt builder -> (mock) LLM -> eval_result Hit/metrics + multi-hop
    coverage (predict_answer.py flow);
 4. training throughput (epochs/hour, subgraphs/sec) parsed from the train
    log.

Usage: python scripts/eval_trained.py [--preset synthqsp|synthcwq]
           [--ckpt <name>.ckpt] [--train_log /tmp/train_full.log]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESETS = {
    "synthqsp": dict(
        data="data/synthqsp", ckpt_dir="checkpoints/synthqsp",
        exp="rearev_synthqsp_r2", out="docs/training_r02.json",
        n_train=1500, train_log="/tmp/train_full.log",
        model_args=["--num_iter", "3", "--num_ins", "2"],
        dataset="SynthQSP (reference-scale proxy: 1500/150/350 questions, "
                "lognormal subgraphs ~E1900/F~10k incl. self-loops+"
                "inverse=off, 1-4 hop mix)",
        hyper="ReaRev published: entity_dim 50, num_iter 3, num_ins 2, "
              "num_gnn 3, lm sbert, batch 8 (gnn/README.md:19)"),
    "synthqsp_r03": dict(
        data="data/synthqsp", ckpt_dir="checkpoints/synthqsp_r03",
        exp="synthqsp_r03", out="docs/training_r03.json",
        n_train=1500, train_log="/tmp/train_r03.log",
        model_args=["--num_iter", "3", "--num_ins", "2"],
        dataset="SynthQSP (reference-scale proxy: 1500/150/350 questions, "
                "lognormal subgraphs ~E1900/F~10k incl. self-loops+"
                "inverse=off, 1-4 hop mix)",
        hyper="ReaRev published: entity_dim 50, num_iter 3, num_ins 2, "
              "num_gnn 3, lm sbert, batch 8 (gnn/README.md:19); r03 v4 "
              "kernels + async epoch loop"),
    "synthfb": dict(
        data="data/synthfb", ckpt_dir="checkpoints/synthfb",
        exp="synthfb", out="docs/training_fb_r03.json",
        n_train=1500, train_log="/tmp/train_fb.log",
        model_args=["--num_iter", "3", "--num_ins", "2",
                    "--lm_frozen", "0"],
        dataset="SynthFB (Freebase-vocabulary proxy: 6k multi-token "
                "relations, 1M-entity global vocab, SynthQSP subgraph "
                "shapes; scale runs add --fact_drop 0.1 --lm_frozen 0)",
        hyper="ReaRev published WebQSP hyperparameters + fact_drop 0.1 + "
              "lm_frozen 0 (gnn/parsing.py:51, bert_encoder.py:80-87)"),
    "synthcwq": dict(
        data="data/synthcwq", ckpt_dir="checkpoints/synthcwq",
        exp="rearev_synthcwq_r2", out="docs/training_cwq_r02.json",
        n_train=2000, train_log="/tmp/train_cwq.log",
        model_args=["--num_iter", "2", "--num_ins", "3"],
        dataset="SynthCWQ (CWQ-flavoured proxy: 2000/200/500 questions, "
                "compositional-heavy 2-4 hop mix, subgraphs up to E6000)",
        hyper="ReaRev CWQ published: entity_dim 50, num_iter 2, num_ins 3, "
              "num_gnn 3, lm sbert, batch 8 (gnn/scripts/rearev_cwq.sh)"),
    "synthqsp_r04": dict(
        data="data/synthqsp", ckpt_dir="checkpoints/synthqsp_r04",
        exp="synthqsp_r04", out="docs/training_r04.json",
        n_train=1500, train_log="/tmp/train_r04.log",
        model_args=["--num_iter", "3", "--num_ins", "2"],
        dataset="SynthQSP (reference-scale proxy: 1500/150/350 questions, "
                "lognormal subgraphs ~E1900/F~10k incl. self-loops+"
                "inverse=off, 1-4 hop mix)",
        hyper="ReaRev published: entity_dim 50, num_iter 3, num_ins 2, "
              "num_gnn 3, lm sbert, batch 8 (gnn/README.md:19); r04 "
              "kernels (k_per_cell sweep default) + async epoch loop"),
    "synthqsp_r05": dict(
        data="data/synthqsp", ckpt_dir="checkpoints/synthqsp_r04",
        exp="synthqsp_r04", out="docs/training_r05.json",
        n_train=1500, train_log="/tmp/train_r04.log",
        model_args=["--num_iter", "3", "--num_ins", "2"],
        dataset="SynthQSP (reference-scale proxy: 1500/150/350 questions, "
                "lognormal subgraphs ~E1900/F~10k incl. self-loops+"
                "inverse=off, 1-4 hop mix)",
        hyper="ReaRev published: entity_dim 50, num_iter 3, num_ins 2, "
              "num_gnn 3, lm sbert, batch 8 (gnn/README.md:19); r05 "
              "stack (K=8 kernels, TDense, prompt-LM-weighted reader)"),
    "synthcwq_r05": dict(
        data="data/synthcwq", ckpt_dir="checkpoints/synthcwq_r05",
        exp="synthcwq_r05", out="docs/training_cwq_r05.json",
        n_train=2000, train_log="/tmp/train_cwq_r05.log",
        model_args=["--num_iter", "2", "--num_ins", "3"],
        dataset="SynthCWQ (CWQ-flavoured proxy: 2000/200/500 questions, "
                "compositional-heavy 2-4 hop mix, subgraphs up to E6000)",
        hyper="ReaRev CWQ published: entity_dim 50, num_iter 2, num_ins 3, "
              "num_gnn 3, lm sbert, batch 8 (gnn/scripts/rearev_cwq.sh); "
              "r05 stack (K=8 kernels, TDense, mxu_gather)"),
    "synthcwq_r04": dict(
        data="data/synthcwq", ckpt_dir="checkpoints/synthcwq_r04",
        exp="synthcwq_r04", out="docs/training_cwq_r04.json",
        n_train=2000, train_log="/tmp/train_cwq_r04.log",
        model_args=["--num_iter", "2", "--num_ins", "3"],
        dataset="SynthCWQ (CWQ-flavoured proxy: 2000/200/500 questions, "
                "compositional-heavy 2-4 hop mix, subgraphs up to E6000)",
        hyper="ReaRev CWQ published: entity_dim 50, num_iter 2, num_ins 3, "
              "num_gnn 3, lm sbert, batch 8 (gnn/scripts/rearev_cwq.sh); "
              "r04 stack (async loop + swept kernels + trained reader)"),
}
DATA = ""
CKPT_DIR = ""
EXP = ""


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_eval_export(ckpt: str, info_path: str, preset: dict):
    """Eval-only CLI pass (the reference's --is_eval flow) on the chip."""
    from gnn_rag_tpu.cli import run
    argv = (["ReaRev", "--entity_dim", "50"] + preset["model_args"]
            + ["--num_gnn", "3", "--lm", "sbert", "--relation_word_emb",
               "True", "--data_folder", DATA + "/", "--name",
               os.path.basename(DATA),
               "--checkpoint_dir", CKPT_DIR + "/", "--experiment_name",
               EXP + "_evalrun", "--load_experiment", ckpt, "--is_eval",
               "--info_attention", "--test_batch_size", "8"])
    run(argv)
    produced = os.path.join(CKPT_DIR, EXP + "_evalrun_test.info")
    os.replace(produced, info_path)


def answer_recall(info_path: str) -> dict:
    """Fraction of gold answers present in the exported candidate set
    (the retrieval metric the LLM stage's ceiling depends on)."""
    import numpy as np
    recalls, cand_sizes = [], []
    with open(info_path) as f:
        for line in f:
            body = json.loads(line)
            cands = {c[0] for c in body["cand"]}
            golds = set(body["answers"])
            if golds:
                recalls.append(len(golds & cands) / len(golds))
            cand_sizes.append(len(cands))
    return {"mean_answer_recall": round(float(np.mean(recalls)), 4),
            "full_recall_frac": round(float(np.mean(
                [r == 1.0 for r in recalls])), 4),
            "mean_candidates": round(float(np.mean(cand_sizes)), 1)}


def build_llm_test_json(out_path: str):
    """SynthQSP test split -> the LLM-side QA schema (RoG jsonl)."""
    n = 0
    with open(os.path.join(DATA, "test.json")) as fin, \
            open(out_path, "w") as fout:
        for line in fin:
            q = json.loads(line)
            answers = [a["text"] for a in q["answers"]]
            fout.write(json.dumps({
                "id": q["id"], "question": q["question"],
                "answer": answers, "q_entity": q["entities"],
                "a_entity": answers, "graph": q["subgraph"]["tuples"],
                "choices": []}) + "\n")
            n += 1
    return n


def rag_stage(info_path: str, qa_path: str, out_dir: str,
              model_name: str = "mock", model_path: str = None,
              keep_parallel: bool = False) -> dict:
    from gnn_rag_tpu.rag.evaluate_multi_hop import eval_result_multi_hop
    from gnn_rag_tpu.rag.evaluate_results import eval_result
    from gnn_rag_tpu.rag.predict import PredictConfig, predict_answers

    t0 = time.perf_counter()
    out = predict_answers(PredictConfig(
        data_path=qa_path, model_name=model_name, model_path=model_path,
        predict_path=out_dir, max_new_tokens=16 if model_path else 512,
        prompt_path="prompts/llama2_predict.txt", rule_path_g1=info_path,
        entities_names_path=None, force=True,
        keep_parallel=keep_parallel,
        batch_size=16 if model_path else 1))
    seconds = time.perf_counter() - t0
    summary = eval_result(out)
    toks = summary.split()
    metrics = {toks[i].rstrip(":"): float(toks[i + 1])
               for i in range(0, len(toks) - 1, 2)
               if toks[i].endswith(":")}
    mh = eval_result_multi_hop(out, dataset_path=qa_path)
    return {"eval_result": metrics, "multi_hop": mh,
            "questions": sum(1 for _ in open(out)),
            "rag_seconds": round(seconds, 1)}


def parse_train_log(path: str, n_train: int = 1500) -> dict:
    if not os.path.exists(path):
        return {}
    epochs = []
    for line in open(path):
        m = re.search(r"Epoch: (\d+), loss: ([\d.]+), time: ([\d.]+)s", line)
        if m:
            epochs.append((int(m.group(1)), float(m.group(2)),
                           float(m.group(3))))
    if not epochs:
        return {}
    import numpy as np
    warm = [t for _, _, t in epochs[2:]]
    out = {"epochs_run": len(set(e for e, _, _ in epochs)),
           "warm_epoch_seconds": round(float(np.median(warm)), 1),
           "epochs_per_hour": round(3600.0 / float(np.median(warm)), 1),
           "train_subgraphs_per_sec": round(n_train / float(np.median(warm)), 1),
           "final_train_loss": epochs[-1][1]}
    evals = re.findall(r"EVAL F1: ([\d.]+), H1: ([\d.]+), EM: ([\d.]+)",
                       open(path).read())
    if evals:
        out["best_dev_h1"] = max(float(h) for _, h, _ in evals)
        out["best_dev_f1"] = max(float(f) for f, _, _ in evals)
    tests = re.findall(r"TEST F1: ([\d.]+), H1: ([\d.]+), EM: ([\d.]+)",
                       open(path).read())
    if tests:
        f, h, em = tests[-1]
        out["test_f1"], out["test_h1"], out["test_em"] = (float(f), float(h),
                                                          float(em))
    return out


def main():
    global DATA, CKPT_DIR, EXP
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="synthqsp", choices=sorted(PRESETS))
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--train_log", default=None)
    ap.add_argument("--skip_eval", action="store_true",
                    help="reuse an existing .info export")
    ap.add_argument("--reader_path", default=None,
                    help="dir with a trained llm_tpu reader (config.json + "
                         "checkpoint/): adds a rag_trained_reader stage "
                         "next to the mock-reader numbers")
    ap.add_argument("--reader_key", default="rag_trained_reader",
                    help="artifact key for the trained-reader stage (use a "
                         "distinct key to keep multiple readers side by "
                         "side, e.g. rag_trained_reader_kp)")
    ap.add_argument("--skip_rag", action="store_true",
                    help="reuse the existing artifact's mock-reader rag "
                         "stage (only recompute the trained-reader stage)")
    args = ap.parse_args()
    preset = PRESETS[args.preset]
    DATA, CKPT_DIR, EXP = preset["data"], preset["ckpt_dir"], preset["exp"]
    ckpt = args.ckpt or EXP + "-h1.ckpt"
    train_log = args.train_log or preset["train_log"]

    os.makedirs("docs", exist_ok=True)
    info_path = os.path.join(CKPT_DIR, "test_r02.info")
    # merge into the existing artifact so independently-computed stages
    # (e.g. readers evaluated under different --reader_key) accumulate
    res = {}
    if os.path.exists(preset["out"]):
        try:
            with open(preset["out"]) as f:
                res = json.load(f)
        except Exception:
            res = {}
    res["dataset"] = preset["dataset"]
    res["hyperparameters"] = preset["hyper"]
    trained = parse_train_log(train_log, preset["n_train"])
    if trained or "training" not in res:
        res["training"] = trained
    if not args.skip_eval or not os.path.exists(info_path):
        log("eval-only export on chip...")
        run_eval_export(ckpt, info_path, preset)
    res["retrieval"] = answer_recall(info_path)

    # load_gnn_rag zips the .info with a sibling test.json by line order
    qa_path = os.path.join(CKPT_DIR, "test.json")
    n = build_llm_test_json(qa_path)
    if args.skip_rag and "rag" in res:
        log(f"LLM-side test.json: {n} questions; reusing mock rag stage")
    else:
        log(f"LLM-side test.json: {n} questions; running RAG stage...")
        res["rag"] = rag_stage(info_path, qa_path,
                               os.path.join(CKPT_DIR, "rag"))

    if args.reader_path:
        log("RAG stage with the TRAINED on-chip reader...")
        # serve with the SAME path verbalization the reader was trained on
        kp = False
        meta_p = os.path.join(args.reader_path, "train_meta.json")
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                kp = bool(json.load(f).get("keep_parallel", False))
        res[args.reader_key] = rag_stage(
            info_path, qa_path,
            os.path.join(CKPT_DIR, "rag_" + args.reader_key),
            model_name="llama_tpu", model_path=args.reader_path,
            keep_parallel=kp)
        res[args.reader_key]["reader_path"] = args.reader_path
        res[args.reader_key]["keep_parallel"] = kp
        # provenance stamp: merged artifacts can carry reader stages from
        # OLDER runs; the ckpt + time identify what each was computed against
        import datetime
        res[args.reader_key]["computed_against_ckpt"] = ckpt
        res[args.reader_key]["computed_at"] = (
            datetime.datetime.now().isoformat(timespec="seconds"))

    with open(preset["out"], "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
