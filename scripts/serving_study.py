"""QAService serving evidence -> docs/serving_r05.json.

VERDICT r3 demand #4: QAService (gnn_rag_tpu/serve.py) is the flagship
new capability over the reference — the reference couples its two stages
only through hand-moved .info files (gnn/README.md:22 ->
predict_answer.py:43-80) and has no online serving story at all. This
study measures the one-process question->answer path on the real chip:

  HTTP POST /answer -> GraphBatch ingest -> trained ReaRev forward ->
  eps-cumulative candidates -> C++ shortest-path enumeration ->
  PromptBuilder -> trained llama_tpu reader -> answer text

Rows: {retrieve-only, answer with bf16 reader, int8 reader, speculative
reader (tiny draft)} x {batch 1, batch 16}; per-request wall latency
p50/p99 and sustained QPS over the SynthQSP test distribution. Every
number includes HTTP + host ingest + device steps (nothing is excluded),
after a warmup pass that compiles each shape bucket a question hits.

Usage (after training the retriever + readers):
  python scripts/serving_study.py \
      --gnn_ckpt_dir checkpoints/synthqsp_r04 --gnn_exp synthqsp_r04 \
      --reader checkpoints/reader_big_kp --draft checkpoints/reader_tiny_kp
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


def post(port, path, body, timeout=600):
    import urllib.request
    req = urllib.request.Request(
        f"http://localhost:{port}{path}", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def load_questions(data_dir, n):
    qs = []
    with open(os.path.join(data_dir, "test.json")) as f:
        for line in f:
            if len(qs) >= n:
                break
            q = json.loads(line)
            qs.append({"id": q["id"], "question": q["question"],
                       "entities": q["entities"],
                       "subgraph": q["subgraph"],
                       "answers": [a["text"] for a in q["answers"]]})
    return qs


def measure(port, path, questions, batch: int, body_key="questions"):
    """Send `questions` in groups of `batch`; per-request latency stats.

    One untimed pass over the EXACT measurement groups first: different
    groups hit different shape buckets, so anything less leaves an XLA
    compile inside the timed window (the r4 7B-decode lesson — always
    time the same compiled program). The warmup timeout is generous: the
    first speculative-decode compile through the tunnel can take >10 min."""
    for i in range(0, len(questions), batch):
        post(port, path, {body_key: questions[i:i + batch]}, timeout=2400)
    lat = []
    hits = 0
    t_all = time.perf_counter()
    for i in range(0, len(questions), batch):
        grp = questions[i:i + batch]
        t0 = time.perf_counter()
        resp = post(port, path, {body_key: grp})
        lat.append(time.perf_counter() - t0)
        for q, r in zip(grp, resp["results"]):
            pred = r.get("prediction", "")
            if any(a in pred for a in q["answers"]):
                hits += 1
    total = time.perf_counter() - t_all
    lat_ms = np.asarray(lat) * 1e3
    return {"batch": batch, "n_questions": len(questions),
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
            "mean_ms": round(float(lat_ms.mean()), 1),
            "sustained_qps": round(len(questions) / total, 2),
            "hit_pct": round(100.0 * hits / len(questions), 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/synthqsp")
    ap.add_argument("--gnn_ckpt_dir", default="checkpoints/synthqsp_r04")
    ap.add_argument("--gnn_exp", default="synthqsp_r04")
    ap.add_argument("--reader", default="checkpoints/reader_big_kp")
    ap.add_argument("--draft", default=None,
                    help="draft bundle for the speculative row")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--max_new", type=int, default=24)
    ap.add_argument("--out", default="docs/serving_r05.json")
    ap.add_argument("--variants", default="retrieve,bf16,int8,spec",
                    help="comma list; others keep their rows from an "
                         "existing --out artifact (re-run only what failed)")
    args = ap.parse_args()
    wanted = set(args.variants.split(","))

    import scripts.serve_qa as serve_qa
    from gnn_rag_tpu.rag.llms import get_registed_model
    from gnn_rag_tpu.serve import QAService

    base_argv = ["ReaRev", "--data_folder", args.data + "/",
                 "--checkpoint_dir", args.gnn_ckpt_dir + "/",
                 "--load_experiment", args.gnn_exp + "-h1.ckpt",
                 "--entity_dim", "50", "--num_iter", "3", "--num_ins", "2",
                 "--num_gnn", "3", "--lm", "sbert",
                 "--relation_word_emb", "True", "--name",
                 os.path.basename(args.data), "--port", "0"]
    httpd = serve_qa.main(base_argv, block=False)
    # serve_qa returns the RetrieverService http server with programmatic
    # handles; QAService is rebuilt per reader variant on the same retriever
    retr = httpd.retriever
    questions = load_questions(args.data, args.n)
    kp = False
    meta_p = os.path.join(args.reader, "train_meta.json")
    if os.path.exists(meta_p):
        kp = bool(json.load(open(meta_p)).get("keep_parallel", False))

    result = {"config": {"n": args.n, "reader": args.reader,
                         "draft": args.draft, "keep_parallel": kp,
                         "path_backend": retr.path_backend,
                         "max_new_tokens": args.max_new},
              "rows": {}}
    if os.path.exists(args.out):   # partial rerun: keep prior rows
        with open(args.out) as f:
            result["rows"] = json.load(f).get("rows", {})

    def save():
        # Re-written after every row: a single-chip tunnel can wedge
        # mid-study, and a partial artifact beats none.
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")

    def row(key, port, path, batch):
        try:
            result["rows"][key] = measure(port, path, questions, batch)
        except Exception as e:  # keep the other rows alive
            result["rows"][key] = {"error": f"{type(e).__name__}: {e}"}
        log(f"{key}:", result["rows"][key])
        save()

    # ---- retrieve-only rows (no reader; measure() self-warms)
    port = httpd.server_port
    if "retrieve" in wanted:
        row("retrieve_b1", port, "/retrieve", 1)
        row("retrieve_b16", port, "/retrieve", 16)
    httpd.shutdown()

    variants = [("bf16", dict(quant=None, draft_path=None))]
    variants.append(("int8", dict(quant="int8", draft_path=None)))
    if args.draft:
        variants.append(("spec", dict(quant=None, draft_path=args.draft)))
    variants = [(n, kw) for n, kw in variants if n in wanted]
    for name, kw in variants:
        reader_args = argparse.Namespace(
            model_path=args.reader, spec_gamma=4,
            max_new_tokens=args.max_new, **kw)
        reader = get_registed_model("llama_tpu")(reader_args)
        reader.prepare_for_inference()
        qa = QAService(retr, reader, keep_parallel=kp)
        h = qa.serve_http(port=0)
        p = h.server_port
        row(f"answer_{name}_b1", p, "/answer", 1)
        row(f"answer_{name}_b16", p, "/answer", 16)
        h.shutdown()

    save()
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
