"""RetrieverService: production serving of the GNN retrieval stage.

New capability (the reference couples retrieval to offline file dumps): load
a trained checkpoint once, then serve questions end to end on TPU —

    question + subgraph  ->  GraphBatch (kernel layout)  ->  ReaRev forward
    ->  eps-cumulative candidates  ->  batched-BFS shortest paths
    ->  verbalized reasoning paths (ready for any LLM reader)

Batches of questions are padded to shape buckets so the jitted forward is
reused across requests. The same class powers an OpenAI-protocol-style HTTP
endpoint via `serve_http`.
"""

from __future__ import annotations

import json
from typing import Callable, List, Optional, Sequence

import jax
import numpy as np

from .config import Config
from .data.loader import KGQADataset, ingest_question, num_kb_relation
from .data.vocab import Vocab
from .rag.path_extract import BatchedPathExtractor
from .rag.text_utils import path_to_string
from .train.metrics import extract_candidates, f1_and_hits_eval
from .train.trainer import build_model


class RetrieverService:
    def __init__(self, cfg: Config, vocab: Vocab, params, *,
                 rel_hidden=None, rel_hidden_inv=None, rel_text_mask=None,
                 question_encoder: Optional[Callable] = None,
                 tokenizer=None, max_hops: int | None = None,
                 entity_buckets=(256, 512, 1024, 2048),
                 fact_buckets=(1024, 2048, 4096, 8192, 16384),
                 path_backend: str = "auto", keep_parallel: bool = False):
        self.cfg = cfg
        self.vocab = vocab
        self.nkr = num_kb_relation(vocab.num_relation,
                                   cfg.data.use_inverse_relation,
                                   cfg.data.use_self_loop)
        self.model = build_model(cfg, vocab.num_entity, self.nkr)
        self.params = params
        self.rel_args = (rel_hidden, rel_hidden_inv, rel_text_mask)
        self.question_encoder = question_encoder  # tokens -> hidden states
        self.tokenizer = tokenizer
        # path backend: 'auto' picks by measured speed (BENCH
        # path_extraction): the C++ enumerator (371 q/s) first, then the
        # pure-Python oracle (99 q/s). The batched TPU BFS ('device',
        # 11.9 q/s) is experimental and never auto-selected — request it
        # explicitly.
        from .native import available as native_available
        if path_backend == "auto":
            path_backend = "native" if native_available() else "python"
        # multi-relation path verbalization (native composite-rel ids or
        # the python oracle; the device BFS keeps collapse semantics — see
        # rag.graph_utils.UndirectedGraph.keep_parallel)
        self.keep_parallel = keep_parallel
        if keep_parallel and path_backend == "device":
            path_backend = "native" if native_available() else "python"
        self.path_backend = path_backend
        self.max_hops = max_hops
        self.extractor = (BatchedPathExtractor(max_hops=max_hops)
                          if path_backend == "device" else None)
        self.entity_buckets = entity_buckets
        self.fact_buckets = fact_buckets
        self._fwd = jax.jit(
            lambda p, b: self.model.apply(p, b, *self.rel_args))

    # ------------------------------------------------------------------
    def retrieve(self, questions: Sequence[dict], *,
                 with_paths: bool = True) -> List[dict]:
        """questions: reference JSONL schema (question, entities,
        subgraph{entities, tuples}); returns per-question candidates
        [[gid, prob]...] and verbalized reasoning paths."""
        records = []
        for q in questions:
            rec = ingest_question(
                q, self.vocab, data_name=self.cfg.data.name,
                use_inverse_relation=self.cfg.data.use_inverse_relation,
                use_self_loop=self.cfg.data.use_self_loop,
                num_kb_relation=self.nkr)
            records.append(rec)

        ds = KGQADataset([r for r in records if r is not None],
                         num_entity=self.vocab.num_entity,
                         num_kb_relation=self.nkr,
                         entity_buckets=self.entity_buckets,
                         fact_buckets=self.fact_buckets)
        if self.tokenizer is not None:
            ds.tokenize_questions(self.tokenizer)
        else:
            for r in ds.records:
                r.q_token_ids = np.zeros(4, np.int32)
        if self.question_encoder is not None:
            ds.q_hidden = [self.question_encoder(r.q_token_ids)
                           for r in ds.records]

        idx = list(range(len(ds)))
        batch = ds.make_batch(
            idx, build_layout=jax.default_backend() == "tpu")
        _, _, pred_dist = self._fwd(self.params, batch)
        pred_dist = np.asarray(pred_dist)

        ignore_prob = (1 - self.cfg.model.eps) / ds.max_local_entity
        results = []
        ri = 0
        for q, rec in zip(questions, records):
            if rec is None:
                results.append({"cand": [], "paths": []})
                continue
            cand2prob = extract_candidates(
                pred_dist[ri], np.asarray(batch.entity_gids[ri]),
                np.asarray(batch.query_entities[ri]),
                self.vocab.num_entity, ignore_prob)
            _, _, _, _, _, _, retrieved = f1_and_hits_eval(
                [], cand2prob, self.cfg.model.eps)
            cand = [[self.vocab.id2entity.get(c, c), float(p)]
                    for c, p in retrieved]
            results.append({"cand": cand, "paths": []})
            ri += 1

        if with_paths:
            path_qs = []
            for q, res in zip(questions, results):
                path_qs.append({
                    "graph": q["subgraph"]["tuples"],
                    "q_entity": q.get("entities", []),
                    "cand": [c for c, _ in res["cand"]],
                })
            if self.path_backend == "device":
                all_paths = self.extractor.extract(path_qs)
            elif self.path_backend == "python":
                from .rag.graph_utils import build_graph, get_truth_paths
                all_paths = [get_truth_paths(
                                 pq["q_entity"], pq["cand"],
                                 build_graph(pq["graph"],
                                             keep_parallel=self.keep_parallel))
                             for pq in path_qs]
            else:
                from .rag.graph_utils import get_truth_paths_fast
                all_paths = [get_truth_paths_fast(
                                 pq["graph"], pq["q_entity"], pq["cand"],
                                 keep_parallel=self.keep_parallel)
                             for pq in path_qs]
            for res, paths in zip(results, all_paths):
                seen = []
                for p in paths:
                    s = path_to_string(p)
                    if s not in seen:
                        seen.append(s)
                res["paths"] = seen
        return results

    # ------------------------------------------------------------------
    def serve_http(self, host: str = "localhost", port: int = 0):
        """POST /retrieve with {"questions": [...]} -> results JSON."""
        return _serve_http(host, port, {"/retrieve": (
            lambda body: {"results": self.retrieve(
                body.get("questions", []),
                with_paths=body.get("with_paths", True))})})


class QAService:
    """End-to-end KGQA in ONE process: GNN retrieval -> shortest-path
    verbalization -> prompt -> LLM reader -> answer.

    New capability: the reference couples its two stages only through
    offline files (.info dumps moved by hand, gnn/README.md:22 ->
    predict_answer.py:43-80); here a question with its subgraph goes in and
    the read answer comes out of a single service, reusing the exact
    PromptBuilder semantics (eps-cumulative candidates, token-budget
    truncation) of the offline path."""

    def __init__(self, retriever: RetrieverService, reader, *,
                 prompt_path: str = "prompts/llama2_predict.txt",
                 top_k_cand: int = 10, keep_parallel: Optional[bool] = None):
        # reader: any rag.llms registry backend, already prepared
        # (mock, llama_tpu [--quant int8], hf_causal, openai_chat, ...)
        self.retriever = retriever
        self.reader = reader
        if keep_parallel is None:
            keep_parallel = retriever.keep_parallel
        from .rag.prompt_builder import PromptBuilder
        self.builder = PromptBuilder(
            prompt_path, maximun_token=reader.maximun_token,
            tokenize=reader.tokenize, keep_parallel=keep_parallel)
        self.top_k_cand = top_k_cand

    def answer(self, questions: Sequence[dict]) -> List[dict]:
        """questions: reference JSONL schema; returns per-question
        {prediction, cand, prompt}."""
        retrieved = self.retriever.retrieve(questions, with_paths=False)
        prompts = []
        for q, r in zip(questions, retrieved):
            ex = {"question": q["question"],
                  "graph": q["subgraph"]["tuples"],
                  "q_entity": q.get("entities", []),
                  "cand": [c for c, _ in r["cand"][:self.top_k_cand]],
                  "choices": q.get("choices", [])}
            prompts.append(self.builder.process_input(ex))
        if len(prompts) > 1 and hasattr(self.reader, "generate_batch"):
            outs = self.reader.generate_batch(prompts)
        else:
            # single prompt goes through generate_sentence so backends with
            # a low-latency path (llama_tpu --draft_path speculative
            # decoding, bs=1 by design) actually use it
            outs = [self.reader.generate_sentence(p) for p in prompts]
        return [{"prediction": o, "cand": r["cand"], "prompt": p}
                for o, r, p in zip(outs, retrieved, prompts)]

    def serve_http(self, host: str = "localhost", port: int = 0):
        """POST /answer with {"questions": [...]} -> answers JSON; also
        exposes the underlying /retrieve."""
        return _serve_http(host, port, {
            "/answer": (lambda body: {"results": self.answer(
                body.get("questions", []))}),
            "/retrieve": (lambda body: {"results": self.retriever.retrieve(
                body.get("questions", []),
                with_paths=body.get("with_paths", True))}),
        })


def _serve_http(host: str, port: int, routes):
    """Minimal threaded JSON-POST server over a {path: handler} table."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            handler = routes.get(self.path.rstrip("/"))
            if handler is None:
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(body, dict):
                    raise ValueError("body must be a JSON object")
            except ValueError as exc:
                self.send_error(400, explain=str(exc))
                return
            try:
                payload = json.dumps(handler(body)).encode()
            except Exception as exc:   # noqa: BLE001 — a bad question must
                # 500 with the reason, not drop the connection and take the
                # worker thread down with it
                self.send_error(500, explain=f"{type(exc).__name__}: {exc}")
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    httpd = ThreadingHTTPServer((host, port), Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd
