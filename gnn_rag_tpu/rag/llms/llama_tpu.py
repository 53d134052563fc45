"""On-chip LlamaLM reader backend (TPU-native replacement for the
reference's HF `pipeline("text-generation")` Llama backend,
llm/src/llms/language_models/llama.py:15-36).

Serves a local SFT'd gnn_rag_tpu.llm_tpu.LlamaLM checkpoint through the
registry interface, decoding with the jitted kv-cache Decoder. The default
tokenizer is a self-contained byte-level tokenizer (no external assets —
this environment has no HF tokenizer files), which is what the tiny trained
reader of scripts/train_reader.py uses; real LLaMA checkpoints imported via
convert_hf can plug in an HF tokenizer by passing `tokenizer=`.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

from .base import BaseLanguageModel


class ByteTokenizer:
    """Reversible byte-level tokenizer: ids 0..2 = pad/bos/eos, 3..258 =
    bytes. No assets, no OOV."""

    pad_id = 0
    bos_id = 1
    eos_id = 2
    vocab_size = 259

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids = [b + 3 for b in text.encode("utf-8")]
        return ([self.bos_id] + ids) if add_bos else ids

    def decode(self, ids) -> str:
        return bytes(max(0, int(i) - 3) for i in ids
                     if int(i) >= 3).decode("utf-8", errors="ignore")


class WordTokenizer:
    """Closed-vocabulary word tokenizer: text splits into `\\S+` words and
    whitespace runs; each in-vocab chunk is ONE token, out-of-vocab chunks
    fall back to byte tokens (ids 3..258, same as ByteTokenizer — fully
    reversible). Built from the KG vocabulary (entities/relations) plus the
    prompt-template words, so an entity id like `m.0005658` is a single
    token — which is what a real LLaMA BPE gives frequent surface forms,
    and what makes answer copying a one-token induction step instead of a
    9-byte transcription (the byte-level reader plateaued at 1.07 nats/byte
    and copied nothing)."""

    pad_id = 0
    bos_id = 1
    eos_id = 2
    _BYTE0 = 3          # ids 3..258 = byte fallback
    _WORD0 = 259        # word ids start here

    def __init__(self, words):
        self.words = list(words)
        self.vocab = {w: self._WORD0 + i for i, w in enumerate(self.words)}
        self.vocab_size = self._WORD0 + len(self.words)

    @classmethod
    def from_texts(cls, texts):
        import re
        seen, order = set(), []
        for t in texts:
            for chunk in re.findall(r"\S+|\s+", t):
                if chunk not in seen:
                    seen.add(chunk)
                    order.append(chunk)
        return cls(order)

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(self.words, f)

    @classmethod
    def load(cls, path: str):
        with open(path) as f:
            return cls(json.load(f))

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        import re
        ids = [self.bos_id] if add_bos else []
        for chunk in re.findall(r"\S+|\s+", text):
            tid = self.vocab.get(chunk)
            if tid is not None:
                ids.append(tid)
            else:
                ids.extend(b + self._BYTE0 for b in chunk.encode("utf-8"))
        return ids

    def decode(self, ids) -> str:
        out, byte_run = [], bytearray()
        for i in ids:
            i = int(i)
            if i >= self._WORD0:
                if byte_run:
                    out.append(byte_run.decode("utf-8", errors="ignore"))
                    byte_run = bytearray()
                if i - self._WORD0 < len(self.words):
                    out.append(self.words[i - self._WORD0])
            elif i >= self._BYTE0:
                byte_run.append(i - self._BYTE0)
        if byte_run:
            out.append(byte_run.decode("utf-8", errors="ignore"))
        return "".join(out)


class LlamaTPU(BaseLanguageModel):
    """Registry backend: greedy decode on the TPU with a kv cache."""

    DTYPE = {"fp16": "bfloat16", "bf16": "bfloat16", "fp32": "float32"}

    @staticmethod
    def add_args(parser):
        parser.add_argument("--model_path", type=str, default=None,
                            help="dir with checkpoint/ and config.json")
        parser.add_argument("--max_new_tokens", type=int, default=64)
        parser.add_argument("--quant", type=str, default=None,
                            choices=["int8"],
                            help="weight-only int8 serving: quantize the "
                                 "checkpoint at load (halves decode HBM "
                                 "traffic, llm_tpu.quant)")
        parser.add_argument("--draft_path", type=str, default=None,
                            help="dir with a SMALLER reader bundle sharing "
                                 "this vocab: single-prompt generation uses "
                                 "speculative draft-and-verify decoding "
                                 "(exact greedy parity, generate."
                                 "SpeculativeDecoder)")
        parser.add_argument("--spec_gamma", type=int, default=4)

    def __init__(self, args, tokenizer=None):
        self.args = args
        self.tok = tokenizer or ByteTokenizer()
        self.maximun_token = 4096 - 100  # overwritten from config at load

    def load_model(self, **kwargs):
        self.prepare_for_inference(**kwargs)
        return self

    def prepare_for_inference(self, **kwargs):
        import jax.numpy as jnp

        from ...llm_tpu.generate import Decoder
        from ...llm_tpu.model import LlamaConfig, LlamaLM
        from ...utils.checkpoint import load_pytree, validate_shapes

        path = self.args.model_path
        vocab_path = os.path.join(path, "vocab.json")
        if os.path.exists(vocab_path):
            self.tok = WordTokenizer.load(vocab_path)
        with open(os.path.join(path, "config.json")) as f:
            raw = json.load(f)
        self.max_new = int(getattr(self.args, "max_new_tokens", 64) or 64)
        cfg = LlamaConfig(**raw)
        self.maximun_token = cfg.max_seq_len - self.max_new - 8
        model = LlamaLM(cfg)
        dummy = model.init(__import__("jax").random.PRNGKey(0),
                           jnp.zeros((1, 8), jnp.int32))
        params = validate_shapes(
            load_pytree(os.path.join(path, "checkpoint"), dummy),
            dummy, context=path)
        quant = getattr(self.args, "quant", None)
        if quant == "int8" and cfg.quant != "int8":
            import dataclasses as _dc

            from ...llm_tpu.quant import quantize_params
            params = quantize_params(params)
            model = LlamaLM(_dc.replace(cfg, quant="int8"))
        self.decoder = Decoder(model, params, max_len=cfg.max_seq_len)
        self.spec = None
        draft_path = getattr(self.args, "draft_path", None)
        gamma = getattr(self.args, "spec_gamma", 4)
        gamma = 4 if gamma is None else int(gamma)
        if draft_path and gamma < 1:
            import logging
            logging.getLogger(__name__).warning(
                "spec_gamma=%d < 1: speculative decoding disabled, "
                "falling back to plain greedy", gamma)
            draft_path = None
        if draft_path:
            from ...llm_tpu.generate import SpeculativeDecoder
            with open(os.path.join(draft_path, "config.json")) as f:
                dcfg = LlamaConfig(**json.load(f))
            dmodel = LlamaLM(dcfg)
            ddummy = dmodel.init(__import__("jax").random.PRNGKey(0),
                                 jnp.zeros((1, 8), jnp.int32))
            dparams = validate_shapes(
                load_pytree(os.path.join(draft_path, "checkpoint"), ddummy),
                ddummy, context=draft_path)
            self.spec = SpeculativeDecoder(
                model, params, dmodel, dparams, max_len=cfg.max_seq_len,
                gamma=gamma)
            # speculation needs gamma+1 extra cache slots beyond max_new
            self.maximun_token = (cfg.max_seq_len - self.max_new
                                  - (gamma + 1) - 8)

    def tokenize(self, text: str) -> int:
        return len(self.tok.encode(text))

    def generate_sentence(self, llm_input: str) -> str:
        # Decoder.greedy returns the NEW tokens only (generate.py contract)
        ids = self.tok.encode(llm_input)[-self.maximun_token:]
        dec = self.spec if self.spec is not None else self.decoder
        out = dec.greedy(ids, max_new_tokens=self.max_new,
                         eos_id=self.tok.eos_id)
        return self.tok.decode(out).strip()

    def generate_batch(self, llm_inputs: List[str]) -> List[str]:
        prompts = [self.tok.encode(t)[-self.maximun_token:]
                   for t in llm_inputs]
        outs = self.decoder.greedy_batch(prompts,
                                         max_new_tokens=self.max_new,
                                         eos_id=self.tok.eos_id)
        return [self.tok.decode(o).strip() for o in outs]
