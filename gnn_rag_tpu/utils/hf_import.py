"""Convert a local HuggingFace BERT-family torch checkpoint into
TransformerQuestionEncoder flax params.

Only used when model assets exist locally (zero-egress environments fall back
to random init). Mirrors the reference's AutoModel.from_pretrained usage
(bert_encoder.py:74-87) without keeping torch in the training loop.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

HF_MODEL_NAMES = {
    "bert": "bert-base-uncased",
    "roberta": "roberta-base",
    "sbert": "sentence-transformers/all-MiniLM-L6-v2",
    "sbert2": "sentence-transformers/all-mpnet-base-v2",
    "simcse": "princeton-nlp/sup-simcse-bert-base-uncased",
    "relbert": "pretrained_lms/sr-simbert/",
}


def load_hf_encoder(lm: str) -> Tuple[dict, Dict[str, int]]:
    """``lm`` is a registry key (sbert/bert/...) or a local checkpoint path."""
    import os

    from transformers import AutoModel

    # local assets only — fail fast instead of attempting network access.
    # local_files_only alone does not stop transformers' adapter_config.json
    # hub probe (5 retries x 8s backoff in zero-egress environments;
    # HF_HUB_OFFLINE is read once at huggingface_hub import, so setting it
    # here is too late), so pre-check the cache and raise immediately.
    name = HF_MODEL_NAMES.get(lm, lm)
    if not os.path.isdir(name):
        from huggingface_hub import try_to_load_from_cache
        cached = try_to_load_from_cache(name, "config.json")
        if not isinstance(cached, str):
            raise FileNotFoundError(
                f"{name} is not a local directory and not in the HF cache")
    model = AutoModel.from_pretrained(name, local_files_only=True)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    cfg = model.config
    dims = {"hidden": cfg.hidden_size, "vocab": cfg.vocab_size,
            "layers": cfg.num_hidden_layers, "heads": cfg.num_attention_heads,
            "intermediate": cfg.intermediate_size,
            "max_len": cfg.max_position_embeddings}
    H, heads = dims["hidden"], dims["heads"]
    hd = H // heads

    def t(name):  # torch Linear stores [out, in]; flax Dense wants [in, out]
        return sd[name].T

    p = {
        "tok_emb": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "pos_emb": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "type_emb": sd["embeddings.token_type_embeddings.weight"][0],
        "emb_ln": {"scale": sd["embeddings.LayerNorm.weight"],
                   "bias": sd["embeddings.LayerNorm.bias"]},
    }
    for i in range(dims["layers"]):
        pre = f"encoder.layer.{i}."
        p[f"q_{i}"] = {"kernel": t(pre + "attention.self.query.weight").reshape(H, heads, hd),
                       "bias": sd[pre + "attention.self.query.bias"].reshape(heads, hd)}
        p[f"k_{i}"] = {"kernel": t(pre + "attention.self.key.weight").reshape(H, heads, hd),
                       "bias": sd[pre + "attention.self.key.bias"].reshape(heads, hd)}
        p[f"v_{i}"] = {"kernel": t(pre + "attention.self.value.weight").reshape(H, heads, hd),
                       "bias": sd[pre + "attention.self.value.bias"].reshape(heads, hd)}
        p[f"attn_out_{i}"] = {"kernel": t(pre + "attention.output.dense.weight"),
                              "bias": sd[pre + "attention.output.dense.bias"]}
        p[f"ln1_{i}"] = {"scale": sd[pre + "attention.output.LayerNorm.weight"],
                         "bias": sd[pre + "attention.output.LayerNorm.bias"]}
        p[f"ffn1_{i}"] = {"kernel": t(pre + "intermediate.dense.weight"),
                          "bias": sd[pre + "intermediate.dense.bias"]}
        p[f"ffn2_{i}"] = {"kernel": t(pre + "output.dense.weight"),
                          "bias": sd[pre + "output.dense.bias"]}
        p[f"ln2_{i}"] = {"scale": sd[pre + "output.LayerNorm.weight"],
                         "bias": sd[pre + "output.LayerNorm.bias"]}
    return {"params": p}, dims
