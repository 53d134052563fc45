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
    arch = getattr(cfg, "model_type", "bert")
    if arch == "t5":
        return _map_t5(sd, cfg)
    if arch == "mpnet":
        return _map_mpnet(sd, cfg)
    # bert / roberta / simcse / relbert share the BERT layout
    dims = {"hidden": cfg.hidden_size, "vocab": cfg.vocab_size,
            "layers": cfg.num_hidden_layers, "heads": cfg.num_attention_heads,
            "intermediate": cfg.intermediate_size,
            "max_len": cfg.max_position_embeddings,
            "arch": "roberta" if arch == "roberta" else "bert",
            "pad_idx": getattr(cfg, "pad_token_id", 0) or 0}
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


def _map_t5(sd, cfg) -> Tuple[dict, Dict[str, int]]:
    """T5 encoder stack -> models.encoder_variants.T5Encoder params
    (the reference's t5 variant runs AutoModel('t5-small').encoder,
    bert_encoder.py:52-55, 95-98)."""
    H, heads, dkv = cfg.d_model, cfg.num_heads, cfg.d_kv
    dims = {"hidden": H, "vocab": cfg.vocab_size, "layers": cfg.num_layers,
            "heads": heads, "intermediate": cfg.d_ff, "head_dim": dkv,
            "num_buckets": cfg.relative_attention_num_buckets,
            "max_distance": getattr(cfg, "relative_attention_max_distance",
                                    128),
            "eps": cfg.layer_norm_epsilon, "arch": "t5"}

    def t(name):
        return sd[name].T

    emb_key = ("shared.weight" if "shared.weight" in sd
               else "encoder.embed_tokens.weight")
    p = {
        "tok_emb": {"embedding": sd[emb_key]},
        "rel_bias": {"embedding":
                     sd["encoder.block.0.layer.0.SelfAttention."
                        "relative_attention_bias.weight"]},
        "final_ln": {"scale": sd["encoder.final_layer_norm.weight"]},
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}."
        att = pre + "layer.0.SelfAttention."
        p[f"q_{i}"] = {"kernel": t(att + "q.weight").reshape(H, heads, dkv)}
        p[f"k_{i}"] = {"kernel": t(att + "k.weight").reshape(H, heads, dkv)}
        p[f"v_{i}"] = {"kernel": t(att + "v.weight").reshape(H, heads, dkv)}
        p[f"o_{i}"] = {"kernel": sd[att + "o.weight"].T.reshape(heads, dkv, H)}
        p[f"ln_attn_{i}"] = {"scale": sd[pre + "layer.0.layer_norm.weight"]}
        p[f"wi_{i}"] = {"kernel": t(pre + "layer.1.DenseReluDense.wi.weight")}
        p[f"wo_{i}"] = {"kernel": t(pre + "layer.1.DenseReluDense.wo.weight")}
        p[f"ln_ffn_{i}"] = {"scale": sd[pre + "layer.1.layer_norm.weight"]}
    return {"params": p}, dims


def _map_mpnet(sd, cfg) -> Tuple[dict, Dict[str, int]]:
    """MPNetModel -> models.encoder_variants.MPNetEncoder params (the
    reference's sbert2 = all-mpnet-base-v2, bert_encoder.py:46-50)."""
    H, heads = cfg.hidden_size, cfg.num_attention_heads
    hd = H // heads
    dims = {"hidden": H, "vocab": cfg.vocab_size,
            "layers": cfg.num_hidden_layers, "heads": heads,
            "intermediate": cfg.intermediate_size,
            "max_len": cfg.max_position_embeddings,
            "num_buckets": cfg.relative_attention_num_buckets,
            "eps": cfg.layer_norm_eps, "pad_idx": cfg.pad_token_id,
            "arch": "mpnet"}

    def t(name):
        return sd[name].T

    p = {
        "tok_emb": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "pos_emb": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "emb_ln": {"scale": sd["embeddings.LayerNorm.weight"],
                   "bias": sd["embeddings.LayerNorm.bias"]},
        "rel_bias": {"embedding":
                     sd["encoder.relative_attention_bias.weight"]},
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layer.{i}."
        for nm in ("q", "k", "v"):
            p[f"{nm}_{i}"] = {
                "kernel": t(pre + f"attention.attn.{nm}.weight"
                            ).reshape(H, heads, hd),
                "bias": sd[pre + f"attention.attn.{nm}.bias"
                           ].reshape(heads, hd)}
        p[f"attn_out_{i}"] = {"kernel": t(pre + "attention.attn.o.weight"),
                              "bias": sd[pre + "attention.attn.o.bias"]}
        p[f"ln1_{i}"] = {"scale": sd[pre + "attention.LayerNorm.weight"],
                         "bias": sd[pre + "attention.LayerNorm.bias"]}
        p[f"ffn1_{i}"] = {"kernel": t(pre + "intermediate.dense.weight"),
                          "bias": sd[pre + "intermediate.dense.bias"]}
        p[f"ffn2_{i}"] = {"kernel": t(pre + "output.dense.weight"),
                          "bias": sd[pre + "output.dense.bias"]}
        p[f"ln2_{i}"] = {"scale": sd[pre + "output.LayerNorm.weight"],
                         "bias": sd[pre + "output.LayerNorm.bias"]}
    return {"params": p}, dims
