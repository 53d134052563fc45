"""Import a local HF LLaMA checkpoint into LlamaLM flax params."""

from __future__ import annotations

from typing import Tuple

from .model import LlamaConfig


def load_hf_llama(model_path: str) -> Tuple[dict, LlamaConfig]:
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(
        model_path, local_files_only=True, torch_dtype=torch.float32)
    hf = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    c = model.config
    cfg = LlamaConfig(
        vocab_size=c.vocab_size, dim=c.hidden_size,
        n_layers=c.num_hidden_layers, n_heads=c.num_attention_heads,
        n_kv_heads=getattr(c, "num_key_value_heads", c.num_attention_heads),
        intermediate=c.intermediate_size,
        rope_theta=getattr(c, "rope_theta", 10000.0),
        max_seq_len=c.max_position_embeddings, norm_eps=c.rms_norm_eps)
    H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    def lin(name, heads=None):
        # TDense stores kernels in the HF orientation [out, in] (see
        # model.py TDense for the TPU layout rationale) — no transpose,
        # no head reshape: the model splits heads on the activation
        return hf[name]

    p = {
        "tok_emb": {"embedding": hf["model.embed_tokens.weight"]},
        "final_norm": {"scale": hf["model.norm.weight"]},
        "lm_head": {"kernel": hf["lm_head.weight"]},
    }
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        p[f"layer_{i}"] = {
            "input_norm": {"scale": hf[pre + "input_layernorm.weight"]},
            "post_attn_norm": {"scale": hf[pre + "post_attention_layernorm.weight"]},
            "attn": {
                "q_proj": {"kernel": lin(pre + "self_attn.q_proj.weight", H)},
                "k_proj": {"kernel": lin(pre + "self_attn.k_proj.weight", KV)},
                "v_proj": {"kernel": lin(pre + "self_attn.v_proj.weight", KV)},
                "o_proj": {"kernel": hf[pre + "self_attn.o_proj.weight"]},
            },
            "mlp": {
                "gate_proj": {"kernel": lin(pre + "mlp.gate_proj.weight")},
                "up_proj": {"kernel": lin(pre + "mlp.up_proj.weight")},
                "down_proj": {"kernel": lin(pre + "mlp.down_proj.weight")},
            },
        }
    return {"params": p}, cfg
