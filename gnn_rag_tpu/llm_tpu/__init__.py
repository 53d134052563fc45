"""TPU-native LLM stack for the reader/planner side of GNN-RAG.

The reference serves LLaMA via HF pipelines with CUDA monkey patches
(flash-attn + RoPE condensation, llm/src/llms/language_models/longchat/) and
finetunes with trl+deepspeed (llm/src/joint_training/). Here the equivalent
is native JAX:

* model.py — LLaMA-family decoder in flax (RMSNorm, RoPE with a condense
  ratio = the reference's position interpolation, GQA, SwiGLU);
* flash_attention.py — Pallas causal flash-attention kernel (the TPU
  equivalent of the reference's CUDA flash-attn monkey patch);
* generate.py — jitted greedy + beam-search decoding with a KV cache
  (drives rag/gen_rule_path.py);
* sharding.py — dp x tp parameter partition rules (GSPMD);
* sft.py — completion-only-loss SFT trainer (the trl SFTTrainer +
  DataCollatorForCompletionOnlyLM equivalent) with checkpoint auto-resume.
"""

from .model import LlamaConfig, LlamaLM

__all__ = ["LlamaConfig", "LlamaLM"]
