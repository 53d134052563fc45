#!/bin/bash
# RoG-style joint SFT on TPU (reference: llm/scripts/train.sh, deepspeed
# ZeRO-3 replaced by dp x tp GSPMD sharding). Expects preprocessed JSONL from
# gnn_rag_tpu.finetune.data_prep.
python -c "
import sys
import numpy as np
from transformers import AutoTokenizer
from gnn_rag_tpu.finetune.data_prep import load_multiple_datasets
from gnn_rag_tpu.llm_tpu.convert_hf import load_hf_llama
from gnn_rag_tpu.llm_tpu.sft import (RESPONSE_TEMPLATE, SFTConfig, SFTTrainer,
                                     pack_examples, resize_embeddings)

model_path = sys.argv[1]
data_paths = sys.argv[2:]
params, model_cfg = load_hf_llama(model_path)
tok = AutoTokenizer.from_pretrained(model_path, use_fast=False,
                                    local_files_only=True)
new_tokens = ['<SEP>', '<PATH>', '</PATH>']
if tok.pad_token is None:
    new_tokens.append('<PAD>')
tok.add_tokens(new_tokens)
params = resize_embeddings(params, model_cfg.vocab_size, len(tok))
data = load_multiple_datasets(data_paths, shuffle=True)
template_ids = tok.encode(RESPONSE_TEMPLATE, add_special_tokens=False)
tokens, mask = pack_examples([d['text'] for d in data], tok.encode,
                             template_ids, 2048, tok.pad_token_id or 0)
cfg = SFTConfig(output_dir='saved_models/llama2_joint', batch_size=8,
                total_steps=3000)
trainer = SFTTrainer(model_cfg, cfg, params=params)
trainer.train(tokens, mask)
" "$@"
