#!/bin/bash
# RoG planning: beam-generate relation paths (reference: llm/scripts/planning.sh)
# Usage: gen_rule_path.sh <model_path> [dataset]
python -c "
import sys
from transformers import AutoTokenizer
from gnn_rag_tpu.llm_tpu.convert_hf import load_hf_llama
from gnn_rag_tpu.llm_tpu.model import LlamaLM
from gnn_rag_tpu.rag.gen_rule_path import (GenRulePathConfig, TpuSeqGenerator,
                                           gen_prediction)

model_path = sys.argv[1]
dataset = sys.argv[2] if len(sys.argv) > 2 else 'RoG-webqsp'
params, model_cfg = load_hf_llama(model_path)
tok = AutoTokenizer.from_pretrained(model_path, use_fast=False,
                                    local_files_only=True)
gen = TpuSeqGenerator(LlamaLM(model_cfg), params, tok, max_len=1024)
cfg = GenRulePathConfig(d=dataset, model_name='RoG', n_beam=3)
print(gen_prediction(cfg, gen))
" "$@"
