#!/bin/bash
# GNN-RAG inference (reference: llm/scripts/rag-reasoning.sh): RoG reader over
# GNN-retrieved candidates (+ optional RoG rule paths for the +RA variant)
python -c "
from gnn_rag_tpu.rag.predict import PredictConfig, predict_answers
import sys
cfg = PredictConfig(
    data_path='rmanluo', d='RoG-webqsp', model_name='rog',
    model_path=sys.argv[1] if len(sys.argv) > 1 else 'rmanluo/RoG',
    prompt_path='prompts/llama2_predict.txt',
    add_rule=False,
    rule_path_g1='results/gnn/RoG-webqsp/rearev-sbert/test.info',
    predict_path='results/KGQA-GNN-RAG')
predict_answers(cfg)
" "$@"
