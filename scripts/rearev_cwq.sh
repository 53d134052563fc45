#!/bin/bash
# Headline CWQ run (reference hyperparameters: gnn/scripts/rearev_cwq.sh:13-14)
python main.py ReaRev --entity_dim 50 --num_epoch 100 --batch_size 8 \
    --eval_every 2 --data_folder data/cwq/ --name cwq --lm sbert \
    --num_iter 2 --num_ins 3 --num_gnn 3 --relation_word_emb True \
    --experiment_name rearev_cwq "$@"
