#!/bin/bash
# Headline WebQSP run (reference hyperparameters: gnn/README.md:19)
python main.py ReaRev --entity_dim 50 --num_epoch 100 --batch_size 8 \
    --eval_every 2 --data_folder data/webqsp/ --lm sbert --num_iter 3 \
    --num_ins 2 --num_gnn 3 --relation_word_emb True \
    --experiment_name rearev_webqsp "$@"
