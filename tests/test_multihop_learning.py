"""ReaRev learns 2-hop compositional reasoning on the synthetic fixture —
the capability the reference's num_iter/num_gnn stack exists for."""

import numpy as np
import pytest

from gnn_rag_tpu.config import Config, ModelConfig, TrainConfig
from gnn_rag_tpu.train.trainer import Trainer
from gnn_rag_tpu.utils.synthetic import multihop_records, random_rel_hidden

NUM_REL = 9
WORD_DIM = 32


@pytest.mark.e2e
def test_rearev_learns_two_hop(tmp_path):
    rng = np.random.default_rng(0)
    ds = multihop_records(rng, n_questions=32, num_relation=NUM_REL)
    ds.q_hidden = [rng.standard_normal((len(r.q_token_ids), WORD_DIM))
                   .astype(np.float32) * 0.5 for r in ds.records]
    rel = random_rel_hidden(rng, NUM_REL + 1, 4, WORD_DIM)
    cfg = Config(model=ModelConfig(entity_dim=24, num_iter=2, num_ins=2,
                                   num_gnn=2, linear_dropout=0.0),
                 train=TrainConfig(batch_size=16, test_batch_size=16,
                                   lr=5e-3, decay_rate=0.995,
                                   checkpoint_dir=str(tmp_path)))
    tr = Trainer(cfg, train_data=ds, valid_data=ds, test_data=ds,
                 num_entity=2000, num_kb_relation=NUM_REL,
                 rel_hidden=rel[0], rel_hidden_inv=rel[1], rel_text_mask=rel[2])
    h1_first = None
    for epoch in range(40):
        loss, h1, _ = tr.train_epoch()
        if h1_first is None:
            h1_first = np.mean(h1)
    h1_final = np.mean(h1)
    # 2-hop composition learned: hit@1 well above the distractor baseline
    assert h1_final > 0.8, (h1_first, h1_final)
