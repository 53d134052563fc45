from .metrics import f1_and_hits_eval, f1_and_hits_train, extract_candidates
from .evaluate import Evaluator
from .trainer import Trainer

__all__ = ["Evaluator", "Trainer", "f1_and_hits_eval", "f1_and_hits_train",
           "extract_candidates"]
