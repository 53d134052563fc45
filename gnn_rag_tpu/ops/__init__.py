from .segment import (
    gather_entities_to_facts,
    scatter_facts_to_entities,
    batched_segment_sum,
)
from .softmax import masked_softmax, VERY_NEG_NUMBER
from .degree import head_degree_weight

__all__ = [
    "gather_entities_to_facts",
    "scatter_facts_to_entities",
    "batched_segment_sum",
    "masked_softmax",
    "head_degree_weight",
    "VERY_NEG_NUMBER",
]
