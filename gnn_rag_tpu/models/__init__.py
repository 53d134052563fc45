from .rearev import ReaRev
from .encoders import (
    AttnEncoder,
    Fusion,
    QueryReform,
    TypeLayer,
    InstructionDecoder,
    LSTMQuestionEncoder,
    TransformerQuestionEncoder,
)

__all__ = [
    "ReaRev",
    "AttnEncoder",
    "Fusion",
    "QueryReform",
    "TypeLayer",
    "InstructionDecoder",
    "LSTMQuestionEncoder",
    "TransformerQuestionEncoder",
]
