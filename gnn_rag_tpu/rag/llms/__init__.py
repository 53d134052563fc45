"""LLM backend registry (reference: llm/src/llms/language_models/__init__.py:8-22).

Name matching is substring-based on the lowercased model name, so
'RoG'/'rog-...' resolve to the Llama backend like the reference. A 'mock'
backend is added for offline tests and dry runs.
"""

from .base import BaseLanguageModel
from .hf_causal import Alpaca, Llama, Longchat
from .flan_t5 import FlanT5
from .llama_tpu import LlamaTPU
from .openai_chat import ChatGPT
from .mock import MockLLM

registed_language_models = {
    "gpt-4": ChatGPT,
    "gpt-3.5-turbo": ChatGPT,
    "alpaca": Alpaca,
    "longchat": Longchat,
    "tpu": LlamaTPU,       # on-chip LlamaLM reader (llm_tpu checkpoint)
    "llama": Llama,
    "flan-t5": FlanT5,
    "rog": Llama,
    "mock": MockLLM,
}


def get_registed_model(model_name: str):
    for key, value in registed_language_models.items():
        if key in model_name.lower():
            return value
    raise ValueError(f"No registered model found for name {model_name}")
