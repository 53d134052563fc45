"""Prompt parity: our instruction strings and templates must match the
reference's byte-for-byte (they are part of the model-facing contract —
finetuned readers like RoG were trained on these exact strings)."""

import os

import pytest

from conftest import REFERENCE_DIR
from gnn_rag_tpu.finetune.data_prep import PLANNING_INSTRUCTION
from gnn_rag_tpu.rag.prompt_builder import PromptBuilder

REF_BUILDER = os.path.join(REFERENCE_DIR,
                           "llm/src/qa_prediction/build_qa_input.py")
REF_FINETUNE = os.path.join(REFERENCE_DIR,
                            "llm/src/joint_training/joint_finetuning.py")


def _source(path):
    if not os.path.exists(path):
        pytest.skip("reference source unavailable")
    with open(path) as f:
        return f.read()


def test_instruction_strings_match_reference():
    src = _source(REF_BUILDER)
    for const in (PromptBuilder.MCQ_INSTRUCTION, PromptBuilder.SAQ_INSTRUCTION,
                  PromptBuilder.MCQ_RULE_INSTRUCTION,
                  PromptBuilder.SAQ_RULE_INSTRUCTION,
                  PromptBuilder.COT, PromptBuilder.EXPLAIN,
                  PromptBuilder.EACH_LINE):
        assert const in src, const


def test_scaffold_strings_match_reference():
    src = _source(REF_BUILDER)
    assert PromptBuilder.QUESTION.replace("\n", "\\n") in src
    assert PromptBuilder.GRAPH_CONTEXT.replace("\n", "\\n") in src
    assert PromptBuilder.CHOICES.replace("\n", "\\n") in src


def test_planning_instruction_matches_reference():
    src = _source(REF_FINETUNE)
    assert PLANNING_INSTRUCTION in src


def test_llama2_template_matches_reference():
    ref = os.path.join(REFERENCE_DIR, "llm/prompts/llama2_predict.txt")
    if not os.path.exists(ref):
        pytest.skip("reference prompts unavailable")
    with open(ref) as f:
        expected = f.read()
    with open("prompts/llama2_predict.txt") as f:
        ours = f.read()
    assert ours == expected