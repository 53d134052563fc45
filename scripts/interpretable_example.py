#!/usr/bin/env python
"""Demo: reasoning-path prompts through any backend (reference:
llm/scripts/interpretable_example.py). Uses the mock reader by default so it
runs offline; pass --model_name rog --model_path <local ckpt> for the real
thing."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnn_rag_tpu.rag.llms import get_registed_model
from gnn_rag_tpu.rag.text_utils import read_prompt

EXAMPLES = [
    {
        "paths": [
            "Jamaica -> location.country.languages_spoken -> Jamaican English",
            "Jamaica -> location.country.languages_spoken -> Jamaican Creole "
            "English Language",
        ],
        "question": "what does jamaican people speak?",
    },
    {
        "paths": [
            "Northern District -> location.administrative_division."
            "first_level_division_of -> Israel -> government."
            "form_of_government.countries -> Parliamentary system",
        ],
        "question": "What type of government is used in the country with "
                    "Northern District?",
    },
]

INSTRUCTION = ("Based on the reasoning paths, please answer the given "
               "question. Please keep the answer as simple as possible and "
               "return all the possible answers as a list.")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", default="mock")
    parser.add_argument("--prompt_path", default="prompts/llama2_predict.txt")
    LLM = get_registed_model(parser.parse_known_args()[0].model_name)
    LLM.add_args(parser)
    args = parser.parse_args()
    model = LLM(args)
    model.prepare_for_inference()
    template = read_prompt(args.prompt_path)
    for ex in EXAMPLES:
        inner = (f"Reasoning Paths:\n{chr(10).join(ex['paths'])}\n\n"
                 f"Question:\n{ex['question']}")
        prompt = template.format(instruction=INSTRUCTION, input=inner)
        print("=" * 60)
        print(prompt)
        print("->", model.generate_sentence(prompt))


if __name__ == "__main__":
    main()
