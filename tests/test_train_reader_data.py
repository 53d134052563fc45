"""train_reader.py data construction: seeded shuffles and the weighted
prompt-LM loss mask (the r4 fix for the copy-circuit phase transition —
see --prompt_loss_weight's help text and BUILD_NOTES round 4)."""

import importlib.util
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_cli_e2e import write_micro_dataset  # noqa: E402

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _load_train_reader():
    spec = importlib.util.spec_from_file_location(
        "train_reader", os.path.join(_ROOT, "scripts", "train_reader.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _ChunkCount:
    def encode(self, t, add_bos=True):
        return re.findall(r"\S+|\s+", t)


def test_build_texts_deterministic_with_shuffle_seed(tmp_path, monkeypatch):
    tr = _load_train_reader()
    data = tmp_path / "d"
    data.mkdir()
    write_micro_dataset(data)
    # SynthQSP-style: answer text IS the mid (the micro CLI dataset uses
    # display names, which never appear in path strings)
    import json
    lines = []
    for line in (data / "train.json").read_text().splitlines():
        q = json.loads(line)
        for a in q["answers"]:
            a["text"] = a["kb_id"]
        lines.append(json.dumps(q))
    (data / "train.json").write_text("\n".join(lines) + "\n")
    monkeypatch.chdir(_ROOT)  # prompts/ template path
    kw = dict(rng=np.random.default_rng(0), shuffle_seed=7)
    a = tr.build_texts(str(data), "train", 400, _ChunkCount(), **kw)
    b = tr.build_texts(str(data), "train", 400, _ChunkCount(),
                       rng=np.random.default_rng(0), shuffle_seed=7)
    assert a == b and len(a) > 0
    # every text carries at least one grounded answer inside the prompt
    for t in a:
        prompt, _, completion = t.rpartition("[/INST]")
        assert prompt, t
        first = completion.strip().split("\n")[0].rstrip("</s>").strip()
        assert first in prompt


def test_prompt_loss_weight_mask():
    from gnn_rag_tpu.llm_tpu.sft import pack_examples

    texts = ["aa bb cc [/INST] dd</s>", "bb [/INST] cc dd</s>"]
    vocab = {"aa": 5, "bb": 6, "cc": 7, "dd": 8, "[/INST]": 9,
             " ": 10, "</s>": 2}

    def tok(text):
        ids = [1]
        for ch in re.findall(r"\S+|\s+", text.replace("</s>", "")):
            ids.append(vocab[ch])
        if text.endswith("</s>"):
            ids.append(2)
        return ids

    tokens, mask = pack_examples(texts, tok, [vocab["[/INST]"]], 16, 0)
    w = 0.25
    prompt_pos = (tokens != 0) & (mask == 0)
    wmask = (mask + w * prompt_pos).astype(np.float32)
    # completion tokens keep weight 1, prompt tokens get w, padding 0
    assert set(np.unique(wmask).tolist()) <= {0.0, w, 1.0}
    assert (wmask[mask == 1] == 1.0).all()
    assert (wmask[(tokens != 0) & (mask == 0)] == w).all()
    assert (wmask[tokens == 0] == 0.0).all()
    # the completion ("dd", eos) is weighted 1.0 in row 0
    assert wmask[0].sum() > mask[0].sum()
