"""On-device batched BFS path extraction vs the Python oracle."""

import numpy as np
import pytest

from gnn_rag_tpu.ops.bfs import UNREACHED, bfs_levels
from gnn_rag_tpu.rag import graph_utils, text_utils
from gnn_rag_tpu.rag.path_extract import BatchedPathExtractor


def test_bfs_levels_chain():
    # chain 0-1-2-3 in sample 0; star in sample 1
    heads = np.array([[0, 1, 1, 2, 2, 3], [0, 1, 0, 2, 0, 3]], np.int32)
    tails = np.array([[1, 0, 2, 1, 3, 2], [1, 0, 2, 0, 3, 0]], np.int32)
    mask = np.ones((2, 6), np.float32)
    src = np.zeros((2, 1, 4), np.float32)
    src[0, 0, 0] = 1
    src[1, 0, 1] = 1
    dist = np.asarray(bfs_levels(heads, tails, mask, src, num_entities=4,
                                 max_hops=4))
    assert dist[0, 0].tolist() == [0, 1, 2, 3]
    assert dist[1, 0].tolist() == [1, 0, 2, 2]


def random_questions(rng, n_q=6):
    qs = []
    for _ in range(n_q):
        n_nodes = int(rng.integers(8, 30))
        n_edges = int(rng.integers(n_nodes, 3 * n_nodes))
        triples = [(f"e{rng.integers(n_nodes)}", f"r{rng.integers(5)}",
                    f"e{rng.integers(n_nodes)}") for _ in range(n_edges)]
        nodes = sorted({x for h, _, t in triples for x in (h, t)})
        q_entity = [str(rng.choice(nodes)) for _ in range(2)]
        cand = [str(rng.choice(nodes)) for _ in range(3)]
        qs.append({"graph": triples, "q_entity": q_entity, "cand": cand})
    return qs


@pytest.mark.parametrize("seed", range(3))
def test_batched_extractor_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    questions = random_questions(rng)
    extractor = BatchedPathExtractor(max_hops=6)
    got = extractor.extract(questions)
    for q, paths in zip(questions, got):
        g = graph_utils.build_graph(q["graph"])
        # oracle restricted to unique sources in-graph (extractor caps at
        # max_sources but uses unique names order)
        exp = graph_utils.get_truth_paths(
            [h for h in q["q_entity"] if h in g], q["cand"], g)
        key = lambda ps: sorted(text_utils.path_to_string(p) for p in ps)
        assert key(paths) == key(exp)


def test_unbounded_bfs_reaches_deep_paths():
    """A 10-hop chain is found without any max_hops cap (reference
    nx.all_shortest_paths is unbounded, graph_utils.py:49-75)."""
    from gnn_rag_tpu.rag.path_extract import BatchedPathExtractor

    chain = [[f"n{i}", f"r{i}", f"n{i+1}"] for i in range(10)]
    q = {"graph": chain, "q_entity": ["n0"], "cand": ["n10"]}
    paths = BatchedPathExtractor().extract([q])[0]
    assert len(paths) == 1
    assert len(paths[0]) == 10
    assert paths[0][0][0] == "n0" and paths[0][-1][2] == "n10"

    # a cap still caps
    assert BatchedPathExtractor(max_hops=4).extract([q])[0] == []


def test_extractor_self_loops_and_zero_length():
    """Self-loop edges are inert; src == cand yields the zero-length path;
    parallel edges collapse to the oracle's relation choice."""
    triples = [["a", "r.self", "a"], ["a", "r1", "b"], ["a", "r2", "b"],
               ["b", "r3", "c"]]
    q = {"graph": triples, "q_entity": ["a"], "cand": ["a", "b", "c"]}
    paths = BatchedPathExtractor().extract([q])[0]
    g = graph_utils.build_graph(q["graph"])
    exp = graph_utils.get_truth_paths(["a"], ["a", "b", "c"], g)
    key = lambda ps: sorted(text_utils.path_to_string(p) for p in ps)
    assert key(paths) == key(exp)
    assert [] in paths                  # zero-length a -> a
    # collapsed relation matches UndirectedGraph (last write wins)
    ab = [p for p in paths if len(p) == 1 and p[0][2] == "b"]
    assert ab and ab[0][0][1] == g.relation("a", "b")
