"""Native C++ shortest-path enumerator vs the Python oracle."""

import numpy as np
import pytest

from gnn_rag_tpu import native
from gnn_rag_tpu.rag import graph_utils, text_utils


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libgraphpath.so not built")


def random_triples(rng, n_nodes=40, n_edges=120, n_rels=6):
    return [(f"e{rng.integers(n_nodes)}", f"r{rng.integers(n_rels)}",
             f"e{rng.integers(n_nodes)}") for _ in range(n_edges)]


@pytest.mark.parametrize("seed", range(6))
def test_native_matches_python(seed):
    rng = np.random.default_rng(seed)
    triples = random_triples(rng)
    q = [f"e{rng.integers(40)}" for _ in range(2)]
    a = [f"e{rng.integers(40)}" for _ in range(4)]
    native_paths = native.truth_paths_native(triples, q, a)
    g = graph_utils.build_graph(triples)
    py_paths = graph_utils.get_truth_paths(q, a, g)
    key = lambda ps: sorted(text_utils.path_to_string(p) for p in ps)
    assert key(native_paths) == key(py_paths)


def test_native_self_pair_and_unreachable():
    triples = [("a", "r", "b"), ("c", "r", "d")]
    out = native.truth_paths_native(triples, ["a"], ["a", "d", "zzz"])
    # a->a zero-length path; a->d unreachable; zzz not in graph
    assert out == [[]]


def test_native_bfs_dist():
    triples = [("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d")]
    node_id = {}
    h, r, t = [], [], []
    for x, rel, y in triples:
        for n in (x, y):
            node_id.setdefault(n, len(node_id))
        h.append(node_id[x]); r.append(0); t.append(node_id[y])
    g = native.NativeGraph(np.asarray(h), np.asarray(r), np.asarray(t),
                           len(node_id))
    dist = g.bfs_dist([node_id["a"]])
    assert dist[node_id["a"]] == 0
    assert dist[node_id["d"]] == 3


def test_native_random_walks():
    triples = [("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d")]
    node_id = {}
    h, r, t = [], [], []
    for x, rel, y in triples:
        for n in (x, y):
            node_id.setdefault(n, len(node_id))
        h.append(node_id[x]); r.append(0); t.append(node_id[y])
    g = native.NativeGraph(np.asarray(h), np.asarray(r), np.asarray(t),
                           len(node_id))
    walks = g.random_walks([node_id["a"]], n_walks=8, walk_len=3, seed=42)
    assert walks.shape == (8, 4)
    assert (walks[:, 0] == node_id["a"]).all()
    # every consecutive pair is an edge
    adj = {(node_id[x], node_id[y]) for x, _, y in triples}
    adj |= {(b, a) for a, b in adj}
    for w in walks:
        for i in range(3):
            if w[i + 1] < 0:
                break
            assert (int(w[i]), int(w[i + 1])) in adj
    # deterministic under the same seed
    walks2 = g.random_walks([node_id["a"]], n_walks=8, walk_len=3, seed=42)
    np.testing.assert_array_equal(walks, walks2)
