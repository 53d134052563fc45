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


@pytest.mark.parametrize("seed", range(4))
def test_native_keep_parallel_matches_python(seed):
    """Composite-rel ids reproduce the oracle's multi-relation
    verbalization ("r1 | r2", first-seen order, deduped), in the same
    path enumeration order."""
    rng = np.random.default_rng(seed)
    # few relations over a small node set -> frequent parallel edges,
    # plus whitespace variants that must merge under strip semantics
    triples = [(f"e{rng.integers(12)}",
                f"r{rng.integers(3)}" + (" " if rng.integers(2) else ""),
                f"e{rng.integers(12)}") for _ in range(60)]
    q = [f"e{rng.integers(12)}", "NOT_IN_GRAPH"]
    a = [f"e{rng.integers(12)}" for _ in range(4)] + ["missing"]
    for kp in (False, True):
        native_paths = native.truth_paths_native(triples, q, a,
                                                 keep_parallel=kp)
        g = graph_utils.build_graph(triples, keep_parallel=kp)
        py_paths = graph_utils.get_truth_paths(q, a, g)
        assert ([text_utils.path_to_string(p) for p in native_paths]
                == [text_utils.path_to_string(p) for p in py_paths])
    assert any(" | " in text_utils.path_to_string(p)
               for p in native.truth_paths_native(triples, q, list(g.nodes()),
                                                  keep_parallel=True))


def test_native_intern_embedded_nul_falls_back():
    """Embedded NULs would shift gp_intern's item boundaries; the wrapper
    must detect this (C++ returns -2) and fall back to dict interning."""
    triples = [("a\0b", "r", "c"), ("c", "r2", "d")]
    out = native.truth_paths_native(triples, ["a\0b"], ["d"])
    g = graph_utils.build_graph(triples)
    py = graph_utils.get_truth_paths(["a\0b"], ["d"], g)
    assert ([text_utils.path_to_string(p) for p in out]
            == [text_utils.path_to_string(p) for p in py])


def test_native_unicode_whitespace_rel_variants_fall_back():
    """'r ' and 'r\\xa0' python-strip to the same relation; ASCII-only
    C++ stripping would keep them distinct, so the wrapper must detect the
    post-strip collision and fall back to oracle semantics."""
    triples = [("a", "r ", "b"), ("a", "r\xa0", "b"), ("b", "s", "c")]
    for kp in (False, True):
        got = native.truth_paths_native(triples, ["a"], ["b", "c"],
                                        keep_parallel=kp)
        g = graph_utils.build_graph(triples, keep_parallel=kp)
        want = graph_utils.get_truth_paths(["a"], ["b", "c"], g)
        assert ([text_utils.path_to_string(p) for p in got]
                == [text_utils.path_to_string(p) for p in want]), kp
    # keep_parallel must NOT verbalize the merged variants as 'r | r'
    got_kp = native.truth_paths_native(triples, ["a"], ["b"],
                                       keep_parallel=True)
    assert all("r | r" not in text_utils.path_to_string(p) for p in got_kp)


def test_native_intern_edge_strings():
    """Empty strings, whitespace-only relations, very long names, and heavy
    duplication all keep parity with the oracle."""
    long_name = "x" * 5000
    triples = [("", "r", "b"), ("b", "  ", ""), ("b", "r", long_name),
               (long_name, "r", "b")] * 3 + [("", "r", "b")] * 5
    for kp in (False, True):
        got = native.truth_paths_native(triples, ["", long_name],
                                        ["b", "", "zzz"], keep_parallel=kp)
        g = graph_utils.build_graph(triples, keep_parallel=kp)
        want = graph_utils.get_truth_paths(["", long_name], ["b", "", "zzz"],
                                           g)
        assert ([text_utils.path_to_string(p) for p in got]
                == [text_utils.path_to_string(p) for p in want]), kp
