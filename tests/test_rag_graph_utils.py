"""graph_utils vs a networkx oracle on random graphs."""

import numpy as np
import networkx as nx
import pytest

from gnn_rag_tpu.rag import graph_utils, text_utils


def random_triples(rng, n_nodes=30, n_edges=60, n_rels=5):
    return [(f"e{rng.integers(n_nodes)}", f"r{rng.integers(n_rels)}",
             f"e{rng.integers(n_nodes)}") for _ in range(n_edges)]


def nx_graph(triples):
    g = nx.Graph()
    for h, r, t in triples:
        g.add_edge(h, t, relation=r.strip())
    return g


def nx_truth_paths(q_entity, a_entity, graph):
    paths = []
    for h in q_entity:
        if h not in graph:
            continue
        for t in a_entity:
            if t not in graph:
                continue
            try:
                for p in nx.all_shortest_paths(graph, h, t):
                    paths.append(p)
            except Exception:
                pass
    out = []
    for p in paths:
        out.append([(p[i], graph[p[i]][p[i + 1]]["relation"], p[i + 1])
                    for i in range(len(p) - 1)])
    return out


@pytest.mark.parametrize("seed", range(5))
def test_truth_paths_match_networkx(seed):
    rng = np.random.default_rng(seed)
    triples = random_triples(rng)
    ours = graph_utils.build_graph(triples)
    theirs = nx_graph(triples)
    q = [f"e{rng.integers(30)}" for _ in range(2)]
    a = [f"e{rng.integers(30)}" for _ in range(3)]
    got = {text_utils.path_to_string(p)
           for p in graph_utils.get_truth_paths(q, a, ours)}
    exp = {text_utils.path_to_string(p) for p in nx_truth_paths(q, a, theirs)}
    assert got == exp


def test_parallel_edge_last_relation_wins():
    triples = [("a", "r1", "b"), ("a", "r2", "b"), ("b", "r3", "a")]
    g = graph_utils.build_graph(triples)
    assert g.relation("a", "b") == "r3"  # nx.Graph overwrite semantics


@pytest.mark.parametrize("seed", range(3))
def test_bfs_with_rule_matches_reference_semantics(seed):
    rng = np.random.default_rng(100 + seed)
    triples = random_triples(rng, n_nodes=15, n_edges=40, n_rels=3)
    g = graph_utils.build_graph(triples)
    nxg = nx_graph(triples)
    start = triples[0][0]
    rule = ["r0", "r1"]
    got = graph_utils.bfs_with_rule(g, start, rule)
    # oracle: enumerate all 2-edge walks whose relations match the rule
    exp = []
    if start in nxg:
        for n1 in nxg.neighbors(start):
            if nxg[start][n1]["relation"] != rule[0]:
                continue
            for n2 in nxg.neighbors(n1):
                if nxg[n1][n2]["relation"] != rule[1]:
                    continue
                exp.append([(start, rule[0], n1), (n1, rule[1], n2)])
    key = lambda paths: sorted(map(str, paths))
    assert key(got) == key(exp)


def test_zero_length_path_for_answer_equal_seed():
    g = graph_utils.build_graph([("a", "r", "b")])
    paths = graph_utils.get_truth_paths(["a"], ["a"], g)
    assert paths == [[]]  # nx all_shortest_paths(a, a) -> [a] -> no triples


def test_path_to_string_format():
    p = [("a", "r1", "b"), ("b", "r2", "c")]
    assert text_utils.path_to_string(p) == "a -> r1 -> b -> r2 -> c"
    assert text_utils.rule_to_string(["r1", "r2"]) == "<PATH>r1<SEP>r2</PATH>"
    assert text_utils.rule_to_string(["r1"]) == "<PATH>r1</PATH>"


def test_simple_paths_match_networkx():
    rng = np.random.default_rng(11)
    triples = random_triples(rng, n_nodes=12, n_edges=25, n_rels=3)
    ours = graph_utils.build_graph(triples)
    theirs = nx_graph(triples)
    nodes = list(theirs.nodes())
    q, a = [nodes[0]], [nodes[-1]]
    got = {text_utils.path_to_string(p)
           for p in graph_utils.get_simple_paths(q, a, ours, hop=2)}
    exp = set()
    for h in q:
        for t in a:
            for p in nx.all_simple_edge_paths(theirs, h, t, cutoff=2):
                exp.add(text_utils.path_to_string(
                    [(e[0], theirs[e[0]][e[1]]["relation"], e[1]) for e in p]))
    assert got == exp


def test_random_and_negative_paths_are_valid_walks():
    import random
    triples = [("a", "r1", "b"), ("b", "r2", "c"), ("c", "r3", "d"),
               ("a", "r4", "e")]
    g = graph_utils.build_graph(triples)
    paths, rules = graph_utils.get_random_paths(
        ["a"], g, n=4, hop=2, rng=random.Random(0))
    assert len(paths) == 4 and len(rules) == 4
    for p, rule in zip(paths, rules):
        assert [r for _, r, _ in p] == rule
        for h, r, t in p:
            assert g.relation(h, t) == r
    neg = graph_utils.get_negative_paths(["a"], ["d"], g, n_neg=4, hop=2,
                                         rng=random.Random(0))
    for p in neg:
        if p:
            assert p[-1][-1] != "d"  # never ends at an answer
