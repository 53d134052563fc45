

def test_keep_parallel_relations():
    """Opt-in multi-relation edges: 'r1 | r2' in insertion order; default
    keeps the reference's last-write collapse; bfs_with_rule matches a rule
    relation inside a combined edge."""
    from gnn_rag_tpu.rag.graph_utils import (bfs_with_rule, build_graph,
                                             get_truth_paths,
                                             get_truth_paths_fast)

    triples = [["a", "r1", "b"], ["a", "r2", "b"], ["a", "r1", "b"],
               ["b", "r3", "c"]]
    g_def = build_graph(triples)
    assert g_def.relation("a", "b") == "r1"          # last write wins
    g_kp = build_graph(triples, keep_parallel=True)
    assert g_kp.relation("a", "b") == "r1 | r2"      # deduped, in order

    paths = get_truth_paths(["a"], ["c"], g_kp)
    assert paths == [[("a", "r1 | r2", "b"), ("b", "r3", "c")]]
    # fast path routes around the native collapse backend
    fast = get_truth_paths_fast(triples, ["a"], ["c"], keep_parallel=True)
    assert fast == paths

    # rule matching sees both member relations
    assert bfs_with_rule(g_kp, "a", ["r1", "r3"])
    assert bfs_with_rule(g_kp, "a", ["r2", "r3"])
    assert not bfs_with_rule(g_kp, "a", ["r9", "r3"])
