"""Batched TPU shortest-path extraction for the RAG stage.

Third backend for get_truth_paths next to the Python oracle
(rag.graph_utils) and the C++ enumerator (native.graphpath): whole BATCHES of
questions get their BFS levels computed on device in one jitted call
(ops.bfs.bfs_levels); the host then walks each question's predecessor DAG —
u precedes v iff dist[u] == dist[v] - 1 — to enumerate the actual paths,
which is output-bound.

Semantics match graph_utils.get_truth_paths: undirected, parallel edges
collapse to the last relation, src == dst yields a zero-length path,
unreachable pairs are skipped. The BFS runs UNBOUNDED by default (to the
graph's diameter, like nx.all_shortest_paths); pass max_hops to cap it.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..data.batch import bucketize
from ..ops.bfs import UNREACHED, bfs_levels
from .graph_utils import Triple, build_graph


class BatchedPathExtractor:
    def __init__(self, max_hops: int | None = None, max_sources: int = 4):
        self.max_hops = max_hops
        self.max_sources = max_sources

    def extract(self, questions: Sequence[dict]
                ) -> List[List[List[Triple]]]:
        """questions: dicts with 'graph' (string triples), 'q_entity',
        'cand'. Returns per-question lists of relation-annotated paths."""
        B = len(questions)
        graphs = []
        node_maps: List[Dict[str, int]] = []
        for q in questions:
            g = build_graph(q["graph"])
            graphs.append(g)
            node_maps.append({n: i for i, n in enumerate(g.nodes())})

        E = bucketize(max((len(m) for m in node_maps), default=1), ())
        # symmetrised edge lists
        n_edges = [sum(len(g.adj[u]) for u in g.adj) for g in graphs]
        F = bucketize(max(n_edges + [1]), ())
        heads = np.zeros((B, F), np.int32)
        tails = np.zeros((B, F), np.int32)
        mask = np.zeros((B, F), np.float32)
        S = self.max_sources
        src_onehot = np.zeros((B, S, E), np.float32)
        src_names: List[List[str]] = []
        for b, (q, g, nm) in enumerate(zip(questions, graphs, node_maps)):
            k = 0
            for u in g.adj:
                for v in g.adj[u]:
                    heads[b, k] = nm[u]
                    tails[b, k] = nm[v]
                    mask[b, k] = 1.0
                    k += 1
            names = [h for h in q["q_entity"] if h in nm][:S]
            src_names.append(names)
            for s, h in enumerate(names):
                src_onehot[b, s, nm[h]] = 1.0

        dist = np.asarray(bfs_levels(heads, tails, mask, src_onehot,
                                     num_entities=E, max_hops=self.max_hops))

        out: List[List[List[Triple]]] = []
        unreached = int(UNREACHED)
        for b, (q, g, nm) in enumerate(zip(questions, graphs, node_maps)):
            id_node = {i: n for n, i in nm.items()}
            paths: List[List[Triple]] = []
            for s, h in enumerate(src_names[b]):
                d = dist[b, s]
                for t in q["cand"]:
                    if t not in nm:
                        continue
                    dt = int(d[nm[t]])
                    if dt >= unreached:
                        continue
                    # backward DFS over the implicit predecessor DAG
                    stack = [(t, [t])]
                    while stack:
                        node, path = stack.pop()
                        if node == h:
                            seq = path[::-1]
                            paths.append(
                                [(seq[i], g.relation(seq[i], seq[i + 1]),
                                  seq[i + 1]) for i in range(len(seq) - 1)])
                            continue
                        dn = int(d[nm[node]])
                        for u in g.neighbors(node):
                            if int(d[nm[u]]) == dn - 1:
                                stack.append((u, path + [u]))
            out.append(paths)
        return out
