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
        # per-question DEDUPED directed edge id-arrays (vectorised via
        # np.unique over the raw triple columns — no per-edge Python loop;
        # the old fill iterated B x F times in the interpreter and
        # dominated extract() wall time)
        edge_arrays: List[tuple] = []
        for q in questions:
            g = build_graph(q["graph"])          # kept for relation lookup
            graphs.append(g)
            tr = np.asarray([(h, t) for h, _, t in q["graph"]], dtype=object)
            if len(tr) == 0:
                node_maps.append({})
                edge_arrays.append((np.zeros(0, np.int32),) * 2)
                continue
            names, flat = np.unique(tr, return_inverse=True)
            nm = {n: i for i, n in enumerate(names)}
            node_maps.append(nm)
            hh, tt = flat.reshape(-1, 2).T.astype(np.int32)
            # collapse parallel/duplicate pairs like UndirectedGraph.adj
            uniq = np.unique(np.stack([np.minimum(hh, tt),
                                       np.maximum(hh, tt)], 1), axis=0)
            keep = uniq[:, 0] != uniq[:, 1]      # drop self-loops: adj[u][u]
            uniq = uniq[keep] if (~keep).any() else uniq
            edge_arrays.append((uniq[:, 0], uniq[:, 1]))

        E = bucketize(max((len(m) for m in node_maps), default=1), ())
        n_edges = [2 * len(h) for h, _ in edge_arrays]
        F = bucketize(max(n_edges + [1]), ())
        heads = np.zeros((B, F), np.int32)
        tails = np.zeros((B, F), np.int32)
        mask = np.zeros((B, F), np.float32)
        S = self.max_sources
        src_onehot = np.zeros((B, S, E), np.float32)
        src_names: List[List[str]] = []
        for b, (q, nm) in enumerate(zip(questions, node_maps)):
            hh, tt = edge_arrays[b]
            k = 2 * len(hh)
            heads[b, :k] = np.concatenate([hh, tt])
            tails[b, :k] = np.concatenate([tt, hh])
            mask[b, :k] = 1.0
            names = [h for h in q["q_entity"] if h in nm][:S]
            src_names.append(names)
            for s, h in enumerate(names):
                src_onehot[b, s, nm[h]] = 1.0

        dist = np.asarray(bfs_levels(heads, tails, mask, src_onehot,
                                     num_entities=E, max_hops=self.max_hops))

        out: List[List[List[Triple]]] = []
        unreached = int(UNREACHED)
        for b, (q, g, nm) in enumerate(zip(questions, graphs, node_maps)):
            id_node = list(nm)                 # np.unique order == id order
            hh, tt = edge_arrays[b]
            sym_h = np.concatenate([hh, tt])
            sym_t = np.concatenate([tt, hh])
            paths: List[List[Triple]] = []
            for s, h in enumerate(src_names[b]):
                d = dist[b, s, :len(nm)].astype(np.int64)
                hid = nm[h]
                # vectorised predecessor DAG: u precedes v iff (u, v) is an
                # edge and dist[u] + 1 == dist[v]; CSR-group by successor so
                # the DFS below touches integer arrays only (the old walk
                # re-read dist through string dicts per neighbor visit)
                keep = d[sym_h] + 1 == d[sym_t]
                ph, pt = sym_h[keep], sym_t[keep]
                order = np.argsort(pt, kind="stable")
                ph, pt = ph[order], pt[order]
                ptr = np.searchsorted(pt, np.arange(len(nm) + 1))
                for t in q["cand"]:
                    tid = nm.get(t)
                    if tid is None or int(d[tid]) >= unreached:
                        continue
                    stack = [(tid, [tid])]
                    while stack:
                        node, path = stack.pop()
                        if node == hid:
                            seq = path[::-1]
                            sn = [id_node[i] for i in seq]
                            paths.append(
                                [(sn[i], g.relation(sn[i], sn[i + 1]),
                                  sn[i + 1]) for i in range(len(sn) - 1)])
                            continue
                        for u in ph[ptr[node]:ptr[node + 1]]:
                            stack.append((int(u), path + [int(u)]))
            out.append(paths)
        return out
