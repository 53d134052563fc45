#!/usr/bin/env python
"""GNN-half CLI entry point (mirrors `python gnn/main.py <Model> --flags` of
the reference, gnn/main.py:12-47)."""

from gnn_rag_tpu.cli import run

if __name__ == "__main__":
    run()
