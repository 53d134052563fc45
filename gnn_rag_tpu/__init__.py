"""gnn_rag_tpu — a TPU-native (JAX/XLA/Pallas/pjit) GNN-RAG framework.

A from-scratch re-design of the capabilities of cmavro/GNN-RAG (reference at
/root/reference) for TPU hardware:

* question-specific KG subgraphs are ingested once into padded COO device
  arrays (``data.GraphBatch``) instead of per-step host-rebuilt sparse
  matrices (reference: gnn/dataset_load.py:473-527 + base_gnn.py:19-51);
* ReaRev / NSM / GraftNet message passing runs as batched gather-gate-scatter
  over those arrays (``ops.segment``), with a fused Pallas kernel for the hot
  op (``ops.pallas_mp``);
* training / evaluation JIT under XLA (``train``), scale-out is mesh data
  parallelism via jax.sharding (``parallel``);
* the LLM RAG half (path extraction, prompt building, answer scoring) lives
  in ``rag`` with a C++ shortest-path enumerator in ``native``.
"""

__version__ = "0.1.0"

VERY_NEG_NUMBER = -1e11  # masking constant (reference: reasongnn.py:9)
VERY_SMALL_NUMBER = 1e-10
