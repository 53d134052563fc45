"""Tile-sorted fact layout for the Pallas scatter kernel.

The hot op of every GNN model here is scatter-add of per-fact values into
entity slots (the reference's ``sparse.mm(fact2tail_mat, fact_val)``,
reasongnn.py:84). XLA lowers that to a serialized scatter on TPU. Instead we
pre-sort each sample's facts by *target-entity tile* (tile = TILE_E
consecutive local entity slots) and pad each tile's facts to TILE_F-chunks.
The scatter then becomes, per chunk, a [TILE_F, TILE_E] one-hot matrix
product with the chunk's [TILE_F, C] values on the MXU, accumulated in VMEM
while consecutive chunks map to the same entity tile (ops.pallas_mp).

Two layouts are built, one per message direction:
* ``fwd``  — sorted by tail tile (scatter into tails; gather prior at heads);
* ``inv``  — sorted by head tile (scatter into heads; gather prior at tails).

Padded chunk slots carry ``scatter == -1`` (never matches an entity row) and
``gather == 0`` / ``rel == pad_rel`` (any valid index; their one-hot row is
all-zero so the value is ignored).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

TILE_E = 128   # entity rows per output tile (TPU lane width)
# facts per chunk: larger chunks amortise per-iteration kernel overhead at
# the cost of more per-tile padding (each entity tile rounds up to one
# chunk). Must be a multiple of 128 (MXU contraction tile). Env-tunable so
# the sweep in scripts/kernel_tune.py can measure per-shape winners.
TILE_F = int(os.environ.get("GNN_RAG_TILE_F", "128"))
assert TILE_F % 128 == 0, TILE_F


class DirectionLayout(NamedTuple):
    scatter: np.ndarray      # int32 [B, Fp]  target local entity (-1 = pad)
    gather: np.ndarray       # int32 [B, Fp]  source local entity (0 on pads)
    rels: np.ndarray         # int32 [B, Fp]  relation id (pad_rel on pads)
    chunk_tiles: np.ndarray  # int32 [B, NC]  entity-tile index per chunk
    chunk_starts: np.ndarray # int32 [B, n_tiles+1] chunk range per entity tile
    weight: np.ndarray       # float32 [B, Fp] per-fact weight (0 on pads)
    perm: np.ndarray         # int32 [B, Fp]  canonical fact index (-1 = pad);
                             # maps per-fact masks (e.g. fact dropout sampled
                             # in canonical COO order) onto layout slots


class KernelLayout(NamedTuple):
    fwd: DirectionLayout
    inv: DirectionLayout
    num_entities: int        # E (multiple of TILE_E)


def build_sample_direction(sc: np.ndarray, ga: np.ndarray, rl: np.ndarray,
                           wt: np.ndarray, E: int, pad_rel: int,
                           tile_e: int = TILE_E, tile_f: int = TILE_F,
                           idx: np.ndarray | None = None):
    """Tile-sort ONE sample's (scatter, gather, rel, weight) fact arrays.
    ``idx`` (default arange) is the canonical fact index of each input fact.
    Returns (scatter, gather, rels, weight, chunk_tiles, chunk_starts, perm)."""
    n_tiles = E // tile_e
    if idx is None:
        idx = np.arange(len(sc), dtype=np.int32)
    tile = sc // tile_e
    order = np.argsort(tile, kind="stable")
    sc, ga, rl, wt, tile = sc[order], ga[order], rl[order], wt[order], tile[order]
    pm = np.asarray(idx, np.int32)[order]
    counts = np.bincount(tile, minlength=n_tiles)
    chunks_per_tile = np.maximum(1, -(-counts // tile_f))
    nc = int(chunks_per_tile.sum())
    Fp = nc * tile_f
    o_sc = np.full(Fp, -1, np.int32)
    o_ga = np.zeros(Fp, np.int32)
    o_rl = np.full(Fp, pad_rel, np.int32)
    o_wt = np.zeros(Fp, np.float32)
    o_pm = np.full(Fp, -1, np.int32)
    o_ct = np.empty(nc, np.int32)
    o_cs = np.zeros(n_tiles + 1, np.int32)
    src = 0
    chunk = 0
    for t in range(n_tiles):
        cnt = int(counts[t])
        nch = int(chunks_per_tile[t])
        dst = chunk * tile_f
        o_sc[dst:dst + cnt] = sc[src:src + cnt]
        o_ga[dst:dst + cnt] = ga[src:src + cnt]
        o_rl[dst:dst + cnt] = rl[src:src + cnt]
        o_wt[dst:dst + cnt] = wt[src:src + cnt]
        o_pm[dst:dst + cnt] = pm[src:src + cnt]
        o_ct[chunk:chunk + nch] = t
        src += cnt
        chunk += nch
        o_cs[t + 1] = chunk
    return (o_sc, o_ga, o_rl, o_wt, o_ct, o_cs, o_pm)


def _build_direction(scatter_g: np.ndarray, gather_g: np.ndarray,
                     rels_g: np.ndarray, weight_g: np.ndarray,
                     fact_mask: np.ndarray, E: int, pad_rel: int,
                     tile_e: int, tile_f: int):
    """Per-batch host build for one direction (per-sample build over the
    valid facts)."""
    B, F = scatter_g.shape
    out = []
    for b in range(B):
        valid = fact_mask[b] > 0
        out.append(build_sample_direction(
            scatter_g[b][valid], gather_g[b][valid], rels_g[b][valid],
            weight_g[b][valid], E, pad_rel, tile_e, tile_f,
            idx=np.nonzero(valid)[0].astype(np.int32)))
    return out


def build_kernel_layout(heads: np.ndarray, rels: np.ndarray, tails: np.ndarray,
                        fact_mask: np.ndarray, E: int, pad_rel: int,
                        fact_weight: np.ndarray | None = None,
                        tile_e: int = TILE_E, tile_f: int = TILE_F
                        ) -> KernelLayout:
    """Build both direction layouts from padded canonical COO arrays.

    E must be a multiple of tile_e (loader buckets guarantee 128-multiples).
    """
    assert E % tile_e == 0, (E, tile_e)
    B, F = heads.shape
    heads = np.asarray(heads); rels = np.asarray(rels); tails = np.asarray(tails)
    fact_mask = np.asarray(fact_mask)
    weight = (np.asarray(fact_weight, np.float32) if fact_weight is not None
              else fact_mask.astype(np.float32))

    n_tiles = E // tile_e

    def pack(samples, nc):
        Fp = nc * tile_f
        sc = np.full((B, Fp), -1, np.int32)
        ga = np.zeros((B, Fp), np.int32)
        rl = np.full((B, Fp), pad_rel, np.int32)
        wt = np.zeros((B, Fp), np.float32)
        pm = np.full((B, Fp), -1, np.int32)
        # padding chunks repeat the sample's last tile so they never trigger
        # a fresh zero-init of an unrelated tile in the kernel
        ct = np.empty((B, nc), np.int32)
        cs = np.zeros((B, n_tiles + 1), np.int32)
        for b, (s, g, r, w, c, c_starts, p) in enumerate(samples):
            sc[b, :len(s)] = s; ga[b, :len(g)] = g
            rl[b, :len(r)] = r; wt[b, :len(w)] = w
            pm[b, :len(p)] = p
            ct[b, :len(c)] = c
            ct[b, len(c):] = c[-1] if len(c) else 0
            cs[b] = c_starts
        return DirectionLayout(sc, ga, rl, ct, cs, wt, pm)

    fwd_s = _build_direction(tails, heads, rels, weight, fact_mask, E,
                             pad_rel, tile_e, tile_f)
    inv_s = _build_direction(heads, tails, rels, weight, fact_mask, E,
                             pad_rel, tile_e, tile_f)
    # BOTH directions pad to ONE shared chunk count (the fused dual-direction
    # kernel stacks fwd/inv chunk_tiles), rounded to a multiple of 8 so the
    # kernel's k_per_cell grid grouping (ops.pallas_mp._pick_k) divides it
    # (loader batches get the same rounding via nc_bucket)
    nc = max(len(s[4]) for s in list(fwd_s) + list(inv_s))
    nc = -(-nc // 8) * 8
    fwd = pack(fwd_s, nc)
    inv = pack(inv_s, nc)
    return KernelLayout(fwd=fwd, inv=inv, num_entities=E)


def pack_samples(fwd_samples, inv_samples, E: int, pad_rel: int,
                 tile_e: int = TILE_E, tile_f: int = TILE_F,
                 num_chunks: int | None = None) -> KernelLayout:
    """Assemble per-sample direction tuples (from build_sample_direction,
    possibly cached per record) into a batch KernelLayout.

    ``num_chunks`` fixes the padded chunk count. Callers batching real data
    MUST pass the (E, F)-bucket bound ``F//tile_f + E//tile_e`` (every
    sample satisfies nc <= ceil(F/tile_f) + n_tiles): without it the padded
    width follows the batch max and every batch gets a fresh XLA
    compilation — minutes per step through a remote-compile TPU tunnel."""
    B = len(fwd_samples)
    n_tiles = E // tile_e

    def pack(samples):
        nc = num_chunks or max(len(s[4]) for s in samples)
        assert all(len(s[4]) <= nc for s in samples), (
            "num_chunks bound too small", nc, max(len(s[4]) for s in samples))
        Fp = nc * tile_f
        sc = np.full((B, Fp), -1, np.int32)
        ga = np.zeros((B, Fp), np.int32)
        rl = np.full((B, Fp), pad_rel, np.int32)
        wt = np.zeros((B, Fp), np.float32)
        pm = np.full((B, Fp), -1, np.int32)
        ct = np.empty((B, nc), np.int32)
        cs = np.zeros((B, n_tiles + 1), np.int32)
        for b, (s, g, r, w, c, c_starts, p) in enumerate(samples):
            sc[b, :len(s)] = s; ga[b, :len(g)] = g
            rl[b, :len(r)] = r; wt[b, :len(w)] = w
            pm[b, :len(p)] = p
            ct[b, :len(c)] = c
            ct[b, len(c):] = c[-1] if len(c) else 0
            cs[b] = c_starts
        return DirectionLayout(sc, ga, rl, ct, cs, wt, pm)

    return KernelLayout(fwd=pack(fwd_samples), inv=pack(inv_samples),
                        num_entities=E)
