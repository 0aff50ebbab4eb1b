"""Device-tiled all-pairs MICA / term-similarity kernels.

The TPU path for the ontology similarity cache (SURVEY.md section 3.4):
the reference computes the N^2 term matrix one column per pool thread
(kol_SimilarityCache.cpp:126-150); here each term carries its (padded)
ancestor list sorted with IC values, and a jitted tile kernel computes

    MICA[i, j] = max over (p, q) of  min(ic_i[p], ic_j[q]) * [id_i[p] == id_j[q]]

as a (TI, TJ, K, K) vectorized compare+reduce on device — the genomics
analogue of a blocked matmul. Set-level BMA over gene term-sets reduces to
sub-block max/mean over this matrix (cache.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ancestor_lists", "mica_matrix_device", "lin_matrix_device"]


def ancestor_lists(information, term_indices: Sequence[int],
                   max_ancestors: Optional[int] = None,
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """(n, K) ancestor ids (-1 pad) and IC values for each term.

    max_ancestors=None (the default) is EXACT: K pads to the longest
    ancestor list in the subset (rounded to a lane multiple) and the
    chunked tile kernel scans every ancestor pair. Passing an int keeps
    the old top-IC truncation (approximate for terms with more ancestors
    — the true MICA of a pair can rank below the cut in BOTH lists)."""
    graph = information.graph
    anc_bits = graph.ancestor_bitsets()
    ic = information.ic
    n = len(term_indices)
    anc_all = [graph._bits_to_indices(anc_bits[t]) for t in term_indices]
    if max_ancestors is None:
        longest = max((len(a) for a in anc_all), default=1)
        K = max(64, ((longest + 63) // 64) * 64)
        truncate = False
    else:
        K = max_ancestors
        truncate = True
    ids = np.full((n, K), -1, dtype=np.int32)
    vals = np.zeros((n, K), dtype=np.float32)
    overflow = 0
    for row, anc in enumerate(anc_all):
        if truncate and len(anc) > K:
            overflow += 1
            order = np.argsort(ic[anc])[::-1][:K]
            anc = anc[order]
        ids[row, : len(anc)] = anc
        vals[row, : len(anc)] = ic[anc]
    if overflow:
        from ..utils.logging import log

        log().warn("ancestor_lists: {} terms truncated to top-{} IC ancestors",
                   overflow, K)
    return ids, vals


@jax.jit
def _mica_tile(ids_i, ic_i, ids_j, ic_j):
    """(TI, K) x (TJ, K) -> (TI, TJ) max-min over matching ancestor ids."""
    eq = ids_i[:, None, :, None] == ids_j[None, :, None, :]
    eq &= ids_i[:, None, :, None] >= 0
    pair_min = jnp.minimum(ic_i[:, None, :, None], ic_j[None, :, None, :])
    return jnp.max(jnp.where(eq, pair_min, 0.0), axis=(2, 3))


@functools.partial(jax.jit, static_argnames=("chunk",))
def _mica_tile_chunked(ids_i, ic_i, ids_j, ic_j, chunk: int = 64):
    """Exact tile for arbitrary ancestor width: fori over (chunk, chunk)
    sub-blocks of the (K_i, K_j) ancestor cross product, so VMEM holds one
    (TI, TJ, chunk, chunk) compare block at a time."""
    ci = ids_i.shape[1] // chunk
    cj = ids_j.shape[1] // chunk
    TI, TJ = ids_i.shape[0], ids_j.shape[0]

    def body(c, acc):
        a = (c // cj) * chunk
        b = (c % cj) * chunk
        idi = jax.lax.dynamic_slice(ids_i, (0, a), (TI, chunk))
        ici = jax.lax.dynamic_slice(ic_i, (0, a), (TI, chunk))
        idj = jax.lax.dynamic_slice(ids_j, (0, b), (TJ, chunk))
        icj = jax.lax.dynamic_slice(ic_j, (0, b), (TJ, chunk))
        eq = (idi[:, None, :, None] == idj[None, :, None, :]) & (
            idi[:, None, :, None] >= 0
        )
        pair_min = jnp.minimum(ici[:, None, :, None], icj[None, :, None, :])
        return jnp.maximum(acc, jnp.max(jnp.where(eq, pair_min, 0.0), axis=(2, 3)))

    init = jnp.zeros((TI, TJ), jnp.float32)
    return jax.lax.fori_loop(0, ci * cj, body, init)


def mica_matrix_device(information, term_indices: Sequence[int],
                       tile: int = 128,
                       max_ancestors: Optional[int] = None) -> np.ndarray:
    """All-pairs MICA IC over a term subset, tiled on device. Exact by
    default (chunked ancestor scan; kol_SimilarityCache.cpp:126-150)."""
    ids, vals = ancestor_lists(information, term_indices, max_ancestors)
    n = len(term_indices)
    K = ids.shape[1]
    ids_d = jnp.asarray(ids)
    vals_d = jnp.asarray(vals)
    kernel = _mica_tile if K <= 64 else functools.partial(
        _mica_tile_chunked, chunk=64
    )
    out = np.zeros((n, n), dtype=np.float32)
    for i0 in range(0, n, tile):
        i1 = min(i0 + tile, n)
        for j0 in range(i0, n, tile):
            j1 = min(j0 + tile, n)
            block = np.asarray(
                kernel(ids_d[i0:i1], vals_d[i0:i1], ids_d[j0:j1], vals_d[j0:j1])
            )
            out[i0:i1, j0:j1] = block
            if j0 != i0:
                out[j0:j1, i0:i1] = block.T
    return out.astype(np.float64)


def lin_matrix_device(information, term_ids: Sequence[str],
                      tile: int = 128,
                      max_ancestors: Optional[int] = None) -> np.ndarray:
    """Lin similarity matrix computed from the device MICA path; matches
    SimilarityLin.similarity_matrix bit-for-bit up to f32 rounding."""
    graph = information.graph
    idxs = [graph.term_index(t) for t in term_ids]
    valid = np.array([i is not None for i in idxs])
    safe = np.array([i if i is not None else 0 for i in idxs], dtype=np.int64)
    mica = mica_matrix_device(information, safe, tile, max_ancestors)
    ic = information.ic[safe]
    counts = information.cumulative_counts[safe]
    ns = graph.namespace_code[safe].astype(np.int64)
    ok = (
        valid[:, None] & valid[None, :]
        & (counts[:, None] > 0) & (counts[None, :] > 0)
        & (ns[:, None] == ns[None, :])
    )
    denom = ic[:, None] + ic[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(denom > 0, 2.0 * mica / denom, 0.0)
    np.fill_diagonal(out, np.where(ic > 0, 1.0, 0.0))
    return np.where(ok, out, 0.0)
