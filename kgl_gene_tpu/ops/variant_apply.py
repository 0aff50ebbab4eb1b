"""Device-side batched variant application and codon translation.

The TPU fast path for the mutation engine (SURVEY.md section 7 "hard
parts"): SNP application over a sample batch is a vmapped scatter into the
replicated region sequence; translation is a gather through the 65-entry
codon LUT. Indel-bearing samples take the exact host path
(kgl_gene_tpu.mutation.adjusted_sequence) — on population data SNPs
dominate, so the device path carries the throughput.

Reference behaviour mirrored: AdjustedSequence SNP update
(kgl_mutation/kgl_mutation_sequence.h:47) and Codon/TranslationTable
indexing (kgl_sequence/kgl_sequence_codon.h:22, kgl_table.h:24).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "apply_snp_batch",
    "build_splice_index",
    "gather_splice",
    "reverse_complement_batch",
    "translate_batch",
    "translate_batch_pallas",
]


@jax.jit
def apply_snp_batch(
    region: jnp.ndarray,      # (L,) uint8 reference region codes
    positions: jnp.ndarray,   # (B, K) int32 region-relative SNP offsets
    alt_codes: jnp.ndarray,   # (B, K) uint8 alternate base codes
    valid: jnp.ndarray,       # (B, K) bool — real SNP vs padding
) -> jnp.ndarray:
    """Apply per-sample SNP sets to a shared region: (B, L) mutated codes.

    Padded entries scatter out-of-bounds and are dropped.
    """
    L = region.shape[0]
    safe_pos = jnp.where(valid, positions, L)  # L is out of bounds -> dropped

    def one(pos, alt):
        return region.at[pos].set(alt, mode="drop")

    return jax.vmap(one)(safe_pos, alt_codes)


def build_splice_index(exon_intervals: np.ndarray, region_start: int) -> np.ndarray:
    """Flat gather indices (region-relative) selecting spliced exon bases
    in genome order."""
    parts = [
        np.arange(lo - region_start, hi - region_start, dtype=np.int32)
        for lo, hi in exon_intervals
    ]
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.int32)


@jax.jit
def gather_splice(mutated: jnp.ndarray, splice_index: jnp.ndarray) -> jnp.ndarray:
    """(B, L) x (S,) -> (B, S) spliced coding bases."""
    return mutated[:, splice_index]


@jax.jit
def reverse_complement_batch(coding: jnp.ndarray, complement_lut: jnp.ndarray) -> jnp.ndarray:
    """(B, S) -> (B, S) reverse-complemented (for '-' strand transcripts)."""
    # arithmetic complement (see ops/pipeline._complement_codes)
    rev = coding[:, ::-1]
    return jnp.where(rev >= 4, rev, 3 - rev).astype(rev.dtype)


def _codon_index(coding: jnp.ndarray) -> jnp.ndarray:
    """(B, 3k) base codes -> (B, k) codon LUT indices (64 = contains N)."""
    B = coding.shape[0]
    k = coding.shape[1] // 3
    cod = coding[:, : 3 * k].reshape(B, k, 3).astype(jnp.int32)
    idx = cod[..., 0] * 16 + cod[..., 1] * 4 + cod[..., 2]
    has_n = (cod >= 4).any(axis=-1)
    return jnp.where(has_n, 64, idx)


@jax.jit
def translate_batch(coding: jnp.ndarray, amino_lut: jnp.ndarray) -> jnp.ndarray:
    """(B, 3k) coding codes -> (B, k) amino codes through the 65-entry LUT
    (index 64 = codon containing N -> unknown 'Z')."""
    return amino_lut[_codon_index(coding)]


def _translate_kernel(idx_ref, lut_ref, out_ref):
    """65-way select chain: XLA lowers tiny-table gathers to ~6 ns/element
    on TPU, while this VPU select chain runs at the dispatch floor. The
    LUT arrives as SMEM data (NCBI tables stay data, not constants)."""
    x = idx_ref[:]
    out = jnp.zeros_like(x)
    for j in range(65):
        out = jnp.where(x == j, lut_ref[0, j], out)
    out_ref[:] = out


def translate_batch_pallas(
    coding: jnp.ndarray, amino_lut: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """TPU translate path: codon indexing in XLA, LUT application as a
    Pallas select chain (equals translate_batch exactly; used inside the
    fused forward step where the gather would otherwise cost more than
    the exon splice and SNP apply combined)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    idx = _codon_index(coding)
    B, k = idx.shape
    kp = ((k + 127) // 128) * 128
    bp = 32 if B % 32 == 0 else 8
    Bp = ((B + bp - 1) // bp) * bp
    idxp = jnp.full((Bp, kp), 64, jnp.int32).at[:B, :k].set(idx)
    lut = jnp.zeros((1, 128), jnp.int32).at[0, :65].set(
        amino_lut.astype(jnp.int32)
    )
    out = pl.pallas_call(
        _translate_kernel,
        grid=(Bp // bp,),
        in_specs=[
            pl.BlockSpec((bp, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bp, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, kp), jnp.int32),
        interpret=interpret,
    )(idxp, lut)
    return out[:B, :k].astype(amino_lut.dtype)
