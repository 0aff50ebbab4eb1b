"""The flagship device pipeline: population x transcript forward step.

One fused, jittable step covering the core KGL_Gene workload
(SURVEY.md section 3.3 "the forward pass"): for a batch of sample genomes
against one transcript region —
  1. apply each sample's SNPs to the replicated region (vmapped scatter),
  2. splice exons via static-length dynamic slices, strand-convert,
  3. translate to amino acids through the codon LUT,
  4. compute each mutant's edit distance to the reference coding sequence
     (banded / anti-diagonal wavefront DP),
  5. reduce alt-allele counts over the batch.

Exon splice is deliberately NOT a gather: exons are contiguous runs, so
the splice is a concat of dynamic slices whose LENGTHS are static and
whose starts are runtime scalars — XLA emits cheap contiguous copies, and
transcripts sharing an exon-length signature (plus region/batch shapes)
share ONE compiled executable (the geometry arrays are arguments, not
closure constants).

Multi-chip: the same step runs under shard_map with samples sharded over
the mesh and the allele-count reduction merged by psum (see
multichip_forward_step).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..sequence.alphabet import DNA5
from ..sequence.tables import amino_translation_table
from .edit_distance import _batched_levenshtein_impl
from .variant_apply import apply_snp_batch, translate_batch

__all__ = ["ForwardOutputs", "make_forward_step", "make_multichip_step"]


class ForwardOutputs(NamedTuple):
    mutated_coding: jnp.ndarray   # (B, S) spliced mutated coding codes
    amino: jnp.ndarray            # (B, S//3) amino codes
    distance: jnp.ndarray         # (B,) edit distance mutant vs reference coding
    allele_counts: jnp.ndarray    # (K_total,) alt allele counts over batch
    valid_protein: jnp.ndarray    # (B,) bool: no internal stop & mod-3 start/stop
    validity_code: jnp.ndarray    # (B,) int32: 0 valid / 1 no-stop / 2 nonsense / 3 no-start


def _splice_slices(
    batch: jnp.ndarray,          # (B, L)
    exon_starts: jnp.ndarray,    # (E,) int32 region-relative exon starts
    exon_lens: Tuple[int, ...],  # static exon lengths
) -> jnp.ndarray:
    """Contiguous-exon splice: concat of static-length dynamic slices."""
    parts = [
        jax.lax.dynamic_slice_in_dim(batch, exon_starts[e], exon_lens[e], axis=1)
        for e in range(len(exon_lens))
    ]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _forward(
    region: jnp.ndarray,         # (L,) reference region codes
    exon_starts: jnp.ndarray,    # (E,) region-relative exon starts
    exon_lens: Tuple[int, ...],  # static exon lengths (sum = S)
    reverse_strand: bool,
    positions: jnp.ndarray,      # (B, K) region-relative SNP positions
    alt_codes: jnp.ndarray,      # (B, K)
    valid: jnp.ndarray,          # (B, K)
    amino_lut: jnp.ndarray,      # (65,)
    complement_lut: jnp.ndarray, # (5,)
    stop_code: int,
    start_codes: jnp.ndarray,    # (n_start,) amino codes acceptable at pos 0
    use_pallas: bool = False,
) -> ForwardOutputs:
    interpret = jax.default_backend() not in ("tpu", "axon")
    mutated = apply_snp_batch(region, positions, alt_codes, valid)
    coding = _splice_slices(mutated, exon_starts, exon_lens)
    if reverse_strand:
        coding = complement_lut[coding[:, ::-1]]
    if use_pallas:
        from .variant_apply import translate_batch_pallas

        amino = translate_batch_pallas(coding, amino_lut, interpret=interpret)
    else:
        amino = translate_batch(coding, amino_lut)

    # Reference coding (no variants) for the distance baseline.
    ref_coding = _splice_slices(region[None, :], exon_starts, exon_lens)
    if reverse_strand:
        ref_coding = complement_lut[ref_coding[:, ::-1]]
    B, S = coding.shape
    lens = jnp.full((B,), S, dtype=jnp.int32)
    K_snps = positions.shape[1]
    # Band exactness proof: every variant here is a substitution at one
    # region offset, so Levenshtein(mutant, ref) <= Hamming <= K_snps and
    # the lengths are equal. When K_snps fits a band the banded kernel is
    # provably exact and does ~band/(2*S) of the full wavefront's work —
    # the static form of edlib's band doubling (edlib.cpp:161-185).
    band_k = 63 if K_snps <= 63 else (127 if K_snps <= 127 else 0)
    if use_pallas and band_k and S >= 512:
        from .pallas_banded import B_LEAD, _banded_call

        band_w = ((2 * band_k + 1 + 127) // 128) * 128
        win_w = band_w + 256
        Wa = ((S + 127) // 128) * 128
        block_b = 256 if B % 256 == 0 else (128 if B % 128 == 0 else 32)
        Bp = ((B + block_b - 1) // block_b) * block_b
        a_p = jnp.zeros((Bp, Wa), jnp.int32).at[:B, :S].set(coding.astype(jnp.int32))
        b_buf = jnp.full((Bp, B_LEAD + Wa + win_w), -1, jnp.int32).at[
            :B, B_LEAD : B_LEAD + S
        ].set(jnp.broadcast_to(ref_coding, (B, S)).astype(jnp.int32))
        len_col = jnp.zeros((Bp, 128), jnp.int32).at[:B, :].set(S)
        # uniform_cap: every real pair has la == lb == S (mutants are
        # substitution-only), so the kernel skips per-row capture work and
        # reads the final wavefront row (padded rows are sliced away).
        distance = _banded_call(
            a_p, b_buf, len_col, len_col, max_len=S, band_k=band_k,
            block_b=block_b, interpret=interpret, uniform_cap=True,
        )[:B, 0]
    elif use_pallas:
        from .pallas_edit_distance import BLOCK_B, _pallas_call

        W = ((S + 1 + 127) // 128) * 128
        Bp = ((B + BLOCK_B - 1) // BLOCK_B) * BLOCK_B
        a_p = jnp.zeros((Bp, W), jnp.int32).at[:B, :S].set(coding.astype(jnp.int32))
        b_rev = jnp.zeros((Bp, W), jnp.int32).at[:B, :S].set(
            jnp.broadcast_to(ref_coding, (B, S)).astype(jnp.int32)
        )[:, ::-1]
        len_col = jnp.zeros((Bp, 128), jnp.int32).at[:B, :].set(S)
        distance = _pallas_call(
            a_p, b_rev, len_col, len_col, max_len=S, interpret=interpret
        )[:B, 0]
    else:
        distance = _batched_levenshtein_impl(
            coding, lens, jnp.broadcast_to(ref_coding, (B, S)), lens, S, S
        )

    # Validity: starts with a start amino, ends with stop, no internal stop.
    starts_ok = jnp.isin(amino[:, 0], start_codes)
    ends_ok = amino[:, -1] == stop_code
    internal_stops = jnp.sum(amino[:, :-1] == stop_code, axis=1)
    valid_protein = starts_ok & ends_ok & (internal_stops == 0)
    # Enum code matching ContigReference.check_valid_amino_batch precedence
    # (computed on device so the host never fetches the amino batch):
    # 0 VALID_PROTEIN, 1 NO_STOP_CODON, 2 NONSENSE_MUTATION, 3 NO_START_CODON.
    validity_code = jnp.maximum(
        jnp.maximum(
            (~ends_ok).astype(jnp.int32),
            2 * (internal_stops > 0).astype(jnp.int32),
        ),
        3 * (~starts_ok).astype(jnp.int32),
    )

    allele_counts = jnp.sum(valid.astype(jnp.int32), axis=0)
    return ForwardOutputs(mutated_coding=coding, amino=amino, distance=distance,
                          allele_counts=allele_counts, valid_protein=valid_protein,
                          validity_code=validity_code)


@functools.partial(
    jax.jit,
    static_argnames=("exon_lens", "reverse_strand", "stop_code", "use_pallas"),
)
def _forward_jit(
    region, exon_starts, positions, alt_codes, valid,
    amino_lut, complement_lut, start_codes,
    *, exon_lens, reverse_strand, stop_code, use_pallas,
):
    return _forward(
        region, exon_starts, exon_lens, reverse_strand,
        positions, alt_codes, valid, amino_lut, complement_lut,
        stop_code, start_codes, use_pallas=use_pallas,
    )


def make_forward_step(
    region_codes: np.ndarray,
    exon_intervals: np.ndarray,
    region_start: int,
    reverse_strand: bool = False,
    table_name: str = "NCBI_TABLE_1",
    use_pallas: bool = False,
):
    """Build a jitted forward step closed over the transcript geometry.

    step_fn(positions, alt_codes, valid) -> ForwardOutputs. Transcripts
    with the same (region length, exon-length signature, batch shapes)
    share one compiled executable — the geometry is passed as arguments
    to a module-level jit, not baked in as constants.
    """
    from ..sequence.alphabet import AminoAcid

    table = amino_translation_table(table_name)
    exon_intervals = np.asarray(exon_intervals, dtype=np.int64)
    exon_lens = tuple(int(hi - lo) for lo, hi in exon_intervals)
    exon_starts = jnp.asarray(
        exon_intervals[:, 0] - region_start, dtype=jnp.int32
    )
    region = jnp.asarray(region_codes, dtype=jnp.uint8)
    amino_lut = jnp.asarray(table.amino_lut, dtype=jnp.uint8)
    complement_lut = jnp.asarray(DNA5.COMPLEMENT, dtype=jnp.uint8)
    start_codes = jnp.asarray(
        np.unique(table.amino_lut[table.start_lut]), dtype=jnp.uint8
    )

    def step(positions, alt_codes, valid):
        return _forward_jit(
            region, exon_starts, positions, alt_codes, valid,
            amino_lut, complement_lut, start_codes,
            exon_lens=exon_lens, reverse_strand=reverse_strand,
            stop_code=AminoAcid.STOP, use_pallas=use_pallas,
        )

    return step


def make_multichip_step(
    mesh: Mesh,
    region_codes: np.ndarray,
    exon_intervals: np.ndarray,
    region_start: int,
    reverse_strand: bool = False,
    table_name: str = "NCBI_TABLE_1",
    use_pallas: bool | None = None,
):
    """The full step under shard_map: samples sharded over the mesh axis,
    transcript geometry replicated, allele counts psum-merged over ICI.

    step(positions, alt_codes, valid, zygosity) where the batch axis of
    every input is sharded; returns (distances sharded, allele counts
    replicated, population AC replicated).

    use_pallas routes each shard's DP through the SAME Pallas kernels as
    the single-chip step (banded when the SNP budget bounds the band, full
    wavefront otherwise) so per-chip throughput matches 1-chip; default is
    auto (on for TPU backends, interpret-mode on the CPU test mesh when
    explicitly requested).
    """
    from jax import shard_map

    from ..sequence.alphabet import AminoAcid

    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")

    axis = mesh.axis_names[0]
    table = amino_translation_table(table_name)
    region = jnp.asarray(region_codes, dtype=jnp.uint8)
    exon_intervals = np.asarray(exon_intervals, dtype=np.int64)
    exon_lens = tuple(int(hi - lo) for lo, hi in exon_intervals)
    exon_starts = jnp.asarray(
        exon_intervals[:, 0] - region_start, dtype=jnp.int32
    )
    amino_lut = jnp.asarray(table.amino_lut, dtype=jnp.uint8)
    complement_lut = jnp.asarray(DNA5.COMPLEMENT, dtype=jnp.uint8)
    start_codes = jnp.asarray(
        np.unique(table.amino_lut[table.start_lut]), dtype=jnp.uint8
    )

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
        out_specs=(P(axis), P(), P()),
        # pallas_call out_shapes carry no varying-mesh-axes annotation; the
        # out_specs above pin the sharding explicitly.
        check_vma=False,
    )
    def step(positions, alt_codes, valid, zygosity):
        out = _forward(
            region, exon_starts, exon_lens, reverse_strand,
            positions, alt_codes, valid,
            amino_lut, complement_lut, AminoAcid.STOP, start_codes,
            use_pallas=use_pallas,
        )
        # Merge per-shard allele counts and zygosity AC over the mesh.
        allele_counts = jax.lax.psum(out.allele_counts, axis)
        pop_ac = jax.lax.psum(
            jnp.sum(zygosity.astype(jnp.int32), axis=0), axis
        )
        return out.distance, allele_counts, pop_ac

    return step
