"""Transcript capture: PopulationDB -> device tensors for the forward step.

This is the bridge between the columnar variant store and the flagship TPU
pipeline (ops/pipeline.py): for one transcript region it classifies every
genome as either *device-capturable* (all windowed variants are simple
1-base SNPs with no per-offset allele conflicts — the overwhelming majority
on population data) or *host-exact* (indels / same-offset allele conflicts,
routed through the reference-parity AdjustedSequence engine).

Capture reproduces the SequenceVariantFilter selection semantics
(kgl_mutation/kgl_mutation_variant_filter.cpp:20-262) for the SNP-only
case as pure vectorized numpy over the contig's incidence columns:
canonical-margin windowing (len-1/len-1 SNPs are already canonical, so
the margin variants never modify the region), region-modify check,
homozygous-duplicate dedup and the filter statistics. Any genome whose
windowed set violates a fast-path precondition falls back to the host
filter, which is the semantic oracle by construction.

The reference runs this workload as a thread-per-genome pool over
AdjustedSequence (kga_analytic/kga_analysis_library/
kga_analysis_lib_seqmutation.cpp:116-140); here the per-genome SNP sets
become one (B, K) tensor batch consumed by make_forward_step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ..utils.intervals import OpenRightInterval
from ..variant.arena import VariantArena
from ..variant.db import ContigDB, PopulationDB
from .sequence_filter import (
    CANONICAL_MARGIN,
    FilteredVariantStats,
    SeqVariantFilterType,
    SequenceVariantFilter,
)

__all__ = [
    "GenomeCapture",
    "PopulationCapture",
    "fast_snp_capture",
    "capture_population",
    "batch_capture_tensors",
]


@dataclass
class GenomeCapture:
    """One genome's selected SNP set for a transcript region."""

    genome_id: str
    positions: np.ndarray  # (k,) int64 absolute contig offsets (selected SNPs)
    alt_codes: np.ndarray  # (k,) uint8 alternate base codes
    stats: FilteredVariantStats = field(default_factory=FilteredVariantStats)

    @property
    def variant_count(self) -> int:
        return int(self.positions.shape[0])


@dataclass
class PopulationCapture:
    """Population split into device-capturable and host-exact genomes."""

    device: List[GenomeCapture]
    host_genome_ids: List[str]   # need the exact AdjustedSequence path
    empty_genome_ids: List[str]  # no contig / zero incidences for the contig


def fast_snp_capture(
    contig_db: ContigDB,
    region: OpenRightInterval,
) -> Optional[GenomeCapture]:
    """Vectorized SNP-only capture for one genome contig; None -> host path.

    Preconditions for the fast path (checked, not assumed):
      * every incidence in the canonical-margin window is a len-1/len-1
        allele (already canonical: clone_canonical is the identity on
        these, kgl_variant/kgl_variant.cpp canonical trim rules), and
      * no region-modifying offset carries more than one DISTINCT allele
        (so the homozygous-preference / allele-frequency tie-break of
        SequenceVariantFilter never fires).
    """
    arena = contig_db.arena
    cols = contig_db.columns()
    offsets = cols["offset"]
    lower = max(0, region.lower - CANONICAL_MARGIN)
    lo = int(np.searchsorted(offsets, lower, side="left"))
    hi = int(np.searchsorted(offsets, region.upper, side="left"))
    rows = np.asarray(cols["row"][lo:hi], dtype=np.int64)
    stats = FilteredVariantStats()
    if rows.size == 0:
        return GenomeCapture("", np.empty(0, np.int64), np.empty(0, np.uint8), stats)

    # Every windowed allele must be a simple SNP (len-1 ref and alt). A
    # same-length multi-base row can canonicalise to a shifted SNP, so it
    # goes to the host filter too.
    if not bool(np.all((arena.ref_lens[rows] == 1) & (arena.alt_lens[rows] == 1))):
        return None

    # Region-modify check: a canonical SNP modifies [offset, offset+1).
    offs = offsets[lo:hi]
    modifying = (offs >= region.lower) & (offs < region.upper)
    rows_m = rows[modifying]
    if rows_m.size == 0:
        return GenomeCapture("", np.empty(0, np.int64), np.empty(0, np.uint8), stats)

    # Selection + statistics over the modifying set. Same (contig, offset,
    # ref, alt) == same arena row, so row identity == HGVS identity.
    unique_rows, counts = np.unique(rows_m, return_counts=True)
    unique_offsets = arena.offsets[unique_rows]
    order = np.argsort(unique_offsets, kind="stable")
    unique_rows, unique_offsets = unique_rows[order], unique_offsets[order]
    # Per-offset allele conflict (two distinct rows at one insert offset)
    # -> host path for the homozygous/AF tie-break.
    if unique_offsets.size > 1 and bool(np.any(unique_offsets[1:] == unique_offsets[:-1])):
        return None

    counts = counts[order]
    # "hetero" in the filter's stats sense: alleles seen exactly once.
    n_hetero = int(np.sum(counts == 1))
    stats.total_interval_variants = n_hetero
    stats.total_snp_variants = n_hetero  # all fast-path alleles are SNPs
    stats.total_frame_shift = 0
    stats.non_unique_count = 0           # one allele per offset: all selected
    stats.upstream_deleted = 0           # SNPs never shadow downstream

    alt_first = arena.alt_first
    return GenomeCapture(
        "", unique_offsets.astype(np.int64), alt_first[unique_rows], stats
    )


def capture_population(
    population: PopulationDB,
    contig_id: str,
    region: OpenRightInterval,
) -> PopulationCapture:
    """Split a population over one transcript region (sorted genome order)."""
    device: List[GenomeCapture] = []
    host_ids: List[str] = []
    empty_ids: List[str] = []
    for genome_id, genome in population:
        contig_db = genome.get_contig(contig_id)
        if contig_db is None or contig_db.variant_count() == 0:
            empty_ids.append(genome_id)
            continue
        cap = fast_snp_capture(contig_db, region)
        if cap is None:
            host_ids.append(genome_id)
        else:
            cap.genome_id = genome_id
            device.append(cap)
    return PopulationCapture(device, host_ids, empty_ids)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()


def batch_capture_tensors(
    captures: List[GenomeCapture],
    region_start: int,
    k_bucket: Optional[int] = None,
    b_bucket: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack per-genome captures into (positions, alt_codes, valid) tensors.

    Shapes are bucketed to powers of two (K and B) so repeated transcript
    batches reuse the same compiled executable on the TPU.
    """
    n = len(captures)
    k_max = max((c.variant_count for c in captures), default=0)
    K = k_bucket if k_bucket is not None else max(8, _next_pow2(k_max))
    B = b_bucket if b_bucket is not None else max(8, _next_pow2(n))
    if k_max > K or n > B:
        raise ValueError(f"bucket too small: need ({n},{k_max}), got ({B},{K})")
    positions = np.zeros((B, K), dtype=np.int32)
    alt_codes = np.zeros((B, K), dtype=np.uint8)
    valid = np.zeros((B, K), dtype=bool)
    for i, cap in enumerate(captures):
        k = cap.variant_count
        positions[i, :k] = cap.positions - region_start
        alt_codes[i, :k] = cap.alt_codes
        valid[i, :k] = True
    return positions, alt_codes, valid


def exact_capture_reference(
    contig_db: ContigDB,
    region: OpenRightInterval,
    filter_type: SeqVariantFilterType = SeqVariantFilterType.DEFAULT_SEQ_FILTER,
    info_store=None,
) -> Tuple[np.ndarray, np.ndarray, FilteredVariantStats]:
    """Oracle capture through the full SequenceVariantFilter (test parity:
    fast_snp_capture must agree whenever it accepts a genome)."""
    filt = SequenceVariantFilter(contig_db, region, filter_type, info_store)
    pos, alts = [], []
    for insert_offset, variant in filt.variants():
        pos.append(variant.offset)
        alts.append(variant.alt.codes[0] if len(variant.alt) else 0)
    return (
        np.asarray(pos, dtype=np.int64),
        np.asarray(alts, dtype=np.uint8),
        filt.stats,
    )
