"""Population x transcript mutation driver + per-transcript statistics.

Capability parity with the shared analysis library
(kga_analytic/kga_analysis_library/): MutateGenes/MutateGenesReport
(kga_analysis_lib_seqmutation.h:39,90 — population-wide transcript
mutation, thread-per-genome pool at .cpp:116-140) and the transcript
family statistics + distance trees (kga_analysis_lib_seq_stats.h:26,65,
tree build .cpp:290-456). The TPU re-design: per-genome mutation uses the
host-exact engine per genome (indel-correct), the all-pairs Levenshtein
over distinct mutant sequences runs on the batched device kernel, and
UPGMA/Newick close the tail.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..classify.upgma import newick, upgma_tree
from ..genome.contig import ContigReference
from ..genome.features import CodingSequenceValidity, TranscriptionSequence
from ..mutation.sequence_filter import SeqVariantFilterType
from ..mutation.transcript import SequenceTranscript
from ..ops.edit_distance import pairwise_distance_matrix
from ..utils.logging import log
from ..variant.db import PopulationDB

__all__ = ["MutateStats", "TranscriptMutateRecord", "MutateGenes", "TranscriptFamilyAnalysis"]


@dataclass
class MutateStats:
    """Aggregate mutation statistics (MutateAnalysis counters)."""

    total_genomes: int = 0
    mutant_genomes: int = 0
    total_variants: int = 0
    total_snp: int = 0
    total_frameshift: int = 0
    duplicate_variants: int = 0
    upstream_deleted: int = 0
    valid_proteins: int = 0
    invalid_proteins: int = 0


@dataclass
class TranscriptMutateRecord:
    """One genome x transcript mutation outcome."""

    genome_id: str
    gene_id: str
    transcript_id: str
    variant_count: int
    modified_coding: str
    validity: CodingSequenceValidity
    distance: Optional[int] = None  # Levenshtein vs reference coding


class MutateGenes:
    """Mutate a transcript across every genome of a population
    (MutateGenes::mutatePopulation)."""

    def __init__(self, contig_ref: ContigReference,
                 filter_type: SeqVariantFilterType = SeqVariantFilterType.DEFAULT_SEQ_FILTER,
                 info_store=None):
        self.contig_ref = contig_ref
        self.filter_type = filter_type
        self.info_store = info_store

    def mutate_transcript(
        self, population: PopulationDB, transcript: TranscriptionSequence
    ) -> Tuple[List[TranscriptMutateRecord], MutateStats]:
        stats = MutateStats()
        records: List[TranscriptMutateRecord] = []
        reference_coding = self.contig_ref.coding_sequence(transcript).to_string()
        for genome_id, genome in population:
            stats.total_genomes += 1
            contig_db = genome.get_contig(self.contig_ref.contig_id)
            if contig_db is None or contig_db.variant_count() == 0:
                records.append(
                    TranscriptMutateRecord(
                        genome_id, transcript.gene.feature_id, transcript.transcript_id,
                        0, reference_coding,
                        self.contig_ref.check_valid_transcript(transcript),
                    )
                )
                continue
            st = SequenceTranscript(
                contig_db, self.contig_ref, transcript, self.filter_type,
                self.info_store,
            )
            n_variants = st.variant_count()
            stats.total_variants += n_variants
            stats.total_snp += st.stats.total_snp_variants
            stats.total_frameshift += st.stats.total_frame_shift
            stats.duplicate_variants += st.stats.non_unique_count
            stats.upstream_deleted += st.stats.upstream_deleted
            if n_variants:
                stats.mutant_genomes += 1
            validity = st.modified_validity()
            if CodingSequenceValidity.valid_sequence(validity):
                stats.valid_proteins += 1
            else:
                stats.invalid_proteins += 1
            records.append(
                TranscriptMutateRecord(
                    genome_id, transcript.gene.feature_id, transcript.transcript_id,
                    n_variants, st.modified_coding().to_string(), validity,
                )
            )
        return records, stats


class TranscriptFamilyAnalysis:
    """Per-transcript-family distance statistics and UPGMA trees
    (AnalysisTranscriptFamily / GenomeTranscriptAnalysis)."""

    def __init__(self, records: List[TranscriptMutateRecord], reference_coding: str):
        self.records = records
        self.reference_coding = reference_coding

    def distinct_sequences(self) -> Dict[str, List[str]]:
        """Modified sequence -> genomes carrying it (sequence dedup records,
        kga_analysis_lib_seq_gene.h:25-117)."""
        out: Dict[str, List[str]] = {}
        for rec in self.records:
            out.setdefault(rec.modified_coding, []).append(rec.genome_id)
        return out

    def _padded_codes(self, sequences: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        from ..sequence.alphabet import DNA5

        width = max((len(s) for s in sequences), default=1)
        seqs = np.zeros((len(sequences), width), dtype=np.uint8)
        lens = np.zeros(len(sequences), dtype=np.int32)
        for i, s in enumerate(sequences):
            codes = DNA5.from_string(s) if s else np.empty(0, np.uint8)
            seqs[i, : len(codes)] = codes
            lens[i] = len(codes)
        return seqs, lens

    def reference_distances(self) -> Dict[str, int]:
        """Levenshtein of each distinct mutant vs the reference coding
        (batched device kernel)."""
        from ..ops.edit_distance import batched_levenshtein

        distinct = list(self.distinct_sequences())
        if not distinct:
            return {}
        width = max(len(self.reference_coding), max(len(s) for s in distinct), 1)
        seqs, lens = self._padded_codes(distinct + [self.reference_coding])
        n = len(distinct)
        ref_seq = np.repeat(seqs[-1:], n, axis=0)
        ref_len = np.repeat(lens[-1:], n)
        distances = np.asarray(
            batched_levenshtein(seqs[:n], lens[:n], ref_seq, ref_len)
        )
        return dict(zip(distinct, distances.tolist()))

    def distance_tree_newick(self, max_leaves: int = 256) -> str:
        """All-pairs distance over distinct sequences -> UPGMA -> Newick
        (kga_analysis_lib_seq_stats.cpp:290-456)."""
        distinct = self.distinct_sequences()
        labels = []
        sequences = []
        for seq, genomes in list(distinct.items())[:max_leaves]:
            labels.append(genomes[0] if len(genomes) == 1 else f"{genomes[0]}+{len(genomes) - 1}")
            sequences.append(seq)
        if len(sequences) < 2:
            return f"({labels[0] if labels else 'reference'}:0);"
        seqs, lens = self._padded_codes(sequences)
        matrix = pairwise_distance_matrix(seqs, lens)
        tree = upgma_tree(matrix, labels)
        return newick(tree)

    def write_report(self, path: str, distances: Optional[Dict[str, int]] = None) -> None:
        distances = distances or self.reference_distances()
        with open(path, "w") as f:
            f.write("Genome,Gene,Transcript,Variants,Validity,Distance,CodingLength\n")
            for rec in self.records:
                distance = distances.get(rec.modified_coding, "")
                f.write(
                    f"{rec.genome_id},{rec.gene_id},{rec.transcript_id},"
                    f"{rec.variant_count},{rec.validity.value},{distance},"
                    f"{len(rec.modified_coding)}\n"
                )
