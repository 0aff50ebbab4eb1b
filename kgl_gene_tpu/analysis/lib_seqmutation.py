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
from ..genome.features import (
    CodingSequenceValidity,
    TranscriptionSequence,
    TranscriptionSequenceType,
)
from ..mutation.capture import (
    BatchCapture,
    batch_capture_tensors,
    capture_population,
    capture_population_batch,
)
from ..mutation.sequence_filter import SeqVariantFilterType
from ..mutation.transcript import SequenceTranscript
from ..ops.edit_distance import pairwise_distance_matrix
from ..sequence.sequence import DNA5SequenceCoding, StrandSense
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
    (MutateGenes::mutatePopulation).

    TPU routing: genomes whose selected variant set is provably SNP-only
    (mutation/capture.py preconditions) run as ONE batched device forward
    step (ops/pipeline.py) — scatter + splice + strand-convert + exact
    edit distance on chip; the remainder (indels, allele conflicts) keep
    the byte-exact AdjustedSequence host engine. This replaces the
    reference's thread-per-genome pool
    (kga_analysis_lib_seqmutation.cpp:116-140).
    """

    def __init__(self, contig_ref: ContigReference,
                 filter_type: SeqVariantFilterType = SeqVariantFilterType.DEFAULT_SEQ_FILTER,
                 info_store=None, use_device: bool = True,
                 k_bucket: Optional[int] = None, b_bucket: Optional[int] = None):
        self.contig_ref = contig_ref
        self.filter_type = filter_type
        self.info_store = info_store
        self.use_device = use_device
        # Minimum capture-tensor buckets: pin these so repeated transcript
        # batches share one compiled step (they grow to the next power of
        # two if a batch exceeds them).
        self.k_bucket = k_bucket
        self.b_bucket = b_bucket
        self._step_cache: Dict[Tuple[str, int, int], object] = {}

    # ------------------------------------------------------------------ #
    def _forward_step(self, transcript: TranscriptionSequence):
        """Jitted device step for this transcript geometry (cached)."""
        key = (transcript.transcript_id, transcript.start, transcript.end)
        step = self._step_cache.get(key)
        if step is None:
            import jax

            from ..ops.pipeline import make_forward_step

            region = self.contig_ref.subsequence(transcript.interval).codes
            step = make_forward_step(
                region,
                transcript.exon_arrays(),
                region_start=transcript.start,
                reverse_strand=transcript.strand is StrandSense.REVERSE,
                table_name=self.contig_ref.coding_table.name,
                use_pallas=jax.default_backend() in ("tpu", "axon"),
            )
            self._step_cache[key] = step
        return step

    def _host_mutate(
        self, genome_id: str, contig_db, transcript: TranscriptionSequence,
        stats: MutateStats,
    ) -> TranscriptMutateRecord:
        """Exact host engine for one genome (indel-correct path)."""
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
        return TranscriptMutateRecord(
            genome_id, transcript.gene.feature_id, transcript.transcript_id,
            n_variants, st.modified_coding().to_string(), validity,
        )

    def _device_mutate(
        self, captures, transcript: TranscriptionSequence,
        stats: MutateStats,
    ) -> List[TranscriptMutateRecord]:
        """One batched forward step for a list of GenomeCaptures (legacy
        per-genome capture path; the batch path below is the fast one)."""
        k_max = max((c.variant_count for c in captures), default=0)
        k_bucket = self.k_bucket
        if k_bucket is not None and k_max > k_bucket:
            k_bucket = None  # grow to the next power of two
        b_bucket = self.b_bucket
        if b_bucket is not None and len(captures) > b_bucket:
            b_bucket = None
        positions, alt_codes, valid = batch_capture_tensors(
            captures, region_start=transcript.start,
            k_bucket=k_bucket, b_bucket=b_bucket,
        )
        batch = BatchCapture(
            genome_ids=[c.genome_id for c in captures],
            positions=positions, alt_codes=alt_codes, valid=valid,
            k_counts=np.asarray([c.variant_count for c in captures], np.int32),
            hetero_counts=np.asarray(
                [c.stats.total_snp_variants for c in captures], np.int32
            ),
            host_genome_ids=[], empty_genome_ids=[],
        )
        return self._device_mutate_batch(batch, transcript, stats)

    def _device_mutate_batch(
        self, batch: BatchCapture, transcript: TranscriptionSequence,
        stats: MutateStats,
    ) -> List[TranscriptMutateRecord]:
        """One batched forward step for all SNP-only genomes, with the
        post-step work (validity classification, coding strings, stats)
        vectorized over the batch — no per-genome sequence objects."""
        from ..sequence.alphabet import DNA5

        step = self._forward_step(transcript)
        out = step(batch.positions, batch.alt_codes, batch.valid)
        n_dev = len(batch.genome_ids)
        coding = np.asarray(out.mutated_coding, dtype=np.uint8)[:n_dev]
        distance = np.asarray(out.distance)[:n_dev]
        is_ncrna = transcript.coding_type is TranscriptionSequenceType.NCRNA
        if is_ncrna:
            validities = [CodingSequenceValidity.NCRNA] * n_dev
        else:
            amino = np.asarray(out.amino, dtype=np.uint8)[:n_dev]
            validities = self.contig_ref.check_valid_amino_batch(
                amino, coding.shape[1]
            )

        # Vectorized stats (sum semantics identical to the per-genome loop).
        k_counts = batch.k_counts[:n_dev]
        stats.total_variants += int(k_counts.sum())
        stats.total_snp += int(batch.hetero_counts[:n_dev].sum())
        stats.mutant_genomes += int(np.count_nonzero(k_counts))
        n_valid = sum(
            1 for v in validities if CodingSequenceValidity.valid_sequence(v)
        )
        stats.valid_proteins += n_valid
        stats.invalid_proteins += n_dev - n_valid

        # Vectorized coding strings: one LUT pass + slice per record.
        S = coding.shape[1]
        char_buf = DNA5.CODE_TO_CHAR[coding].tobytes()
        gene_id = transcript.gene.feature_id
        tx_id = transcript.transcript_id
        records: List[TranscriptMutateRecord] = []
        for i, genome_id in enumerate(batch.genome_ids):
            records.append(
                TranscriptMutateRecord(
                    genome_id, gene_id, tx_id, int(k_counts[i]),
                    char_buf[i * S : (i + 1) * S].decode("ascii"),
                    validities[i], distance=int(distance[i]),
                )
            )
        return records

    def mutate_transcript(
        self, population: PopulationDB, transcript: TranscriptionSequence,
        use_device: Optional[bool] = None,
    ) -> Tuple[List[TranscriptMutateRecord], MutateStats]:
        if use_device is None:
            use_device = self.use_device
        use_device = use_device and transcript.coding_nucleotides() >= 3
        stats = MutateStats()
        by_id: Dict[str, TranscriptMutateRecord] = {}
        reference_coding = self.contig_ref.coding_sequence(transcript).to_string()
        ref_validity = self.contig_ref.check_valid_transcript(transcript)

        def ref_record(genome_id: str) -> TranscriptMutateRecord:
            return TranscriptMutateRecord(
                genome_id, transcript.gene.feature_id, transcript.transcript_id,
                0, reference_coding, ref_validity,
            )

        contig_id = self.contig_ref.contig_id
        batch: Optional[BatchCapture] = None
        if use_device:
            k_bucket = self.k_bucket
            b_bucket = self.b_bucket
            try:
                batch = capture_population_batch(
                    population, contig_id, transcript.interval,
                    region_start=transcript.start,
                    k_bucket=k_bucket, b_bucket=b_bucket,
                )
            except ValueError:
                # bucket too small: grow to the next power of two
                batch = capture_population_batch(
                    population, contig_id, transcript.interval,
                    region_start=transcript.start,
                )
            empty_ids, host_ids = batch.empty_genome_ids, batch.host_genome_ids
        else:
            empty_ids, host_ids = [], []
            for genome_id, genome in population:
                contig_db = genome.get_contig(contig_id)
                if contig_db is None or contig_db.variant_count() == 0:
                    empty_ids.append(genome_id)
                else:
                    host_ids.append(genome_id)

        stats.total_genomes = population.genome_count()
        for genome_id in empty_ids:
            by_id[genome_id] = ref_record(genome_id)
        for genome_id in host_ids:
            contig_db = population.get_genome(genome_id).get_contig(contig_id)
            by_id[genome_id] = self._host_mutate(
                genome_id, contig_db, transcript, stats
            )
        if batch is not None and batch.genome_ids:
            for rec in self._device_mutate_batch(batch, transcript, stats):
                by_id[rec.genome_id] = rec
        records = [by_id[gid] for gid in sorted(by_id)]
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
        # On the chip, route through the device-resident banded pair pool
        # (ops/edit_distance band_k path): transcript-family members differ
        # by bounded edit counts, and pairs that overflow the band re-run
        # through the exact adaptive path, so this is a pure routing choice.
        import jax

        band_k = 127 if jax.default_backend() in ("tpu", "axon") else None
        matrix = pairwise_distance_matrix(seqs, lens, band_k=band_k)
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
