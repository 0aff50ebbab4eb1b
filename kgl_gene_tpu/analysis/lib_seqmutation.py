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
    capture_population_split,
)
from ..mutation.sequence_filter import SeqVariantFilterType
from ..mutation.transcript import SequenceTranscript
from ..ops.edit_distance import pairwise_distance_matrix
from ..sequence.sequence import DNA5SequenceCoding, StrandSense
from ..utils.logging import log
from ..variant.db import PopulationDB

__all__ = ["MutateStats", "TranscriptMutateRecord", "MutateGenes", "TranscriptFamilyAnalysis"]

# Device validity code -> enum (matches ops/pipeline.py validity_code and
# ContigReference.check_valid_amino_batch precedence; 4 = per-genome
# NOT_MOD3 from the indel step's dynamic coding lengths).
_VALIDITY_BY_CODE = (
    CodingSequenceValidity.VALID_PROTEIN,
    CodingSequenceValidity.NO_STOP_CODON,
    CodingSequenceValidity.NONSENSE_MUTATION,
    CodingSequenceValidity.NO_START_CODON,
    CodingSequenceValidity.NOT_MOD3,
)


_JIT_HELPERS: Dict[str, object] = {}

# byte value -> its three base-5 digits (codes 0..4); digits beyond a valid
# packed byte (>= 125) never occur.
_BASE5_LUT = np.stack(
    [
        np.arange(256, dtype=np.uint8) % 5,
        (np.arange(256, dtype=np.uint8) // 5) % 5,
        (np.arange(256, dtype=np.uint8) // 25) % 5,
    ],
    axis=1,
)


def _pack_traced(coding, distance, validity_code, coding_len,
                 tail_only: bool = False):
    """Traceable output packing: three base-5 coding codes per byte + an
    8-byte tail (distance LE32, validity code, coding length LE24) so the
    host fetches ONE uint8 array per step. tail_only skips the sequence
    bytes entirely — the SNP fast path's coding strings reconstruct
    host-side from the capture tensors (the sequence dominated the packed
    transfer: ~1 kB/record vs 8 B of tail on the remote tunnel)."""
    import jax.numpy as jnp

    d = distance.astype(jnp.uint32)
    cl = coding_len.astype(jnp.uint32)
    tail = jnp.stack(
        [
            (d & 255).astype(jnp.uint8),
            ((d >> 8) & 255).astype(jnp.uint8),
            ((d >> 16) & 255).astype(jnp.uint8),
            ((d >> 24) & 255).astype(jnp.uint8),
            validity_code.astype(jnp.uint8),
            (cl & 255).astype(jnp.uint8),
            ((cl >> 8) & 255).astype(jnp.uint8),
            ((cl >> 16) & 255).astype(jnp.uint8),
        ],
        axis=1,
    )
    if tail_only:
        return tail
    B, S = coding.shape
    c = coding.astype(jnp.uint8)
    if S % 3:
        c = jnp.pad(c, ((0, 0), (0, 3 - S % 3)))
    # base-5 packing: three codes (0..4, N included) per byte.
    nib = c[:, 0::3] + 5 * c[:, 1::3] + 25 * c[:, 2::3]
    return jnp.concatenate([nib, tail], axis=1)


def _pack_outputs(coding, distance, validity_code, coding_len,
                  tail_only: bool = False):
    """Jitted wrapper around _pack_traced (single-step dispatch path)."""
    fn = _JIT_HELPERS.get("pack")
    if fn is None:
        import jax

        fn = _JIT_HELPERS["pack"] = jax.jit(
            _pack_traced, static_argnames=("tail_only",)
        )
    return fn(coding, distance, validity_code, coding_len,
              tail_only=tail_only)


def _link_rate_mb_s() -> float:
    """Measured device->host rate of the attached device link (MB/s),
    probed ONCE per process (a 0.5 MB round trip). The remote tunnel's
    rate swings >10x day to day; the pooled mutate program picks its
    indel payload mode (ship packed sequences vs 8-byte tails + host
    reconstruction) from this number."""
    rate = _JIT_HELPERS.get("link_rate")
    if rate is None:
        import time

        import jax
        import jax.numpy as jnp

        probe = jax.device_put(jnp.zeros((512, 1024), jnp.uint8))
        np.asarray(probe)  # warm / force placement
        t0 = time.perf_counter()
        np.asarray(probe + jnp.uint8(1))
        rate = 0.5 / max(time.perf_counter() - t0, 1e-6)
        _JIT_HELPERS["link_rate"] = rate
    return rate


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

    def _indel_step(self, transcript: TranscriptionSequence, K: int, A: int,
                    band_k: int):
        """Jitted general SNP+indel device step for this transcript geometry
        (cached per slot-shape + band)."""
        key = ("indel", transcript.transcript_id, transcript.start,
               transcript.end, K, A, band_k)
        step = self._step_cache.get(key)
        if step is None:
            import jax

            from ..ops.pipeline import make_indel_forward_step

            region = self.contig_ref.subsequence(transcript.interval).codes
            step = make_indel_forward_step(
                region,
                transcript.exon_arrays(),
                region_start=transcript.start,
                reverse_strand=transcript.strand is StrandSense.REVERSE,
                table_name=self.contig_ref.coding_table.name,
                use_pallas=jax.default_backend() in ("tpu", "axon"),
                pad_coding=K * A,
                band_k=band_k,
            )
            self._step_cache[key] = step
        return step

    def _device_dispatch(self, batch: BatchCapture,
                         transcript: TranscriptionSequence):
        """Dispatch the forward step + on-device output packing for one
        transcript. Returns the packed uint8 device handle: coding base-5
        (3 codes/byte) plus distance/validity/length tail — ONE
        device->host transfer per step instead of three (the tunnel
        round-trip, not compute, dominated the e2e path)."""
        import jax.numpy as jnp

        step = self._forward_step(transcript)
        out = step(batch.positions, batch.alt_codes, batch.valid)
        coding_len = jnp.full(
            out.distance.shape, out.mutated_coding.shape[1], jnp.int32
        )
        return _pack_outputs(out.mutated_coding, out.distance,
                             out.validity_code, coding_len, True)

    def _device_dispatch_indel(self, batch, transcript: TranscriptionSequence):
        """Dispatch the general SNP+indel step for one transcript."""
        K = batch.pos.shape[1]
        A = batch.ins_codes.shape[2]
        band_k = (
            31 if batch.edit_bound <= 31
            else 63 if batch.edit_bound <= 63
            else (127 if batch.edit_bound <= 127 else 0)
        )
        step = self._indel_step(transcript, K, A, band_k)
        out = step(batch.pos, batch.kind, batch.del_len, batch.ins_codes,
                   batch.ins_len, batch.alt_code, batch.valid)
        return _pack_outputs(out.mutated_coding, out.distance,
                             out.validity_code, out.coding_len, True)

    def _pooled_program(self, specs, transcripts):
        """ONE jitted program running every transcript's snp/indel forward
        step back to back, packing each step's outputs and concatenating
        them on device. On a remote-attached device (the axon tunnel) each
        program execution costs ~30 ms of launch/round-trip overhead
        regardless of compute, so collapsing T transcripts x 2 steps + the
        concat from 2T+1 executions into ONE is the difference between the
        product path being overhead-bound and compute-bound (the reference
        instead loops transcripts around a thread pool,
        kga_analysis_lib_seqmutation.cpp:26-55).

        specs: tuple of ("snp"|"indel", transcript_key, geometry...) — the
        cache key; transcripts: parallel list of TranscriptionSequence used
        only on a cache miss. The jitted program is cached ON the contig
        object so a fresh MutateGenes per pass (the product pattern) still
        reuses the traced executable. Returns fn(*flat_inputs) ->
        (Bmax, sum(widths)) uint8.
        """
        cache = self.contig_ref.__dict__.setdefault("_pooled_step_cache", {})
        key = ("pooled", self.contig_ref.coding_table.name, specs)
        hit = cache.get(key)
        if hit is not None:
            return hit
        import jax
        import jax.numpy as jnp

        from ..ops.pipeline import _forward, _forward_indel
        from ..sequence.alphabet import DNA5, AminoAcid
        from ..sequence.tables import amino_translation_table

        table = amino_translation_table(self.contig_ref.coding_table.name)
        amino_lut = jnp.asarray(table.amino_lut, dtype=jnp.uint8)
        complement_lut = jnp.asarray(DNA5.COMPLEMENT, dtype=jnp.uint8)
        start_codes = jnp.asarray(
            np.unique(table.amino_lut[table.start_lut]), dtype=jnp.uint8
        )
        use_pallas = jax.default_backend() in ("tpu", "axon")

        # Per-step geometry constants, resolved once at build time.
        consts = []
        for spec, transcript in zip(specs, transcripts):
            which, _tx_id, start, end, *extra = spec
            region = jnp.asarray(
                self.contig_ref.subsequence(transcript.interval).codes,
                dtype=jnp.uint8,
            )
            exon_intervals = np.asarray(transcript.exon_arrays(), np.int64)
            reverse = transcript.strand is StrandSense.REVERSE
            if which == "snp":
                exon_lens = tuple(
                    int(hi - lo) for lo, hi in exon_intervals
                )
                exon_starts = jnp.asarray(
                    exon_intervals[:, 0] - transcript.start, dtype=jnp.int32
                )
                consts.append((region, exon_starts, exon_lens, reverse))
            else:
                exon_bounds = np.asarray(
                    [
                        (int(lo - transcript.start), int(hi - transcript.start))
                        for lo, hi in exon_intervals
                    ],
                    dtype=np.int64,
                )
                pad_coding, band_k, tail_only = extra
                consts.append((region, exon_bounds, reverse, pad_coding,
                               band_k, tail_only))

        n_inputs = [3 if s[0] == "snp" else 7 for s in specs]

        def program(*flat):
            packed = []
            it = iter(flat)
            for spec, cst in zip(specs, consts):
                if spec[0] == "snp":
                    region, exon_starts, exon_lens, reverse = cst
                    pos, alt, valid = next(it), next(it), next(it)
                    out = _forward(
                        region, exon_starts, exon_lens, reverse,
                        pos, alt, valid, amino_lut, complement_lut,
                        AminoAcid.STOP, start_codes, use_pallas=use_pallas,
                    )
                    cl = jnp.full(
                        out.distance.shape, out.mutated_coding.shape[1],
                        jnp.int32,
                    )
                    # SNP steps ship tails only; strings reconstruct
                    # host-side (_reconstruct_snp_codes).
                    packed.append(
                        _pack_traced(out.mutated_coding, out.distance,
                                     out.validity_code, cl, tail_only=True)
                    )
                else:
                    (region, exon_bounds, reverse, pad_coding, band_k,
                     tail_only) = cst
                    args = [next(it) for _ in range(7)]
                    out = _forward_indel(
                        region, exon_bounds, reverse, *args,
                        amino_lut, complement_lut, AminoAcid.STOP,
                        start_codes, pad_coding, band_k, use_pallas,
                    )
                    packed.append(
                        _pack_traced(out.mutated_coding, out.distance,
                                     out.validity_code, out.coding_len,
                                     tail_only=tail_only)
                    )
            bmax = max(p.shape[0] for p in packed)
            return jnp.concatenate(
                [
                    jnp.pad(p, ((0, bmax - p.shape[0]), (0, 0)))
                    if p.shape[0] < bmax else p
                    for p in packed
                ],
                axis=1,
            )

        hit = (jax.jit(program), n_inputs)
        cache[key] = hit
        return hit

    def _reconstruct_snp_codes(
        self, batch: BatchCapture, transcript: TranscriptionSequence,
    ) -> np.ndarray:
        """Host-side coding codes for the SNP fast path: the device sends
        only the 8-byte tails; the mutant sequences re-derive from the
        reference coding plus the capture tensors (region-relative SNP
        positions mapped through the exon layout / strand) — byte-exact
        with the device scatter+splice (apply -> splice -> complement)."""
        from ..sequence.alphabet import DNA5

        n_dev = len(batch.genome_ids)
        ref_codes = self.contig_ref.coding_sequence(transcript).codes
        S = len(ref_codes)
        reverse = transcript.strand is StrandSense.REVERSE
        L = transcript.end - transcript.start
        cmap = np.full(L, -1, np.int64)
        cs = 0
        for lo, hi in np.asarray(transcript.exon_arrays(), np.int64):
            lo_r, hi_r = int(lo - transcript.start), int(hi - transcript.start)
            cmap[lo_r:hi_r] = cs + np.arange(hi_r - lo_r)
            cs += hi_r - lo_r
        pos = batch.positions[:n_dev].astype(np.int64)
        alt = batch.alt_codes[:n_dev]
        ok = batch.valid[:n_dev] & (pos >= 0) & (pos < L)
        cpos = np.where(ok, cmap[np.clip(pos, 0, L - 1)], -1)
        ok &= cpos >= 0
        codes_v = alt
        if reverse:
            cpos = np.where(ok, S - 1 - cpos, -1)
            codes_v = DNA5.COMPLEMENT[alt]
        out = np.repeat(ref_codes[None, :], n_dev, axis=0)
        b_idx, k_idx = np.nonzero(ok)
        out[b_idx, cpos[b_idx, k_idx]] = codes_v[b_idx, k_idx]
        return out

    def _device_collect(
        self, packed: np.ndarray, batch: BatchCapture,
        transcript: TranscriptionSequence, coding_len: int,
        stats: MutateStats,
    ) -> List[TranscriptMutateRecord]:
        """Unpack one transcript's fetched outputs into records (vectorized
        strings + validity; no per-genome sequence objects). Tail-only
        payloads (8 columns) reconstruct the coding strings host-side."""
        from ..sequence.alphabet import DNA5

        n_dev = len(batch.genome_ids)
        S = coding_len
        packed = packed[:n_dev]
        if packed.shape[1] == 8:
            codes = self._reconstruct_snp_codes(batch, transcript)
        else:
            nib = packed[:, : (S + 2) // 3]
            # base-5 unpack via one (256, 3) LUT gather.
            codes = _BASE5_LUT[nib].reshape(n_dev, -1)[:, :S]
        tail = packed[:, -8:]
        distance = (
            tail[:, 0].astype(np.int64)
            | (tail[:, 1].astype(np.int64) << 8)
            | (tail[:, 2].astype(np.int64) << 16)
            | (tail[:, 3].astype(np.int64) << 24)
        )
        if transcript.coding_type is TranscriptionSequenceType.NCRNA:
            validities = [CodingSequenceValidity.NCRNA] * n_dev
        elif S % 3 != 0:
            validities = [CodingSequenceValidity.NOT_MOD3] * n_dev
        else:
            validities = [_VALIDITY_BY_CODE[c] for c in tail[:, 4]]

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
        char_buf = DNA5.CODE_TO_CHAR[codes].tobytes()
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

    def _reconstruct_indel_codes(
        self, batch, transcript: TranscriptionSequence,
    ) -> np.ndarray:
        """Host replay of the device indel apply for tail-only payloads
        (ops/pipeline.py reconstruct_indel_coding_host)."""
        from ..ops.pipeline import reconstruct_indel_coding_host

        n_dev = len(batch.genome_ids)
        region = self.contig_ref.subsequence(transcript.interval).codes
        exon_bounds = np.asarray(
            [
                (int(lo - transcript.start), int(hi - transcript.start))
                for lo, hi in np.asarray(transcript.exon_arrays(), np.int64)
            ],
            np.int64,
        )
        K = batch.pos.shape[1]
        A = batch.ins_codes.shape[2]
        codes, _lens = reconstruct_indel_coding_host(
            region, exon_bounds,
            transcript.strand is StrandSense.REVERSE,
            batch.pos[:n_dev], batch.kind[:n_dev],
            batch.del_len[:n_dev], batch.ins_codes[:n_dev],
            batch.ins_len[:n_dev], batch.alt_code[:n_dev],
            batch.valid[:n_dev], pad_coding=K * A,
        )
        return codes

    def _device_collect_indel(
        self, packed: np.ndarray, batch, transcript: TranscriptionSequence,
        stats: MutateStats, recon: Optional[np.ndarray] = None,
    ) -> List[TranscriptMutateRecord]:
        """Unpack the general step's outputs (variable coding lengths)."""
        from ..sequence.alphabet import DNA5

        n_dev = len(batch.genome_ids)
        packed = packed[:n_dev]
        if packed.shape[1] == 8:
            codes = recon if recon is not None \
                else self._reconstruct_indel_codes(batch, transcript)
        else:
            nib = packed[:, :-8]
            codes = _BASE5_LUT[nib].reshape(n_dev, -1)
        W = codes.shape[1]
        tail = packed[:, -8:]
        distance = (
            tail[:, 0].astype(np.int64)
            | (tail[:, 1].astype(np.int64) << 8)
            | (tail[:, 2].astype(np.int64) << 16)
            | (tail[:, 3].astype(np.int64) << 24)
        )
        lens = (
            tail[:, 5].astype(np.int64)
            | (tail[:, 6].astype(np.int64) << 8)
            | (tail[:, 7].astype(np.int64) << 16)
        )
        if transcript.coding_type is TranscriptionSequenceType.NCRNA:
            validities = [CodingSequenceValidity.NCRNA] * n_dev
        else:
            validities = [_VALIDITY_BY_CODE[c] for c in tail[:, 4]]

        k_counts = batch.k_counts[:n_dev]
        stats.total_variants += int(k_counts.sum())
        stats.total_snp += int(batch.hetero_counts[:n_dev].sum())
        stats.total_frameshift += int(batch.frameshift_counts[:n_dev].sum())
        stats.mutant_genomes += int(np.count_nonzero(k_counts))
        n_valid = sum(
            1 for v in validities if CodingSequenceValidity.valid_sequence(v)
        )
        stats.valid_proteins += n_valid
        stats.invalid_proteins += n_dev - n_valid

        char_buf = DNA5.CODE_TO_CHAR[codes].tobytes()
        gene_id = transcript.gene.feature_id
        tx_id = transcript.transcript_id
        records: List[TranscriptMutateRecord] = []
        for i, genome_id in enumerate(batch.genome_ids):
            records.append(
                TranscriptMutateRecord(
                    genome_id, gene_id, tx_id, int(k_counts[i]),
                    char_buf[i * W : i * W + int(lens[i])].decode("ascii"),
                    validities[i], distance=int(distance[i]),
                )
            )
        return records

    def _device_mutate_batch(
        self, batch: BatchCapture, transcript: TranscriptionSequence,
        stats: MutateStats,
    ) -> List[TranscriptMutateRecord]:
        """One batched forward step for all SNP-only genomes: dispatch,
        single packed fetch, vectorized unpack."""
        coding_len = transcript.coding_nucleotides()
        packed_dev = self._device_dispatch(batch, transcript)
        packed = np.asarray(packed_dev, dtype=np.uint8)
        return self._device_collect(packed, batch, transcript, coding_len, stats)

    def _capture(
        self, population: PopulationDB, transcript: TranscriptionSequence,
        use_device: bool,
    ):
        """Capture split for one transcript: (snp batch | None,
        indel batch | None, empty ids, host ids). The general indel device
        route applies only under the DEFAULT filter (other filter types
        change indel selection; indel genomes then take the host oracle)."""
        contig_id = self.contig_ref.contig_id
        if use_device:
            default_filter = (
                self.filter_type is SeqVariantFilterType.DEFAULT_SEQ_FILTER
            )
            try:
                if default_filter:
                    snp_batch, indel_batch = capture_population_split(
                        population, contig_id, transcript.interval,
                        region_start=transcript.start,
                        k_bucket=self.k_bucket, b_bucket=self.b_bucket,
                    )
                else:
                    snp_batch = capture_population_batch(
                        population, contig_id, transcript.interval,
                        region_start=transcript.start,
                        k_bucket=self.k_bucket, b_bucket=self.b_bucket,
                    )
                    indel_batch = None
            except ValueError:
                # bucket too small: grow to the next power of two
                if default_filter:
                    snp_batch, indel_batch = capture_population_split(
                        population, contig_id, transcript.interval,
                        region_start=transcript.start,
                    )
                else:
                    snp_batch = capture_population_batch(
                        population, contig_id, transcript.interval,
                        region_start=transcript.start,
                    )
                    indel_batch = None
            return (snp_batch, indel_batch, snp_batch.empty_genome_ids,
                    snp_batch.host_genome_ids)
        empty_ids, host_ids = [], []
        for genome_id, genome in population:
            contig_db = genome.get_contig(contig_id)
            if contig_db is None or contig_db.variant_count() == 0:
                empty_ids.append(genome_id)
            else:
                host_ids.append(genome_id)
        return None, None, empty_ids, host_ids

    def mutate_transcripts(
        self, population: PopulationDB,
        transcripts: List[TranscriptionSequence],
        use_device: Optional[bool] = None,
        timings: Optional[Dict[str, float]] = None,
    ) -> List[Tuple[List[TranscriptMutateRecord], MutateStats]]:
        """Mutate several transcripts in one device round-trip: every
        transcript's snp/indel forward step runs inside ONE pooled jitted
        program whose packed outputs cross the host link as ONE transfer
        (each program execution costs ~30 ms of launch overhead on a
        remote-attached device), then records materialise per transcript.
        The reference equivalent loops transcripts serially around its
        thread pool (kga_analysis_lib_seqmutation.cpp:26-55).

        timings (optional dict) accumulates per-stage wall seconds:
        capture_s / dispatch_s / fetch_s / unpack_s, and n_device_fetches.
        """
        import time as _time

        if use_device is None:
            use_device = self.use_device
        if timings is None:
            timings = {}
        timings.setdefault("capture_s", 0.0)
        timings.setdefault("dispatch_s", 0.0)
        timings.setdefault("fetch_s", 0.0)
        timings.setdefault("unpack_s", 0.0)
        timings.setdefault("n_device_fetches", 0)
        _t0 = _time.perf_counter()
        contig_id = self.contig_ref.contig_id
        preps = []
        steps = []  # (prep_index, which, transcript, batch)
        for transcript in transcripts:
            dev = use_device and transcript.coding_nucleotides() >= 3
            snp_batch, indel_batch, empty_ids, host_ids = self._capture(
                population, transcript, dev
            )
            stats = MutateStats()
            stats.total_genomes = population.genome_count()
            i = len(preps)
            if snp_batch is not None and snp_batch.genome_ids:
                steps.append((i, "snp", transcript, snp_batch))
            if indel_batch is not None and indel_batch.genome_ids:
                steps.append((i, "indel", transcript, indel_batch))
            preps.append(
                (transcript, snp_batch, indel_batch, empty_ids, host_ids, stats)
            )

        timings["capture_s"] += _time.perf_counter() - _t0

        # ONE pooled program for every step, ONE fetch (see _pooled_program).
        _t0 = _time.perf_counter()
        fetched: Dict[Tuple[int, str], np.ndarray] = {}
        if steps:
            specs, step_txs, flat_inputs, widths = [], [], [], []
            for _i, which, tx, b in steps:
                if which == "snp":
                    specs.append(("snp", tx.transcript_id, tx.start, tx.end))
                    flat_inputs += [b.positions, b.alt_codes, b.valid]
                    widths.append(8)  # tail-only: strings rebuild host-side
                else:
                    K, A = b.pos.shape[1], b.ins_codes.shape[2]
                    pad_c = ((max(K * A, 3) + 2) // 3) * 3
                    band_k = (
                        31 if b.edit_bound <= 31
                        else 63 if b.edit_bound <= 63
                        else (127 if b.edit_bound <= 127 else 0)
                    )
                    # Payload mode: on a slow link the ~1 kB/record packed
                    # sequence dominates the fetch, so ship 8-byte tails
                    # and replay the apply in numpy; on a healthy link the
                    # transfer is cheaper than the replay.
                    tail_only = _link_rate_mb_s() < 40.0
                    specs.append(("indel", tx.transcript_id, tx.start, tx.end,
                                  pad_c, band_k, tail_only))
                    flat_inputs += [b.pos, b.kind, b.del_len, b.ins_codes,
                                    b.ins_len, b.alt_code, b.valid]
                    if tail_only:
                        widths.append(8)
                    else:
                        s_pad = (
                            (tx.coding_nucleotides() + pad_c + 2) // 3
                        ) * 3
                        widths.append(s_pad // 3 + 8)
                step_txs.append(tx)
            fn, _n_inputs = self._pooled_program(tuple(specs), step_txs)
            handle = fn(*flat_inputs)
            _t1 = _time.perf_counter()
            timings["dispatch_s"] += _t1 - _t0
            # Tail-only indel steps: kick the coding-string replay onto
            # host threads NOW — the device fetch below blocks in
            # np.asarray with the GIL released, so the numpy replay runs
            # INSIDE the fetch wait instead of after it.
            recon_jobs = [
                (i, tx, b)
                for spec, (i, which, tx, b) in zip(specs, steps)
                if which == "indel" and spec[-1] is True
            ]
            rpool = None
            futs = {}
            if recon_jobs:
                from ..parallel.host_pipeline import WorkflowThreads

                rpool = WorkflowThreads(
                    WorkflowThreads.default_threads(len(recon_jobs))
                )
                futs = {
                    i: rpool.enqueue_future(
                        self._reconstruct_indel_codes, b, tx
                    )
                    for i, tx, b in recon_jobs
                }
            fused = np.asarray(handle, dtype=np.uint8)
            timings["fetch_s"] += _time.perf_counter() - _t1
            timings["n_device_fetches"] += 1
            self._recon_cache = {i: f.result() for i, f in futs.items()}
            if rpool is not None:
                rpool.shutdown()
            assert fused.shape[1] == sum(widths), (fused.shape, widths)
            offsets = np.cumsum([0] + widths)
            for j, (i, which, _tx, _b) in enumerate(steps):
                fetched[(i, which)] = fused[:, offsets[j] : offsets[j + 1]]
        else:
            timings["dispatch_s"] += _time.perf_counter() - _t0

        _t0 = _time.perf_counter()
        # One pool shared by every transcript's host-exact fallback batch
        # (the reference's thread-per-genome pool,
        # kga_analysis_lib_seqmutation.cpp:116-140) — spawned lazily on the
        # first transcript that needs it, shut down once at the end.
        pool = None
        results = []
        for i, (transcript, snp_batch, indel_batch, empty_ids, host_ids,
                stats) in enumerate(preps):
            by_id: Dict[str, TranscriptMutateRecord] = {}
            reference_coding = self.contig_ref.coding_sequence(
                transcript
            ).to_string()
            ref_validity = self.contig_ref.check_valid_transcript(transcript)
            for genome_id in empty_ids:
                by_id[genome_id] = TranscriptMutateRecord(
                    genome_id, transcript.gene.feature_id,
                    transcript.transcript_id, 0, reference_coding, ref_validity,
                )
            if len(host_ids) >= 8:
                # Pool the host-exact fallback; each task gets a private
                # MutateStats, reduced below (thread-safe without locks).
                from ..parallel.host_pipeline import WorkflowThreads

                if pool is None:
                    pool = WorkflowThreads(
                        WorkflowThreads.default_threads(len(host_ids))
                    )
                futures = []
                for genome_id in host_ids:
                    contig_db = population.get_genome(genome_id).get_contig(
                        contig_id
                    )
                    local = MutateStats()
                    futures.append((genome_id, local, pool.enqueue_future(
                        self._host_mutate, genome_id, contig_db, transcript,
                        local,
                    )))
                for genome_id, local, fut in futures:
                    by_id[genome_id] = fut.result()
                    for f in (
                        "mutant_genomes", "total_variants", "total_snp",
                        "total_frameshift", "duplicate_variants",
                        "upstream_deleted", "valid_proteins",
                        "invalid_proteins",
                    ):
                        setattr(stats, f, getattr(stats, f) + getattr(local, f))
            else:
                for genome_id in host_ids:
                    contig_db = population.get_genome(genome_id).get_contig(
                        contig_id
                    )
                    by_id[genome_id] = self._host_mutate(
                        genome_id, contig_db, transcript, stats
                    )
            if (i, "snp") in fetched:
                for rec in self._device_collect(
                    fetched[(i, "snp")], snp_batch, transcript,
                    transcript.coding_nucleotides(), stats,
                ):
                    by_id[rec.genome_id] = rec
            if (i, "indel") in fetched:
                for rec in self._device_collect_indel(
                    fetched[(i, "indel")], indel_batch, transcript, stats,
                    recon=getattr(self, "_recon_cache", {}).get(i),
                ):
                    by_id[rec.genome_id] = rec
            results.append(([by_id[g] for g in sorted(by_id)], stats))
        if pool is not None:
            pool.shutdown()
        timings["unpack_s"] += _time.perf_counter() - _t0
        return results

    def mutate_transcript(
        self, population: PopulationDB, transcript: TranscriptionSequence,
        use_device: Optional[bool] = None,
    ) -> Tuple[List[TranscriptMutateRecord], MutateStats]:
        return self.mutate_transcripts(
            population, [transcript], use_device=use_device
        )[0]


class TranscriptFamilyAnalysis:
    """Per-transcript-family distance statistics and UPGMA trees
    (AnalysisTranscriptFamily / GenomeTranscriptAnalysis).

    metric: "global" (NW, the default) or "local" (infix / edlib HW mode,
    the Pf gene-family metric — kga_analysis_lib_Pfgene.cpp consumes
    LevenshteinLocalCodingView, kgl_sequence_distance_impl.h:49-122)."""

    def __init__(self, records: List[TranscriptMutateRecord],
                 reference_coding: str, metric: str = "global"):
        self.records = records
        self.reference_coding = reference_coding
        self.metric = metric

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
        """Distance of each distinct mutant vs the reference coding
        (batched device kernel; global NW or local infix per self.metric)."""
        from ..ops.edit_distance import (
            batched_levenshtein,
            batched_levenshtein_local,
        )

        distinct = list(self.distinct_sequences())
        if not distinct:
            return {}
        width = max(len(self.reference_coding), max(len(s) for s in distinct), 1)
        seqs, lens = self._padded_codes(distinct + [self.reference_coding])
        n = len(distinct)
        ref_seq = np.repeat(seqs[-1:], n, axis=0)
        ref_len = np.repeat(lens[-1:], n)
        kernel = (
            batched_levenshtein_local if self.metric == "local"
            else batched_levenshtein
        )
        distances = np.asarray(kernel(seqs[:n], lens[:n], ref_seq, ref_len))
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
        if self.metric == "local":
            # all-pairs infix distance through the batched local kernel
            from ..ops.edit_distance import batched_levenshtein_local

            n = len(sequences)
            iu, ju = np.triu_indices(n, k=1)
            d = np.asarray(
                batched_levenshtein_local(seqs[iu], lens[iu], seqs[ju], lens[ju])
            )
            matrix = np.zeros((n, n), dtype=np.float64)
            matrix[iu, ju] = d
            matrix[ju, iu] = d
        else:
            # On the chip, route through the device-resident banded pair
            # pool (ops/edit_distance band_k path): transcript-family
            # members differ by bounded edit counts, and pairs overflowing
            # the band re-run through the exact adaptive path, so this is
            # a pure routing choice.
            import jax

            band_k = 127 if jax.default_backend() in ("tpu", "axon") else None
            matrix = pairwise_distance_matrix(seqs, lens, band_k=band_k)
        tree = upgma_tree(matrix, labels)
        return newick(tree)

    def reference_cigars(self, band_k: int = 127) -> Dict[str, str]:
        """CIGAR of each distinct mutant vs the reference coding via the
        batched banded device traceback (ops/traceback.py — the batched
        counterpart of edlib's alignment path, contrib/edlib/edlib.h:96-249);
        band-overflow pairs fall back to the exact host DP."""
        from ..ops.traceback import batched_cigar

        distinct = list(self.distinct_sequences())
        if not distinct:
            return {}
        seqs, lens = self._padded_codes([self.reference_coding] + distinct)
        n = len(distinct)
        ref_seq = np.repeat(seqs[:1], n, axis=0)
        ref_len = np.repeat(lens[:1], n)
        cigars = batched_cigar(
            ref_seq, ref_len, seqs[1:], lens[1:], band_k=band_k
        )
        return dict(zip(distinct, cigars))

    def write_report(self, path: str, distances: Optional[Dict[str, int]] = None,
                     cigars: bool = False) -> None:
        distances = distances or self.reference_distances()
        cigar_map = self.reference_cigars() if cigars else {}
        with open(path, "w") as f:
            header = "Genome,Gene,Transcript,Variants,Validity,Distance,CodingLength"
            f.write(header + (",Cigar\n" if cigars else "\n"))
            for rec in self.records:
                distance = distances.get(rec.modified_coding, "")
                f.write(
                    f"{rec.genome_id},{rec.gene_id},{rec.transcript_id},"
                    f"{rec.variant_count},{rec.validity.value},{distance},"
                    f"{len(rec.modified_coding)}"
                    + (f",{cigar_map.get(rec.modified_coding, '')}\n"
                       if cigars else "\n")
                )
