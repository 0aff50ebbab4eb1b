"""Transcript capture layer: device routing parity vs the exact host path.

The oracle is the host SequenceVariantFilter + AdjustedSequence engine
(itself validated against string-surgery oracles in test_mutation.py).
The device path (mutation/capture.py + ops/pipeline.py) must produce
byte-identical records and statistics whenever it accepts a genome, and
fall back to the host engine for indels / same-offset allele conflicts.
"""

import numpy as np
import pytest

from kgl_gene_tpu.analysis.lib_seqmutation import MutateGenes
from kgl_gene_tpu.genome.genome import GenomeReference
from kgl_gene_tpu.io.vcf import parse_vcf_population
from kgl_gene_tpu.mutation.capture import (
    batch_capture_tensors,
    capture_population,
    exact_capture_reference,
    fast_snp_capture,
)
from kgl_gene_tpu.sequence.sequence import DNA5SequenceLinear
from kgl_gene_tpu.variant.db import PopulationDB
from kgl_gene_tpu.variant.variant import FormatData, Variant, VariantPhase

from fixtures import (
    CONTIG_1,
    CONTIG_2,
    build_contig1,
    build_contig2,
    make_genome_files,
    write_vcf,
)


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    files = make_genome_files(tmp_path_factory.mktemp("genome"))
    return GenomeReference.create_genome_database("ref", files["fasta"], files["gff"])


@pytest.fixture(scope="module")
def fixture_population(tmp_path_factory):
    path = write_vcf(str(tmp_path_factory.mktemp("vcf") / "pop.vcf"))
    pop, header, info = parse_vcf_population(path, "pop", "PF_DIPLOID")
    return pop, info


def _mk_variant(contig_id, pos, ref, alt):
    return Variant(
        contig_id=contig_id, offset=pos, phase=VariantPhase.UNPHASED,
        identifier="", ref=DNA5SequenceLinear.from_string(ref),
        alt=DNA5SequenceLinear.from_string(alt), format_data=FormatData(),
    )


def _synth_population(contig_id, contig_seq, span, n_genomes, seed,
                      indel_fraction=0.0):
    """Random SNP (optionally indel-salted) population over one contig."""
    rng = np.random.default_rng(seed)
    pop = PopulationDB("synth", "PF_DIPLOID")
    lo, hi = span
    for g in range(n_genomes):
        gid = f"G{g:03d}"
        pop.get_create_genome(gid)
        for _ in range(int(rng.integers(0, 6))):
            pos = int(rng.integers(lo, hi))
            ref = contig_seq[pos]
            if rng.random() < indel_fraction:
                if rng.random() < 0.5 and pos + 4 < hi:
                    v = _mk_variant(contig_id, pos, contig_seq[pos : pos + 4], ref)
                else:
                    v = _mk_variant(contig_id, pos, ref, ref + "GT")
            else:
                alt = str(rng.choice([b for b in "ACGT" if b != ref]))
                v = _mk_variant(contig_id, pos, ref, alt)
            pop.add_variant(v, [gid])
            if rng.random() < 0.3:  # homozygous second incidence
                pop.add_variant(v, [gid])
    return pop


def _has_offset_conflict(contig_db, region):
    """Two distinct modifying alleles at one offset (fast-path rejection)."""
    seen = {}
    for v in contig_db.region_variants(region):
        cv = v.clone_canonical()
        if region.lower <= cv.offset < region.upper:
            seen.setdefault(cv.offset, set()).add(cv.hgvs())
    return any(len(s) > 1 for s in seen.values())


def _transcript(genome, contig_id, gene_id, transcript_id):
    contig = genome.get_contig(contig_id)
    return contig, contig.get_transcription(gene_id, transcript_id)


def _assert_records_equal(recs_a, recs_b):
    assert len(recs_a) == len(recs_b)
    for a, b in zip(recs_a, recs_b):
        assert a.genome_id == b.genome_id
        assert a.variant_count == b.variant_count, a.genome_id
        assert a.modified_coding == b.modified_coding, a.genome_id
        assert a.validity == b.validity, a.genome_id


class TestFastCaptureOracle:
    """fast_snp_capture vs the full SequenceVariantFilter selection."""

    def test_fixture_population(self, genome, fixture_population):
        pop, info = fixture_population
        contig, transcript = _transcript(genome, CONTIG_1, "GENE1", "GENE1.1")
        checked = 0
        for gid, g in pop:
            cdb = g.get_contig(CONTIG_1)
            if cdb is None or cdb.variant_count() == 0:
                continue
            cap = fast_snp_capture(cdb, transcript.interval)
            pos, alts, stats = exact_capture_reference(cdb, transcript.interval)
            if cap is None:
                # Fast path must only reject genomes with window indels or
                # offset conflicts — the fixture genomes all carry indels.
                continue
            checked += 1
            np.testing.assert_array_equal(cap.positions, pos)
            np.testing.assert_array_equal(cap.alt_codes, alts)
            assert cap.stats == stats
        # Fixture S1/S2/S4 carry indels in the GENE1 window -> host path.
        assert checked == 0

    @pytest.mark.parametrize("seed", [3, 7, 11])
    def test_synthetic_snp_only(self, genome, seed):
        contig, transcript = _transcript(genome, CONTIG_1, "GENE1", "GENE1.1")
        pop = _synth_population(CONTIG_1, build_contig1(), (40, 140), 24, seed)
        accepted = 0
        for gid, g in pop:
            cdb = g.get_contig(CONTIG_1)
            if cdb is None or cdb.variant_count() == 0:
                continue
            cap = fast_snp_capture(cdb, transcript.interval)
            pos, alts, stats = exact_capture_reference(cdb, transcript.interval)
            if cap is None:
                # Rejection must coincide with a real conflict: two distinct
                # alleles at one offset (no indels were generated here).
                assert _has_offset_conflict(cdb, transcript.interval)
                continue
            accepted += 1
            np.testing.assert_array_equal(cap.positions, pos)
            np.testing.assert_array_equal(cap.alt_codes, alts)
            assert cap.stats == stats
        assert accepted > 5  # the fast path must actually engage


class TestDeviceHostParity:
    """MutateGenes with device routing == pure host engine, byte for byte."""

    @pytest.mark.parametrize("seed", [0, 1])
    def test_forward_gene_snp_only(self, genome, seed):
        contig, transcript = _transcript(genome, CONTIG_1, "GENE1", "GENE1.1")
        pop = _synth_population(CONTIG_1, build_contig1(), (30, 140), 20, seed)
        cap = capture_population(pop, CONTIG_1, transcript.interval)
        assert len(cap.device) > 5  # device batch actually used
        mut = MutateGenes(contig)
        recs_d, stats_d = mut.mutate_transcript(pop, transcript, use_device=True)
        recs_h, stats_h = mut.mutate_transcript(pop, transcript, use_device=False)
        _assert_records_equal(recs_d, recs_h)
        assert stats_d == stats_h
        # Device records carry the on-chip Levenshtein distance.
        dev_ids = {c.genome_id for c in cap.device}
        for rec in recs_d:
            if rec.genome_id in dev_ids:
                assert rec.distance is not None

    def test_reverse_strand_gene(self, genome):
        contig, transcript = _transcript(genome, CONTIG_2, "GENE2", "GENE2.1")
        pop = _synth_population(CONTIG_2, build_contig2(), (110, 190), 16, 5)
        cap = capture_population(pop, CONTIG_2, transcript.interval)
        assert len(cap.device) > 3
        mut = MutateGenes(contig)
        recs_d, stats_d = mut.mutate_transcript(pop, transcript, use_device=True)
        recs_h, stats_h = mut.mutate_transcript(pop, transcript, use_device=False)
        _assert_records_equal(recs_d, recs_h)
        assert stats_d == stats_h

    @pytest.mark.parametrize("seed", [2, 9])
    def test_mixed_indel_routing(self, genome, seed):
        """Indel-salted population: device + host routes mixed, still equal."""
        contig, transcript = _transcript(genome, CONTIG_1, "GENE1", "GENE1.1")
        pop = _synth_population(CONTIG_1, build_contig1(), (30, 140), 20, seed,
                                indel_fraction=0.35)
        cap = capture_population(pop, CONTIG_1, transcript.interval)
        assert cap.host_genome_ids  # some genomes must fall back
        mut = MutateGenes(contig)
        recs_d, stats_d = mut.mutate_transcript(pop, transcript, use_device=True)
        recs_h, stats_h = mut.mutate_transcript(pop, transcript, use_device=False)
        _assert_records_equal(recs_d, recs_h)
        assert stats_d == stats_h

    def test_fixture_population_end_to_end(self, genome, fixture_population):
        """The real VCF fixture through both routes (all-host fallback)."""
        pop, info = fixture_population
        contig, transcript = _transcript(genome, CONTIG_1, "GENE1", "GENE1.1")
        mut = MutateGenes(contig, info_store=info)
        recs_d, stats_d = mut.mutate_transcript(pop, transcript, use_device=True)
        recs_h, stats_h = mut.mutate_transcript(pop, transcript, use_device=False)
        _assert_records_equal(recs_d, recs_h)
        assert stats_d == stats_h


class TestBatchTensors:
    def test_bucketing_and_padding(self):
        from kgl_gene_tpu.mutation.capture import GenomeCapture

        caps = [
            GenomeCapture("a", np.array([100, 105], dtype=np.int64),
                          np.array([1, 2], dtype=np.uint8)),
            GenomeCapture("b", np.empty(0, np.int64), np.empty(0, np.uint8)),
        ]
        positions, alts, valid = batch_capture_tensors(caps, region_start=90)
        assert positions.shape == (8, 8) and valid.dtype == bool
        np.testing.assert_array_equal(positions[0, :2], [10, 15])
        assert valid[0, :2].all() and not valid[0, 2:].any()
        assert not valid[1].any() and not valid[2:].any()

    def test_bucket_too_small(self):
        from kgl_gene_tpu.mutation.capture import GenomeCapture

        caps = [GenomeCapture("a", np.arange(9, dtype=np.int64),
                              np.zeros(9, np.uint8))]
        with pytest.raises(ValueError):
            batch_capture_tensors(caps, region_start=0, k_bucket=4)


class TestBatchCaptureParity:
    """capture_population_batch vs the per-genome fast_snp_capture loop."""

    @pytest.mark.parametrize("seed", [0, 4, 13])
    @pytest.mark.parametrize("indel_fraction", [0.0, 0.3])
    def test_batch_equals_per_genome(self, genome, seed, indel_fraction):
        from kgl_gene_tpu.mutation.capture import (
            batch_capture_tensors as _bct,
            capture_population_batch,
        )

        contig, transcript = _transcript(genome, CONTIG_1, "GENE1", "GENE1.1")
        pop = _synth_population(CONTIG_1, build_contig1(), (30, 140), 24, seed,
                                indel_fraction=indel_fraction)
        per = capture_population(pop, CONTIG_1, transcript.interval)
        batch = capture_population_batch(
            pop, CONTIG_1, transcript.interval, region_start=transcript.start
        )
        assert batch.genome_ids == [c.genome_id for c in per.device]
        assert sorted(batch.host_genome_ids) == sorted(per.host_genome_ids)
        assert sorted(batch.empty_genome_ids) == sorted(per.empty_genome_ids)
        if per.device:
            pos, alts, valid = _bct(
                per.device, region_start=transcript.start,
                k_bucket=batch.positions.shape[1],
                b_bucket=batch.positions.shape[0],
            )
            np.testing.assert_array_equal(batch.positions, pos)
            np.testing.assert_array_equal(batch.alt_codes, alts)
            np.testing.assert_array_equal(batch.valid, valid)
            np.testing.assert_array_equal(
                batch.k_counts, [c.variant_count for c in per.device]
            )
            np.testing.assert_array_equal(
                batch.hetero_counts,
                [c.stats.total_snp_variants for c in per.device],
            )

    def test_index_cache_invalidation(self, genome):
        from kgl_gene_tpu.mutation.capture import PopulationContigIndex

        contig, transcript = _transcript(genome, CONTIG_1, "GENE1", "GENE1.1")
        pop = _synth_population(CONTIG_1, build_contig1(), (30, 140), 8, 1)
        idx1 = PopulationContigIndex.get(pop, CONTIG_1)
        assert PopulationContigIndex.get(pop, CONTIG_1) is idx1  # cached
        seq = build_contig1()
        pop.add_variant(_mk_variant(CONTIG_1, 50, seq[50], "A" if seq[50] != "A" else "C"),
                        ["G000"])
        idx2 = PopulationContigIndex.get(pop, CONTIG_1)
        assert idx2 is not idx1
        assert idx2.incidence_count == idx1.incidence_count + 1


class TestAminoBatchValidity:
    """check_valid_amino_batch vs the scalar validity classifier."""

    def test_parity_random(self, genome):
        from kgl_gene_tpu.sequence.alphabet import AminoAcid
        from kgl_gene_tpu.sequence.sequence import AminoSequence

        contig = genome.get_contig(CONTIG_1)
        rng = np.random.default_rng(0)
        B, M = 64, 12
        amino = rng.integers(0, 22, size=(B, M)).astype(np.uint8)
        # salt in valid rows: start amino + body + stop
        starts = np.fromiter(contig._start_aminos(), dtype=np.uint8)
        for i in range(0, B, 3):
            amino[i, 0] = starts[0]
            amino[i, 1:-1] = 1  # no stop in body
            amino[i, -1] = AminoAcid.STOP
        batch = contig.check_valid_amino_batch(amino, M * 3)
        for i in range(B):
            scalar = contig.check_valid_protein_sequence(AminoSequence(amino[i]))
            assert batch[i] is scalar, i

    def test_not_mod3(self, genome):
        contig = genome.get_contig(CONTIG_1)
        from kgl_gene_tpu.genome.features import CodingSequenceValidity

        out = contig.check_valid_amino_batch(np.zeros((4, 5), np.uint8), 16)
        assert out == [CodingSequenceValidity.NOT_MOD3] * 4
