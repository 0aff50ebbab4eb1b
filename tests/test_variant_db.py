"""Variant subsystem tests: VCF ingest, columnar DB, canonical forms,
filters, validation."""

import os

import numpy as np
import pytest

from kgl_gene_tpu.genome.genome import GenomeReference
from kgl_gene_tpu.io.vcf import parse_vcf_population
from kgl_gene_tpu.utils.intervals import OpenRightInterval
from kgl_gene_tpu.variant.db import PopulationDB
from kgl_gene_tpu.variant.filter import (
    ContigRegionFilter,
    DiploidFilter,
    DPCountFilter,
    FrameShiftFilter,
    GenomeListFilter,
    HomozygousFilter,
    NotFilter,
    PassFilter,
    RefAltCountFilter,
    SNPFilter,
    TrueFilter,
    UniqueUnphasedFilter,
)
from kgl_gene_tpu.variant.variant import (
    FormatData,
    Variant,
    VariantPhase,
    VariantType,
    canonicalize,
)
from kgl_gene_tpu.sequence.sequence import DNA5SequenceLinear

from fixtures import (
    CONTIG_1,
    VCF_SAMPLES,
    build_contig1,
    make_genome_files,
    vcf_variant_specs,
    write_vcf,
)


@pytest.fixture(scope="module")
def vcf_path(tmp_path_factory):
    return write_vcf(str(tmp_path_factory.mktemp("vcf") / "pop.vcf"))


@pytest.fixture(scope="module")
def population(vcf_path):
    pop, header, info = parse_vcf_population(vcf_path, "test_pop", "PF_DIPLOID")
    return pop, header, info


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    files = make_genome_files(tmp_path_factory.mktemp("genome"))
    return GenomeReference.create_genome_database(
        "ref", files["fasta"], files["gff"]
    )


class TestCanonicalize:
    def _cc(self, ref, alt, off):
        from kgl_gene_tpu.sequence.alphabet import DNA5
        r, a, o = canonicalize(DNA5.from_string(ref), DNA5.from_string(alt), off)
        return DNA5.to_string(r), DNA5.to_string(a), o

    def test_snp_already_canonical(self):
        assert self._cc("A", "T", 100) == ("A", "T", 100)

    def test_padded_snp(self):
        # ACGT > ACTT: the reference's canonicalSequences keeps the '1M'
        # anchor (prefix-1) and bounds the suffix trim, yielding CG>CT at
        # offset 11 (kgl_variant_db.cpp:178-188 semantics, reproduced).
        assert self._cc("ACGT", "ACTT", 10) == ("CG", "CT", 11)

    def test_delete(self):
        # VCF-style: ref=ATTT alt=A is already canonical (1MnD).
        assert self._cc("ATTT", "A", 5) == ("ATTT", "A", 5)
        # Padded delete: ref=CATTT alt=CA -> canonical ATTT>A at offset 6.
        assert self._cc("CATTT", "CA", 5) == ("ATTT", "A", 6)

    def test_insert(self):
        assert self._cc("A", "AGG", 7) == ("A", "AGG", 7)
        assert self._cc("TA", "TAGG", 7) == ("A", "AGG", 8)


class TestVariantSemantics:
    def test_types_and_intervals(self):
        snp = Variant(CONTIG_1, 55, VariantPhase.UNPHASED, "",
                      DNA5SequenceLinear.from_string("T"),
                      DNA5SequenceLinear.from_string("A"))
        assert snp.variant_type() is VariantType.SNP
        _, iv = snp.modify_interval()
        assert iv == OpenRightInterval(55, 56)

        dele = Variant(CONTIG_1, 107, VariantPhase.UNPHASED, "",
                       DNA5SequenceLinear.from_string("TAAA"),
                       DNA5SequenceLinear.from_string("T"))
        assert dele.variant_type() is VariantType.INDEL_DELETE
        _, iv = dele.modify_interval()
        assert iv == OpenRightInterval(108, 111)

        ins = Variant(CONTIG_1, 60, VariantPhase.UNPHASED, "",
                      DNA5SequenceLinear.from_string("C"),
                      DNA5SequenceLinear.from_string("CGGG"))
        assert ins.variant_type() is VariantType.INDEL_INSERT
        _, iv = ins.modify_interval()
        assert iv == OpenRightInterval(61, 64)
        _, mem = ins.member_interval()
        assert mem == OpenRightInterval(61, 62)

    def test_hgvs_identity(self):
        v = Variant(CONTIG_1, 55, VariantPhase.DIPLOID_PHASE_A, "rs1",
                    DNA5SequenceLinear.from_string("T"),
                    DNA5SequenceLinear.from_string("A"))
        assert v.hgvs() == f"{CONTIG_1}:g.55T>A"
        assert v.hgvs_phase().endswith(":1")
        assert v.analogous(v.clone_phase(VariantPhase.DIPLOID_PHASE_B))
        assert v.homozygous(v.clone_phase(VariantPhase.DIPLOID_PHASE_B))


class TestVCFIngest:
    def test_header(self, population):
        _, header, _ = population
        assert header.genome_names == VCF_SAMPLES
        assert header.contigs[CONTIG_1] == 400
        assert set(header.info_fields) == {"AF", "DP", "VALIDATED"}

    def test_population_counts(self, population):
        pop, _, _ = population
        # All samples are pre-created from the header (even hom-ref S3).
        assert pop.genome_count() == 4
        assert pop.get_genome("S3").variant_count() == 0
        # S1: SNP(0/1) + del(0/1) + multi(1/2 -> 2 alleles) = 4 incidences
        s1 = pop.get_genome("S1")
        assert s1.variant_count() == 4
        # unique alleles: snp, del, ins, multi x2 = 5
        assert len(pop.arena) == 5

    def test_homozygous_double_incidence(self, population):
        """1/1 genotypes add TWO identical incidences (A and B alleles are
        added independently, kgl_variant_factory_pf_impl.cpp:287,336)."""
        pop, _, _ = population
        s2 = pop.get_genome("S2")
        # S2: SNP 1/1 (two incidences) + ins 0/1 -> 3 total
        assert s2.variant_count() == 3

    def test_info_store(self, population):
        pop, _, info = population
        dp = info.float_column("DP")
        assert dp.tolist() == [100.0, 80.0, 60.0, 90.0]
        assert info.flag_column("VALIDATED").tolist() == [True, False, False, False]
        assert info.object_value("AF", 3) == [0.1, 0.05]

    def test_validate_against_reference(self, population, genome):
        pop, _, _ = population
        total, failed = pop.validate(genome)
        assert total == pop.variant_count()
        assert failed == 0

    def test_region_query(self, population):
        pop, _, _ = population
        s1_contig = pop.get_genome("S1").get_contig(CONTIG_1)
        region = s1_contig.region_variants(OpenRightInterval(50, 80))
        assert region.variant_count() == 1  # the SNP at 55
        assert region.find_at_offset(55)[0].variant_type() is VariantType.SNP


class TestFilters:
    def test_snp_filter(self, population):
        pop, _, _ = population
        snps = pop.view_filter(SNPFilter())
        for _, g in snps:
            for _, c in g:
                for v in c:
                    assert v.is_snp()
        # S1 has 3 SNP incidences (multi-allelic 2 + coding snp 1)
        assert snps.get_genome("S1").variant_count() == 3

    def test_not_filter(self, population):
        pop, _, _ = population
        non_snp = pop.view_filter(NotFilter(SNPFilter()))
        assert non_snp.variant_count() + pop.view_filter(SNPFilter()).variant_count() == pop.variant_count()

    def test_true_false(self, population):
        pop, _, _ = population
        assert pop.view_filter(TrueFilter()).variant_count() == pop.variant_count()
        assert pop.view_filter(~TrueFilter()).variant_count() == 0

    def test_dp_and_refalt(self, population):
        pop, _, _ = population
        deep = pop.view_filter(DPCountFilter(21))
        for _, g in deep:
            for _, c in g:
                for v in c:
                    assert v.format_data.dp_count >= 21
        combined = pop.view_filter(DPCountFilter(18) & RefAltCountFilter(20))
        assert combined.variant_count() <= pop.variant_count()

    def test_region_filter(self, population):
        pop, _, _ = population
        coding = pop.view_filter(ContigRegionFilter(50, 130))
        offsets = []
        coding.process_all(lambda v: offsets.append(v.offset) or True)
        assert all(50 <= o < 130 for o in offsets)

    def test_genome_list_filter(self, population):
        pop, _, _ = population
        only_s1 = pop.view_filter(GenomeListFilter(["S1"]))
        assert only_s1.genome_count() == 1

    def test_frameshift_filter(self, population):
        pop, _, _ = population
        fs = pop.view_filter(FrameShiftFilter())
        # The 3-base deletion is in-frame; the GGG insert is in-frame too.
        assert fs.variant_count() == 0

    def test_unique_unphased(self, population):
        pop, _, _ = population
        uniq = pop.view_filter(UniqueUnphasedFilter())
        # The two hom 1/1 double-incidences (S2 SNP, S4 del) collapse.
        assert uniq.variant_count() == pop.variant_count() - 2

    def test_pass_filter(self, population):
        pop, _, _ = population
        assert pop.view_filter(PassFilter()).variant_count() == pop.variant_count()


class TestSquareContigs:
    def test_square_contigs(self, population):
        pop, _, _ = population
        squared = pop.deep_copy()
        # Give one genome a private contig, then square.
        extra = squared.get_genome("S1").get_create_contig("private_ctg")
        assert squared.get_genome("S2").get_contig("private_ctg") is None
        n = squared.square_contigs()
        contig_ids = {cid for _, g in squared for cid, _ in g}
        assert n == len(contig_ids)
        for gid, genome in squared:
            for cid in contig_ids:
                assert genome.get_contig(cid) is not None
        # Squaring adds only EMPTY contigs — incidence counts unchanged.
        assert squared.variant_count() == pop.variant_count()


class TestTransforms:
    def test_compress(self, population):
        pop, _, _ = population
        compressed = pop.compress_population()
        assert compressed.genome_count() == 1
        assert compressed.variant_count() == len(pop.arena)

    def test_canonical_population(self, population):
        pop, _, _ = population
        canon = pop.canonical_population()
        ok = []
        canon.process_all(lambda v: ok.append(v.is_canonical()) or True)
        assert all(ok)
        assert canon.variant_count() == pop.variant_count()

    def test_deep_copy(self, population):
        pop, _, _ = population
        copy = pop.deep_copy()
        assert copy.variant_count() == pop.variant_count()
        assert copy.genome_count() == pop.genome_count()


class TestInfoFilters:
    def test_info_geq_filter(self, population):
        from kgl_gene_tpu.variant.filter import InfoGEQFloatFilter, P7FrequencyFilter

        pop, _, info = population
        deep = pop.view_filter(InfoGEQFloatFilter(info, "DP", 85.0))
        # Records with DP>=85: rec0 (DP=100) and rec3 (DP=90).
        offsets = set()
        deep.process_all(lambda v: offsets.add(v.offset) or True)
        assert offsets == {55, 10}
        freq = pop.view_filter(P7FrequencyFilter(info, 0.2))
        offsets = set()
        freq.process_all(lambda v: offsets.add(v.offset) or True)
        # AF >= 0.2: rec0 (0.5) and rec1 (0.25); multiallelic AF list first=0.1.
        assert offsets == {55, 107}

    def test_vep_substring_filter(self, tmp_path):
        from kgl_gene_tpu.io.vcf import InfoSchema, InfoStore
        from kgl_gene_tpu.variant.db import PopulationDB
        from kgl_gene_tpu.variant.filter import VepSubStringFilter
        from kgl_gene_tpu.variant.vep import VEPSubFields

        schemas = {"CSQ": InfoSchema("CSQ", ".", "String",
                                     "Format: Allele|Consequence|Gene")}
        store = InfoStore(schemas, ["CSQ"])
        r0 = store.add_record("CSQ=A|missense_variant|G1")
        r1 = store.add_record("CSQ=A|synonymous_variant|G2")
        pop = PopulationDB("vep")
        v0 = Variant(CONTIG_1, 5, VariantPhase.UNPHASED, "",
                     DNA5SequenceLinear.from_string("A"),
                     DNA5SequenceLinear.from_string("T"), info_index=r0)
        v1 = Variant(CONTIG_1, 9, VariantPhase.UNPHASED, "",
                     DNA5SequenceLinear.from_string("C"),
                     DNA5SequenceLinear.from_string("G"), info_index=r1)
        pop.add_variant(v0, ["G"])
        pop.add_variant(v1, ["G"])
        vep = VEPSubFields(store)
        filtered = pop.view_filter(VepSubStringFilter(vep, "Consequence", "missense"))
        assert filtered.variant_count() == 1
        kept = []
        filtered.process_all(lambda v: kept.append(v.offset) or True)
        assert kept == [5]
