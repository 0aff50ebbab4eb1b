"""Frozen expected-value oracle corpus (VERDICT r3 missing #4).

The reference's de-facto oracle is real data plus HARD-CODED expected
constants (kol_ontology/unit_test/kol_test_data.h:12-50: literal
similarity values checked with BOOST_CHECK_CLOSE). This module imports
that strategy wholesale: every input byte below is a LITERAL frozen in
this file, and every expectation — mutated coding strings, protein,
validity, edit distances, CIGARs, allele counts, het/hom tallies — is a
hand-computed literal, NOT derived by running the code under test.

Dataset: one 120 bp contig, a 2-exon forward gene (60 nt coding,
20 codons M A E F G H K L M N P Q R S T V W Y I *), three diploid
samples carrying a het SNP, a hom SNP and a 2-base insertion.
"""

import os

import numpy as np
import pytest

from kgl_gene_tpu.genome.features import CodingSequenceValidity
from kgl_gene_tpu.genome.genome import GenomeReference
from kgl_gene_tpu.io.vcf import parse_vcf_population

# ---------------------------------------------------------------------------
# frozen inputs (every byte literal)
# ---------------------------------------------------------------------------
CONTIG = "ORACLE_1"
EXON1 = "ATGGCCGAATTCGGACATAAACTGATGAAC"   # codons 1-10: M A E F G H K L M N
EXON2 = "CCGCAGCGTAGCACCGTTTGGTACATCTAA"   # codons 11-20: P Q R S T V W Y I *
SEQUENCE = "T" * 10 + EXON1 + "G" * 10 + EXON2 + "C" * 40  # 120 bp

FASTA = f">{CONTIG} frozen oracle contig\n{SEQUENCE}\n"

GFF3 = "\n".join([
    "##gff-version 3",
    f"{CONTIG}\toracle\tgene\t11\t80\t.\t+\t.\tID=OG1;Name=oracle_gene",
    f"{CONTIG}\toracle\tmRNA\t11\t80\t.\t+\t.\tID=OG1.1;Parent=OG1",
    f"{CONTIG}\toracle\tCDS\t11\t40\t.\t+\t0\tID=OG1.1.CDS;Parent=OG1.1",
    f"{CONTIG}\toracle\tCDS\t51\t80\t.\t+\t0\tID=OG1.1.CDS;Parent=OG1.1",
]) + "\n"

# POS 14 (0-based 13) = coding index 3: codon 2 GCC -> TCC (Ala -> Ser).
# POS 20 (0-based 19) = coding index 9: TAG inserts "AG" after it.
# POS 100 (0-based 99) sits in the C tail, outside the gene entirely.
VCF = "\n".join([
    "##fileformat=VCFv4.2",
    f"##contig=<ID={CONTIG},length=120>",
    '##INFO=<ID=AF,Number=A,Type=Float,Description="af">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">',
    '##FORMAT=<ID=AD,Number=R,Type=Integer,Description="ad">',
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3",
    f"{CONTIG}\t14\trsSNP\tG\tT\t60\tPASS\tAF=0.5\tGT:AD\t0/1:5,5\t1/1:0,9\t0/0:9,0",
    f"{CONTIG}\t20\trsINS\tT\tTAG\t60\tPASS\tAF=0.17\tGT:AD\t0/0:8,0\t0/0:7,0\t0/1:6,4",
    f"{CONTIG}\t100\trsTAIL\tC\tA\t60\tPASS\tAF=0.17\tGT:AD\t0/1:4,4\t0/0:9,0\t0/0:9,0",
]) + "\n"

# ---------------------------------------------------------------------------
# frozen expectations (hand-computed literals)
# ---------------------------------------------------------------------------
REF_CODING = EXON1 + EXON2
PROTEIN = "MAEFGHKLMNPQRSTVWYI*"
S1_CODING = "ATGTCCGAATTCGGACATAAACTGATGAAC" + EXON2   # G->T at coding idx 3
S2_CODING = S1_CODING                                   # hom, same allele
S3_CODING = REF_CODING[:10] + "AG" + REF_CODING[10:]    # 62 nt, frameshift
EXPECT = {
    "S1": (S1_CODING, CodingSequenceValidity.VALID_PROTEIN, 1, "3M1X56M"),
    "S2": (S2_CODING, CodingSequenceValidity.VALID_PROTEIN, 1, "3M1X56M"),
    "S3": (S3_CODING, CodingSequenceValidity.NOT_MOD3, 2, "10M2I50M"),
}
# variant-major population statistics over the 3 records:
# SNP AC = 1 (S1 het) + 2 (S2 hom) = 3; INS AC = 1; TAIL AC = 1; AN = 6.
EXPECT_AC = [3, 1, 1]        # records in (contig, offset) order: 13, 19, 99
EXPECT_AF = [0.5, 1 / 6, 1 / 6]
EXPECT_HET_BY_GENOME = {"S1": 2, "S2": 0, "S3": 1}
EXPECT_HOM_BY_GENOME = {"S1": 0, "S2": 1, "S3": 0}


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    base = tmp_path_factory.mktemp("oracle")
    fasta = os.path.join(base, "oracle.fasta")
    gff = os.path.join(base, "oracle.gff3")
    vcf = os.path.join(base, "oracle.vcf")
    open(fasta, "w").write(FASTA)
    open(gff, "w").write(GFF3)
    open(vcf, "w").write(VCF)
    genome = GenomeReference.create_genome_database("oracle", fasta, gff)
    return genome, vcf


class TestFrozenReference:
    def test_contig_and_coding_literals(self, oracle):
        genome, _vcf = oracle
        contig = genome.get_contig(CONTIG)
        assert len(contig) == 120
        tx = contig.get_transcription("OG1", "OG1.1")
        assert contig.coding_sequence(tx).to_string() == REF_CODING
        assert contig.check_valid_transcript(tx) is \
            CodingSequenceValidity.VALID_PROTEIN

    def test_protein_literal(self, oracle):
        genome, _vcf = oracle
        contig = genome.get_contig(CONTIG)
        tx = contig.get_transcription("OG1", "OG1.1")
        amino = contig.get_amino_sequence(contig.coding_sequence(tx))
        assert amino.to_string() == PROTEIN


class TestFrozenMutation:
    @pytest.mark.parametrize("use_native", [True, False])
    def test_per_sample_outcomes(self, oracle, use_native):
        from kgl_gene_tpu.analysis.lib_seqmutation import MutateGenes

        genome, vcf = oracle
        contig = genome.get_contig(CONTIG)
        pop, _header, info = parse_vcf_population(
            vcf, "oracle_pop", "PF_DIPLOID", use_native=use_native
        )
        assert pop.genome_count() == 3  # all header samples pre-created
        tx = contig.get_transcription("OG1", "OG1.1")
        mutator = MutateGenes(contig, info_store=info)
        records, stats = mutator.mutate_transcript(pop, tx)
        assert [r.genome_id for r in records] == ["S1", "S2", "S3"]
        for rec in records:
            coding, validity, distance, _cig = EXPECT[rec.genome_id]
            assert rec.modified_coding == coding, rec.genome_id
            assert rec.validity is validity, rec.genome_id
            assert rec.distance == distance, rec.genome_id
            assert rec.variant_count == 1, rec.genome_id
        assert stats.total_genomes == 3
        assert stats.mutant_genomes == 3
        assert stats.valid_proteins == 2
        assert stats.invalid_proteins == 1

    def test_frozen_cigars(self, oracle):
        from kgl_gene_tpu.analysis.lib_seqmutation import (
            MutateGenes, TranscriptFamilyAnalysis,
        )

        genome, vcf = oracle
        contig = genome.get_contig(CONTIG)
        pop, _h, info = parse_vcf_population(vcf, "p", "PF_DIPLOID")
        tx = contig.get_transcription("OG1", "OG1.1")
        records, _stats = MutateGenes(contig, info_store=info
                                      ).mutate_transcript(pop, tx)
        fam = TranscriptFamilyAnalysis(records, REF_CODING)
        cigars = fam.reference_cigars(band_k=31)
        for gid, (coding, _v, _d, cig) in EXPECT.items():
            assert cigars[coding] == cig, gid

    def test_frozen_population_statistics(self, oracle):
        from kgl_gene_tpu.variant.columnar import VariantMajorView

        _genome, vcf = oracle
        pop, _h, _i = parse_vcf_population(vcf, "p", "PF_DIPLOID")
        view = VariantMajorView(pop)
        assert view.variant_count == 3
        assert list(view.offsets) == [13, 19, 99]
        assert view.alt_allele_counts().tolist() == EXPECT_AC
        np.testing.assert_allclose(view.allele_frequencies(), EXPECT_AF)
        het, hom = view.het_hom_by_genome()
        for g, gid in enumerate(view.genome_ids):
            assert het[g] == EXPECT_HET_BY_GENOME[gid], gid
            assert hom[g] == EXPECT_HOM_BY_GENOME[gid], gid


def test_frozen_distances_through_myers_kernel(oracle):
    """The banded Myers bit-vector kernel reproduces the hand-computed
    distance literals for every oracle sample (interpret mode)."""
    from kgl_gene_tpu.analysis.lib_seqmutation import MutateGenes
    from kgl_gene_tpu.ops.pallas_myers import myers_banded_levenshtein
    from kgl_gene_tpu.sequence.alphabet import DNA5

    genome, vcf = oracle
    contig = genome.get_contig(CONTIG)
    pop, _h, info = parse_vcf_population(vcf, "pm", "PF_DIPLOID")
    tx = contig.get_transcription("OG1", "OG1.1")
    records, _stats = MutateGenes(contig, info_store=info
                                  ).mutate_transcript(pop, tx)
    ref = DNA5.from_string(REF_CODING)
    W = max(len(REF_CODING), max(len(r.modified_coding) for r in records))
    B = len(records)
    sa = np.zeros((B, W), np.int32)
    la = np.zeros(B, np.int32)
    for i, r in enumerate(records):
        codes = DNA5.from_string(r.modified_coding)
        sa[i, : len(codes)] = codes
        la[i] = len(codes)
    sb = np.zeros((B, W), np.int32)
    sb[:, : len(ref)] = ref
    lb = np.full(B, len(ref), np.int32)
    got = myers_banded_levenshtein(sa, la, sb, lb, band_k=31, interpret=True)
    for i, r in enumerate(records):
        assert got[i] == EXPECT[r.genome_id][2], r.genome_id
