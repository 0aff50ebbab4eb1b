"""Tests for the phased-diploid (1000G) and mono-genome (gnomAD/GRCh)
VCF parser paths."""

import numpy as np
import pytest

from kgl_gene_tpu.io.vcf import parse_vcf_population
from kgl_gene_tpu.variant.variant import VariantPhase

from fixtures import CONTIG_1, build_contig1


def _write_phased_vcf(path):
    c1 = build_contig1()
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write(f"##contig=<ID={CONTIG_1},length=400>\n")
        f.write('##INFO=<ID=AF,Number=A,Type=Float,Description="af">\n')
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tP1\tP2\n")
        # phased: P1 = 1|0 (phase A carries alt), P2 = 0|1 (phase B).
        f.write(f"{CONTIG_1}\t21\trs0\t{c1[20]}\t"
                f"{'A' if c1[20] != 'A' else 'C'}\t50\tPASS\tAF=0.5\tGT\t1|0\t0|1\n")
        # hom phased 1|1 -> both phases.
        f.write(f"{CONTIG_1}\t31\trs1\t{c1[30]}\t"
                f"{'G' if c1[30] != 'G' else 'T'}\t50\tPASS\tAF=0.5\tGT\t1|1\t0|0\n")
        # unphased fallback 0/1 -> UNPHASED.
        f.write(f"{CONTIG_1}\t41\trs2\t{c1[40]}\t"
                f"{'T' if c1[40] != 'T' else 'A'}\t50\tPASS\tAF=0.5\tGT\t./.\t0/1\n")
    return path


def _write_aggregate_vcf(path):
    c1 = build_contig1()
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write(f"##contig=<ID={CONTIG_1},length=400>\n")
        f.write('##INFO=<ID=AF,Number=A,Type=Float,Description="af">\n')
        f.write('##INFO=<ID=AC,Number=A,Type=Integer,Description="ac">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        f.write(f"{CONTIG_1}\t11\trs0\t{c1[10]}\t"
                f"{'A' if c1[10] != 'A' else 'C'}\t50\tPASS\tAF=0.01;AC=3\n")
        # multi-allelic aggregate record, one '*' upstream allele skipped.
        alts = [a for a in "ACGT" if a != c1[15]][:2]
        f.write(f"{CONTIG_1}\t16\trs1\t{c1[15]}\t{alts[0]},*\t50\tPASS\tAF=0.2,0.1;AC=5,2\n")
    return path


class TestPhasedDiploid:
    def test_phases(self, tmp_path):
        path = _write_phased_vcf(str(tmp_path / "phased.vcf"))
        pop, header, info = parse_vcf_population(path, "phased", "PHASED_DIPLOID")
        p1 = pop.get_genome("P1")
        p2 = pop.get_genome("P2")
        p1_variants = sorted(p1.get_contig(CONTIG_1), key=lambda v: v.offset)
        # P1: rs0 phase A + rs1 A and B (1|1) = 3 incidences.
        assert len(p1_variants) == 3
        assert p1_variants[0].phase is VariantPhase.DIPLOID_PHASE_A
        assert {v.phase for v in p1_variants[1:]} == {
            VariantPhase.DIPLOID_PHASE_A, VariantPhase.DIPLOID_PHASE_B,
        }
        p2_variants = sorted(p2.get_contig(CONTIG_1), key=lambda v: v.offset)
        # P2: rs0 phase B + rs2 unphased.
        assert len(p2_variants) == 2
        assert p2_variants[0].phase is VariantPhase.DIPLOID_PHASE_B
        assert p2_variants[1].phase is VariantPhase.UNPHASED

    def test_homozygous_pair_detection(self, tmp_path):
        path = _write_phased_vcf(str(tmp_path / "phased2.vcf"))
        pop, _, _ = parse_vcf_population(path, "phased", "PHASED_DIPLOID")
        variants = pop.get_genome("P1").get_contig(CONTIG_1).find_at_offset(30)
        assert len(variants) == 2
        assert variants[0].homozygous(variants[1])


def _write_gnomad_vcf(path):
    c1 = build_contig1()
    alt = lambda pos, choice: next(a for a in choice if a != c1[pos])  # noqa: E731
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write(f"##contig=<ID={CONTIG_1},length=400>\n")
        f.write('##INFO=<ID=AF,Number=A,Type=Float,Description="af">\n')
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">\n')
        f.write('##FORMAT=<ID=DP,Number=1,Type=Integer,Description="dp">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tG1\tG2\tG3\n")
        # diploid het/hom/missing.
        f.write(f"{CONTIG_1}\t21\trs0\t{c1[20]}\t{alt(20, 'AC')}\t50\tPASS\t"
                f"AF=0.5\tGT:DP\t0/1:20\t1/1:30\t./.:10\n")
        # multi-alt with an abstract <NON_REF> allele: index 2 skipped.
        f.write(f"{CONTIG_1}\t31\trs1\t{c1[30]}\t{alt(30, 'GT')},<NON_REF>\t50\tPASS\t"
                f"AF=0.5\tGT:DP\t0/2:20\t1/2:25\t0/0:30\n")
        # haploid male-style GT (no '/') -> phase A only.
        f.write(f"{CONTIG_1}\t41\trs2\t{c1[40]}\t{alt(40, 'TA')}\t50\tPASS\t"
                f"AF=0.5\tGT:DP\t1:15\t0:22\t.:5\n")
        # non-PASS record: still ingested, pass_filter False on the variant.
        f.write(f"{CONTIG_1}\t51\trs3\t{c1[50]}\t{alt(50, 'CG')}\t50\tAC0\t"
                f"AF=0.1\tGT:DP\t0/1:12\t0/0:30\t0/0:28\n")
        # malformed GT head -> warned, treated as reference.
        f.write(f"{CONTIG_1}\t61\trs4\t{c1[60]}\t{alt(60, 'GA')}\t50\tPASS\t"
                f"AF=0.1\tGT:DP\tx/y:12\t0/0:30\t0/9:28\n")
    return path


class TestGnomadDiploid:
    def test_genotype_semantics(self, tmp_path):
        path = _write_gnomad_vcf(str(tmp_path / "gnomad.vcf"))
        pop, header, info = parse_vcf_population(path, "gnomad", "GNOMAD_DIPLOID")
        assert pop.genome_count() == 2  # only carrier genomes materialise
        g1 = pop.get_genome("G1")
        g2 = pop.get_genome("G2")
        v1 = sorted(g1.get_contig(CONTIG_1), key=lambda v: v.offset)
        # G1: rs0 het (1), rs2 haploid (1), rs3 non-PASS (1), rs1 0/2 abstract
        # skipped, rs4 malformed skipped.
        assert [v.offset for v in v1] == [20, 40, 50]
        assert all(v.phase is VariantPhase.UNPHASED for v in v1)
        assert v1[2].pass_filter is False  # AC0 record flagged, not dropped
        v2 = sorted(g2.get_contig(CONTIG_1), key=lambda v: v.offset)
        # G2: rs0 hom 1/1 -> TWO incidences; rs1 1/2 -> one (alt 2 abstract).
        assert [v.offset for v in v2] == [20, 20, 30]
        # G3: './.', '0/0', '.', '0/0', '0/9 out of range' -> no genome entry.
        assert pop.get_genome("G3") is None

    def test_dispatch_table(self):
        from kgl_gene_tpu.io.data_source import ParserType, find_characteristic

        c = find_characteristic("GnomadGenome3_1")
        assert c.parser_type is ParserType.DiploidGnomad
        assert c.parser_type.value == "GNOMAD_DIPLOID"


class TestMonoGenome:
    def test_aggregate_parse(self, tmp_path):
        path = _write_aggregate_vcf(str(tmp_path / "agg.vcf"))
        pop, header, info = parse_vcf_population(
            path, "gnomad", "MONO_GENOME", genome_name="gnomad_stats",
        )
        assert pop.genome_count() == 1
        genome = pop.get_genome("gnomad_stats")
        # 1 + 1 alt (the '*' allele skipped) = 2 incidences.
        assert genome.variant_count() == 2
        # INFO columns accessible through the frequency reader.
        from kgl_gene_tpu.stats.frequency import FrequencyDatabaseRead

        freq = FrequencyDatabaseRead(info)
        variants = sorted(genome.get_contig(CONTIG_1), key=lambda v: v.offset)
        assert freq.allele_frequency("ALL", variants[0].info_index) == 0.01
        assert freq.allele_count("ALL", variants[0].info_index) == 3
