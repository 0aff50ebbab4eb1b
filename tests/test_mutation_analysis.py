"""MUTATION plugin depth: clinvar intersection, genealogy ethnicity/sex
splits, and per-allele population-frequency rows
(kga_mutation/kga_analysis_mutation_gene_clinvar.h:31, ..._gene_ethnic.h,
..._gene_allele.h). Expected values are hand-derived from the fixture VCF."""

import os

import numpy as np
import pytest

from kgl_gene_tpu.analysis.mutation_analysis import MutationAnalysis
from kgl_gene_tpu.app.resources import AnalysisResources, ResourceType
from kgl_gene_tpu.genome.genome import GenomeReference
from kgl_gene_tpu.io.resource_parsers import (
    parse_citations,
    parse_genome_aux,
    parse_ped_genealogy,
)
from kgl_gene_tpu.io.vcf import parse_vcf_population

from fixtures import CONTIG_1, build_contig1, make_genome_files, write_vcf


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    files = make_genome_files(tmp_path_factory.mktemp("genome"))
    return GenomeReference.create_genome_database("ref", files["fasta"], files["gff"])


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    path = write_vcf(str(tmp_path_factory.mktemp("vcf") / "pop.vcf"))
    pop, header, info = parse_vcf_population(path, "cohort", "PF_DIPLOID",
                                             subscribed_info=["AF"])
    pop.info_store = info
    return pop


def _write_clinvar_vcf(path):
    """Clinvar-style aggregate VCF: the fixture SNP at 0-based 55 is marked
    Pathogenic; an unrelated benign record is ignored."""
    c1 = build_contig1()
    alt55 = "A" if c1[55] != "A" else "G"  # matches the fixture cohort SNP
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write(f"##contig=<ID={CONTIG_1},length=400>\n")
        f.write('##INFO=<ID=CLNSIG,Number=.,Type=String,Description="sig">\n')
        f.write('##INFO=<ID=CLNDN,Number=.,Type=String,Description="dn">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        f.write(f"{CONTIG_1}\t56\tcv0\t{c1[55]}\t{alt55}\t50\tPASS\t"
                f"CLNSIG=Pathogenic;CLNDN=Test_disease\n")
        f.write(f"{CONTIG_1}\t91\tcv1\t{c1[90]}\t"
                f"{'A' if c1[90] != 'A' else 'T'}\t50\tPASS\t"
                f"CLNSIG=Benign;CLNDN=Other_disease\n")
    return path


@pytest.fixture(scope="module")
def clinvar(tmp_path_factory):
    path = _write_clinvar_vcf(str(tmp_path_factory.mktemp("cv") / "clinvar.vcf"))
    pop, header, info = parse_vcf_population(
        path, "clinvarDB", "MONO_GENOME", subscribed_info=["CLNSIG", "CLNDN"],
        genome_name="clinvar",
    )
    pop.info_store = info
    return pop


@pytest.fixture(scope="module")
def resources(tmp_path_factory, genome):
    base = tmp_path_factory.mktemp("res")
    # PED genealogy: sex 1=male, 2=female.
    ped = base / "ped.tsv"
    header = "\t".join(["Family", "Individual", "Paternal", "Maternal", "Sex",
                        "Pheno", "Population", "PopDesc", "Gender", "Rel",
                        "Sib", "Second", "Third", "Comments"])
    rows = [
        "\t".join(["F1", "S1", "0", "0", "1", "0", "ACB", "d", "", "", "", "", "", ""]),
        "\t".join(["F1", "S2", "0", "0", "2", "0", "ACB", "d", "", "", "", "", "", ""]),
        "\t".join(["F2", "S3", "0", "0", "1", "0", "GBR", "d", "", "", "", "", "", ""]),
        "\t".join(["F2", "S4", "0", "0", "2", "0", "CHB", "d", "", "", "", "", "", ""]),
    ]
    ped.write_text(header + "\n" + "\n".join(rows) + "\n")
    # Genome aux: super populations.
    aux = base / "aux.tsv"
    aux_header = "\t".join(["Individual", "Sex", "Population", "PopDesc",
                            "SuperPopulation", "SuperDesc"])
    aux_rows = [
        "\t".join(["S1", "male", "ACB", "d", "AFR", "d"]),
        "\t".join(["S2", "female", "ACB", "d", "AFR", "d"]),
        "\t".join(["S3", "male", "GBR", "d", "EUR", "d"]),
        "\t".join(["S4", "female", "CHB", "d", "EAS", "d"]),
    ]
    aux.write_text(aux_header + "\n" + "\n".join(aux_rows) + "\n")
    # Allele citations: rs0 cited twice.
    cit = base / "citations.tsv"
    cit.write_text("rs0\t111\nrs0\t222\nrs9\t333\n")

    container = AnalysisResources()
    container.add_resource(ResourceType.GENOME_DATABASE, "ref", genome)
    container.add_resource(ResourceType.GENEALOGY, "ped", parse_ped_genealogy(str(ped)))
    container.add_resource(ResourceType.GENOME_AUX, "aux", parse_genome_aux(str(aux)))
    container.add_resource(ResourceType.CITATION, "cit", parse_citations(str(cit)))
    return container


def _run(tmp_path, resources, *populations):
    analysis = MutationAnalysis()
    assert analysis.initialize_analysis(str(tmp_path), [], resources)
    for pop in populations:
        assert analysis.file_read_analysis(pop)
    assert analysis.iteration_analysis()
    assert analysis.finalize_analysis()
    with open(os.path.join(str(tmp_path), "gene_mutation.csv")) as f:
        gene_lines = f.read().strip().split("\n")
    with open(os.path.join(str(tmp_path), "gene_allele.csv")) as f:
        allele_lines = f.read().strip().split("\n")
    return gene_lines, allele_lines


class TestMutationAnalysis:
    def test_gene_row_with_clinvar_and_ethnicity(self, tmp_path, resources,
                                                 cohort, clinvar):
        gene_lines, allele_lines = _run(tmp_path, resources, cohort, clinvar)
        header = gene_lines[0].split(",")
        rows = [l.split(",") for l in gene_lines[1:]]
        gene1 = [r for r in rows if r[0] == "GENE1"]
        assert len(gene1) == 1
        row = dict(zip(header, gene1[0]))
        # GENE1 span [40,140): SNP@55, ins@60, del@107 -> 3 alleles, 1 SNP.
        assert row["Variants"] == "3"
        assert row["SNPs"] == "1"
        # Carriers: S1, S2, S4 (S3 is hom-ref) -> 1 male (S1), 2 female.
        assert row["CarrierGenomes"] == "3"
        assert row["MaleCarriers"] == "1"
        assert row["FemaleCarriers"] == "2"
        # Super-pop allele counts: AFR = S1(2) + S2(3) = 5, EAS = S4(3).
        assert row["AC_AFR"] == "5"
        assert row["AC_EAS"] == "3"
        assert row["AC_EUR"] == "0"
        # Ethnic carrier-genome split.
        assert row["ETH_AFR"] == "2" and row["ETH_EAS"] == "1"
        # Clinvar intersection: the pathogenic SNP@55 is carried by S1, S2
        # (hom), S4; the benign cv1 record must not count.
        assert row["ClinvarAlleles"] == "1"
        assert row["ClinvarGenomes"] == "3"
        assert row["ClinvarHom"] == "1"
        assert row["ClinvarMale"] == "1" and row["ClinvarFemale"] == "2"
        assert row["ClinvarDesc"] == "Test_disease"

    def test_allele_rows(self, tmp_path, resources, cohort, clinvar):
        gene_lines, allele_lines = _run(tmp_path, resources, cohort, clinvar)
        header = allele_lines[0].split(",")
        rows = [dict(zip(header, l.split(","))) for l in allele_lines[1:]]
        gene1 = [r for r in rows if r["Gene"] == "GENE1"]
        assert sorted(r["Offset"] for r in gene1) == ["107", "55", "60"]
        snp = [r for r in gene1 if r["Offset"] == "55"][0]
        assert snp["ID"] == "rs0"
        assert snp["SNP"] == "1"
        assert (snp["AC"], snp["AN"], snp["AF"]) == ("4", "8", "0.5")
        assert snp["AC_AFR"] == "3" and snp["AC_EAS"] == "1"
        assert snp["Citations"] == "2"  # rs0 cited twice
        indel = [r for r in gene1 if r["Offset"] == "107"][0]
        assert indel["SNP"] == "0"
        # S1 het (1) + S4 hom (2) = 3.
        assert indel["AC"] == "3"

    def test_without_clinvar_population(self, tmp_path, resources, cohort):
        gene_lines, _ = _run(tmp_path, resources, cohort)
        header = gene_lines[0].split(",")
        row = dict(zip(header, gene_lines[1].split(",")))
        assert row["ClinvarAlleles"] == "0"
        assert row["ClinvarDesc"] == ""


def test_payload_modes_produce_identical_records(genome, cohort, monkeypatch):
    """The pooled mutate program's two payload modes — packed sequences on
    a fast link vs 8-byte tails + host reconstruction on a slow one —
    must materialise byte-identical records."""
    import kgl_gene_tpu.analysis.lib_seqmutation as lsm
    from kgl_gene_tpu.analysis.lib_seqmutation import MutateGenes

    contig = genome.get_contig(CONTIG_1)
    tx = contig.get_transcription("GENE1", "GENE1.1")

    def run(rate):
        monkeypatch.setitem(lsm._JIT_HELPERS, "link_rate", rate)
        mut = MutateGenes(contig, info_store=cohort.info_store)
        (records, stats) = mut.mutate_transcript(cohort, tx)
        return records, stats

    rec_fast, st_fast = run(1000.0)   # ship packed sequences
    rec_slow, st_slow = run(1.0)      # tails + host reconstruction
    assert len(rec_fast) == len(rec_slow) > 0
    for a, b in zip(rec_fast, rec_slow):
        assert a.genome_id == b.genome_id
        assert a.modified_coding == b.modified_coding
        assert a.validity == b.validity
        assert a.distance == b.distance
    assert st_fast.valid_proteins == st_slow.valid_proteins
