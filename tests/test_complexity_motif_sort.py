"""Tests: sequence complexity, motif search, variant sort/index, VEP."""

import numpy as np
import pytest

from kgl_gene_tpu.genome.genome import GenomeReference
from kgl_gene_tpu.io.vcf import InfoSchema, parse_vcf_population
from kgl_gene_tpu.sequence.complexity import (
    alphabet_entropy,
    complexity_lempel_ziv,
    kmer_count,
    relative_cpg_islands,
)
from kgl_gene_tpu.sequence.motif import find_motifs, find_promoter_motifs, iupac_to_regex
from kgl_gene_tpu.sequence.sequence import DNA5SequenceLinear
from kgl_gene_tpu.variant.sort import VariantSort
from kgl_gene_tpu.variant.vep import VEPSubFields

from fixtures import CONTIG_1, make_genome_files, write_vcf


class TestComplexity:
    def test_entropy(self):
        uniform = DNA5SequenceLinear.from_string("ACGT" * 100)
        single = DNA5SequenceLinear.from_string("AAAA" * 100)
        # 4 of 5 symbols equally likely: entropy = log4/log5.
        assert abs(alphabet_entropy(uniform) - np.log(4) / np.log(5)) < 1e-12
        assert alphabet_entropy(single) == 0.0
        assert alphabet_entropy(DNA5SequenceLinear.from_string("")) == 0.0

    def test_cpg(self):
        seq = DNA5SequenceLinear.from_string("CGCGCGCG")  # 4 CGs in 8 bases
        assert relative_cpg_islands(seq) == 4 * 32.0 / 8
        assert relative_cpg_islands(DNA5SequenceLinear.from_string("ATAT")) == 0.0

    def test_lempel_ziv(self):
        # Repetitive sequences have lower LZ complexity than random ones.
        rep = DNA5SequenceLinear.from_string("ACAC" * 50)
        rng = np.random.default_rng(0)
        rand = DNA5SequenceLinear(rng.integers(0, 4, 200).astype(np.uint8))
        assert complexity_lempel_ziv(rep) < complexity_lempel_ziv(rand)
        assert complexity_lempel_ziv(DNA5SequenceLinear.from_string("")) == 0

    def test_kmer_count(self):
        seq = DNA5SequenceLinear.from_string("ATGATGATG")
        kmer = DNA5SequenceLinear.from_string("ATG")
        assert kmer_count(seq, kmer) == 3
        assert kmer_count(seq, DNA5SequenceLinear.from_string("GGG")) == 0
        # overlapping occurrences count
        assert kmer_count(
            DNA5SequenceLinear.from_string("AAAA"), DNA5SequenceLinear.from_string("AA")
        ) == 3


class TestMotif:
    def test_iupac(self):
        assert iupac_to_regex("TATAWAW") == "TATA[AT]A[AT]"

    def test_find(self):
        seq = DNA5SequenceLinear.from_string("CCTATAAATCCTATATAACC")
        hits = find_motifs(seq, "TATAWAW")
        assert [(h.lower, h.upper) for h in hits] == [(2, 9), (11, 18)]

    def test_promoter_window(self):
        seq = DNA5SequenceLinear.from_string("A" * 10 + "TATAAAT" + "A" * 30 + "ATG" + "A" * 10)
        hits = find_promoter_motifs(seq, upstream_of=47, window=47)
        assert len(hits) == 1 and hits[0].lower == 10


class TestVariantSort:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        base = tmp_path_factory.mktemp("sort")
        files = make_genome_files(base)
        vcf = write_vcf(str(base / "pop.vcf"))
        genome = GenomeReference.create_genome_database("ref", files["fasta"], files["gff"])
        pop, _, info = parse_vcf_population(vcf, "pop", "PF_DIPLOID")
        return genome, pop

    def test_variant_id_index(self, setup):
        _, pop = setup
        index = VariantSort.variant_id_index(pop)
        # Fixture writes ids rs0..rs3; multi-allelic rs3 has 2 rows.
        assert set(index) == {"rs0", "rs1", "rs2", "rs3"}
        assert len(index["rs3"]) == 2

    def test_genome_index(self, setup):
        _, pop = setup
        gindex = VariantSort.genome_variant_id_index(pop)
        assert "rs0" in gindex["S1"]
        assert "rs2" not in gindex["S1"]  # insert is S2 only

    def test_gene_index(self, setup):
        genome, pop = setup
        gene_index = VariantSort.gene_variant_index(pop, genome)
        # GENE1 spans [40,140): snp@55, del@107, ins@60 -> 3 rows.
        assert len(gene_index["GENE1"]) == 3
        assert "NCG1" not in gene_index  # no variants in [200,260)


class TestVEP:
    def test_vep_subfields(self):
        from kgl_gene_tpu.io.vcf import InfoStore

        schemas = {
            "CSQ": InfoSchema(
                "CSQ", ".", "String",
                'Consequence annotations. Format: Allele|Consequence|Gene',
            )
        }
        store = InfoStore(schemas, ["CSQ"])
        store.add_record("CSQ=A|missense_variant|GENE1,A|synonymous_variant|GENE2")
        vep = VEPSubFields(store)
        assert vep.has_vep()
        assert vep.sub_fields == ["Allele", "Consequence", "Gene"]
        records = vep.records(0)
        assert len(records) == 2
        assert records[0]["Consequence"] == "missense_variant"
        assert vep.sub_field_values(0, "Gene") == ["GENE1", "GENE2"]
        assert vep.contains_substring(0, "Consequence", "missense")
        assert not vep.contains_substring(0, "Consequence", "stop_gained")
