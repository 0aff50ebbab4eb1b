"""Mutation engine tests: variant selection, sequence application, offset
translation across indels, transcript splice + translation.

The oracle is a direct Python string-edit model applied to the fixture
contig (the reference's de-facto real-data-invariant strategy at unit
scale)."""

import numpy as np
import pytest

from kgl_gene_tpu.genome.features import CodingSequenceValidity
from kgl_gene_tpu.genome.genome import GenomeReference
from kgl_gene_tpu.io.vcf import parse_vcf_population
from kgl_gene_tpu.mutation.adjusted_sequence import AdjustedSequence
from kgl_gene_tpu.mutation.sequence_filter import (
    SeqVariantFilterType,
    SequenceVariantFilter,
)
from kgl_gene_tpu.mutation.transcript import SequenceTranscript
from kgl_gene_tpu.utils.intervals import OpenRightInterval

from fixtures import CONTIG_1, build_contig1, make_genome_files, vcf_variant_specs, write_vcf


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    files = make_genome_files(tmp_path_factory.mktemp("genome"))
    return GenomeReference.create_genome_database("ref", files["fasta"], files["gff"])


@pytest.fixture(scope="module")
def population(tmp_path_factory):
    path = write_vcf(str(tmp_path_factory.mktemp("vcf") / "pop.vcf"))
    pop, header, info = parse_vcf_population(path, "pop", "PF_DIPLOID")
    return pop, info


def _string_oracle(contig: str, region, edits) -> str:
    """Apply (pos, ref, alt) edits to a region of the contig by plain string
    surgery, back-to-front so offsets stay valid."""
    a, b = region
    text = contig[a:b]
    for pos, ref, alt in sorted(edits, reverse=True):
        rel = pos - a
        assert contig[pos : pos + len(ref)] == ref
        text = text[:rel] + alt + text[rel + len(ref) :]
    return text


class TestSequenceVariantFilter:
    def test_gene1_region_s1(self, genome, population):
        pop, info = population
        contig_db = pop.get_genome("S1").get_contig(CONTIG_1)
        sel = SequenceVariantFilter(
            contig_db, OpenRightInterval(40, 140), info_store=info
        )
        # S1 carries the SNP at 55 (0/1) and the deletion at 107 (0/1).
        offsets = [v.offset for _, v in sel.variants()]
        assert 55 in offsets and 107 in offsets
        assert len(sel) == 2
        # Indels keyed at offset+1.
        assert set(sel.offset_variant_map) == {55, 108}

    def test_snp_adjusted(self, genome, population):
        pop, info = population
        contig_db = pop.get_genome("S1").get_contig(CONTIG_1)
        sel = SequenceVariantFilter(
            contig_db, OpenRightInterval(40, 140),
            SeqVariantFilterType.SNP_ADJUSTED, info_store=info,
        )
        assert all(v.is_snp() for _, v in sel.variants())

    def test_multiallelic_selection(self, genome, population):
        """At offset 10, S1 is 1/2 — two different alleles at one offset;
        exactly one must be selected."""
        pop, info = population
        contig_db = pop.get_genome("S1").get_contig(CONTIG_1)
        sel = SequenceVariantFilter(
            contig_db, OpenRightInterval(0, 40), info_store=info
        )
        assert len(sel) == 1
        assert sel.stats.non_unique_count == 1


class TestAdjustedSequence:
    def test_snp_and_indel_apply(self, genome, population):
        pop, info = population
        contig1 = build_contig1()
        contig_db = pop.get_genome("S1").get_contig(CONTIG_1)
        sel = SequenceVariantFilter(contig_db, OpenRightInterval(40, 140), info_store=info)
        adj = AdjustedSequence(genome.get_contig(CONTIG_1), sel)
        specs = vcf_variant_specs()
        snp, dele = specs[0], specs[1]
        expected = _string_oracle(
            contig1, (40, 140),
            [(55, snp["ref"], snp["alts"][0]), (107, dele["ref"], dele["alts"][0])],
        )
        assert adj.modified.to_string() == expected
        assert adj.size_delta() == -3
        assert adj.applied_snp == 1 and adj.applied_delete == 1

    def test_offset_translation(self, genome, population):
        pop, info = population
        contig_db = pop.get_genome("S1").get_contig(CONTIG_1)
        sel = SequenceVariantFilter(contig_db, OpenRightInterval(40, 140), info_store=info)
        adj = AdjustedSequence(genome.get_contig(CONTIG_1), sel)
        # Before the deletion, offsets are unshifted.
        assert adj.modified_interval(OpenRightInterval(50, 80)) == OpenRightInterval(10, 40)
        # After the deletion (del [108,111)), offsets shift by -3.
        assert adj.modified_interval(OpenRightInterval(120, 130)) == OpenRightInterval(77, 87)
        # An interval ending inside the delete shadow is clamped.
        iv = adj.modified_interval(OpenRightInterval(100, 110))
        assert iv == OpenRightInterval(60, 68)

    def test_original_subsequence(self, genome, population):
        pop, info = population
        contig1 = build_contig1()
        contig_db = pop.get_genome("S1").get_contig(CONTIG_1)
        sel = SequenceVariantFilter(contig_db, OpenRightInterval(40, 140), info_store=info)
        adj = AdjustedSequence(genome.get_contig(CONTIG_1), sel)
        orig = adj.original_sub_sequence(OpenRightInterval(50, 80))
        assert orig.to_string() == contig1[50:80]


class TestSequenceTranscript:
    def test_s1_transcript_mutation(self, genome, population):
        """S1: SNP in exon 1 + in-frame 3bp deletion in exon 2. The modified
        protein stays valid (no frameshift)."""
        pop, info = population
        contig1 = build_contig1()
        contig_ref = genome.get_contig(CONTIG_1)
        tx = contig_ref.get_transcription("GENE1", "GENE1.1")
        contig_db = pop.get_genome("S1").get_contig(CONTIG_1)
        st = SequenceTranscript(contig_db, contig_ref, tx, info_store=info)

        specs = vcf_variant_specs()
        snp, dele = specs[0], specs[1]
        # Oracle: apply edits then splice [50,80) + [100,130) in modified coords.
        mutated_contig = _string_oracle(
            contig1, (0, 400),
            [(55, snp["ref"], snp["alts"][0]), (107, dele["ref"], dele["alts"][0])],
        )
        # Exon 1 unshifted; exon 2 shrinks by 3 (deletion inside it).
        expected_coding = mutated_contig[50:80] + mutated_contig[100:127]
        assert st.modified_coding().to_string() == expected_coding
        assert st.original_coding().to_string() == contig1[50:80] + contig1[100:130]
        # In-frame: modified protein still valid.
        assert st.modified_validity() is CodingSequenceValidity.VALID_PROTEIN
        assert st.original_validity() is CodingSequenceValidity.VALID_PROTEIN
        # Protein differs at the SNP codon.
        assert st.modified_amino().to_string() != st.original_amino().to_string()
        assert len(st.modified_amino()) == len(st.original_amino()) - 1

    def test_s2_insert_transcript(self, genome, population):
        """S2: hom SNP at 55 + het GGG insert after 60 (in exon 1). The
        in-frame insert grows the coding sequence by 3."""
        pop, info = population
        contig1 = build_contig1()
        contig_ref = genome.get_contig(CONTIG_1)
        tx = contig_ref.get_transcription("GENE1", "GENE1.1")
        contig_db = pop.get_genome("S2").get_contig(CONTIG_1)
        st = SequenceTranscript(contig_db, contig_ref, tx, info_store=info)
        specs = vcf_variant_specs()
        snp, ins = specs[0], specs[2]
        mutated_contig = _string_oracle(
            contig1, (0, 400),
            [(55, snp["ref"], snp["alts"][0]), (60, ins["ref"], ins["alts"][0])],
        )
        expected_coding = mutated_contig[50:83] + mutated_contig[103:133]
        assert st.modified_coding().to_string() == expected_coding
        assert st.modified_validity() is CodingSequenceValidity.VALID_PROTEIN
        assert len(st.modified_coding()) == 63
