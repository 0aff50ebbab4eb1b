"""Genome model + FASTA/GFF3/GAF ingest tests."""

import os

import numpy as np
import pytest

from kgl_gene_tpu.genome.features import CodingSequenceValidity, TranscriptionSequenceType
from kgl_gene_tpu.genome.genome import GenomeReference
from kgl_gene_tpu.io.streams import BGZFReader, write_bgzf, is_bgzf
from kgl_gene_tpu.utils.intervals import OpenRightInterval

from fixtures import CONTIG_1, CONTIG_2, GENE2_CODING, build_contig1, make_genome_files


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    files = make_genome_files(tmp_path_factory.mktemp("genome"))
    return GenomeReference.create_genome_database(
        "test_genome", files["fasta"], files["gff"], files["gaf"]
    )


class TestGenomeIngest:
    def test_contigs(self, genome):
        assert set(genome.contig_ids()) == {CONTIG_1, CONTIG_2}
        c1 = genome.get_contig(CONTIG_1)
        assert len(c1) == 400
        assert c1.sequence.to_string() == build_contig1()

    def test_gene_map(self, genome):
        c1 = genome.get_contig(CONTIG_1)
        assert set(c1.genes) == {"GENE1", "NCG1"}
        gene1 = c1.get_gene("GENE1")
        assert gene1.interval == OpenRightInterval(40, 140)
        assert c1.genes_at(50) == [gene1]
        assert c1.find_gene_array(OpenRightInterval(0, 500)) == c1.all_genes()

    def test_transcript_structure(self, genome):
        c1 = genome.get_contig(CONTIG_1)
        tx = c1.get_transcription("GENE1", "GENE1.1")
        assert tx is not None
        assert tx.coding_type is TranscriptionSequenceType.PROTEIN
        np.testing.assert_array_equal(tx.exon_arrays(), [[50, 80], [100, 130]])
        assert tx.coding_nucleotides() == 60

    def test_coding_sequence_forward(self, genome):
        c1 = genome.get_contig(CONTIG_1)
        tx = c1.get_transcription("GENE1", "GENE1.1")
        coding = c1.coding_sequence(tx)
        contig1 = build_contig1()
        assert coding.to_string() == contig1[50:80] + contig1[100:130]
        amino = c1.get_amino_sequence(coding)
        assert amino.to_string().startswith("M")
        assert amino.to_string().endswith("*")
        assert c1.check_valid_transcript(tx) is CodingSequenceValidity.VALID_PROTEIN

    def test_coding_sequence_reverse(self, genome):
        c2 = genome.get_contig(CONTIG_2)
        tx = c2.get_transcription("GENE2", "GENE2.1")
        coding = c2.coding_sequence(tx)
        assert coding.to_string() == GENE2_CODING
        assert c2.check_valid_transcript(tx) is CodingSequenceValidity.VALID_PROTEIN

    def test_ncrna_transcript(self, genome):
        c1 = genome.get_contig(CONTIG_1)
        tx = c1.get_transcription("NCG1", "NCG1.1")
        assert tx.coding_type is TranscriptionSequenceType.NCRNA
        assert c1.check_valid_transcript(tx) is CodingSequenceValidity.NCRNA

    def test_verify_counts(self, genome):
        valid, invalid = genome.verify_features()
        assert valid == 3  # GENE1.1, GENE2.1, NCG1.1
        assert invalid == 0

    def test_gaf(self, genome):
        assert genome.gene_ontology["GENE1"] == ["GO:0000001", "GO:0000002"]
        # NOT-qualified annotation excluded.
        assert genome.gene_ontology["GENE2"] == ["GO:0000001"]

    def test_equivalent(self, genome, tmp_path):
        files = make_genome_files(tmp_path)
        genome2 = GenomeReference.create_genome_database(
            "copy", files["fasta"], files["gff"]
        )
        assert genome.equivalent(genome2)


class TestBGZF:
    def test_round_trip(self, tmp_path):
        data = b"\n".join(b"line %d with payload xyz" % i for i in range(5000)) + b"\n"
        path = str(tmp_path / "test.bgz")
        write_bgzf(path, data, block_size=1024)
        assert is_bgzf(path)
        reader = BGZFReader(path, verify=True)
        assert reader.read() == data
        reader.close()

    def test_gzip_compatible(self, tmp_path):
        # BGZF is valid multi-member gzip.
        import gzip
        data = b"hello bgzf world\n" * 100
        path = str(tmp_path / "x.bgz")
        write_bgzf(path, data, block_size=256)
        with gzip.open(path, "rb") as f:
            assert f.read() == data
