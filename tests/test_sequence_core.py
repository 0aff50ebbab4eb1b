"""Sequence core tests: alphabets, containers, codon translation.

Modeled on the reference's de-facto oracle style (hard-coded expected
values; SURVEY.md section 4)."""

import numpy as np
import pytest

from kgl_gene_tpu.sequence import (
    AminoAcid,
    AminoSequence,
    CodingDNA5,
    DNA5,
    DNA5SequenceCoding,
    DNA5SequenceLinear,
    StrandSense,
    amino_translation_table,
    codon_indices,
)


class TestDNA5:
    def test_round_trip(self):
        s = "ACGTNACGT"
        assert DNA5.to_string(DNA5.from_string(s)) == s

    def test_lowercase_and_u(self):
        assert DNA5.to_string(DNA5.from_string("acgun")) == "ACGTN"

    def test_iupac_extended_to_n(self):
        assert DNA5.to_string(DNA5.from_string("RYSWKMBDHV")) == "N" * 10

    def test_complement(self):
        codes = DNA5.from_string("ACGTN")
        assert DNA5.to_string(DNA5.complement_codes(codes)) == "TGCAN"

    def test_transition_transversion(self):
        a, c, g, t, n = DNA5.from_string("ACGTN")
        assert DNA5.is_transition(a, g)
        assert DNA5.is_transition(c, t)
        assert not DNA5.is_transition(a, a)
        assert not DNA5.is_transition(a, c)
        assert not DNA5.is_transition(a, n)
        assert DNA5.is_transversion(a, c)
        assert not DNA5.is_transversion(a, g)
        assert not DNA5.is_transversion(g, n)


class TestSequenceContainers:
    def test_subsequence_and_mutate(self):
        seq = DNA5SequenceLinear.from_string("ACGTACGT")
        assert seq.subsequence(2, 4).to_string() == "GTAC"
        assert seq.modify_base(0, DNA5.T).to_string() == "TCGTACGT"
        assert seq.delete_subsequence(1, 3).to_string() == "AACGT"
        ins = DNA5SequenceLinear.from_string("GGG")
        assert seq.insert_subsequence(4, ins).to_string() == "ACGTGGGACGT"

    def test_common_prefix_suffix(self):
        a = DNA5SequenceLinear.from_string("ACGTT")
        b = DNA5SequenceLinear.from_string("ACTTT")
        assert a.common_prefix(b) == 2
        assert a.common_suffix(b) == 2
        same = DNA5SequenceLinear.from_string("ACG")
        assert same.common_prefix(same) == 3

    def test_strand_conversion_round_trip(self):
        seq = DNA5SequenceLinear.from_string("AACGTT")
        fwd = seq.coding_sequence(StrandSense.FORWARD)
        assert fwd.to_string() == "AACGTT"
        rev = seq.coding_sequence(StrandSense.REVERSE)
        assert rev.to_string() == "AACGTT"[::-1].translate(str.maketrans("ACGT", "TGCA"))
        assert rev.to_string() == "AACGTT"  # palindrome here
        seq2 = DNA5SequenceLinear.from_string("AAACCC")
        rev2 = seq2.coding_sequence(StrandSense.REVERSE)
        assert rev2.to_string() == "GGGTTT"
        assert rev2.linear_sequence().to_string() == "AAACCC"


class TestTranslation:
    def test_codon_indices(self):
        # AAA=0, AAC=1, TTT=63, TAA=48 (the reference's STOP_CODON_OFFSET)
        codes = CodingDNA5.from_string("AAAAACTTTTAA")
        np.testing.assert_array_equal(codon_indices(codes), [0, 1, 63, 48])

    def test_codon_with_n_is_unknown(self):
        table = amino_translation_table()
        seq = DNA5SequenceCoding.from_string("ATGANG")
        assert seq.get_amino_sequence(table).to_string() == "MZ"

    def test_standard_table(self):
        table = amino_translation_table("NCBI_TABLE_1")
        seq = DNA5SequenceCoding.from_string("ATGGCTTGGTAA")  # M A W *
        assert seq.get_amino_sequence(table).to_string() == "MAW*"
        # Start/stop flags.
        assert table.is_start_codon(codon_indices(CodingDNA5.from_string("ATG")))[0]
        assert table.is_stop_codon(codon_indices(CodingDNA5.from_string("TAA")))[0]
        assert table.is_stop_codon(codon_indices(CodingDNA5.from_string("TAG")))[0]
        assert table.is_stop_codon(codon_indices(CodingDNA5.from_string("TGA")))[0]

    def test_table_2_vertebrate_mito(self):
        table = amino_translation_table("NCBI_TABLE_2")
        # AGA/AGG are stops in vertebrate mitochondrial code; TGA = W.
        assert table.is_stop_codon(codon_indices(CodingDNA5.from_string("AGA")))[0]
        seq = DNA5SequenceCoding.from_string("TGA")
        assert seq.get_amino_sequence(table).to_string() == "W"

    def test_unknown_table_falls_back_to_standard(self):
        assert amino_translation_table("NO_SUCH").name == "NCBI_TABLE_1"

    def test_full_standard_code(self):
        """Whole standard genetic code against the textbook mapping."""
        table = amino_translation_table()
        bases = "ACGT"
        std = {}
        # Textbook standard code, spelled out via known amino groups.
        code = (
            "KNKN" "TTTT" "RSRS" "IIMI"  # AA* AC* AG* AT*
            "QHQH" "PPPP" "RRRR" "LLLL"  # CA* CC* CG* CT*
            "EDED" "AAAA" "GGGG" "VVVV"  # GA* GC* GG* GT*
            "*Y*Y" "SSSS" "*CWC" "LFLF"  # TA* TC* TG* TT*
        )
        for i in range(64):
            codon = bases[i // 16] + bases[(i // 4) % 4] + bases[i % 4]
            std[codon] = code[i]
        for codon, aa in std.items():
            got = DNA5SequenceCoding.from_string(codon).get_amino_sequence(table).to_string()
            assert got == aa, f"{codon}: expected {aa} got {got}"


class TestAminoSequence:
    def test_validity_checks(self):
        seq = AminoSequence.from_string("MAW*")
        assert seq.ends_with_stop()
        assert seq.internal_stops() == 0
        assert not seq.contains_unknown()
        bad = AminoSequence.from_string("MA*W*")
        assert bad.internal_stops() == 1
        unk = AminoSequence.from_string("MZW")
        assert unk.contains_unknown()

    def test_round_trip(self):
        s = "FLSYCWPHQRIMTNKVADEG*Z"
        assert AminoSequence.from_string(s).to_string() == s
