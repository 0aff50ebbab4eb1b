"""Synthetic test genome fixtures.

Builds a deterministic miniature organism (2 contigs, forward + reverse
multi-exon protein genes) with FASTA/GFF3/GAF/VCF files — the tiny oracle
dataset used across the test suite, mirroring the reference's real-data
invariant strategy (SURVEY.md section 4) at unit scale.
"""

from __future__ import annotations

import os
import random

import numpy as np

CONTIG_1 = "tpu_chr1"
CONTIG_2 = "tpu_chr2"

# --- deterministic contig sequences -----------------------------------------
_rng = random.Random(42)


def _random_dna(n: int, rng) -> str:
    return "".join(rng.choice("ACGT") for _ in range(n))


def _revcomp(s: str) -> str:
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def build_contig1() -> str:
    """400bp contig with GENE1 (+ strand): CDS1 [50,80), CDS2 [100,130).

    The spliced 60bp coding region translates to a valid protein:
    starts ATG, ends TAA, no internal stop.
    """
    rng = random.Random(1)
    seq = list(_random_dna(400, rng))
    # Coding: ATG + 17 codons + TAA = 60 nt. Choose codons without stops.
    safe_codons = ["GCT", "GGC", "TGG", "AAA", "CCC", "GTA", "CAT", "TAC",
                   "TCG", "ATC", "GAA", "TTT", "CTG", "AGG", "AAC", "GAC", "CGA", "GCA"]
    coding = "ATG" + "".join(safe_codons) + "TAA"
    assert len(coding) == 60
    exon1, exon2 = coding[:30], coding[30:]
    seq[50:80] = exon1
    seq[100:130] = exon2
    return "".join(seq)


def build_contig2() -> str:
    """300bp contig with GENE2 (- strand): CDS [120,180) on reverse strand.

    The reverse-complement of [120,180) is a valid 60nt protein ORF.
    """
    rng = random.Random(2)
    seq = list(_random_dna(300, rng))
    coding = "ATG" + "GCTGGCTGGAAACCCGTACATTACTCGATCGAATTTCTGAGGAACGACCGAGCA" + "TAA"
    assert len(coding) == 60
    seq[120:180] = _revcomp(coding)
    return "".join(seq)


GENE1_CODING = build_contig1()[50:80] + build_contig1()[100:130]
GENE2_CODING = "ATG" + "GCTGGCTGGAAACCCGTACATTACTCGATCGAATTTCTGAGGAACGACCGAGCA" + "TAA"


def write_fasta(path: str) -> str:
    c1, c2 = build_contig1(), build_contig2()
    with open(path, "w") as f:
        f.write(f">{CONTIG_1} synthetic contig 1\n")
        for i in range(0, len(c1), 60):
            f.write(c1[i : i + 60] + "\n")
        f.write(f">{CONTIG_2} synthetic contig 2\n")
        for i in range(0, len(c2), 60):
            f.write(c2[i : i + 60] + "\n")
    return path


def write_gff3(path: str) -> str:
    rows = [
        # contig 1: GENE1 forward, two CDS under one mRNA
        (CONTIG_1, "test", "gene", 41, 140, ".", "+", ".", "ID=GENE1;Name=gene_one"),
        (CONTIG_1, "test", "mRNA", 41, 140, ".", "+", ".", "ID=GENE1.1;Parent=GENE1"),
        (CONTIG_1, "test", "CDS", 51, 80, ".", "+", "0", "ID=GENE1.1.CDS;Parent=GENE1.1"),
        (CONTIG_1, "test", "CDS", 101, 130, ".", "+", "0", "ID=GENE1.1.CDS;Parent=GENE1.1"),
        # contig 2: GENE2 reverse, single CDS
        (CONTIG_2, "test", "gene", 111, 190, ".", "-", ".", "ID=GENE2"),
        (CONTIG_2, "test", "mRNA", 111, 190, ".", "-", ".", "ID=GENE2.1;Parent=GENE2"),
        (CONTIG_2, "test", "CDS", 121, 180, ".", "-", "0", "ID=GENE2.1.CDS;Parent=GENE2.1"),
        # an ncRNA gene with exons only
        (CONTIG_1, "test", "ncRNA_gene", 201, 260, ".", "+", ".", "ID=NCG1"),
        (CONTIG_1, "test", "transcript", 201, 260, ".", "+", ".", "ID=NCG1.1;Parent=NCG1"),
        (CONTIG_1, "test", "exon", 201, 230, ".", "+", ".", "ID=NCG1.1.e1;Parent=NCG1.1"),
        (CONTIG_1, "test", "exon", 241, 260, ".", "+", ".", "ID=NCG1.1.e2;Parent=NCG1.1"),
    ]
    with open(path, "w") as f:
        f.write("##gff-version 3\n")
        for row in rows:
            f.write("\t".join(str(x) for x in row) + "\n")
    return path


def write_gaf(path: str) -> str:
    rows = [
        ("TESTDB", "GENE1", "g1", "", "GO:0000001", "PMID:1", "IEA", "", "P", "", "", "protein", "taxon:1", "20240101", "TESTDB"),
        ("TESTDB", "GENE1", "g1", "", "GO:0000002", "PMID:1", "IEA", "", "F", "", "", "protein", "taxon:1", "20240101", "TESTDB"),
        ("TESTDB", "GENE2", "g2", "NOT", "GO:0000003", "PMID:1", "IEA", "", "P", "", "", "protein", "taxon:1", "20240101", "TESTDB"),
        ("TESTDB", "GENE2", "g2", "", "GO:0000001", "PMID:1", "IEA", "", "P", "", "", "protein", "taxon:1", "20240101", "TESTDB"),
    ]
    with open(path, "w") as f:
        f.write("!gaf-version: 2.1\n")
        for row in rows:
            f.write("\t".join(row) + "\n")
    return path


def make_genome_files(tmpdir) -> dict:
    base = str(tmpdir)
    return {
        "fasta": write_fasta(os.path.join(base, "genome.fasta")),
        "gff": write_gff3(os.path.join(base, "genome.gff3")),
        "gaf": write_gaf(os.path.join(base, "genome.gaf")),
    }
