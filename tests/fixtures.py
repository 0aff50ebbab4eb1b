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


# --------------------------------------------------------------------------- #
# synthetic Pf-style diploid VCF over contig 1
# --------------------------------------------------------------------------- #
VCF_SAMPLES = ["S1", "S2", "S3", "S4"]


def vcf_variant_specs():
    """The synthetic variant records: (pos0, ref, alt(s), genotypes).

    Genotypes are (gt, ad, dp, gq) per sample in VCF_SAMPLES order.
    """
    c1 = build_contig1()
    return [
        # SNP inside GENE1 CDS1 at 0-based 55 (T in the coding frame).
        dict(contig=CONTIG_1, pos0=55, ref=c1[55], alts=[("A" if c1[55] != "A" else "G")],
             info="AF=0.5;DP=100;VALIDATED",
             genotypes=[("0/1", "10,12", 22, 60.0), ("1/1", "0,25", 25, 90.0),
                        ("0/0", "30,0", 30, 99.0), ("0/1", "8,9", 17, 45.0)]),
        # In-frame 3-base deletion in CDS2: ref c1[107:111], alt c1[107].
        dict(contig=CONTIG_1, pos0=107, ref=c1[107:111], alts=[c1[107]],
             info="AF=0.25;DP=80",
             genotypes=[("0/1", "12,8", 20, 50.0), ("0/0", "28,0", 28, 99.0),
                        ("0/0", "31,0", 31, 99.0), ("1/1", "0,18", 18, 77.0)]),
        # Insertion of GGG after 0-based 60.
        dict(contig=CONTIG_1, pos0=60, ref=c1[60], alts=[c1[60] + "GGG"],
             info="AF=0.125;DP=60",
             genotypes=[("0/0", "25,0", 25, 99.0), ("0/1", "11,9", 20, 66.0),
                        ("0/0", "27,0", 27, 99.0), ("0/0", "22,0", 22, 99.0)]),
        # Multi-allelic SNP outside genes at 0-based 10.
        dict(contig=CONTIG_1, pos0=10, ref=c1[10],
             alts=[a for a in "ACGT" if a != c1[10]][:2],
             info="AF=0.1,0.05;DP=90",
             genotypes=[("1/2", "5,8,7", 20, 33.0), ("0/1", "15,5", 20, 60.0),
                        ("0/0", "30,0,0", 30, 99.0), ("0/2", "12,0,6", 18, 41.0)]),
    ]


def write_vcf(path: str) -> str:
    import textwrap
    specs = vcf_variant_specs()
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write(f"##contig=<ID={CONTIG_1},length=400>\n")
        f.write(f"##contig=<ID={CONTIG_2},length=300>\n")
        f.write('##INFO=<ID=AF,Number=A,Type=Float,Description="Allele freq">\n')
        f.write('##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">\n')
        f.write('##INFO=<ID=VALIDATED,Number=0,Type=Flag,Description="Validated">\n')
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n')
        f.write('##FORMAT=<ID=AD,Number=R,Type=Integer,Description="Allele depth">\n')
        f.write('##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">\n')
        f.write('##FORMAT=<ID=GQ,Number=1,Type=Float,Description="Qual">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + "\t".join(VCF_SAMPLES) + "\n")
        for i, spec in enumerate(specs):
            gts = "\t".join(
                f"{gt}:{ad}:{dp}:{gq}" for gt, ad, dp, gq in spec["genotypes"]
            )
            f.write(
                f"{spec['contig']}\t{spec['pos0'] + 1}\trs{i}\t{spec['ref']}\t"
                f"{','.join(spec['alts'])}\t100\tPASS\t{spec['info']}\tGT:AD:DP:GQ\t{gts}\n"
            )
    return path
