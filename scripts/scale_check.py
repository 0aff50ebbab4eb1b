"""Chromosome-scale synthetic workload: ingest + stats + mutate timing.

Generates a Pf-chromosome-class dataset (500 kb contig, 50 genes,
100 samples, ~5,000 variant records), runs the full pipeline stages and
prints per-stage timings — the driver for ingest/throughput tuning
(BASELINE.json config[1])."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate(tmp, n_samples=100, contig_len=500_000, n_genes=50, n_records=5000):
    rng = np.random.default_rng(0)
    bases = "ACGT"
    contig = rng.integers(0, 4, contig_len)
    contig_str = "".join(bases[b] for b in contig)
    fasta = os.path.join(tmp, "chr.fasta")
    with open(fasta, "w") as f:
        f.write(">Pf_chr1\n")
        for i in range(0, contig_len, 80):
            f.write(contig_str[i : i + 80] + "\n")
    gff = os.path.join(tmp, "chr.gff3")
    gene_span = contig_len // n_genes
    with open(gff, "w") as f:
        f.write("##gff-version 3\n")
        for g in range(n_genes):
            start = g * gene_span + 1000
            end = start + 2999  # 3kb single-exon CDS
            f.write(f"Pf_chr1\tsyn\tgene\t{start}\t{end}\t.\t+\t.\tID=G{g}\n")
            f.write(f"Pf_chr1\tsyn\tmRNA\t{start}\t{end}\t.\t+\t.\tID=G{g}.1;Parent=G{g}\n")
            f.write(f"Pf_chr1\tsyn\tCDS\t{start}\t{end}\t.\t+\t0\tID=G{g}.1.c;Parent=G{g}.1\n")
    # VCF: n_records positions, mostly SNPs, per-sample genotypes.
    vcf = os.path.join(tmp, "pop.vcf")
    samples = [f"S{i:03d}" for i in range(n_samples)]
    positions = np.sort(rng.choice(contig_len - 10, n_records, replace=False))
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write(f"##contig=<ID=Pf_chr1,length={contig_len}>\n")
        f.write('##INFO=<ID=AF,Number=A,Type=Float,Description="af">\n')
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">\n')
        f.write('##FORMAT=<ID=AD,Number=R,Type=Integer,Description="ad">\n')
        f.write('##FORMAT=<ID=DP,Number=1,Type=Integer,Description="dp">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + "\t".join(samples) + "\n")
        af_values = rng.beta(0.5, 3.0, n_records)
        for r, pos in enumerate(positions):
            ref = bases[contig[pos]]
            alt = bases[(contig[pos] + 1 + rng.integers(0, 3)) % 4]
            af = af_values[r]
            gts = []
            carriers = rng.random(n_samples) < af
            hom = rng.random(n_samples) < af
            for s in range(n_samples):
                if carriers[s]:
                    gt = "1/1" if hom[s] else "0/1"
                    ad = f"{rng.integers(0, 20)},{rng.integers(5, 40)}"
                else:
                    gt = "0/0"
                    ad = f"{rng.integers(20, 40)},0"
                gts.append(f"{gt}:{ad}:{rng.integers(20, 60)}")
            f.write(f"Pf_chr1\t{pos + 1}\trs{r}\t{ref}\t{alt}\t99\tPASS\t"
                    f"AF={af:.4f}\tGT:AD:DP\t" + "\t".join(gts) + "\n")
    return fasta, gff, vcf


def main():
    import tempfile

    # Host-pipeline timing: run the JAX stages on CPU (the TPU path is
    # exercised by bench.py; the remote-compile latency of fresh shapes
    # would swamp these stage timings).
    import jax

    jax.config.update("jax_platforms", "cpu")

    from kgl_gene_tpu.genome.genome import GenomeReference
    from kgl_gene_tpu.io.vcf import parse_vcf_population
    from kgl_gene_tpu.stats.inbreeding import LocusData, inbreeding_all
    from kgl_gene_tpu.variant.columnar import VariantMajorView

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        fasta, gff, vcf = generate(tmp)
        t1 = time.perf_counter()
        print(f"generate: {t1 - t0:.2f}s  vcf size {os.path.getsize(vcf)/1e6:.1f} MB")

        genome = GenomeReference.create_genome_database("Pf", fasta, gff)
        t2 = time.perf_counter()
        print(f"genome load: {t2 - t1:.2f}s ({genome.gene_count()} genes)")

        pop, header, info = parse_vcf_population(vcf, "pop", "PF_DIPLOID")
        t3 = time.perf_counter()
        n_inc = pop.variant_count()
        print(f"VCF ingest: {t3 - t2:.2f}s ({n_inc} incidences, "
              f"{n_inc / (t3 - t2):.0f} incidences/s, "
              f"{5000 * 100 / (t3 - t2):.0f} genotype-cells/s)")

        total, failed = pop.validate(genome)
        t4 = time.perf_counter()
        print(f"validate: {t4 - t3:.2f}s ({failed}/{total} failed)")

        view = VariantMajorView(pop)
        t5 = time.perf_counter()
        print(f"variant-major view: {t5 - t4:.2f}s "
              f"({view.genome_count}x{view.variant_count})")

        data = LocusData(zygosity=view.zygosity,
                         minor_freq=view.allele_frequencies())
        results = inbreeding_all(data)
        t6 = time.perf_counter()
        print(f"inbreeding x4 algorithms: {t6 - t5:.2f}s")

        # transcript mutation for 5 genes x 100 genomes
        from kgl_gene_tpu.analysis.lib_seqmutation import MutateGenes

        contig = genome.get_contig("Pf_chr1")
        for g in range(3):
            tx = contig.get_transcription(f"G{g}", f"G{g}.1")
            mutator = MutateGenes(contig, info_store=info)
            records, stats = mutator.mutate_transcript(pop, tx)
        t7 = time.perf_counter()
        print(f"transcript mutate (3 genes x 100 genomes): {t7 - t6:.2f}s "
              f"({300 / (t7 - t6):.0f} genome-transcripts/s host path)")


if __name__ == "__main__":
    main()
