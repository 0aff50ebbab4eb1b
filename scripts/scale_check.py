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
    from kgl_gene_tpu.io.synthetic import generate_population_files

    paths = generate_population_files(
        tmp, n_samples=n_samples, contig_len=contig_len, n_genes=n_genes,
        n_records=n_records,
    )
    return paths.fasta, paths.gff3, paths.vcf


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
