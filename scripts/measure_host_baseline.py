"""Measure the single-thread host-path genome rate that grounds
bench.py's vs_baseline denominator (BASELINE.md "Measured CPU baseline").

Runs the repo's own host-exact engine (SequenceTranscript mutate +
numpy row-DP distance) at the bench gene scale and prints the
single-thread and 100-thread-extrapolated genome rates."""

import sys
import tempfile
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from kgl_gene_tpu.analysis.lib_seqmutation import MutateGenes, MutateStats
from kgl_gene_tpu.genome.genome import GenomeReference
from kgl_gene_tpu.io.synthetic import generate_population_files
from kgl_gene_tpu.io.vcf import parse_vcf_population
from kgl_gene_tpu.ops.edit_distance import levenshtein_numpy


def main():
    rng = np.random.default_rng(0)
    S = 3000
    a = rng.integers(0, 4, S).astype(np.uint8)
    b = a.copy()
    idx = rng.choice(S, 48, replace=False)
    b[idx] = (b[idx] + 1) % 4
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        levenshtein_numpy(a, b)
    dp_s = (time.perf_counter() - t0) / n
    print(f"host DP (3kb x 3kb): {dp_s * 1000:.1f} ms/pair")

    tmp = tempfile.mkdtemp()
    paths = generate_population_files(
        tmp, n_samples=8, contig_len=120_000, n_genes=1, n_records=400,
        coding_len=3_000, snp_only=False,
    )
    genome = GenomeReference.create_genome_database(
        "s", paths.fasta, paths.gff3
    )
    contig = genome.get_contig(paths.contig_id)
    pop, _h, info = parse_vcf_population(paths.vcf, "pop", "PF_DIPLOID")
    tx = contig.get_transcription(paths.gene_id(0), paths.transcript_id(0))
    mut = MutateGenes(contig, info_store=info, use_device=False)
    stats = MutateStats()
    gids = [g for g, _ in pop][:8]
    t0 = time.perf_counter()
    for gid in gids:
        cdb = pop.get_genome(gid).get_contig(paths.contig_id)
        mut._host_mutate(gid, cdb, tx, stats)
    mut_s = (time.perf_counter() - t0) / len(gids)
    total = mut_s + dp_s
    print(f"host mutate engine: {mut_s * 1000:.2f} ms/genome")
    print(f"single-thread: {1 / total:.2f} genomes/s")
    print(f"100-thread extrapolation: {100 / total:.1f} genomes/s")


if __name__ == "__main__":
    sys.exit(main())
