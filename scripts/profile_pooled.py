"""Measure the REAL pooled mutate_transcripts path end to end."""
import os, sys, tempfile, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kgl_gene_tpu.analysis.lib_seqmutation import MutateGenes
from kgl_gene_tpu.genome.genome import GenomeReference
from kgl_gene_tpu.io.synthetic import generate_population_files
from kgl_gene_tpu.io.vcf import parse_vcf_population

tmp = tempfile.mkdtemp()
paths = generate_population_files(
    tmp, n_samples=256, contig_len=120_000, n_genes=4,
    n_records=3_000, coding_len=3_000, snp_only=False,
)
genome = GenomeReference.create_genome_database("synthetic", paths.fasta, paths.gff3)
contig = genome.get_contig(paths.contig_id)


def one_pass():
    t0 = time.perf_counter()
    pop, _header, info = parse_vcf_population(paths.vcf, "pop", "PF_DIPLOID")
    t1 = time.perf_counter()
    mutator = MutateGenes(contig, info_store=info, k_bucket=32, b_bucket=256)
    txs = [contig.get_transcription(paths.gene_id(g), paths.transcript_id(g))
           for g in range(paths.n_genes)]
    results = mutator.mutate_transcripts(pop, txs)
    t2 = time.perf_counter()
    n = sum(len(r) for r, _ in results)
    return n, t1 - t0, t2 - t1, t2 - t0


one_pass()  # warm (compiles the pooled program)
for _ in range(4):
    n, parse_s, mut_s, tot = one_pass()
    print(f"records={n} parse={parse_s*1000:.1f}ms mutate={mut_s*1000:.1f}ms total={tot*1000:.1f}ms -> {n/tot:.0f} genomes/s")
