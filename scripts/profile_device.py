"""Break the e2e fetch_s into per-step compute: time each transcript's snp
and indel step fetch separately, and report batch routing/shapes."""
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
pop, _header, info = parse_vcf_population(paths.vcf, "pop", "PF_DIPLOID")
mutator = MutateGenes(contig, info_store=info, k_bucket=32, b_bucket=256)
txs = [contig.get_transcription(paths.gene_id(g), paths.transcript_id(g))
       for g in range(paths.n_genes)]

batches = []
for tx in txs:
    snp_batch, indel_batch, empty_ids, host_ids = mutator._capture(pop, tx, True)
    n_snp = len(snp_batch.genome_ids) if snp_batch else 0
    n_ind = len(indel_batch.genome_ids) if indel_batch else 0
    print(f"{tx.transcript_id}: snp={n_snp} indel={n_ind} empty={len(empty_ids)} host={len(host_ids)}")
    if snp_batch is not None and snp_batch.genome_ids:
        print(f"   snp shapes: pos{snp_batch.positions.shape}")
    if indel_batch is not None and indel_batch.genome_ids:
        b = indel_batch
        print(f"   indel shapes: pos{b.pos.shape} ins{b.ins_codes.shape} edit_bound={b.edit_bound}")
    batches.append((tx, snp_batch, indel_batch))

# warm all steps
for tx, sb, ib in batches:
    if sb is not None and sb.genome_ids:
        np.asarray(mutator._device_dispatch(sb, tx))
    if ib is not None and ib.genome_ids:
        np.asarray(mutator._device_dispatch_indel(ib, tx))

for tx, sb, ib in batches:
    if sb is not None and sb.genome_ids:
        t0 = time.perf_counter()
        p = mutator._device_dispatch(sb, tx); r = np.asarray(p)
        print(f"{tx.transcript_id} snp step+fetch: {(time.perf_counter()-t0)*1000:.1f} ms  out {r.shape} = {r.nbytes/1e3:.0f} KB")
    if ib is not None and ib.genome_ids:
        t0 = time.perf_counter()
        p = mutator._device_dispatch_indel(ib, tx); r = np.asarray(p)
        print(f"{tx.transcript_id} indel step+fetch: {(time.perf_counter()-t0)*1000:.1f} ms  out {r.shape} = {r.nbytes/1e3:.0f} KB")

# pure RTT measure: fetch a tiny device array
x = jax.device_put(np.zeros(8, np.uint8))
for _ in range(2):
    t0 = time.perf_counter(); np.asarray(x); rtt = time.perf_counter()-t0
print(f"pure fetch RTT (8B): {rtt*1000:.1f} ms")
# 1 MB fetch
y = jax.device_put(np.zeros(1_000_000, np.uint8))
np.asarray(y)
t0 = time.perf_counter(); np.asarray(y); t = time.perf_counter()-t0
print(f"1 MB fetch: {t*1000:.1f} ms")
