"""Isolate pooled-program execution time from capture/unpack/parse."""
import os, sys, tempfile, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kgl_gene_tpu.analysis.lib_seqmutation import MutateGenes, MutateStats
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

# capture all
steps, specs, step_txs, flat_inputs = [], [], [], []
for transcript in txs:
    snp_batch, indel_batch, empty_ids, host_ids = mutator._capture(pop, transcript, True)
    if snp_batch is not None and snp_batch.genome_ids:
        specs.append(("snp", transcript.transcript_id, transcript.start, transcript.end))
        flat_inputs += [snp_batch.positions, snp_batch.alt_codes, snp_batch.valid]
        step_txs.append(transcript)
    if indel_batch is not None and indel_batch.genome_ids:
        b = indel_batch
        K, A = b.pos.shape[1], b.ins_codes.shape[2]
        pad_c = ((max(K * A, 3) + 2) // 3) * 3
        band_k = 63 if b.edit_bound <= 63 else (127 if b.edit_bound <= 127 else 0)
        specs.append(("indel", transcript.transcript_id, transcript.start, transcript.end, pad_c, band_k))
        flat_inputs += [b.pos, b.kind, b.del_len, b.ins_codes, b.ins_len, b.alt_code, b.valid]
        step_txs.append(transcript)

fn, _ = mutator._pooled_program(tuple(specs), step_txs)
r = np.asarray(fn(*flat_inputs))  # warm
print("out:", r.shape, r.nbytes / 1e3, "KB")
for _ in range(4):
    t0 = time.perf_counter()
    r = np.asarray(fn(*flat_inputs), dtype=np.uint8)
    print(f"pooled exec+fetch: {(time.perf_counter()-t0)*1000:.1f} ms")

# device-resident inputs: measures pure execute+download (no upload)
dev_inputs = [jax.device_put(a) for a in flat_inputs]
np.asarray(fn(*dev_inputs))
for _ in range(3):
    t0 = time.perf_counter()
    r = np.asarray(fn(*dev_inputs), dtype=np.uint8)
    print(f"pooled exec+fetch (device inputs): {(time.perf_counter()-t0)*1000:.1f} ms")

# --- ablation: snp-only vs indel-only pooled programs ---
snp_specs, snp_txs, snp_in = [], [], []
ind_specs, ind_txs, ind_in = [], [], []
it = iter(flat_inputs)
for spec, tx in zip(specs, step_txs):
    n = 3 if spec[0] == "snp" else 7
    args = [next(it) for _ in range(n)]
    if spec[0] == "snp":
        snp_specs.append(spec); snp_txs.append(tx); snp_in += args
    else:
        ind_specs.append(spec); ind_txs.append(tx); ind_in += args

m2 = MutateGenes(contig, info_store=info, k_bucket=32, b_bucket=256)
fs, _ = m2._pooled_program(tuple(snp_specs), snp_txs)
np.asarray(fs(*snp_in))
best = 1e9
for _ in range(5):
    t0 = time.perf_counter(); np.asarray(fs(*snp_in)); best = min(best, time.perf_counter()-t0)
print(f"snp-only pooled ({len(snp_specs)} steps): min {best*1000:.1f} ms")

fi, _ = m2._pooled_program(tuple(ind_specs), ind_txs)
np.asarray(fi(*ind_in))
best = 1e9
for _ in range(5):
    t0 = time.perf_counter(); np.asarray(fi(*ind_in)); best = min(best, time.perf_counter()-t0)
print(f"indel-only pooled ({len(ind_specs)} steps): min {best*1000:.1f} ms")

best = 1e9
for _ in range(6):
    t0 = time.perf_counter(); np.asarray(fn(*flat_inputs)); best = min(best, time.perf_counter()-t0)
print(f"full pooled: min {best*1000:.1f} ms")
