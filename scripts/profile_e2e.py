"""Per-stage profile of the e2e product path (VERDICT r3 weak #1).

Times parse / capture / dispatch / fetch / unpack separately for the bench
workload (256 samples x 4 genes, 3000 records, 10% indels).
"""
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kgl_gene_tpu.analysis.lib_seqmutation import MutateGenes, _concat_packed
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


def one_pass(timings):
    t0 = time.perf_counter()
    pop, _header, info = parse_vcf_population(paths.vcf, "pop", "PF_DIPLOID")
    t1 = time.perf_counter()
    timings.setdefault("parse_s", []).append(t1 - t0)
    mutator = MutateGenes(contig, info_store=info, k_bucket=32, b_bucket=256)
    txs = [
        contig.get_transcription(paths.gene_id(g), paths.transcript_id(g))
        for g in range(paths.n_genes)
    ]
    # --- manual replay of mutate_transcripts with stage timers ---
    from kgl_gene_tpu.analysis.lib_seqmutation import MutateStats
    t_cap = t_disp = 0.0
    preps, packed_devs = [], []
    for transcript in txs:
        tc0 = time.perf_counter()
        snp_batch, indel_batch, empty_ids, host_ids = mutator._capture(
            pop, transcript, True)
        t_cap += time.perf_counter() - tc0
        stats = MutateStats(); stats.total_genomes = pop.genome_count()
        i = len(preps)
        td0 = time.perf_counter()
        if snp_batch is not None and snp_batch.genome_ids:
            packed_devs.append((i, "snp", mutator._device_dispatch(snp_batch, transcript)))
        if indel_batch is not None and indel_batch.genome_ids:
            packed_devs.append((i, "indel", mutator._device_dispatch_indel(indel_batch, transcript)))
        t_disp += time.perf_counter() - td0
        preps.append((transcript, snp_batch, indel_batch, empty_ids, host_ids, stats))
    timings.setdefault("capture_s", []).append(t_cap)
    timings.setdefault("dispatch_s", []).append(t_disp)

    tf0 = time.perf_counter()
    fetched = {}
    live = [p for (_i, _w, p) in packed_devs]
    if len(live) > 1:
        fused = np.asarray(_concat_packed(live), dtype=np.uint8)
        widths = [int(p.shape[1]) for p in live]
        offsets = np.cumsum([0] + widths)
        for j, (i, which, _p) in enumerate(packed_devs):
            fetched[(i, which)] = fused[:, offsets[j]: offsets[j + 1]]
    timings.setdefault("fetch_s", []).append(time.perf_counter() - tf0)

    tu0 = time.perf_counter()
    results = []
    for i, (transcript, snp_batch, indel_batch, empty_ids, host_ids, stats) in enumerate(preps):
        by_id = {}
        reference_coding = contig.coding_sequence(transcript).to_string()
        ref_validity = contig.check_valid_transcript(transcript)
        from kgl_gene_tpu.analysis.lib_seqmutation import TranscriptMutateRecord
        for genome_id in empty_ids:
            by_id[genome_id] = TranscriptMutateRecord(
                genome_id, transcript.gene.feature_id, transcript.transcript_id,
                0, reference_coding, ref_validity)
        for genome_id in host_ids:
            contig_db = pop.get_genome(genome_id).get_contig(contig.contig_id)
            by_id[genome_id] = mutator._host_mutate(genome_id, contig_db, transcript, stats)
        if (i, "snp") in fetched:
            for rec in mutator._device_collect(fetched[(i, "snp")], snp_batch, transcript,
                                               transcript.coding_nucleotides(), stats):
                by_id[rec.genome_id] = rec
        if (i, "indel") in fetched:
            for rec in mutator._device_collect_indel(fetched[(i, "indel")], indel_batch, transcript, stats):
                by_id[rec.genome_id] = rec
        results.append(([by_id[g] for g in sorted(by_id)], stats))
    timings.setdefault("unpack_s", []).append(time.perf_counter() - tu0)
    n_records = sum(len(r) for r, _ in results)
    timings.setdefault("total_s", []).append(time.perf_counter() - t0)
    return n_records, len(host_ids_all := [h for (_t, _s, _i, _e, h, _st) in preps for h in [None]])


timings = {}
one_pass(timings)  # warm
timings = {}
for _ in range(3):
    n, _ = one_pass(timings)
print(f"records/pass: {n}")
for k, v in timings.items():
    print(f"  {k}: med {np.median(v)*1000:.1f} ms  (runs: {[round(x*1000,1) for x in v]})")
print(f"genomes/s: {n / np.median(timings['total_s']):.0f}")
