"""Benchmark: flagship population x transcript forward step on one chip.

Workload (BASELINE.json config[0/1] class): a Pf-gene-scale transcript
(3,000 coding bases from a 4,800 bp region, two exons) mutated across a
batch of sample genomes — per-sample SNP apply, exon splice, translation,
exact edit distance of every mutant coding sequence vs the reference
(anti-diagonal wavefront DP), and allele-count reduction.

Prints ONE JSON line: sample-genomes/s/chip plus the alignment GCUPS.
vs_baseline compares against a 100-thread edlib CPU workstation estimate
for the same per-sample work (the reference's target platform,
README.md:24-27): edlib NW ~1.0 GCUPS/core scalar but the full reference
pipeline measured ~0.05 genomes/s/thread at this gene scale -> ~5
genomes/s at 100 threads (no published numbers exist; BASELINE.md).
"""

import json
import os
import time

import numpy as np

# Persistent compilation cache: the remote TPU compile of the wavefront
# kernel is slow the first time; the cache (pre-warmed during development)
# makes driver runs start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kgl_gene_tpu.ops.pipeline import make_forward_step

    rng = np.random.default_rng(0)

    REGION = 4800
    EXONS = np.array([[400, 1900], [2400, 3900]], dtype=np.int64)  # 3000 coding bases
    COD = int((EXONS[:, 1] - EXONS[:, 0]).sum())
    BATCH = 256
    SNPS = 48

    region = rng.integers(0, 4, size=REGION).astype(np.uint8)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    step = make_forward_step(region, EXONS, region_start=0, use_pallas=on_tpu)

    positions = rng.integers(0, REGION, size=(BATCH, SNPS)).astype(np.int32)
    alt_codes = rng.integers(0, 4, size=(BATCH, SNPS)).astype(np.uint8)
    valid = rng.random((BATCH, SNPS)) < 0.8

    # Warm up / compile.
    out = step(positions, alt_codes, valid)
    jax.block_until_ready(out)

    iters = 10
    start = time.perf_counter()
    for _ in range(iters):
        out = step(positions, alt_codes, valid)
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - start) / iters

    genomes_per_s = BATCH / elapsed
    # DP cells per forward: B x COD x COD (mutant vs reference coding).
    gcups = BATCH * COD * COD / elapsed / 1e9

    cpu_baseline_genomes_per_s = 5.0  # 100-thread edlib-class estimate (see docstring)
    result = {
        "metric": "sample-genomes/s/chip (variant apply + alignment)",
        "value": round(genomes_per_s, 3),
        "unit": "genomes/s",
        "vs_baseline": round(genomes_per_s / cpu_baseline_genomes_per_s, 3),
        "alignment_gcups": round(gcups, 3),
        "batch": BATCH,
        "coding_bases": COD,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
