"""End-to-end product path on generated data: synthetic FASTA/GFF3/VCF ->
native ingest -> transcript capture -> forward step -> family statistics.

This is the test-scale version of bench.py's e2e measurement (VCF ->
device, the workload of kga_analytic/kga_analysis_library/
kga_analysis_lib_seqmutation.cpp:116-240), asserting the device-routed
records byte-match the host-exact engine.
"""

import numpy as np
import pytest

from kgl_gene_tpu.analysis.lib_seqmutation import MutateGenes, TranscriptFamilyAnalysis
from kgl_gene_tpu.genome.genome import GenomeReference
from kgl_gene_tpu.io.synthetic import generate_population_files
from kgl_gene_tpu.io.vcf import parse_vcf_population
from kgl_gene_tpu.ops.edit_distance import levenshtein_numpy, pairwise_distance_matrix


@pytest.fixture(scope="module")
def synthetic_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("syn")
    paths = generate_population_files(
        str(tmp), n_samples=12, contig_len=24_000, n_genes=2,
        n_records=600, coding_len=300, seed=3,
    )
    genome = GenomeReference.create_genome_database("syn", paths.fasta, paths.gff3)
    pop, header, info = parse_vcf_population(paths.vcf, "pop", "PF_DIPLOID")
    return paths, genome, pop, info


def test_e2e_device_matches_host(synthetic_run):
    paths, genome, pop, info = synthetic_run
    contig = genome.get_contig(paths.contig_id)
    assert pop.genome_count() == paths.n_samples
    for g in range(paths.n_genes):
        tx = contig.get_transcription(paths.gene_id(g), paths.transcript_id(g))
        device_recs, device_stats = MutateGenes(
            contig, info_store=info, k_bucket=16, b_bucket=16
        ).mutate_transcript(pop, tx)
        host_recs, host_stats = MutateGenes(
            contig, info_store=info, use_device=False
        ).mutate_transcript(pop, tx)
        assert len(device_recs) == paths.n_samples
        for d, h in zip(device_recs, host_recs):
            assert d.genome_id == h.genome_id
            assert d.modified_coding == h.modified_coding
            assert d.validity == h.validity
            assert d.variant_count == h.variant_count
        assert device_stats.total_snp == host_stats.total_snp
        assert device_stats.mutant_genomes == host_stats.mutant_genomes


def test_e2e_family_report_distances(synthetic_run):
    paths, genome, pop, info = synthetic_run
    contig = genome.get_contig(paths.contig_id)
    tx = contig.get_transcription(paths.gene_id(1), paths.transcript_id(1))
    records, _ = MutateGenes(contig, info_store=info).mutate_transcript(pop, tx)
    ref_coding = contig.coding_sequence(tx).to_string()
    fam = TranscriptFamilyAnalysis(records, ref_coding)
    distances = fam.reference_distances()
    from kgl_gene_tpu.sequence.alphabet import DNA5

    ref_codes = DNA5.from_string(ref_coding)
    for seq, d in distances.items():
        assert d == levenshtein_numpy(DNA5.from_string(seq), ref_codes)


def test_pairwise_banded_tail_padding():
    """band_k path with a ragged final chunk must equal the oracle."""
    rng = np.random.default_rng(7)
    base = rng.integers(0, 4, 400).astype(np.uint8)
    n = 9  # 36 pairs -> chunks of 16: 16 + 16 + ragged 4 (padded)
    seqs = np.tile(base, (n, 1))
    for i in range(1, n):
        idx = rng.choice(400, 11, replace=False)
        seqs[i, idx] = (seqs[i, idx] + 1 + rng.integers(0, 3, 11)) % 4
    lens = np.full(n, 400, np.int32)
    got = pairwise_distance_matrix(seqs, lens, batch_pairs=16, band_k=63)
    want = np.array(
        [[levenshtein_numpy(seqs[i], seqs[j]) for j in range(n)] for i in range(n)],
        dtype=np.float64,
    )
    assert np.array_equal(got, want)
