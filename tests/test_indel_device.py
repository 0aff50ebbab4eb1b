"""Device-side indel apply (ops/pipeline.py _forward_indel): exactness vs a
direct AdjustedSequence-style Python oracle over random SNP/insert/delete
cocktails (SURVEY.md section 7 hard part (a))."""

import numpy as np
import pytest

from kgl_gene_tpu.ops.edit_distance import levenshtein_numpy
from kgl_gene_tpu.ops.pipeline import make_indel_forward_step
from kgl_gene_tpu.sequence.alphabet import DNA5
from kgl_gene_tpu.sequence.tables import amino_translation_table


def _oracle_apply(region, exons, slots, reverse=False):
    """AdjustedSequence semantics: SNPs in place, indels front-to-back with
    slice rebuilding; exon bounds through the cumulative offset map."""
    base = region.copy()
    indels = []
    for (pos, kind, dlen, icodes, ilen, alt) in slots:
        if kind == 0:
            base[pos] = alt
        else:
            indels.append((pos, kind, dlen, icodes, ilen))
    indels.sort(key=lambda s: s[0])
    pieces, cursor, events = [], 0, []
    for (pos, kind, dlen, icodes, ilen) in indels:
        if kind == 1:
            ds, de = max(pos, 0), min(pos + dlen, len(base))
            if de <= ds:
                continue
            if ds > cursor:
                pieces.append(base[cursor:ds])
            cursor = de
            events.append((ds, -(de - ds)))
        else:
            if pos < 0 or pos > len(base):
                continue
            if pos > cursor:
                pieces.append(base[cursor:pos])
                cursor = pos
            pieces.append(np.asarray(icodes[:ilen], dtype=np.uint8))
            events.append((pos, ilen))
    pieces.append(base[cursor:])
    modified = np.concatenate(pieces) if pieces else np.empty(0, np.uint8)

    def m(x):
        shift = 0
        for (ep, delta) in events:
            if ep <= x:
                if delta < 0:
                    de = ep - delta
                    shift += -(x - ep) if x < de else delta
                else:
                    shift += delta
            else:
                break
        return x + shift

    parts = [modified[m(lo): m(hi)] for lo, hi in exons]
    coding = np.concatenate(parts) if parts else np.empty(0, np.uint8)
    if reverse:
        coding = DNA5.COMPLEMENT[coding[::-1]]
    return coding


def _random_slots(rng, L, K, A, exons):
    """Random slot set satisfying the device preconditions: sorted indel
    spans non-interacting, ins_len <= A."""
    slots = []
    used = []  # blocked intervals [lo, hi)
    n = int(rng.integers(0, K + 1))
    positions = rng.permutation(L - 1)[: 3 * n]
    for p in positions:
        if len(slots) >= n:
            break
        p = int(p)
        kind = int(rng.integers(0, 3))
        if kind == 1:
            dlen = int(rng.integers(1, 6))
            span = (p, min(p + dlen, L) + 1)
        else:
            span = (p, p + 2)
        if any(span[0] < hi and span[1] > lo for lo, hi in used):
            continue
        used.append(span)
        if kind == 0:
            slots.append((p, 0, 0, np.zeros(A, np.uint8), 0,
                          int(rng.integers(0, 4))))
        elif kind == 1:
            slots.append((p, 1, dlen, np.zeros(A, np.uint8), 0, 0))
        else:
            ilen = int(rng.integers(1, A + 1))
            codes = rng.integers(0, 4, size=A).astype(np.uint8)
            slots.append((p, 2, 0, codes, ilen, 0))
    return slots


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("reverse", [False, True])
def test_indel_step_matches_oracle(seed, reverse):
    rng = np.random.default_rng(seed)
    L, K, A = 300, 8, 6
    region = rng.integers(0, 4, size=L).astype(np.uint8)
    exons = [(30, 120), (150, 270)]
    step = make_indel_forward_step(
        region, np.asarray(exons, dtype=np.int64) , region_start=0,
        reverse_strand=reverse, pad_coding=K * A,
    )
    B = 16
    pos = np.zeros((B, K), np.int32)
    kind = np.zeros((B, K), np.int8)
    dlen = np.zeros((B, K), np.int32)
    icodes = np.zeros((B, K, A), np.uint8)
    ilen = np.zeros((B, K), np.int32)
    alt = np.zeros((B, K), np.uint8)
    valid = np.zeros((B, K), bool)
    all_slots = []
    for b in range(B):
        slots = _random_slots(rng, L, K, A, exons)
        all_slots.append(slots)
        for s, (p, k, d, ic, il, a) in enumerate(slots):
            pos[b, s], kind[b, s], dlen[b, s] = p, k, d
            icodes[b, s], ilen[b, s], alt[b, s] = ic, il, a
            valid[b, s] = True
    out = step(pos, kind, dlen, icodes, ilen, alt, valid)
    coding = np.asarray(out.mutated_coding)
    lens = np.asarray(out.coding_len)
    dist = np.asarray(out.distance)
    vcode = np.asarray(out.validity_code)

    table = amino_translation_table("NCBI_TABLE_1")
    ref_coding = _oracle_apply(region, exons, [], reverse=reverse)
    for b in range(B):
        expect = _oracle_apply(region, exons, all_slots[b], reverse=reverse)
        assert lens[b] == len(expect), (b, all_slots[b])
        np.testing.assert_array_equal(coding[b, : lens[b]], expect, err_msg=str(b))
        assert dist[b] == levenshtein_numpy(expect, ref_coding), b
        # validity parity vs the scalar classifier
        from kgl_gene_tpu.genome.features import CodingSequenceValidity
        from kgl_gene_tpu.sequence.alphabet import AminoAcid

        if len(expect) % 3 != 0:
            assert vcode[b] == 4, b
        else:
            aa = table.translate(expect)
            no_start = len(aa) == 0 or int(aa[0]) not in set(
                int(x) for x in np.unique(table.amino_lut[table.start_lut])
            )
            stops = np.nonzero(aa == AminoAcid.STOP)[0]
            fss = int(stops[0]) + 1 if len(stops) else len(aa)
            nonsense = fss != len(aa)
            no_stop = len(aa) == 0 or int(aa[-1]) != AminoAcid.STOP
            expect_code = max(
                1 if no_stop else 0, 2 if nonsense else 0, 3 if no_start else 0
            )
            assert vcode[b] == expect_code, (b, aa[:5])


class TestIndelCaptureRouting:
    """capture_population_split + MutateGenes: indel genomes stay on
    device (byte-parity vs the host oracle), hairy cases fall back."""

    def _population(self, seed, n_genomes=24, indel_fraction=0.4):
        import sys
        sys.path.insert(0, "tests")
        from fixtures import CONTIG_1, build_contig1
        from kgl_gene_tpu.sequence.sequence import DNA5SequenceLinear
        from kgl_gene_tpu.variant.db import PopulationDB
        from kgl_gene_tpu.variant.variant import FormatData, Variant, VariantPhase

        contig_seq = build_contig1()
        rng = np.random.default_rng(seed)
        pop = PopulationDB("synth", "PF_DIPLOID")
        lo, hi = 30, 140
        for g in range(n_genomes):
            gid = f"G{g:03d}"
            pop.get_create_genome(gid)
            for _ in range(int(rng.integers(0, 6))):
                p = int(rng.integers(lo, hi))
                ref = contig_seq[p]
                roll = rng.random()
                if roll < indel_fraction / 2 and p + 4 < hi:
                    v_ref, v_alt = contig_seq[p : p + 4], ref  # 1M3D
                elif roll < indel_fraction:
                    ins = "".join(rng.choice(list("ACGT"), 3))
                    v_ref, v_alt = ref, ref + ins  # 1M3I
                else:
                    v_ref = ref
                    v_alt = str(rng.choice([b for b in "ACGT" if b != ref]))
                v = Variant(
                    contig_id=CONTIG_1, offset=p, phase=VariantPhase.UNPHASED,
                    identifier="",
                    ref=DNA5SequenceLinear.from_string(v_ref),
                    alt=DNA5SequenceLinear.from_string(v_alt),
                    format_data=FormatData(),
                )
                pop.add_variant(v, [gid])
                if rng.random() < 0.3:
                    pop.add_variant(v, [gid])
        return pop

    @pytest.mark.parametrize("seed", [0, 5, 9, 21])
    def test_device_indel_parity_fuzz(self, seed, tmp_path_factory):
        from kgl_gene_tpu.analysis.lib_seqmutation import MutateGenes
        from kgl_gene_tpu.genome.genome import GenomeReference
        from kgl_gene_tpu.mutation.capture import capture_population_split
        import sys
        sys.path.insert(0, "tests")
        from fixtures import CONTIG_1, make_genome_files

        files = make_genome_files(tmp_path_factory.mktemp("g"))
        genome = GenomeReference.create_genome_database(
            "ref", files["fasta"], files["gff"]
        )
        contig = genome.get_contig(CONTIG_1)
        tx = contig.get_transcription("GENE1", "GENE1.1")
        pop = self._population(seed)
        snp_b, indel_b = capture_population_split(
            pop, CONTIG_1, tx.interval, region_start=tx.start
        )
        assert indel_b is not None and len(indel_b.genome_ids) > 2, (
            "indel device route must engage"
        )
        mut = MutateGenes(contig)
        recs_d, stats_d = mut.mutate_transcript(pop, tx, use_device=True)
        recs_h, stats_h = mut.mutate_transcript(pop, tx, use_device=False)
        assert len(recs_d) == len(recs_h)
        for a, b in zip(recs_d, recs_h):
            assert a.genome_id == b.genome_id
            assert a.variant_count == b.variant_count, a.genome_id
            assert a.modified_coding == b.modified_coding, a.genome_id
            assert a.validity == b.validity, a.genome_id
        assert stats_d == stats_h

    def test_reverse_strand_indels(self, tmp_path_factory):
        from kgl_gene_tpu.analysis.lib_seqmutation import MutateGenes
        from kgl_gene_tpu.genome.genome import GenomeReference
        import sys
        sys.path.insert(0, "tests")
        from fixtures import CONTIG_2, make_genome_files

        files = make_genome_files(tmp_path_factory.mktemp("g2"))
        genome = GenomeReference.create_genome_database(
            "ref", files["fasta"], files["gff"]
        )
        contig = genome.get_contig(CONTIG_2)
        tx = contig.get_transcription("GENE2", "GENE2.1")

        from fixtures import build_contig2
        from kgl_gene_tpu.sequence.sequence import DNA5SequenceLinear
        from kgl_gene_tpu.variant.db import PopulationDB
        from kgl_gene_tpu.variant.variant import FormatData, Variant, VariantPhase

        seq = build_contig2()
        rng = np.random.default_rng(3)
        pop = PopulationDB("synth", "PF_DIPLOID")
        for g in range(12):
            gid = f"G{g:03d}"
            pop.get_create_genome(gid)
            p = int(rng.integers(115, 180))
            if g % 3 == 0:
                v = Variant(CONTIG_2, p, VariantPhase.UNPHASED, "",
                            DNA5SequenceLinear.from_string(seq[p : p + 3]),
                            DNA5SequenceLinear.from_string(seq[p]),
                            FormatData())
            elif g % 3 == 1:
                v = Variant(CONTIG_2, p, VariantPhase.UNPHASED, "",
                            DNA5SequenceLinear.from_string(seq[p]),
                            DNA5SequenceLinear.from_string(seq[p] + "AG"),
                            FormatData())
            else:
                alt = "A" if seq[p] != "A" else "C"
                v = Variant(CONTIG_2, p, VariantPhase.UNPHASED, "",
                            DNA5SequenceLinear.from_string(seq[p]),
                            DNA5SequenceLinear.from_string(alt), FormatData())
            pop.add_variant(v, [gid])
        mut = MutateGenes(contig)
        recs_d, stats_d = mut.mutate_transcript(pop, tx, use_device=True)
        recs_h, stats_h = mut.mutate_transcript(pop, tx, use_device=False)
        for a, b in zip(recs_d, recs_h):
            assert a.modified_coding == b.modified_coding, a.genome_id
            assert a.validity == b.validity, a.genome_id
        assert stats_d == stats_h


@pytest.mark.parametrize("seed", [5, 6])
@pytest.mark.parametrize("reverse", [False, True])
def test_host_reconstruction_matches_device(seed, reverse):
    """reconstruct_indel_coding_host (the tail-only transfer path's
    string rebuild) must be byte-exact with the device step's
    mutated_coding — identical formulas replayed in numpy."""
    from kgl_gene_tpu.ops.pipeline import reconstruct_indel_coding_host

    rng = np.random.default_rng(seed)
    L, K, A = 300, 8, 6
    region = rng.integers(0, 4, size=L).astype(np.uint8)
    exons = [(30, 120), (150, 270)]
    step = make_indel_forward_step(
        region, np.asarray(exons, dtype=np.int64), region_start=0,
        reverse_strand=reverse, pad_coding=K * A,
    )
    B = 12
    pos = np.zeros((B, K), np.int32)
    kind = np.zeros((B, K), np.int8)
    dlen = np.zeros((B, K), np.int32)
    icodes = np.zeros((B, K, A), np.uint8)
    ilen = np.zeros((B, K), np.int32)
    alt = np.zeros((B, K), np.uint8)
    valid = np.zeros((B, K), bool)
    for b in range(B):
        for s, (p, k, d, ic, il, a) in enumerate(
            _random_slots(rng, L, K, A, exons)
        ):
            pos[b, s], kind[b, s], dlen[b, s] = p, k, d
            icodes[b, s], ilen[b, s], alt[b, s] = ic, il, a
            valid[b, s] = True
    out = step(pos, kind, dlen, icodes, ilen, alt, valid)
    dev_coding = np.asarray(out.mutated_coding)
    dev_len = np.asarray(out.coding_len)
    host_coding, host_len = reconstruct_indel_coding_host(
        region, np.asarray(exons, np.int64), reverse,
        pos, kind, dlen, icodes, ilen, alt, valid, pad_coding=K * A,
    )
    np.testing.assert_array_equal(host_len, dev_len)
    for b in range(B):
        np.testing.assert_array_equal(
            host_coding[b, : host_len[b]], dev_coding[b, : dev_len[b]],
            err_msg=str(b),
        )


def test_numpy_fallback_matches_native(monkeypatch):
    """The numpy replay (native-lib-unavailable fallback) must equal the
    native single-pass reconstruction."""
    import kgl_gene_tpu.ops.pipeline as pl
    import kgl_gene_tpu.native as native_mod

    rng = np.random.default_rng(17)
    L, K, A = 300, 8, 6
    region = rng.integers(0, 4, size=L).astype(np.uint8)
    exons = np.asarray([(30, 120), (150, 270)], np.int64)
    B = 8
    pos = rng.integers(0, L, (B, K)).astype(np.int32)
    kind = rng.integers(0, 3, (B, K)).astype(np.int8)
    dlen = rng.integers(1, 5, (B, K)).astype(np.int32)
    icodes = rng.integers(0, 4, (B, K, A)).astype(np.uint8)
    ilen = rng.integers(1, A + 1, (B, K)).astype(np.int32)
    alt = rng.integers(0, 4, (B, K)).astype(np.uint8)
    valid = rng.random((B, K)) < 0.4
    for reverse in (False, True):
        nat = pl.reconstruct_indel_coding_host(
            region, exons, reverse, pos, kind, dlen, icodes, ilen, alt,
            valid, pad_coding=K * A,
        )
        monkeypatch.setattr(
            pl, "reconstruct_indel_coding_host",
            pl.reconstruct_indel_coding_host,
        )
        monkeypatch.setattr(
            native_mod, "indel_reconstruct",
            lambda *a, **k: None,
        )
        py = pl.reconstruct_indel_coding_host(
            region, exons, reverse, pos, kind, dlen, icodes, ilen, alt,
            valid, pad_coding=K * A,
        )
        monkeypatch.undo()
        np.testing.assert_array_equal(nat[1], py[1])
        np.testing.assert_array_equal(nat[0], py[0])


@pytest.mark.parametrize("band_k", [63, 127])
@pytest.mark.parametrize("reverse", [False, True])
def test_conv_splice_matches_gather(band_k, reverse):
    """band_k > 0 routes the exon splice through the one-hot depthwise
    conv; it must match the band_k == 0 gather path exactly."""
    rng = np.random.default_rng(band_k)
    L, K, A = 300, 8, 6
    region = rng.integers(0, 4, size=L).astype(np.uint8)
    exons = np.asarray([(30, 120), (150, 270)], np.int64)
    B = 12
    pos = np.zeros((B, K), np.int32)
    kind = np.zeros((B, K), np.int8)
    dlen = np.zeros((B, K), np.int32)
    icodes = np.zeros((B, K, A), np.uint8)
    ilen = np.zeros((B, K), np.int32)
    alt = np.zeros((B, K), np.uint8)
    valid = np.zeros((B, K), bool)
    for b in range(B):
        for s, (p, k, d, ic, il, a) in enumerate(
            _random_slots(rng, L, K, A, exons)
        ):
            pos[b, s], kind[b, s], dlen[b, s] = p, k, d
            icodes[b, s], ilen[b, s], alt[b, s] = ic, il, a
            valid[b, s] = True
    step_conv = make_indel_forward_step(
        region, exons, region_start=0, reverse_strand=reverse,
        pad_coding=K * A, band_k=band_k,
    )
    step_gather = make_indel_forward_step(
        region, exons, region_start=0, reverse_strand=reverse,
        pad_coding=K * A, band_k=0,
    )
    a_out = step_conv(pos, kind, dlen, icodes, ilen, alt, valid)
    b_out = step_gather(pos, kind, dlen, icodes, ilen, alt, valid)
    np.testing.assert_array_equal(
        np.asarray(a_out.coding_len), np.asarray(b_out.coding_len)
    )
    np.testing.assert_array_equal(
        np.asarray(a_out.mutated_coding), np.asarray(b_out.mutated_coding)
    )
    np.testing.assert_array_equal(
        np.asarray(a_out.distance), np.asarray(b_out.distance)
    )
