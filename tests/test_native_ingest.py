"""Parity tests: end-to-end native C++ VCF ingest vs the streaming Python
record loop. Both must produce identical populations (incidence columns,
arena alleles, phases, FORMAT evidence) and identical INFO stores — the
native path is the TPU-era analogue of the reference's 50-thread consumer
pool (kgl_parser/kgl_variant_factory_readvcf_impl.h:45) and must not change
semantics.
"""

import os

import numpy as np
import pytest

from fixtures import CONTIG_1, CONTIG_2, build_contig1, write_vcf
from kgl_gene_tpu.io.streams import write_bgzf
from kgl_gene_tpu.io.vcf import parse_vcf_population
from kgl_gene_tpu.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


def _population_snapshot(pop):
    """Full per-(genome, contig) incidence tuples, resolved through the
    arena so two populations with different arenas compare equal."""
    out = {}
    arena = pop.arena
    for gid, genome in pop:
        for cid, contig in genome:
            cols = contig.columns()
            rows = []
            for i in range(len(cols["row"])):
                row = int(cols["row"][i])
                rows.append((
                    arena.contig_name(arena.contigs[row]),
                    int(cols["offset"][i]),
                    arena.ref_codes(row).tobytes(),
                    arena.alt_codes(row).tobytes(),
                    arena.identifier(row),
                    arena.info_row(row),
                    int(cols["phase"][i]),
                    int(cols["ref_count"][i]),
                    int(cols["alt_count"][i]),
                    int(cols["dp_count"][i]),
                    float(cols["gq_value"][i]),
                    float(cols["quality"][i]),
                    bool(cols["pass"][i]),
                ))
            out[(gid, cid)] = rows
    return out


def _assert_parity(path, parser_type, subscribed=None, genome_name=None):
    native = parse_vcf_population(
        path, "pop", parser_type, subscribed_info=subscribed,
        genome_name=genome_name, use_native=True,
    )
    python = parse_vcf_population(
        path, "pop", parser_type, subscribed_info=subscribed,
        genome_name=genome_name, use_native=False,
    )
    pop_n, _, info_n = native
    pop_p, _, info_p = python
    assert set(pop_n.genome_map) == set(pop_p.genome_map)
    sn, sp = _population_snapshot(pop_n), _population_snapshot(pop_p)
    assert sn == sp
    assert info_n.count == info_p.count
    for fid in sorted(info_p.subscribed):
        for r in range(info_p.count):
            a, b = info_n.value(fid, r), info_p.value(fid, r)
            if isinstance(b, float) and np.isnan(b):
                assert np.isnan(a), (fid, r)
            else:
                assert a == b, (fid, r, a, b)
    return native, python


class TestPfDiploidNative:
    def test_fixture_parity(self, tmp_path):
        path = write_vcf(str(tmp_path / "pf.vcf"))
        (pop_n, _, _), _ = _assert_parity(
            path, "PF_DIPLOID", subscribed=["AF", "DP", "VALIDATED"]
        )
        # hom 1/1 emits two incidences; all header samples pre-created.
        assert pop_n.genome_count() == 4
        assert pop_n.variant_count() == 11

    def test_bgzf_native_path(self, tmp_path):
        plain = write_vcf(str(tmp_path / "pf.vcf"))
        with open(plain, "rb") as f:
            data = f.read()
        bgz = str(tmp_path / "pf.vcf.bgz")
        write_bgzf(bgz, data)
        _assert_parity(bgz, "PF_DIPLOID", subscribed=["DP"])

    def test_edge_genotypes(self, tmp_path):
        """Haploid GT, missing GT, '*' allele, triploid GT, '.' tokens —
        the GT-parse edge cases must match the Python tokenizer exactly."""
        c1 = build_contig1()
        path = str(tmp_path / "edge.vcf")
        with open(path, "w") as f:
            f.write("##fileformat=VCFv4.2\n")
            f.write(f"##contig=<ID={CONTIG_1},length=400>\n")
            f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="g">\n')
            f.write('##FORMAT=<ID=AD,Number=R,Type=Integer,Description="d">\n')
            f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                    "S1\tS2\tS3\tS4\tS5\n")
            alt = "A" if c1[20] != "A" else "G"
            # haploid '1' (skip), './.' (skip), '1/.' (allele A only),
            # '1/1/1' (triploid -> skip), '.|1' (treated unphased dot->0)
            f.write(f"{CONTIG_1}\t21\t.\t{c1[20]}\t{alt}\t50\tPASS\t.\tGT:AD\t"
                    "1:5,5\t./.:9,0\t1/.:4,6\t1/1/1:2,8\t.|1:3,7\n")
            # '*' upstream allele + zero-depth spanning deletion skip
            f.write(f"{CONTIG_1}\t31\t.\t{c1[30]}\t{alt},*\t50\tPASS\t.\tGT:AD\t"
                    "1/2:5,5,2\t0/1:0,0,0\t2/2:5,0,4\t0/0:9,0,0\t1/1:0,8,0\n")
            # malformed GT 'x/1' and empty trailing token '1/'
            f.write(f"{CONTIG_1}\t41\t.\t{c1[40]}\t{alt}\t.\t.\t.\tGT:AD\t"
                    "x/1:5,5\t1/:3,3\t0|1:2,2\t.:4,0\t1|0:1,9\n")
        _assert_parity(path, "PF_DIPLOID")

    def test_malformed_lines_skipped(self, tmp_path):
        c1 = build_contig1()
        path = str(tmp_path / "bad.vcf")
        alt = "A" if c1[20] != "A" else "G"
        with open(path, "w") as f:
            f.write("##fileformat=VCFv4.2\n")
            f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n")
            f.write("short\tline\n")  # < 8 fields -> skipped
            f.write(f"{CONTIG_1}\tNOTANUMBER\t.\t{c1[20]}\t{alt}\t1\tPASS\t.\tGT:AD\t0/1:1,1\n")
            f.write(f"{CONTIG_1}\t21\t.\t{c1[20]}\t{alt}\t1\tPASS\t.\tGT:AD\t0/1:1,1\n")
        (pop_n, _, info_n), (pop_p, _, _) = _assert_parity(path, "PF_DIPLOID")
        assert pop_n.variant_count() == 1
        assert info_n.count == 1


class TestPhasedDiploidNative:
    def test_phases_parity(self, tmp_path):
        c1 = build_contig1()
        path = str(tmp_path / "phased.vcf")
        alt = "A" if c1[20] != "A" else "G"
        alt2 = "C" if c1[30] != "C" else "G"
        with open(path, "w") as f:
            f.write("##fileformat=VCFv4.2\n")
            f.write(f"##contig=<ID={CONTIG_1},length=400>\n")
            f.write('##INFO=<ID=AF,Number=A,Type=Float,Description="af">\n')
            f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tP1\tP2\tP3\n")
            f.write(f"{CONTIG_1}\t21\trs0\t{c1[20]}\t{alt}\t60\tPASS\tAF=0.5\tGT\t"
                    "0|1\t1|1\t1|0\n")
            f.write(f"{CONTIG_1}\t31\trs1\t{c1[30]}\t{alt2}\t60\tPASS\tAF=0.2\tGT\t"
                    "0/1\t.|1\t1\n")
            f.write(f"{CONTIG_1}\t41\trs2\t{c1[40]}\t{alt},*\t60\tq10\tAF=0.1,0.3\tGT\t"
                    "1|2\t2|2\t0|0\n")
        (pop_n, _, _), _ = _assert_parity(path, "PHASED_DIPLOID", subscribed=["AF"])
        # phased genomes only exist if they carry variants
        assert set(pop_n.genome_map) == {"P1", "P2", "P3"}

    def test_multiallelic_and_haploid(self, tmp_path):
        c1 = build_contig1()
        alt = "A" if c1[50] != "A" else "G"
        path = str(tmp_path / "hap.vcf")
        with open(path, "w") as f:
            f.write("##fileformat=VCFv4.2\n")
            f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tP1\tP2\n")
            # haploid chrX/chrY style calls -> single UNPHASED incidence
            f.write(f"{CONTIG_1}\t51\t.\t{c1[50]}\t{alt}\t9\tPASS\t.\tGT\t1\t0\n")
        (pop_n, _, _), _ = _assert_parity(path, "PHASED_DIPLOID")
        assert pop_n.variant_count() == 1


class TestMonoGenomeNative:
    def test_aggregate_parity(self, tmp_path):
        c1 = build_contig1()
        path = str(tmp_path / "agg.vcf")
        alts = [a for a in "ACGT" if a != c1[10]][:2]
        with open(path, "w") as f:
            f.write("##fileformat=VCFv4.2\n")
            f.write(f"##contig=<ID={CONTIG_1},length=400>\n")
            f.write(f"##contig=<ID={CONTIG_2},length=300>\n")
            f.write('##INFO=<ID=AF,Number=A,Type=Float,Description="af">\n')
            f.write('##INFO=<ID=AC,Number=A,Type=Integer,Description="ac">\n')
            f.write('##INFO=<ID=AN,Number=1,Type=Integer,Description="an">\n')
            f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
            f.write(f"{CONTIG_1}\t11\trs0\t{c1[10]}\t{','.join(alts)}\t99\tPASS\t"
                    "AF=0.25,0.5;AC=3,6;AN=12\n")
            f.write(f"{CONTIG_1}\t16\trs1\t{c1[15]}\t{alts[0]},*\t50\tlow\t"
                    "AF=0.2,0.1;AC=5,2;AN=.\n")
            f.write(f"{CONTIG_2}\t5\trs2\tACGT\tA\t12\tPASS\tAN=8\n")
        (pop_n, _, info_n), _ = _assert_parity(
            path, "MONO_GENOME", subscribed=["AF", "AC", "AN"],
            genome_name="gnomad_stats",
        )
        assert set(pop_n.genome_map) == {"gnomad_stats"}
        # '*' allele dropped: 2 + 1 + 1 = 4 variants
        assert pop_n.variant_count() == 4
        an = info_n.float_column("AN")
        assert an[0] == 12 and np.isnan(an[1]) and an[2] == 8


class TestNativeThroughput:
    def test_wide_record_block_landing(self, tmp_path):
        """Many samples on one record land as one column block per genome
        with correct per-genome grouping."""
        c1 = build_contig1()
        alt = "A" if c1[20] != "A" else "G"
        n = 64
        names = [f"W{i}" for i in range(n)]
        path = str(tmp_path / "wide.vcf")
        with open(path, "w") as f:
            f.write("##fileformat=VCFv4.2\n")
            f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                    + "\t".join(names) + "\n")
            cols = "\t".join(
                ("1/1:0,9" if i % 3 == 0 else "0/1:4,5" if i % 3 == 1 else "0/0:9,0")
                for i in range(n)
            )
            f.write(f"{CONTIG_1}\t21\t.\t{c1[20]}\t{alt}\t77\tPASS\t.\tGT:AD\t{cols}\n")
        (pop_n, _, _), (pop_p, _, _) = _assert_parity(path, "PF_DIPLOID")
        hom = sum(1 for i in range(n) if i % 3 == 0)
        het = sum(1 for i in range(n) if i % 3 == 1)
        assert pop_n.variant_count() == 2 * hom + het
        assert pop_n.genome_count() == n


class TestChunkedIngest:
    def test_tiny_chunks_equal_whole_file(self, tmp_path, monkeypatch):
        """Chunked streaming (line-aligned cuts, global record bases) must
        produce exactly the same population and INFO store as one-chunk
        parsing — the >RAM-file path."""
        path = write_vcf(str(tmp_path / "pf.vcf"))
        whole = parse_vcf_population(
            path, "pop", "PF_DIPLOID", subscribed_info=["AF", "DP", "VALIDATED"],
            use_native=True,
        )
        # Chunk smaller than one record line: forces carry/merge logic.
        monkeypatch.setenv("KGT_NATIVE_INGEST_CHUNK_BYTES", "64")
        chunked = parse_vcf_population(
            path, "pop", "PF_DIPLOID", subscribed_info=["AF", "DP", "VALIDATED"],
            use_native=True,
        )
        assert _population_snapshot(chunked[0]) == _population_snapshot(whole[0])
        info_w, info_c = whole[2], chunked[2]
        assert info_c.count == info_w.count
        np.testing.assert_array_equal(
            info_c.float_column("DP"), info_w.float_column("DP")
        )
        for r in range(info_w.count):
            assert info_c.object_value("AF", r) == info_w.object_value("AF", r)

    def test_chunked_header_larger_than_first_read(self, tmp_path, monkeypatch):
        """Headers spanning multiple chunk reads parse completely."""
        path = write_vcf(str(tmp_path / "pf2.vcf"))
        monkeypatch.setenv("KGT_NATIVE_INGEST_CHUNK_BYTES", "16")
        pop, header, _ = parse_vcf_population(
            path, "pop", "PF_DIPLOID", use_native=True
        )
        assert header.genome_names == ["S1", "S2", "S3", "S4"]
        assert pop.variant_count() == 11


class TestNativeStringInfo:
    """Native string/array INFO columns (the packed-memory equivalent of
    kgl_variant_factory_vcf_evidence_memory.h:52-66): gnomAD-style CSQ
    strings + per-allele float arrays land as pools/CSR with lazy decode,
    byte-identical to the Python streaming parser."""

    def _write_gnomad_vep(self, path, n_records=40):
        import numpy as np
        rng = np.random.default_rng(5)
        with open(path, "w") as f:
            f.write("##fileformat=VCFv4.2\n")
            f.write("##contig=<ID=chr21,length=100000>\n")
            f.write('##INFO=<ID=AF,Number=A,Type=Float,Description="af">\n')
            f.write('##INFO=<ID=AC,Number=A,Type=Integer,Description="ac">\n')
            f.write('##INFO=<ID=CLNSIG,Number=.,Type=String,Description="clinsig">\n')
            f.write('##INFO=<ID=vep,Number=.,Type=String,Description="VEP. Format: Allele|Consequence|IMPACT|Gene">\n')
            f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
            for r in range(n_records):
                pos = 100 + r * 7
                info = []
                if r % 5 != 0:
                    info.append(f"AF={rng.random():.4f}")
                if r % 3 != 0:
                    info.append(f"AC={int(rng.integers(1, 50))}")
                if r % 4 == 0:
                    info.append("CLNSIG=Pathogenic,Benign")
                if r % 2 == 0:
                    info.append(
                        f"vep=A|missense_variant|MODERATE|GENE{r},A|intron_variant|LOW|GENE{r}"
                    )
                f.write(
                    f"chr21\t{pos}\trs{r}\tA\tG\t50\tPASS\t"
                    + (";".join(info) if info else ".") + "\n"
                )
        return path

    def test_native_equals_python(self, tmp_path):
        path = self._write_gnomad_vep(str(tmp_path / "gnomad.vcf"))
        sub = ["AF", "AC", "CLNSIG", "vep"]
        pop_n, _, info_n = parse_vcf_population(
            path, "g", "MONO_GENOME", subscribed_info=sub, use_native=True)
        pop_p, _, info_p = parse_vcf_population(
            path, "g", "MONO_GENOME", subscribed_info=sub, use_native=False)
        assert info_n.count == info_p.count == 40
        for r in range(info_n.count):
            for fid in sub:
                assert info_n.object_value(fid, r) == info_p.object_value(fid, r), (fid, r)

    def test_vep_subfields_on_native_columns(self, tmp_path):
        from kgl_gene_tpu.variant.vep import VEPSubFields

        path = self._write_gnomad_vep(str(tmp_path / "gnomad2.vcf"))
        _, _, info = parse_vcf_population(
            path, "g", "MONO_GENOME", subscribed_info=["vep"], use_native=True)
        vep = VEPSubFields(info)
        assert vep.has_vep()
        recs = vep.records(0)
        assert len(recs) == 2
        assert recs[0]["Consequence"] == "missense_variant"
        assert recs[1]["IMPACT"] == "LOW"
        assert vep.records(1) == []  # odd record: no vep field

    def test_long_numeric_tokens(self, tmp_path):
        """Numeric scalar/array INFO tokens >= 63 chars parse instead of
        silently landing as NaN (fixed 64-byte strtod buffer)."""
        path = str(tmp_path / "long.vcf")
        long_float = "0." + "5" * 70  # 72-char token
        with open(path, "w") as f:
            f.write("##fileformat=VCFv4.2\n")
            f.write("##contig=<ID=chr21,length=100000>\n")
            f.write('##INFO=<ID=AF,Number=A,Type=Float,Description="af">\n')
            f.write('##INFO=<ID=XS,Number=1,Type=Float,Description="x">\n')
            f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
            f.write(f"chr21\t100\trs0\tA\tG\t50\tPASS\tAF={long_float},"
                    f"{long_float};XS={long_float}\n")
        _, _, info = parse_vcf_population(
            path, "g", "MONO_GENOME", subscribed_info=["AF", "XS"],
            use_native=True)
        af = info.object_value("AF", 0)
        assert af is not None and abs(af[0] - float(long_float)) < 1e-12
        assert abs(af[1] - float(long_float)) < 1e-12
        xs = info.float_column("XS")
        assert abs(float(xs[0]) - float(long_float)) < 1e-12

    def test_chunked_string_columns(self, tmp_path, monkeypatch):
        path = self._write_gnomad_vep(str(tmp_path / "gnomad3.vcf"))
        sub = ["AF", "CLNSIG", "vep"]
        whole = parse_vcf_population(
            path, "g", "MONO_GENOME", subscribed_info=sub, use_native=True)
        monkeypatch.setenv("KGT_NATIVE_INGEST_CHUNK_BYTES", "128")
        chunked = parse_vcf_population(
            path, "g", "MONO_GENOME", subscribed_info=sub, use_native=True)
        info_w, info_c = whole[2], chunked[2]
        assert info_c.count == info_w.count
        for r in range(info_w.count):
            for fid in sub:
                assert info_c.object_value(fid, r) == info_w.object_value(fid, r)


class TestScaleGenerator:
    """generate_scale_vcf: byte-level writer parses identically through the
    native path with expected population shape (the bench_scale fixture)."""

    def test_parses_and_counts(self, tmp_path):
        from kgl_gene_tpu.io.synthetic import generate_scale_vcf

        path = generate_scale_vcf(
            str(tmp_path / "s.vcf"), n_records=400, n_samples=30
        )
        pop, header, info = parse_vcf_population(
            path, "s", "PF_DIPLOID", subscribed_info=["AF"]
        )
        assert pop.genome_count() == 30
        assert info.count == 400
        # hom cells emit two incidences, het one; spot-check one genome
        from kgl_gene_tpu.variant.columnar import VariantMajorCSR

        csr = VariantMajorCSR(pop)
        assert csr.variant_count <= 400 and csr.variant_count > 0
        af = csr.allele_frequencies()
        assert np.all(af >= 0) and np.all(af <= 1)

    def test_native_matches_python(self, tmp_path):
        from kgl_gene_tpu.io.synthetic import generate_scale_vcf

        path = generate_scale_vcf(
            str(tmp_path / "s2.vcf"), n_records=120, n_samples=12
        )
        n = parse_vcf_population(path, "s", "PF_DIPLOID", use_native=True)
        p = parse_vcf_population(path, "s", "PF_DIPLOID", use_native=False)
        assert _population_snapshot(n[0]) == _population_snapshot(p[0])


class TestNativeBGZFStream:
    """Streaming native BGZF: slab framing + parallel inflate + prefetch
    (kel_io/kel_bzip_workflow.h:42 counterpart), any file size, bounded
    memory, no whole-file gate."""

    def _bgzf_file(self, tmp_path, n_lines=20000):
        from kgl_gene_tpu.io.streams import write_bgzf

        lines = [
            f"chr{1 + i % 3}\t{100 + i}\trs{i}\tA\tG\t50\tPASS\tAF=0.{i % 10}\n"
            .encode() for i in range(n_lines)
        ]
        data = b"".join(lines)
        path = str(tmp_path / "s.vcf.bgz")
        write_bgzf(path, data)
        return path, data

    def test_matches_python_reader_and_raw(self, tmp_path):
        from kgl_gene_tpu.io.streams import BGZFReader
        from kgl_gene_tpu.native import NativeBGZFStream, native_available

        if not native_available():
            import pytest as _pytest
            _pytest.skip("native library unavailable")
        path, data = self._bgzf_file(tmp_path)
        # small slabs force multiple framing rounds + carry handling
        with NativeBGZFStream(path, slab_bytes=4096, verify=True) as s:
            out = s.read(-1)
        assert out == data
        with BGZFReader(path) as r:
            assert r.read(-1) == out

    def test_readinto_chunks(self, tmp_path):
        from kgl_gene_tpu.native import NativeBGZFStream, native_available

        if not native_available():
            import pytest as _pytest
            _pytest.skip("native library unavailable")
        path, data = self._bgzf_file(tmp_path, n_lines=5000)
        buf = bytearray(1009)  # odd size: spans slab boundaries
        got = bytearray()
        with NativeBGZFStream(path, slab_bytes=2048) as s:
            while True:
                n = s.readinto(buf)
                if not n:
                    break
                got += buf[:n]
        assert bytes(got) == data

    def test_corrupt_block_raises(self, tmp_path):
        from kgl_gene_tpu.native import NativeBGZFStream, native_available

        if not native_available():
            import pytest as _pytest
            _pytest.skip("native library unavailable")
        path, _data = self._bgzf_file(tmp_path, n_lines=4000)
        blob = bytearray(open(path, "rb").read())
        blob[len(blob) // 2] ^= 0xFF
        bad = str(tmp_path / "bad.bgz")
        open(bad, "wb").write(bytes(blob))
        import pytest as _pytest
        with _pytest.raises(OSError):
            with NativeBGZFStream(bad, slab_bytes=4096) as s:
                s.read(-1)

    def test_ingest_bgz_equals_plain(self, tmp_path):
        """parse_vcf_population over a .bgz input routes through the
        streaming native decompressor and matches the plain-text parse."""
        import shutil

        from kgl_gene_tpu.io.streams import write_bgzf
        from kgl_gene_tpu.io.synthetic import generate_scale_vcf

        plain = str(tmp_path / "p.vcf")
        generate_scale_vcf(plain, 2000, 20)
        bgz = str(tmp_path / "p.vcf.bgz")
        write_bgzf(bgz, open(plain, "rb").read())
        pop_p, _, _ = parse_vcf_population(plain, "a", "PF_DIPLOID")
        pop_b, _, _ = parse_vcf_population(bgz, "b", "PF_DIPLOID")
        assert pop_p.genome_count() == pop_b.genome_count()
        gp = {g: c.variant_count() for g, gen in pop_p
              for c in gen.contig_map.values()}
        gb = {g: c.variant_count() for g, gen in pop_b
              for c in gen.contig_map.values()}
        assert gp == gb and sum(gp.values()) > 0
