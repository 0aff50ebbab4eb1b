"""VCF ingest: header parse, record tokenisation, INFO evidence columns and
the concrete population parsers.

Capability parity with the reference VCF stack (kgl_parser/):
  - VCFRecord model                (kgl_variant_vcf_record.h:21)
  - header contig/INFO parse       (kgl_variant_factory_vcf_parse_header.h:49)
  - record field/FORMAT parse      (kgl_variant_factory_record_vcf_impl.h:22)
  - INFO tokenisation + evidence   (kgl_variant_factory_vcf_parse_info.h,
                                    kgl_evidence/kgl_variant_factory_vcf_evidence.h:215)
  - Pf diploid parser              (kgl_variant_factory_pf_impl.cpp:56-230)
  - GRCh/gnomAD mono-genome parser (kgl_variant_factory_grch_impl.h:24)
  - 1000G phased diploid parser    (kgl_variant_factory_1000_impl.cpp:93-127)

TPU-first re-design: the reference's 15+15+50-thread pipeline feeding a
mutex-guarded pointer DB becomes a streaming tokeniser that lands directly
in columnar arrays (the arena + per-genome incidence columns + Arrow-style
INFO columns). Decompression runs on the host BGZF thread pool.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..sequence.alphabet import DNA5
from ..sequence.sequence import DNA5SequenceLinear
from ..utils.logging import log
from ..variant.db import PopulationDB
from ..variant.variant import FormatData, Variant, VariantPhase
from .streams import open_text_stream

__all__ = [
    "VCFRecord", "VCFHeader", "InfoSchema", "InfoStore",
    "read_vcf", "PfDiploidParser", "MonoGenomeParser", "PhasedDiploidParser",
    "GnomadDiploidParser",
    "parse_vcf_population",
]

MISSING = "."
UPSTREAM_ALLELE = "*"
PASS_FILTER = ("PASS", ".", "")


# --------------------------------------------------------------------------- #
# header
# --------------------------------------------------------------------------- #
@dataclass
class InfoSchema:
    """One ##INFO declaration."""

    field_id: str
    number: str  # '0','1','A','R','G','.' or integer text
    field_type: str  # Integer|Float|String|Character|Flag
    description: str = ""


@dataclass
class VCFHeader:
    contigs: Dict[str, int] = field(default_factory=dict)  # contig -> length
    info_fields: Dict[str, InfoSchema] = field(default_factory=dict)
    format_fields: Dict[str, InfoSchema] = field(default_factory=dict)
    genome_names: List[str] = field(default_factory=list)

    def verify_contigs(self, genome_reference, contig_alias=None) -> bool:
        """Cross-check declared contigs/sizes against the reference genome
        (kgl_variant_factory_pf_impl.cpp:30-38)."""
        ok = True
        for contig_id, size in self.contigs.items():
            mapped = contig_alias.lookup(contig_id) if contig_alias else contig_id
            contig = genome_reference.get_contig(mapped)
            if contig is None:
                continue  # VCF may declare contigs absent from the reference
            if size and len(contig) != size:
                log().warn(
                    "VCF contig {} size {} != reference contig size {}",
                    contig_id, size, len(contig),
                )
                ok = False
        return ok


def _parse_meta_fields(text: str) -> Dict[str, str]:
    """Parse '<ID=DP,Number=1,Type=Integer,Description="...">' bodies."""
    body = text.strip()
    if body.startswith("<") and body.endswith(">"):
        body = body[1:-1]
    out: Dict[str, str] = {}
    key = ""
    val = ""
    in_quotes = False
    items: List[str] = []
    cur = ""
    for ch in body:
        if ch == '"':
            in_quotes = not in_quotes
            cur += ch
        elif ch == "," and not in_quotes:
            items.append(cur)
            cur = ""
        else:
            cur += ch
    if cur:
        items.append(cur)
    for item in items:
        if "=" not in item:
            continue
        k, v = item.split("=", 1)
        out[k.strip()] = v.strip().strip('"')
    return out


# --------------------------------------------------------------------------- #
# records
# --------------------------------------------------------------------------- #
@dataclass
class VCFRecord:
    """One VCF data line (kgl_variant_vcf_record.h:21). Only the 9 fixed
    fields are split eagerly; the genotype columns stay as one string
    (genotype_text) so the native tokenizer consumes them without a Python
    split/join round trip."""

    contig_id: str
    offset: int  # ZERO based (VCF POS - 1)
    identifier: str
    ref: str
    alts: List[str]
    quality: float
    passed_filter: bool
    info: str
    format_fields: List[str]
    genotype_text: str = ""
    line_number: int = 0
    _genotypes: Optional[List[str]] = None

    @property
    def genotypes(self) -> List[str]:
        if self._genotypes is None:
            self._genotypes = (
                self.genotype_text.split("\t") if self.genotype_text else []
            )
        return self._genotypes


def read_vcf(path: str) -> Tuple[VCFHeader, Iterator[VCFRecord]]:
    """Open a VCF (plain/.gz/.bgz) returning the parsed header and a record
    iterator."""
    stream = open_text_stream(path)
    header = VCFHeader()
    line_number = 0

    def records() -> Iterator[VCFRecord]:
        nonlocal line_number
        with stream:
            for line in stream:
                line_number += 1
                if line.startswith("##"):
                    _parse_header_line(line.rstrip("\n"), header)
                    continue
                if line.startswith("#CHROM"):
                    fields = line.rstrip("\n").split("\t")
                    header.genome_names = fields[9:] if len(fields) > 9 else []
                    continue
                line = line.rstrip("\n")
                if not line:
                    continue
                rec = _parse_record_line(line, line_number)
                if rec is not None:
                    yield rec

    # Consume header eagerly up to the first record by buffering one.
    it = records()
    buffered: List[VCFRecord] = []
    for rec in it:
        buffered.append(rec)
        break

    def chained() -> Iterator[VCFRecord]:
        yield from buffered
        yield from it

    return header, chained()


def _parse_header_line(line: str, header: VCFHeader) -> None:
    if line.startswith("##contig="):
        meta = _parse_meta_fields(line[len("##contig=") :])
        if "ID" in meta:
            try:
                header.contigs[meta["ID"]] = int(meta.get("length", 0))
            except ValueError:
                header.contigs[meta["ID"]] = 0
    elif line.startswith("##INFO="):
        meta = _parse_meta_fields(line[len("##INFO=") :])
        if "ID" in meta:
            header.info_fields[meta["ID"]] = InfoSchema(
                meta["ID"], meta.get("Number", "."), meta.get("Type", "String"),
                meta.get("Description", ""),
            )
    elif line.startswith("##FORMAT="):
        meta = _parse_meta_fields(line[len("##FORMAT=") :])
        if "ID" in meta:
            header.format_fields[meta["ID"]] = InfoSchema(
                meta["ID"], meta.get("Number", "."), meta.get("Type", "String"),
                meta.get("Description", ""),
            )


def _parse_record_line(line: str, line_number: int) -> Optional[VCFRecord]:
    # Split only the 9 fixed fields; genotype columns stay joined.
    fields = line.split("\t", 9)
    if len(fields) < 8:
        log().warn("VCF line {}: expected >=8 tab fields, found {}", line_number, len(fields))
        return None
    try:
        pos = int(fields[1]) - 1  # VCF POS is 1-based
    except ValueError:
        log().warn("VCF line {}: non-integer POS {}", line_number, fields[1])
        return None
    qual_text = fields[5]
    try:
        quality = float(qual_text) if qual_text not in (MISSING, "") else 0.0
    except ValueError:
        quality = 0.0
    return VCFRecord(
        contig_id=fields[0],
        offset=pos,
        identifier="" if fields[2] == MISSING else fields[2],
        ref=fields[3],
        alts=fields[4].split(","),
        quality=quality,
        passed_filter=fields[6] in PASS_FILTER,
        info=fields[7],
        format_fields=fields[8].split(":") if len(fields) > 8 else [],
        genotype_text=fields[9] if len(fields) > 9 else "",
        line_number=line_number,
    )


# --------------------------------------------------------------------------- #
# INFO evidence: subscribed fields -> typed columns
# --------------------------------------------------------------------------- #
class InfoStore:
    """Columnar INFO evidence with field subscription.

    The reference packs each record's INFO into a counted binary
    DataMemoryBlock (kgl_evidence/kgl_variant_factory_vcf_evidence_data_blk.h:37)
    so gnomAD-scale INFO fits in RAM; here the same job is done by typed
    per-field columns (Arrow style): scalar Integer/Float fields are numpy
    arrays with NaN missing, Flags are bools, everything else (arrays,
    strings, VEP) is a per-record Python value list. Only *subscribed*
    fields are parsed (kgl_app/kgl_runtime.h:220-248 evidenceList).
    """

    def __init__(self, schemas: Dict[str, InfoSchema], subscribed: Optional[Sequence[str]] = None):
        self.schemas = schemas
        if subscribed is None:
            self.subscribed = set(schemas)
        else:
            self.subscribed = {f for f in subscribed if f in schemas} if subscribed else set()
            missing = set(subscribed or ()) - set(schemas)
            if missing:
                log().warn("InfoStore: subscribed INFO fields not in header: {}", sorted(missing))
        self._scalar_float: Dict[str, List[float]] = {}
        self._scalar_int: Dict[str, List[float]] = {}
        self._flags: Dict[str, List[bool]] = {}
        self._objects: Dict[str, List] = {}
        # native columnar object storage (fid -> CSR / pool tuples)
        self._native_arrays: Dict[str, tuple] = {}
        self._native_strings: Dict[str, tuple] = {}
        self.count = 0
        for fid in self.subscribed:
            schema = schemas[fid]
            if schema.field_type == "Flag":
                self._flags[fid] = []
            elif schema.number == "1" and schema.field_type == "Float":
                self._scalar_float[fid] = []
            elif schema.number == "1" and schema.field_type == "Integer":
                self._scalar_int[fid] = []
            else:
                self._objects[fid] = []

    def split_native_fields(
        self,
    ) -> Tuple[List[str], List[str], List[str], List[str]]:
        """Partition subscribed fields into (numeric scalars, flags, numeric
        arrays, strings) for the native columnar parser. Numeric arrays are
        Number!=1 Integer/Float fields (AF, AC, ...); strings are everything
        else (CSQ/VEP, CLNSIG, ...). Order is deterministic."""
        numeric: List[str] = []
        flags: List[str] = []
        arrays: List[str] = []
        strings: List[str] = []
        for fid in sorted(self.subscribed):
            if fid in self._flags:
                flags.append(fid)
            elif fid in self._scalar_float or fid in self._scalar_int:
                numeric.append(fid)
            elif self.schemas[fid].field_type in ("Integer", "Float"):
                arrays.append(fid)
            else:
                strings.append(fid)
        return numeric, flags, arrays, strings

    def load_native_columns(
        self,
        numeric_fields: Sequence[str],
        numeric_cols: np.ndarray,
        flag_fields: Sequence[str],
        flag_cols: np.ndarray,
        count: int,
        array_cols: Optional[Dict[str, tuple]] = None,
        string_cols: Optional[Dict[str, tuple]] = None,
    ) -> None:
        """Adopt columns produced by the native record parser (bulk path;
        add_record must not be mixed in afterwards). array_cols maps fid ->
        (values float64, offsets int64 (R+1), present bool (R,)); string_cols
        maps fid -> (pool bytes, offsets, present). Values decode lazily in
        object_value — the columnar equivalent of the reference's packed
        DataMemoryBlock (kgl_variant_factory_vcf_evidence_memory.h:52-66)."""
        for i, fid in enumerate(numeric_fields):
            col = numeric_cols[i]
            if fid in self._scalar_float:
                self._scalar_float[fid] = col
            else:
                self._scalar_int[fid] = col
        for i, fid in enumerate(flag_fields):
            self._flags[fid] = flag_cols[i]
        self._native_arrays = dict(array_cols or {})
        self._native_strings = dict(string_cols or {})
        for fid in list(self._objects):
            if fid in self._native_arrays or fid in self._native_strings:
                del self._objects[fid]
        self.count = count

    def add_record(self, info_text: str) -> int:
        """Parse one INFO string; returns the record's info row index."""
        row = self.count
        self.count += 1
        parsed: Dict[str, str] = {}
        if info_text and info_text != MISSING:
            for item in info_text.split(";"):
                if not item:
                    continue
                if "=" in item:
                    k, v = item.split("=", 1)
                    parsed[k] = v
                else:
                    parsed[item] = ""
        for fid, col in self._flags.items():
            col.append(fid in parsed)
        for fid, col in self._scalar_float.items():
            text = parsed.get(fid)
            try:
                col.append(float(text) if text not in (None, MISSING, "") else np.nan)
            except ValueError:
                col.append(np.nan)
        for fid, col in self._scalar_int.items():
            text = parsed.get(fid)
            try:
                col.append(float(int(text)) if text not in (None, MISSING, "") else np.nan)
            except ValueError:
                col.append(np.nan)
        for fid, col in self._objects.items():
            text = parsed.get(fid)
            col.append(self._parse_object(fid, text))
        return row

    def _parse_object(self, fid: str, text: Optional[str]):
        if text is None:
            return None
        schema = self.schemas[fid]
        parts = text.split(",")
        if schema.field_type == "Integer":
            return [int(p) if p not in (MISSING, "") else None for p in parts]
        if schema.field_type == "Float":
            return [float(p) if p not in (MISSING, "") else None for p in parts]
        return parts

    # --- typed getters (InfoEvidenceAnalysis analogue) --------------------
    def float_column(self, fid: str) -> np.ndarray:
        if fid in self._scalar_float:
            return np.asarray(self._scalar_float[fid], dtype=np.float64)
        if fid in self._scalar_int:
            return np.asarray(self._scalar_int[fid], dtype=np.float64)
        raise KeyError(f"{fid} is not a subscribed scalar numeric INFO field")

    def flag_column(self, fid: str) -> np.ndarray:
        return np.asarray(self._flags[fid], dtype=bool)

    def object_value(self, fid: str, row: int):
        if fid in self._native_arrays:
            values, offsets, present = self._native_arrays[fid]
            if not present[row]:
                return None
            vals = values[offsets[row] : offsets[row + 1]]
            if self.schemas[fid].field_type == "Integer":
                return [None if np.isnan(v) else int(v) for v in vals]
            return [None if np.isnan(v) else float(v) for v in vals]
        if fid in self._native_strings:
            pool, offsets, present = self._native_strings[fid]
            if not present[row]:
                return None
            text = pool[offsets[row] : offsets[row + 1]].decode("ascii", "replace")
            return text.split(",")
        return self._objects[fid][row]

    def is_object_field(self, fid: str) -> bool:
        return (
            fid in self._objects
            or fid in self._native_arrays
            or fid in self._native_strings
        )

    def value(self, fid: str, row: int):
        if fid in self._scalar_float:
            return self._scalar_float[fid][row]
        if fid in self._scalar_int:
            return self._scalar_int[fid][row]
        if fid in self._flags:
            return self._flags[fid][row]
        if self.is_object_field(fid):
            return self.object_value(fid, row)
        raise KeyError(fid)

    def has_field(self, fid: str) -> bool:
        return fid in self.subscribed


# --------------------------------------------------------------------------- #
# concrete parsers
# --------------------------------------------------------------------------- #
class _BaseVCFParser:
    """Shared machinery: allele -> Variant creation with code conversion."""

    def __init__(self, population: PopulationDB, info_store: Optional[InfoStore] = None,
                 contig_alias=None):
        self.population = population
        self.info_store = info_store
        self.contig_alias = contig_alias
        self.variant_count = 0
        self.record_count = 0

    def _map_contig(self, contig_id: str) -> str:
        if self.contig_alias is not None:
            return self.contig_alias.lookup(contig_id)
        return contig_id

    def _make_variant(self, record: VCFRecord, alt: str, phase: VariantPhase,
                      fmt: FormatData, info_row: int) -> Variant:
        return Variant(
            contig_id=self._map_contig(record.contig_id),
            offset=record.offset,
            phase=phase,
            identifier=record.identifier,
            ref=DNA5SequenceLinear(DNA5.from_string(record.ref)),
            alt=DNA5SequenceLinear(DNA5.from_string(alt)),
            format_data=fmt,
            info_index=info_row,
            pass_filter=record.passed_filter,
        )

    def _info_row(self, record: VCFRecord) -> int:
        if self.info_store is None:
            return -1
        return self.info_store.add_record(record.info)


def _parse_gt(gt_text: str) -> Optional[Tuple[List[int], bool]]:
    """Parse a GT field; returns (allele indices, phased?) or None."""
    if not gt_text or gt_text == MISSING:
        return None
    phased = "|" in gt_text
    sep = "|" if phased else "/"
    parts = gt_text.split(sep)
    alleles: List[int] = []
    for p in parts:
        if p in (MISSING, ""):
            alleles.append(0)
        elif p.isdigit():
            alleles.append(int(p))
        else:
            return None
    return alleles, phased


class PfDiploidParser(_BaseVCFParser):
    """P. falciparum population VCF: per-sample GT(+AD+DP+GQ) genotypes,
    unphased variants per genome (kgl_variant_factory_pf_impl.cpp:56-230).

    Requires GT and AD FORMAT fields; A/B alleles both contribute; the '*'
    upstream-deletion allele and zero-depth downstream spanning records are
    skipped.
    """

    def parse(self, header: VCFHeader, records: Iterator[VCFRecord]) -> PopulationDB:
        genome_names = header.genome_names
        # Pre-create every sample genome so hom-ref samples exist with zero
        # variants (PfVCFImpl::setupPopulationStructure).
        for name in genome_names:
            self.population.get_create_genome(name)
        # Native genotype tokenizer fast path (kgl_gene_tpu.native): the
        # per-sample GT/AD/DP/GQ split runs in C++ and only carrier samples
        # reach Python.
        from ..native import native_available, parse_genotypes

        use_native = native_available()
        for record in records:
            self.record_count += 1
            fmt_index = {f: i for i, f in enumerate(record.format_fields)}
            gt_idx = fmt_index.get("GT")
            ad_idx = fmt_index.get("AD")
            if use_native and gt_idx is not None and ad_idx is not None:
                if self._parse_record_native(
                    record, genome_names, fmt_index, parse_genotypes
                ):
                    continue
            if gt_idx is None or ad_idx is None:
                log().error("Pf VCF record {}: FORMAT missing GT/AD", record.line_number)
                continue
            dp_idx = fmt_index.get("DP")
            gq_idx = fmt_index.get("GQ")
            info_row = self._info_row(record)
            if len(genome_names) != len(record.genotypes):
                log().warn(
                    "Pf VCF record {}: {} genomes vs {} genotype columns",
                    record.line_number, len(genome_names), len(record.genotypes),
                )
            for genome_name, genotype in zip(genome_names, record.genotypes):
                gfields = genotype.split(":")
                if gt_idx >= len(gfields):
                    continue
                gt = _parse_gt(gfields[gt_idx])
                if gt is None or len(gt[0]) != 2:
                    continue
                a_allele, b_allele = gt[0]
                if a_allele == 0 and b_allele == 0:
                    continue
                gq_value = 0.0
                if gq_idx is not None and gq_idx < len(gfields) and gfields[gq_idx] not in (MISSING, ""):
                    try:
                        gq_value = float(gfields[gq_idx])
                    except ValueError:
                        pass
                dp_value = 0
                if dp_idx is not None and dp_idx < len(gfields) and gfields[dp_idx] not in (MISSING, ""):
                    try:
                        dp_value = int(gfields[dp_idx])
                    except ValueError:
                        pass
                ad_counts: List[int] = []
                if ad_idx < len(gfields):
                    for t in gfields[ad_idx].split(","):
                        try:
                            ad_counts.append(int(t))
                        except ValueError:
                            ad_counts.append(0)
                if len(ad_counts) != len(record.alts) + 1:
                    log().error(
                        "Pf VCF record {}: expected {} AD depths, found {}",
                        record.line_number, len(record.alts) + 1, len(ad_counts),
                    )
                    continue
                # A and B alleles each add an incidence independently — a
                # homozygous 1/1 genotype yields two identical incidences
                # (kgl_variant_factory_pf_impl.cpp:287,336).
                for allele_no in (a_allele, b_allele):
                    if allele_no == 0 or allele_no > len(record.alts):
                        continue
                    alt = record.alts[allele_no - 1]
                    ref_count = ad_counts[0]
                    alt_count = ad_counts[allele_no]
                    # Zero ref+alt depth flags a spanning downstream deletion.
                    if alt == UPSTREAM_ALLELE or (ref_count == 0 and alt_count == 0):
                        continue
                    fmt = FormatData(ref_count, alt_count, dp_value, gq_value, record.quality)
                    variant = self._make_variant(
                        record, alt, VariantPhase.UNPHASED, fmt, info_row
                    )
                    self.population.add_variant(variant, [genome_name])
                    self.variant_count += 1
        return self.population


    def _parse_record_native(self, record: VCFRecord, genome_names: List[str],
                             fmt_index: Dict[str, int], parse_genotypes) -> bool:
        """C++ tokenised genotype columns -> incidences. Returns False to
        fall back to the Python path for this record."""
        n_samples = len(genome_names)
        if n_samples == 0 or not record.genotype_text:
            return False
        n_alleles = len(record.alts)
        text = record.genotype_text.encode("ascii", "replace")
        result = parse_genotypes(
            text, n_samples, n_alleles,
            fmt_index.get("GT", -1), fmt_index.get("AD", -1),
            fmt_index.get("DP", -1), fmt_index.get("GQ", -1),
        )
        if result is None:
            return False
        gt_a, gt_b, ad, dp, gq, ad_count = result
        info_row = self._info_row(record)
        # Carrier mask: any non-ref allele called.
        carriers = np.nonzero((gt_a > 0) | (gt_b > 0))[0]
        if len(carriers) == 0:
            return True
        # Intern each alt allele ONCE per record; incidences then append
        # directly to the contigs (no per-incidence Variant objects).
        contig_id = self._map_contig(record.contig_id)
        ref_codes = DNA5.from_string(record.ref)
        allele_rows: List[int] = []
        for alt in record.alts:
            if alt == UPSTREAM_ALLELE or not alt or alt == MISSING:
                allele_rows.append(-1)
                continue
            allele_rows.append(self.population.arena.intern(
                contig_id, record.offset, ref_codes, DNA5.from_string(alt),
                record.identifier, info_row,
            ))
        quality = record.quality
        unphased = VariantPhase.UNPHASED
        pop = self.population
        for s in carriers:
            s = int(s)
            # AD must list n_alleles + 1 depths (reference parser skips the
            # sample otherwise, kgl_variant_factory_pf_impl.cpp:255-262).
            if int(ad_count[s]) != n_alleles + 1:
                log().error(
                    "Pf VCF record {}: expected {} AD depths, found {}",
                    record.line_number, n_alleles + 1, int(ad_count[s]),
                )
                continue
            contig_db = None
            for allele_no in (int(gt_a[s]), int(gt_b[s])):
                if allele_no <= 0 or allele_no > n_alleles:
                    continue
                row = allele_rows[allele_no - 1]
                if row < 0:
                    continue
                ref_count = int(ad[s, 0])
                alt_count = int(ad[s, allele_no])
                if ref_count == 0 and alt_count == 0:
                    continue  # spanning downstream deletion
                if contig_db is None:
                    genome = pop.get_create_genome(genome_names[s])
                    contig_db = genome.get_create_contig(contig_id)
                contig_db.add_incidence(
                    row, unphased,
                    FormatData(ref_count, alt_count, int(dp[s]), float(gq[s]),
                               quality),
                    record.passed_filter,
                )
                self.variant_count += 1
        return True


class MonoGenomeParser(_BaseVCFParser):
    """GRCh/gnomAD-style aggregate VCF: no genotype columns; every alt
    allele becomes an unphased variant of a single statistical 'genome'
    (kgl_variant_factory_grch_impl.h:24,68)."""

    def __init__(self, population: PopulationDB, genome_name: str,
                 info_store: Optional[InfoStore] = None, contig_alias=None):
        super().__init__(population, info_store, contig_alias)
        self.genome_name = genome_name

    def parse(self, header: VCFHeader, records: Iterator[VCFRecord]) -> PopulationDB:
        for record in records:
            self.record_count += 1
            info_row = self._info_row(record)
            for alt in record.alts:
                if alt == UPSTREAM_ALLELE or not alt or alt == MISSING:
                    continue
                fmt = FormatData(quality=record.quality)
                variant = self._make_variant(record, alt, VariantPhase.UNPHASED, fmt, info_row)
                self.population.add_variant(variant, [self.genome_name])
                self.variant_count += 1
        return self.population


class PhasedDiploidParser(_BaseVCFParser):
    """1000-Genomes style phased diploid VCF: GT 'a|b' splits into phase A
    and phase B variants per sample
    (kgl_variant_factory_1000_impl.cpp:93-127)."""

    def parse(self, header: VCFHeader, records: Iterator[VCFRecord]) -> PopulationDB:
        genome_names = header.genome_names
        for record in records:
            self.record_count += 1
            fmt_index = {f: i for i, f in enumerate(record.format_fields)}
            gt_idx = fmt_index.get("GT")
            if gt_idx is None:
                continue
            info_row = self._info_row(record)
            for genome_name, genotype in zip(genome_names, record.genotypes):
                gfields = genotype.split(":")
                if gt_idx >= len(gfields):
                    continue
                gt = _parse_gt(gfields[gt_idx])
                if gt is None:
                    continue
                alleles, phased = gt
                phases = (
                    (VariantPhase.DIPLOID_PHASE_A, VariantPhase.DIPLOID_PHASE_B)
                    if phased and len(alleles) == 2
                    else tuple(VariantPhase.UNPHASED for _ in alleles)
                )
                for allele_no, phase in zip(alleles, phases):
                    if allele_no == 0 or allele_no > len(record.alts):
                        continue
                    alt = record.alts[allele_no - 1]
                    if alt == UPSTREAM_ALLELE:
                        continue
                    fmt = FormatData(quality=record.quality)
                    variant = self._make_variant(record, alt, phase, fmt, info_row)
                    self.population.add_variant(variant, [genome_name])
                    self.variant_count += 1
        return self.population


class GnomadDiploidParser(_BaseVCFParser):
    """Gnomad per-sample diploid genomes VCF (GenomeGnomadVCFImpl,
    kgl_variant_factory_gnomad_impl.h:19-60, .cpp:62-311).

    GT head of each genotype column only (no FORMAT evidence): 'a/b' is a
    diploid call, a bare index is a haploid X/Y male call (phase A only),
    '.' is reference. Carriers are grouped per alt allele and added
    UNPHASED (both phase maps). Abstract alt alleles ('<NON_REF>' style
    brackets) and '*' upstream alleles are skipped; out-of-range indices
    and malformed GT heads warn and count as reference.
    """

    def parse(self, header: VCFHeader, records: Iterator[VCFRecord]) -> PopulationDB:
        genome_names = header.genome_names
        for record in records:
            self.record_count += 1
            info_row = self._info_row(record)
            if len(genome_names) != len(record.genotypes):
                log().warn(
                    "Gnomad VCF record {}: {} genomes vs {} genotype columns",
                    record.line_number, len(genome_names), len(record.genotypes),
                )
            # Group carrier genomes per alt index for each phase
            # (.cpp:95-118 phase_A_map / phase_B_map).
            phase_maps: Tuple[Dict[int, List[str]], Dict[int, List[str]]] = ({}, {})
            n_alts = len(record.alts)
            for genome_name, genotype in zip(genome_names, record.genotypes):
                a_idx, b_idx = self._alternate_index(genotype, n_alts, record)
                if a_idx:
                    phase_maps[0].setdefault(a_idx - 1, []).append(genome_name)
                if b_idx:
                    phase_maps[1].setdefault(b_idx - 1, []).append(genome_name)
            for phase_map in phase_maps:
                for alt_idx, genomes in sorted(phase_map.items()):
                    alt = record.alts[alt_idx]
                    if not alt or alt == MISSING or alt == UPSTREAM_ALLELE:
                        continue
                    if "<" in alt:  # abstract alt (ABSTRACT_ALT_BRACKET_)
                        continue
                    fmt = FormatData(quality=record.quality)
                    variant = self._make_variant(
                        record, alt, VariantPhase.UNPHASED, fmt, info_row
                    )
                    self.population.add_variant(variant, genomes)
                    self.variant_count += len(genomes)
        return self.population

    def _alternate_index(self, genotype: str, n_alts: int,
                         record: VCFRecord) -> Tuple[int, int]:
        """(phase A, phase B) alt indices; 0 = reference
        (GenomeGnomadVCFImpl::alternateIndex, .cpp:146-235)."""
        if len(genotype) < 3:  # MINIMUM_GENOTYPE_SIZE_
            log().warn("Gnomad VCF record {}: genotype '{}' too short",
                       record.line_number, genotype)
            return 0, 0
        gt = genotype.split(":", 1)[0]
        parts = gt.split("/")
        a = b = 0
        try:
            if len(parts) == 2:
                if parts[0] != MISSING:
                    a = int(parts[0])
                if parts[1] != MISSING:
                    b = int(parts[1])
            else:
                # No '/': haploid X/Y male indicator, phase A only.
                if gt != MISSING:
                    a = int(gt)
        except ValueError:
            log().warn("Gnomad VCF record {}: cannot parse GT '{}'",
                       record.line_number, gt)
            return 0, 0
        if a < 0 or b < 0 or a > n_alts or b > n_alts:
            log().warn("Gnomad VCF record {}: GT '{}' exceeds {} alts",
                       record.line_number, gt, n_alts)
            return 0, 0
        return a, b


# --------------------------------------------------------------------------- #
# native end-to-end ingest (records never touch Python)
# --------------------------------------------------------------------------- #
_NATIVE_MODES = {"PF_DIPLOID": 0, "PHASED_DIPLOID": 1, "MONO_GENOME": 2}


def _open_decompressed_stream(path: str):
    """Binary stream of decompressed bytes for any supported container."""
    import bz2 as _bz2
    import gzip as _gzip

    from .streams import BGZFReader, is_bgzf

    lower = path.lower()
    if lower.endswith((".bgz", ".bgzf")) or (lower.endswith(".gz") and is_bgzf(path)):
        # Native streaming slab decompressor (parallel inflate + one slab
        # of prefetch, bounded memory at ANY size — the old 2 GiB
        # whole-file gate is gone); Python-threaded reader as fallback.
        from ..native import NativeBGZFStream, native_available

        if native_available() and not os.environ.get("KGT_DISABLE_NATIVE_INGEST"):
            try:
                return NativeBGZFStream(path)
            except OSError:
                pass
        return BGZFReader(path)
    if lower.endswith(".gz"):
        return _gzip.open(path, "rb")
    if lower.endswith(".bz2"):
        return _bz2.open(path, "rb")
    return open(path, "rb")


class _NativeLander:
    """Per-chunk consumer for the C++ record-loop parser: interns alleles,
    lands incidence column blocks and accumulates INFO columns. Chunks are
    line-aligned, so record/INFO row indices are globalised with a running
    record base."""

    def __init__(self, population: PopulationDB, info_store: InfoStore,
                 contig_alias, genome_name: Optional[str], mode: int,
                 genome_names: List[str]):
        self.population = population
        self.info_store = info_store
        self.contig_alias = contig_alias
        self.genome_name = genome_name
        self.mode = mode
        self.genome_names = genome_names
        (self.numeric_fields, self.flag_fields, self.array_fields,
         self.string_fields) = info_store.split_native_fields()
        self.numeric_chunks: List[np.ndarray] = []
        self.flag_chunks: List[np.ndarray] = []
        self.array_chunks: Dict[str, List[tuple]] = {f: [] for f in self.array_fields}
        self.string_chunks: Dict[str, List[tuple]] = {f: [] for f in self.string_fields}
        self.record_base = 0
        self.variant_count = 0
        self.bad_records = 0
        self.ad_mismatch = 0

    def consume(self, res: dict, text: bytes) -> None:
        R = res["n_records"]
        self.bad_records += res["bad_records"]
        self.ad_mismatch += res["ad_mismatch"]
        self.numeric_chunks.append(res["info_numeric"])
        self.flag_chunks.append(res["info_flags"])
        for fid in self.array_fields:
            self.array_chunks[fid].append(res["info_arrays"][fid])
        for fid in self.string_fields:
            self.string_chunks[fid].append(res["info_strings"][fid])

        # --- allele interning (one Python step per carrier record) ---------
        text_np = np.frombuffer(text, dtype=np.uint8)
        lut = DNA5.CHAR_TO_CODE
        contig_names = [
            text[res["contig_start"][c] : res["contig_end"][c]].decode("ascii")
            for c in range(res["n_contigs"])
        ]
        if self.contig_alias is not None:
            contig_names = [self.contig_alias.lookup(c) for c in contig_names]

        A = res["n_alts"]
        row_start = res["alt_row_start"]
        alt_s, alt_e = res["alt_start"], res["alt_end"]
        needed = np.zeros(A, dtype=bool)
        if self.mode == 2:
            # every well-formed alt becomes a variant of the single genome
            alt_len = alt_e - alt_s
            needed[:] = alt_len > 0
            one_base = np.nonzero(alt_len == 1)[0]
            bad = (text_np[alt_s[one_base]] == ord("*")) | (
                text_np[alt_s[one_base]] == ord(".")
            )
            needed[one_base[bad]] = False
        elif res["n_incidences"]:
            needed[row_start[res["inc_record"]] + res["inc_allele"] - 1] = True

        rows = np.full(A, -1, dtype=np.int64)
        if A and needed.any():
            rec_has = np.maximum.reduceat(needed.astype(np.int8), row_start[:-1]) > 0
            intern_bytes = self.population.arena.intern_bytes
            # char->code as a 256-byte translate table: allele conversion is
            # one C-level bytes.translate, no per-record numpy slicing.
            code_trans = bytes(lut)
            rec_contig = res["rec_contig"].tolist()
            rec_pos = res["rec_pos"].tolist()
            id_s, id_e = res["rec_id_start"].tolist(), res["rec_id_end"].tolist()
            ref_s, ref_e = res["rec_ref_start"].tolist(), res["rec_ref_end"].tolist()
            alt_sl, alt_el = alt_s.tolist(), alt_e.tolist()
            row_l = row_start.tolist()
            needed_l = needed.tolist()
            base = self.record_base
            contig_idx = [
                self.population.arena.contig_index(c) for c in contig_names
            ]
            for r in np.nonzero(rec_has)[0].tolist():
                # bytes(...) keeps intern keys hashable when `text` is the
                # reusable chunk bytearray (zero-copy ingest loop).
                ref_b = bytes(text[ref_s[r] : ref_e[r]]).translate(code_trans)
                ident = (
                    text[id_s[r] : id_e[r]].decode("ascii")
                    if id_e[r] > id_s[r] else ""
                )
                cidx = contig_idx[rec_contig[r]]
                offset = rec_pos[r]
                for a in range(row_l[r], row_l[r + 1]):
                    if needed_l[a]:
                        rows[a] = intern_bytes(
                            cidx, offset, ref_b,
                            bytes(text[alt_sl[a] : alt_el[a]]).translate(
                                code_trans
                            ),
                            ident, base + r,
                        )

        # --- incidence landing: bulk column blocks per (genome, contig) ----
        if self.mode == 2:
            inc_alt = np.nonzero(needed)[0]
            if len(inc_alt):
                counts = np.diff(row_start)
                inc_rec = np.repeat(np.arange(R, dtype=np.int64), counts)[inc_alt]
                genome = self.population.get_create_genome(
                    self.genome_name or self.population.population_id
                )
                cols = {
                    "row": rows[inc_alt],
                    "phase": np.full(
                        len(inc_alt), int(VariantPhase.UNPHASED), np.uint8
                    ),
                    "ref_count": np.zeros(len(inc_alt), np.int64),
                    "alt_count": np.zeros(len(inc_alt), np.int64),
                    "dp": np.zeros(len(inc_alt), np.int64),
                    "gq": np.zeros(len(inc_alt), np.float32),
                    "quality": res["rec_qual"][inc_rec].astype(np.float32),
                    "pass": res["rec_pass"][inc_rec],
                    "contig": res["rec_contig"][inc_rec],
                }
                self.variant_count += _land_blocks(genome, None, cols, contig_names)
        elif res["n_incidences"]:
            inc_rec = res["inc_record"].astype(np.int64)
            cols = {
                "row": rows[row_start[inc_rec] + res["inc_allele"] - 1],
                "phase": res["inc_phase"],
                "ref_count": res["inc_ref_count"],
                "alt_count": res["inc_alt_count"],
                "dp": res["inc_dp"],
                "gq": res["inc_gq"],
                "quality": res["rec_qual"][inc_rec],
                "pass": res["rec_pass"][inc_rec],
                "contig": res["rec_contig"][inc_rec],
            }
            self.variant_count += _land_blocks(
                self.population, res["inc_sample"], cols, contig_names,
                genome_names=self.genome_names,
            )
        self.record_base += R

    def finalize(self) -> None:
        R = self.record_base
        n_num = len(self.numeric_fields)
        n_flag = len(self.flag_fields)
        numeric = (
            np.concatenate(self.numeric_chunks, axis=1)
            if self.numeric_chunks else np.empty((n_num, R))
        )
        flags = (
            np.concatenate(self.flag_chunks, axis=1)
            if self.flag_chunks else np.empty((n_flag, R), dtype=bool)
        )
        # merge per-chunk CSR / pool columns with offset rebasing
        arrays = {}
        for fid, chunks in self.array_chunks.items():
            if len(chunks) == 1:
                arrays[fid] = chunks[0]
                continue
            values = np.concatenate([c[0] for c in chunks])
            present = np.concatenate([c[2] for c in chunks])
            offs, base = [], 0
            for c in chunks:
                offs.append(c[1][:-1] + base)
                base += int(c[1][-1])
            offs.append(np.asarray([base], dtype=np.int64))
            arrays[fid] = (values, np.concatenate(offs), present)
        strings = {}
        for fid, chunks in self.string_chunks.items():
            if len(chunks) == 1:
                strings[fid] = chunks[0]
                continue
            pool = b"".join(c[0] for c in chunks)
            present = np.concatenate([c[2] for c in chunks])
            offs, base = [], 0
            for c in chunks:
                offs.append(c[1][:-1] + base)
                base += int(c[1][-1])
            offs.append(np.asarray([base], dtype=np.int64))
            strings[fid] = (pool, np.concatenate(offs), present)
        self.info_store.load_native_columns(
            self.numeric_fields, numeric, self.flag_fields, flags, R,
            array_cols=arrays, string_cols=strings,
        )


def _native_parse_population(
    path: str,
    population_id: str,
    parser_type: str,
    subscribed_info: Optional[Sequence[str]],
    contig_alias,
    genome_name: Optional[str],
) -> Optional[Tuple[PopulationDB, VCFHeader, InfoStore]]:
    """End-to-end native ingest: the VCF body is tokenised by the C++
    record loop (kgl_gene_tpu/native/kgt_native.cpp, the TPU-era analogue of
    the reference's 50-thread consumer pool,
    kgl_variant_factory_readvcf_impl.h:45) in line-aligned chunks and lands
    as columnar arrays; Python only interns unique alleles (one step per
    record, not per genotype cell). Arbitrarily large files stream with
    bounded memory (chunk size KGT_NATIVE_INGEST_CHUNK_BYTES, default
    512 MiB). Returns None when the fast path doesn't apply."""
    from ..native import native_available, parse_vcf_records

    mode = _NATIVE_MODES.get(parser_type)
    if mode is None or not native_available():
        return None
    chunk_size = int(
        os.environ.get("KGT_NATIVE_INGEST_CHUNK_BYTES", 512 << 20)
    )
    try:
        stream = _open_decompressed_stream(path)
    except OSError as exc:
        log().error("VCF {}: cannot open ({})", path, exc)
        return None

    with stream:
        # Header reads stay small: the body loop below streams the bulk
        # into its reusable buffer.
        header_read = min(chunk_size, 1 << 20)
        first = stream.read(header_read)
        # --- header (small, parsed in Python) ------------------------------
        header = VCFHeader()
        body_start = 0
        pos = 0
        while True:
            if pos >= len(first):
                more = stream.read(header_read)
                if not more:
                    break
                first += more
                continue
            if first[pos : pos + 1] != b"#":
                break
            nl = first.find(b"\n", pos)
            if nl < 0:
                more = stream.read(header_read)
                if not more:
                    nl = len(first)
                else:
                    first += more
                    continue
            line = first[pos:nl].decode("ascii", "replace").rstrip("\r")
            if line.startswith("##"):
                _parse_header_line(line, header)
            elif line.startswith("#CHROM"):
                fields = line.split("\t")
                header.genome_names = fields[9:] if len(fields) > 9 else []
            pos = nl + 1
            body_start = min(pos, len(first))

        info_store = InfoStore(header.info_fields, subscribed_info)
        genome_names = header.genome_names
        n_samples = len(genome_names)

        population = PopulationDB(population_id, parser_type)
        if mode == 0:
            # Pre-create every sample genome (setupPopulationStructure).
            for name in genome_names:
                population.get_create_genome(name)
        lander = _NativeLander(
            population, info_store, contig_alias, genome_name, mode,
            genome_names,
        )

        # Zero-copy chunk loop: ONE reusable buffer refilled with readinto;
        # the C++ parser takes (pointer, line-aligned length), and only the
        # partial trailing line moves (a memmove of < one record). The old
        # slice-and-concat loop copied every chunk 3-4 times — at 13 GB
        # that was most of the ingest wall time.
        carry_len = len(first) - body_start
        # Size the buffer by what the file can actually deliver (capped at
        # 64 MiB / chunk_size): a zero-filled 64 MiB bytearray costs ~25 ms
        # of memset on this host — most of the parse wall time for a
        # product-scale (few-MB) VCF.
        try:
            remaining = os.path.getsize(path) + (1 << 16)
            if path.endswith((".gz", ".bgz", ".bgzf")):
                remaining *= 8  # decompressed estimate; loop grows if short
        except OSError:
            remaining = 64 << 20
        buf = bytearray(
            max(min(chunk_size, 64 << 20, remaining), carry_len, 1 << 20)
        )
        buf[:carry_len] = first[body_start:]
        first = b""
        eof = False
        while True:
            while not eof and carry_len < len(buf):
                view = memoryview(buf)[carry_len:]
                if hasattr(stream, "readinto"):
                    n = stream.readinto(view)
                else:
                    data = stream.read(len(buf) - carry_len)
                    n = len(data)
                    buf[carry_len : carry_len + n] = data
                del view
                if not n:
                    eof = True
                    break
                carry_len += n
            if carry_len == 0:
                break
            if eof:
                cut = carry_len  # final tail: records may lack a newline
            else:
                cut = buf.rfind(b"\n", 0, carry_len) + 1
                if cut <= 0:
                    # one line larger than the buffer: grow and refill
                    grown = bytearray(len(buf) * 2)
                    grown[:carry_len] = buf[:carry_len]
                    buf = grown
                    continue
            res = parse_vcf_records(
                buf, 0, n_samples, mode,
                lander.numeric_fields, lander.flag_fields,
                lander.array_fields, lander.string_fields,
                length=cut,
            )
            if res is None:
                return None
            lander.consume(res, buf)
            rem = carry_len - cut
            if rem:
                buf[:rem] = buf[cut:carry_len]
            carry_len = rem
            if eof:
                break

    lander.finalize()
    if lander.bad_records:
        log().warn("VCF {}: {} malformed records skipped", path, lander.bad_records)
    if lander.ad_mismatch:
        log().error(
            "VCF {}: {} genotype cells with AD depth count != allele count",
            path, lander.ad_mismatch,
        )
    log().info(
        "VCF {} [native]: parsed {} records -> {} variant incidences, {} genomes",
        path, lander.record_base, lander.variant_count,
        population.genome_count(),
    )
    return population, header, info_store


def _land_blocks(target, samples: Optional[np.ndarray], cols: dict,
                 contig_names: List[str], genome_names: Optional[List[str]] = None) -> int:
    """Bulk-append incidence columns grouped by (sample, contig). `target`
    is a GenomeDB when samples is None, else a PopulationDB."""
    n = len(cols["row"])
    if n == 0:
        return 0
    contig = cols["contig"].astype(np.int64)
    if samples is None:
        order = np.argsort(contig, kind="stable")
        key = contig[order]
    else:
        samp = samples.astype(np.int64)
        order = np.lexsort((contig, samp))  # stable: record order kept in ties
        key = samp[order] * (int(contig.max()) + 1) + contig[order]
    sorted_cols = {k: v[order] for k, v in cols.items()}
    bounds = np.concatenate(([0], np.nonzero(np.diff(key))[0] + 1, [n]))
    for b in range(len(bounds) - 1):
        i, j = int(bounds[b]), int(bounds[b + 1])
        cname = contig_names[int(sorted_cols["contig"][i])]
        if samples is None:
            genome = target
        else:
            genome = target.get_create_genome(
                genome_names[int(samples[order[i]])]
            )
        genome.get_create_contig(cname).add_incidence_block(
            sorted_cols["row"][i:j],
            sorted_cols["phase"][i:j],
            sorted_cols["ref_count"][i:j],
            sorted_cols["alt_count"][i:j],
            sorted_cols["dp"][i:j],
            sorted_cols["gq"][i:j],
            sorted_cols["quality"][i:j],
            sorted_cols["pass"][i:j],
        )
    return n


# --------------------------------------------------------------------------- #
# top-level convenience
# --------------------------------------------------------------------------- #
_PARSERS = {
    "PF_DIPLOID": PfDiploidParser,
    "PHASED_DIPLOID": PhasedDiploidParser,
    "GNOMAD_DIPLOID": GnomadDiploidParser,
}


def _record_key(rec: VCFRecord) -> str:
    """Deterministic record identity for the ingest-cursor fingerprint."""
    return (
        f"{rec.contig_id}:{rec.offset}:{rec.ref}:{','.join(rec.alts)}:"
        f"{rec.genotype_text[:64]}"
    )


def _try_resume(checkpoint_path: str, path: str):
    """Load (cursor, population, info_store) when a valid checkpoint whose
    prefix fingerprint matches the file exists; None -> fresh ingest."""
    import pickle

    from .checkpoint import IngestCursor, load_population
    from ..utils.string_hash import combine_hash, string_hash

    cursor = IngestCursor.load(checkpoint_path)
    snap = checkpoint_path + ".pop"
    info_snap = checkpoint_path + ".info"
    if cursor is None or cursor.file_path != path or not os.path.isfile(snap):
        return None
    # Re-verify the processed prefix: replay the first record_count records
    # and compare the rolling hash (guards against a changed input file).
    fp, n = 0, 0
    _, records = read_vcf(path)
    for rec in records:
        if n >= cursor.record_count:
            break
        fp = combine_hash(fp, string_hash(_record_key(rec)))
        n += 1
    if n != cursor.record_count or fp != cursor.fingerprint:
        log().warn(
            "ingest cursor {}: prefix fingerprint mismatch (file changed?); "
            "restarting ingest", checkpoint_path,
        )
        return None
    population = load_population(snap)
    info_store = None
    if os.path.isfile(info_snap):
        with open(info_snap, "rb") as f:
            info_store = pickle.load(f)
    log().info(
        "ingest cursor {}: resuming {} at record {} ({} incidences restored)",
        checkpoint_path, path, cursor.record_count, population.variant_count(),
    )
    return cursor, population, info_store


def _checkpointed_records(records, cursor, checkpoint_path, every,
                          population, info_store, parser_box):
    """Wrap a record stream: skip the resumed prefix, advance the cursor per
    processed record, snapshot population+info every `every` records."""
    import pickle

    from .checkpoint import save_population
    from ..utils.string_hash import combine_hash, string_hash

    skip = cursor.record_count

    def snapshot():
        parser = parser_box[0]
        if parser is not None:
            cursor.variant_count = parser.variant_count
        save_population(population, checkpoint_path + ".pop")
        if info_store is not None:
            tmp = checkpoint_path + ".info.tmp"
            with open(tmp, "wb") as f:
                pickle.dump(info_store, f, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, checkpoint_path + ".info")
        cursor.save(checkpoint_path)  # cursor last: publish point

    n_skipped = 0
    for rec in records:
        if n_skipped < skip:
            n_skipped += 1
            continue
        yield rec
        # Control returns here after the parser consumed the record.
        cursor.fingerprint = combine_hash(
            cursor.fingerprint, string_hash(_record_key(rec))
        )
        cursor.record_count += 1
        cursor.line_number = rec.line_number
        if every and cursor.record_count % every == 0:
            snapshot()


def parse_vcf_population(
    path: str,
    population_id: str,
    parser_type: str = "PF_DIPLOID",
    subscribed_info: Optional[Sequence[str]] = None,
    contig_alias=None,
    genome_name: Optional[str] = None,
    use_native: Optional[bool] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 10_000,
) -> Tuple[PopulationDB, VCFHeader, InfoStore]:
    """Parse a VCF into a PopulationDB (ParserSelection::parseData analogue,
    kgl_parser/kgl_variant_factory_parsers.cpp:27-73).

    use_native: None (auto) tries the end-to-end C++ record loop first and
    falls back to the streaming Python loop; False forces the streaming
    path; True requires the native path (raises if unavailable).

    checkpoint_path: enable the ingest cursor (SURVEY.md section 5 failure
    recovery). Every `checkpoint_every` records the population + INFO
    columns snapshot to disk; an interrupted ingest re-invoked with the
    same checkpoint_path resumes after the last snapshot (prefix verified
    by rolling fingerprint) and produces the identical population. Forces
    the streaming path.

    KGT_DISABLE_NATIVE_INGEST=1 (env) turns auto into the streaming path —
    the operational probe for native/streaming output parity."""
    if use_native is None and os.environ.get("KGT_DISABLE_NATIVE_INGEST"):
        use_native = False
    if checkpoint_path is None and use_native is not False:
        native = _native_parse_population(
            path, population_id, parser_type, subscribed_info, contig_alias,
            genome_name,
        )
        if native is not None:
            return native
        if use_native:
            raise RuntimeError(
                f"native VCF ingest unavailable for {path} (parser {parser_type})"
            )
    header, records = read_vcf(path)
    population = PopulationDB(population_id, parser_type)
    # info store needs header INFO schemas; read_vcf fills the header while
    # iterating, so peek the first record to force header consumption.
    records = iter(records)
    first: List[VCFRecord] = []
    for rec in records:
        first.append(rec)
        break
    info_store = InfoStore(header.info_fields, subscribed_info)

    cursor = None
    parser_box = [None]
    if checkpoint_path is not None:
        from .checkpoint import IngestCursor

        resumed = _try_resume(checkpoint_path, path)
        if resumed is not None:
            cursor, population, resumed_info = resumed
            population.population_id = population_id
            if resumed_info is not None:
                info_store = resumed_info
        else:
            cursor = IngestCursor(file_path=path)

    def chained():
        yield from first
        yield from records

    stream = chained()
    if cursor is not None:
        stream = _checkpointed_records(
            stream, cursor, checkpoint_path, checkpoint_every,
            population, info_store, parser_box,
        )

    if parser_type == "MONO_GENOME":
        parser = MonoGenomeParser(
            population, genome_name or population_id, info_store, contig_alias
        )
    else:
        parser_cls = _PARSERS.get(parser_type, PfDiploidParser)
        parser = parser_cls(population, info_store, contig_alias)
    parser_box[0] = parser
    parser.parse(header, stream)
    if checkpoint_path is not None:
        # Completed: the cursor files are no longer needed.
        for suffix in ("", ".pop", ".info"):
            try:
                os.remove(checkpoint_path + suffix)
            except OSError:
                pass
    log().info(
        "VCF {}: parsed {} records -> {} variant incidences, {} genomes",
        path, parser.record_count, parser.variant_count, population.genome_count(),
    )
    return population, header, info_store
