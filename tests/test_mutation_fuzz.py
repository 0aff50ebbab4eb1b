"""Property/fuzz tests for the mutation engine: random variant sets applied
through AdjustedSequence must equal back-to-front string surgery with the
same selected variants; offset translation must be consistent."""

import numpy as np
import pytest

from kgl_gene_tpu.genome.contig import ContigReference
from kgl_gene_tpu.mutation.adjusted_sequence import AdjustedSequence
from kgl_gene_tpu.mutation.sequence_filter import SequenceVariantFilter
from kgl_gene_tpu.sequence.alphabet import DNA5
from kgl_gene_tpu.sequence.sequence import DNA5SequenceLinear
from kgl_gene_tpu.utils.intervals import OpenRightInterval
from kgl_gene_tpu.variant.arena import VariantArena
from kgl_gene_tpu.variant.db import ContigDB
from kgl_gene_tpu.variant.variant import FormatData, Variant, VariantPhase, VariantType


def _random_contig(rng, n):
    codes = rng.integers(0, 4, n).astype(np.uint8)
    return ContigReference("fuzz", DNA5SequenceLinear(codes))


def _random_variants(rng, contig_codes, n_variants, region):
    """Random canonical SNP/del/ins variants with VALID ref bases, spaced
    so member intervals don't collide (one variant per offset窗口)."""
    letters = "ACGT"
    variants = []
    # non-overlapping anchor positions with gaps >= 12
    positions = np.sort(rng.choice(
        np.arange(region.lower + 1, region.upper - 12, 12), n_variants, replace=False,
    ))
    for pos in positions:
        pos = int(pos)
        kind = rng.integers(0, 3)
        ref0 = letters[contig_codes[pos]]
        if kind == 0:  # SNP
            alt = letters[(contig_codes[pos] + 1 + rng.integers(0, 3)) % 4]
            ref, alt_s = ref0, alt
        elif kind == 1:  # delete 1-6 bases after anchor
            size = int(rng.integers(1, 7))
            ref = "".join(letters[c] for c in contig_codes[pos : pos + 1 + size])
            alt_s = ref0
        else:  # insert 1-6 bases after anchor
            ins = "".join(letters[rng.integers(0, 4)] for _ in range(rng.integers(1, 7)))
            ref = ref0
            alt_s = ref0 + ins
        variants.append((pos, ref, alt_s))
    return variants


def _string_apply(contig_str, region, selected):
    """Oracle: apply (pos, ref, alt) edits back-to-front within region."""
    a, b = region.lower, region.upper
    text = contig_str[a:b]
    for pos, ref, alt in sorted(selected, reverse=True):
        rel = pos - a
        assert contig_str[pos : pos + len(ref)] == ref
        # clamp deletes that run past the region end
        avail = min(len(ref), b - pos)
        text = text[:rel] + alt + text[rel + avail :]
    return text


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_adjusted_sequence(seed):
    rng = np.random.default_rng(seed)
    n = 600
    contig = _random_contig(rng, n)
    contig_str = contig.sequence.to_string()
    region = OpenRightInterval(50, 550)
    n_variants = int(rng.integers(1, 12))
    specs = _random_variants(rng, contig.sequence.codes, n_variants, region)

    arena = VariantArena()
    contig_db = ContigDB("fuzz", arena)
    for pos, ref, alt in specs:
        row = arena.intern("fuzz", pos, DNA5.from_string(ref), DNA5.from_string(alt))
        contig_db.add_incidence(row, VariantPhase.UNPHASED, FormatData(10, 10, 20, 50, 99))

    selection = SequenceVariantFilter(contig_db, region)
    adj = AdjustedSequence(contig, selection)

    # Oracle applies exactly the SELECTED variants.
    selected = [
        (v.offset, v.ref.to_string(), v.alt.to_string())
        for _, v in selection.variants()
    ]
    want = _string_apply(contig_str, region, selected)
    got = adj.modified.to_string()
    assert got == want, f"seed {seed}: mismatch with {len(selected)} variants"

    # Offset translation: monotone non-decreasing over region bounds.
    probes = np.linspace(region.lower, region.upper, 23).astype(int)
    mapped = [adj._modified_offset(int(p)) for p in probes]
    assert all(b >= a for a, b in zip(mapped, mapped[1:]))
    assert mapped[0] == 0
    assert mapped[-1] == len(adj.modified)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_canonicalize(seed):
    """Random padded variants canonicalise to a valid canonical class and
    the canonical edit is equivalent to the original edit."""
    from kgl_gene_tpu.variant.variant import canonicalize

    rng = np.random.default_rng(100 + seed)
    letters = "ACGT"
    base = "".join(letters[i] for i in rng.integers(0, 4, 40))
    pos = 10
    kind = rng.integers(0, 3)
    if kind == 0:
        ref = base[pos]
        alt = letters[(letters.index(ref) + 1) % 4]
    elif kind == 1:
        size = int(rng.integers(1, 5))
        ref = base[pos : pos + 1 + size]
        alt = base[pos]
    else:
        ins = "".join(letters[rng.integers(0, 4)] for _ in range(rng.integers(1, 5)))
        ref = base[pos]
        alt = ref + ins
    # pad with shared prefix/suffix
    pad_l = int(rng.integers(0, 4))
    pad_r = int(rng.integers(0, 4))
    padded_ref = base[pos - pad_l : pos] + ref + base[pos + len(ref) : pos + len(ref) + pad_r]
    padded_alt = base[pos - pad_l : pos] + alt + base[pos + len(ref) : pos + len(ref) + pad_r]
    c_ref, c_alt, c_off = canonicalize(
        DNA5.from_string(padded_ref), DNA5.from_string(padded_alt), pos - pad_l
    )
    # Applying (canonical) and (original padded) to the base string agree.
    def apply(text, p, r, a):
        assert text[p : p + len(r)] == r
        return text[:p] + a + text[p + len(r):]

    got = apply(base, c_off, DNA5.to_string(c_ref), DNA5.to_string(c_alt))
    want = apply(base, pos - pad_l, padded_ref, padded_alt)
    assert got == want
