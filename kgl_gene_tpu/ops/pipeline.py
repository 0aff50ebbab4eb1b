"""The flagship device pipeline: population x transcript forward step.

One fused, jittable step covering the core KGL_Gene workload
(SURVEY.md section 3.3 "the forward pass"): for a batch of sample genomes
against one transcript region —
  1. apply each sample's SNPs to the replicated region (vmapped scatter),
  2. splice exons via static-length dynamic slices, strand-convert,
  3. translate to amino acids through the codon LUT,
  4. compute each mutant's edit distance to the reference coding sequence
     (banded / anti-diagonal wavefront DP),
  5. reduce alt-allele counts over the batch.

Exon splice is deliberately NOT a gather: exons are contiguous runs, so
the splice is a concat of dynamic slices whose LENGTHS are static and
whose starts are runtime scalars — XLA emits cheap contiguous copies, and
transcripts sharing an exon-length signature (plus region/batch shapes)
share ONE compiled executable (the geometry arrays are arguments, not
closure constants).

Multi-chip: the same step runs under shard_map with samples sharded over
the mesh and the allele-count reduction merged by psum (see
multichip_forward_step).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..sequence.alphabet import DNA5
from ..sequence.tables import amino_translation_table
from .edit_distance import _batched_levenshtein_impl
from .variant_apply import apply_snp_batch, translate_batch

__all__ = [
    "ForwardOutputs",
    "IndelForwardOutputs",
    "make_forward_step",
    "make_indel_forward_step",
    "make_multichip_step",
    "make_multichip_indel_step",
]


class ForwardOutputs(NamedTuple):
    mutated_coding: jnp.ndarray   # (B, S) spliced mutated coding codes
    amino: jnp.ndarray            # (B, S//3) amino codes
    distance: jnp.ndarray         # (B,) edit distance mutant vs reference coding
    allele_counts: jnp.ndarray    # (K_total,) alt allele counts over batch
    valid_protein: jnp.ndarray    # (B,) bool: no internal stop & mod-3 start/stop
    validity_code: jnp.ndarray    # (B,) int32: 0 valid / 1 no-stop / 2 nonsense / 3 no-start


def _complement_codes(x):
    """DNA5 complement without the 5-entry LUT gather: COMPLEMENT is
    [3,2,1,0,4], i.e. 3-x for bases and identity for N — tiny-table
    gathers cost ~6 ns/element on TPU (a (256, 3000) complement was ~5 ms,
    more than the whole rest of the step)."""
    return jnp.where(x >= 4, x, 3 - x).astype(x.dtype)


def _splice_slices(
    batch: jnp.ndarray,          # (B, L)
    exon_starts: jnp.ndarray,    # (E,) int32 region-relative exon starts
    exon_lens: Tuple[int, ...],  # static exon lengths
) -> jnp.ndarray:
    """Contiguous-exon splice: concat of static-length dynamic slices."""
    parts = [
        jax.lax.dynamic_slice_in_dim(batch, exon_starts[e], exon_lens[e], axis=1)
        for e in range(len(exon_lens))
    ]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _forward(
    region: jnp.ndarray,         # (L,) reference region codes
    exon_starts: jnp.ndarray,    # (E,) region-relative exon starts
    exon_lens: Tuple[int, ...],  # static exon lengths (sum = S)
    reverse_strand: bool,
    positions: jnp.ndarray,      # (B, K) region-relative SNP positions
    alt_codes: jnp.ndarray,      # (B, K)
    valid: jnp.ndarray,          # (B, K)
    amino_lut: jnp.ndarray,      # (65,)
    complement_lut: jnp.ndarray, # (5,)
    stop_code: int,
    start_codes: jnp.ndarray,    # (n_start,) amino codes acceptable at pos 0
    use_pallas: bool = False,
) -> ForwardOutputs:
    interpret = jax.default_backend() not in ("tpu", "axon")
    mutated = apply_snp_batch(region, positions, alt_codes, valid)
    coding = _splice_slices(mutated, exon_starts, exon_lens)
    if reverse_strand:
        coding = _complement_codes(coding[:, ::-1])
    if use_pallas:
        from .variant_apply import translate_batch_pallas

        amino = translate_batch_pallas(coding, amino_lut, interpret=interpret)
    else:
        amino = translate_batch(coding, amino_lut)

    # Reference coding (no variants) for the distance baseline.
    ref_coding = _splice_slices(region[None, :], exon_starts, exon_lens)
    if reverse_strand:
        ref_coding = _complement_codes(ref_coding[:, ::-1])
    B, S = coding.shape
    lens = jnp.full((B,), S, dtype=jnp.int32)
    K_snps = positions.shape[1]
    # Band exactness proof: every variant here is a substitution at one
    # region offset, so Levenshtein(mutant, ref) <= Hamming <= K_snps and
    # the lengths are equal. When K_snps fits a band the banded kernel is
    # provably exact and does ~band/(2*S) of the full wavefront's work —
    # the static form of edlib's band doubling (edlib.cpp:161-185).
    band_k = (
        31 if K_snps <= 31
        else 63 if K_snps <= 63
        else (127 if K_snps <= 127 else 0)
    )
    if use_pallas and band_k and S >= 512:
        # Banded Myers bit-vector DP (ops/pallas_myers.py): 32 DP cells
        # per int32 lane — the r5 kernel that replaced the
        # one-cell-per-lane banded kernel in the fused step (~16x fewer
        # vector issues at the same band).
        from .pallas_myers import myers_distance_padded

        lens_i = jnp.full((B,), S, jnp.int32)
        distance = myers_distance_padded(
            coding.astype(jnp.int32), lens_i,
            ref_coding.astype(jnp.int32), lens_i,
            max_len=S, band_k=band_k, interpret=interpret, shared_b=True,
        )
    elif use_pallas:
        from .pallas_edit_distance import BLOCK_B, _pallas_call

        W = ((S + 1 + 127) // 128) * 128
        Bp = ((B + BLOCK_B - 1) // BLOCK_B) * BLOCK_B
        a_p = jnp.zeros((Bp, W), jnp.int32).at[:B, :S].set(coding.astype(jnp.int32))
        b_rev = jnp.zeros((Bp, W), jnp.int32).at[:B, :S].set(
            jnp.broadcast_to(ref_coding, (B, S)).astype(jnp.int32)
        )[:, ::-1]
        len_col = jnp.zeros((Bp, 128), jnp.int32).at[:B, :].set(S)
        distance = _pallas_call(
            a_p, b_rev, len_col, len_col, max_len=S, interpret=interpret
        )[:B, 0]
    else:
        distance = _batched_levenshtein_impl(
            coding, lens, jnp.broadcast_to(ref_coding, (B, S)), lens, S, S
        )

    # Validity: starts with a start amino, ends with stop, no internal stop.
    starts_ok = jnp.isin(amino[:, 0], start_codes)
    ends_ok = amino[:, -1] == stop_code
    internal_stops = jnp.sum(amino[:, :-1] == stop_code, axis=1)
    valid_protein = starts_ok & ends_ok & (internal_stops == 0)
    # Enum code matching ContigReference.check_valid_amino_batch precedence
    # (computed on device so the host never fetches the amino batch):
    # 0 VALID_PROTEIN, 1 NO_STOP_CODON, 2 NONSENSE_MUTATION, 3 NO_START_CODON.
    validity_code = jnp.maximum(
        jnp.maximum(
            (~ends_ok).astype(jnp.int32),
            2 * (internal_stops > 0).astype(jnp.int32),
        ),
        3 * (~starts_ok).astype(jnp.int32),
    )

    allele_counts = jnp.sum(valid.astype(jnp.int32), axis=0)
    return ForwardOutputs(mutated_coding=coding, amino=amino, distance=distance,
                          allele_counts=allele_counts, valid_protein=valid_protein,
                          validity_code=validity_code)


def reconstruct_indel_coding_host(
    region_codes: np.ndarray,     # (L,) reference region codes
    exon_bounds: np.ndarray,      # (E, 2) region-relative exon [lo, hi)
    reverse_strand: bool,
    pos: np.ndarray, kind: np.ndarray, del_len: np.ndarray,
    ins_codes: np.ndarray, ins_len: np.ndarray, alt_code: np.ndarray,
    valid: np.ndarray,
    pad_coding: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy replay of _forward_indel steps 1-4 (SNP scatter, deletion
    mask, insertion prefix map, exon splice in modified coordinates,
    strand convert): (coding (B, S_pad) codes, coding_len (B,)).

    Exists so the pooled device program can ship 8-byte tails instead of
    ~1 kB packed sequences per record — the mutant strings re-derive
    host-side from the SAME capture tensors the device consumed
    (byte-exact by construction: identical formulas; pinned by
    tests/test_indel_device.py reconstruction parity)."""
    B, K = pos.shape
    A = ins_codes.shape[2]
    L = int(region_codes.shape[0])
    exon_bounds = np.asarray(exon_bounds, np.int64)
    exon_lens_ref = [int(hi - lo) for lo, hi in exon_bounds]
    S_ref = int(sum(exon_lens_ref))
    pad_coding = ((max(pad_coding, 3) + 2) // 3) * 3
    S_pad = ((S_ref + pad_coding + 2) // 3) * 3

    # Native single-pass replay (kgt_native.cpp kgt_indel_reconstruct):
    # ~30x the numpy form on this host; falls through to numpy when the
    # lib is unavailable. Parity pinned by test_indel_device.py.
    from ..native import indel_reconstruct

    native = indel_reconstruct(
        region_codes, exon_bounds, reverse_strand, pos, kind, del_len,
        ins_codes, ins_len, alt_code, valid, pad_coding, DNA5.COMPLEMENT,
        S_pad,
    )
    if native is not None:
        return native

    pos = pos.astype(np.int32)
    valid = valid.astype(bool)
    snp_m = valid & (kind == 0)
    del_m = valid & (kind == 1)
    ins_m = valid & (kind == 2)

    # 1. SNPs in place.
    base = np.repeat(region_codes[None, :].astype(np.uint8), B, axis=0)
    bi, ki = np.nonzero(snp_m & (pos >= 0) & (pos < L))
    base[bi, pos[bi, ki]] = alt_code[bi, ki].astype(np.uint8)

    # 2. Deletion mask via +-1 markers and a cumulative sum.
    marker = np.zeros((B, L + 1), np.int32)
    bi, ki = np.nonzero(del_m & (pos >= 0) & (pos <= L))
    np.add.at(marker, (bi, pos[bi, ki]), 1)
    ends = np.minimum(pos + del_len, L)
    np.add.at(marker, (bi, ends[bi, ki]), -1)
    deleted = np.cumsum(marker[:, :L], axis=1) > 0
    keep = (~deleted).astype(np.int32)

    # 3. Insertions before original position p.
    ins_at = np.zeros((B, L + 1), np.int32)
    bi, ki = np.nonzero(ins_m & (pos >= 0) & (pos <= L))
    np.add.at(ins_at, (bi, pos[bi, ki]), ins_len[bi, ki].astype(np.int32))
    unit = ins_at + np.pad(keep, ((0, 0), (0, 1)))
    cum = np.cumsum(unit, axis=1) - unit
    m_map = cum + ins_at
    W_out = L + pad_coding
    out = np.full((B, W_out), 4, np.uint8)
    kb, kp = np.nonzero(keep[:, :L] > 0)
    dst = m_map[kb, kp]
    ok = dst < W_out  # device scatter drops out-of-buffer (mode="drop")
    out[kb[ok], dst[ok]] = base[kb[ok], kp[ok]]
    ins_start = np.take_along_axis(cum, np.where(ins_m, pos, L), axis=1)
    for j in range(A):
        bi, ki = np.nonzero(ins_m & (j < ins_len) & (pos >= 0) & (pos <= L))
        dst = ins_start[bi, ki] + j
        ok = dst < W_out
        out[bi[ok], dst[ok]] = ins_codes[bi[ok], ki[ok], j].astype(np.uint8)

    # 4. Exon splice in modified coordinates (flat int32 gathers: the
    # int64 take_along_axis form cost ~2x on the 2-vCPU host).
    c_idx = np.arange(S_pad, dtype=np.int32)[None, :]
    gather_idx = np.zeros((B, S_pad), np.int32)
    in_any = np.zeros((B, S_pad), bool)
    cs = np.zeros((B, 1), np.int32)
    for lo, hi in exon_bounds:
        mlo = m_map[:, int(lo)][:, None]
        mhi = m_map[:, int(hi)][:, None]
        le = mhi - mlo
        sel = (c_idx >= cs) & (c_idx < cs + le)
        gather_idx = np.where(sel, mlo + (c_idx - cs), gather_idx)
        in_any |= sel
        cs = cs + le
    coding_len = cs[:, 0]
    flat = (
        np.clip(gather_idx, 0, W_out - 1)
        + (np.arange(B, dtype=np.int64) * W_out)[:, None]
    )
    coding = out.reshape(-1)[flat]
    coding = np.where(in_any, coding, 4).astype(np.uint8)
    if reverse_strand:
        rev_idx = np.clip(coding_len[:, None] - 1 - c_idx, 0, S_pad - 1)
        flat = rev_idx + (np.arange(B, dtype=np.int64) * S_pad)[:, None]
        coding = np.where(
            c_idx < coding_len[:, None],
            DNA5.COMPLEMENT[coding.reshape(-1)[flat]],
            4,
        ).astype(np.uint8)
    return coding, coding_len


class IndelForwardOutputs(NamedTuple):
    mutated_coding: jnp.ndarray  # (B, S_pad) coding codes, valid to coding_len
    coding_len: jnp.ndarray      # (B,) int32 true coding length per genome
    amino: jnp.ndarray           # (B, S_pad//3) amino codes (garbage past len)
    distance: jnp.ndarray        # (B,) edit distance vs reference coding
    validity_code: jnp.ndarray   # (B,) 0 valid/1 no-stop/2 nonsense/3 no-start/4 not-mod3


def _forward_indel(
    region: jnp.ndarray,          # (L,) reference region codes
    exon_bounds: jnp.ndarray,     # (E, 2) int32 region-relative exon [lo, hi)
    reverse_strand: bool,
    pos: jnp.ndarray,             # (B, K) region-relative insert offsets
    kind: jnp.ndarray,            # (B, K) 0 SNP / 1 DEL / 2 INS
    del_len: jnp.ndarray,         # (B, K) effective deletion lengths (clamped)
    ins_codes: jnp.ndarray,       # (B, K, A) inserted base codes (no anchor)
    ins_len: jnp.ndarray,         # (B, K) inserted base counts
    alt_code: jnp.ndarray,        # (B, K) SNP substitution codes
    valid: jnp.ndarray,           # (B, K) slot validity
    amino_lut: jnp.ndarray,
    complement_lut: jnp.ndarray,
    stop_code: int,
    start_codes: jnp.ndarray,
    pad_coding: int,              # static coding slack (>= K*A, multiple of 3)
    band_k: int,                  # static: banded distance if >0, wavefront if 0
    use_pallas: bool,
) -> IndelForwardOutputs:
    """The general variant-apply forward step: SNP/insert/delete cocktails
    under FIXED shapes via prefix-summed length deltas (SURVEY.md section 7
    hard part (a); reference semantics = AdjustedSequence + ModifiedOffsetMap,
    kgl_mutation/kgl_mutation_sequence.h:26, kgl_mutation_translate.h:72).

    Per genome: unit[p] = inserted-bases-before-p + kept(p); the exclusive
    prefix sum of unit gives both every base's output slot and the
    original->modified coordinate map m(x) the exon splice uses, exactly
    the reference's cumulative-shift offset map.
    """
    B, K = pos.shape
    A = ins_codes.shape[2]
    L = region.shape[0]
    exon_bounds = np.asarray(exon_bounds)
    exon_lens_ref = [int(hi - lo) for lo, hi in exon_bounds]
    S_ref = int(sum(exon_lens_ref))
    S_pad = ((S_ref + pad_coding + 2) // 3) * 3  # translation needs mod-3 width
    OOB = L + pad_coding + S_pad  # any index >= buffer size drops the scatter

    pos = pos.astype(jnp.int32)
    snp_m = valid & (kind == 0)
    del_m = valid & (kind == 1)
    ins_m = valid & (kind == 2)

    # 1. SNPs in place (host pass 1).
    base = jnp.broadcast_to(region.astype(jnp.uint8), (B, L))
    snp_idx = jnp.where(snp_m, pos, OOB)
    base = jax.vmap(lambda b, i, a: b.at[i].set(a, mode="drop"))(
        base, snp_idx, alt_code.astype(jnp.uint8)
    )

    # 2. Deletion mask via +-1 markers and a cumulative sum (no-overlap
    #    precondition enforced at capture). Start/end markers land in ONE
    #    scatter over concatenated slots (each XLA scatter costs ~0.6 ms
    #    at product shapes; the step ran 8-9 of them).
    del_start = jnp.where(del_m, pos, OOB)
    del_end = jnp.where(del_m, jnp.minimum(pos + del_len, L), OOB)
    marker = jnp.zeros((B, L + 1), jnp.int32)
    mk_idx = jnp.concatenate([del_start, del_end], axis=1)
    mk_val = jnp.concatenate(
        [jnp.ones((B, K), jnp.int32), jnp.full((B, K), -1, jnp.int32)], axis=1
    )
    marker = jax.vmap(lambda m, i, v: m.at[i].add(v, mode="drop"))(
        marker, mk_idx, mk_val
    )
    deleted = jnp.cumsum(marker[:, :L], axis=1) > 0
    keep = (~deleted).astype(jnp.int32)

    # 3. Insertions: bases inserted BEFORE original position p (p == L
    #    appends at the region end, host rel == len(base) case).
    ins_at = jnp.zeros((B, L + 1), jnp.int32)
    ins_at = jax.vmap(lambda m, i, n: m.at[i].add(n, mode="drop"))(
        ins_at, jnp.where(ins_m, pos, OOB), ins_len.astype(jnp.int32)
    )

    # unit[p] = ins_at[p] + keep[p] (keep[L] = 0); exclusive prefix sum.
    unit = ins_at + jnp.pad(keep, ((0, 0), (0, 1)))
    cum = jnp.cumsum(unit, axis=1) - unit  # exclusive
    # m(x) for x in [0, L]: output offset of the bound at original x,
    # AFTER insertions at x (ModifiedOffsetMap convention).
    m_map = cum + ins_at
    # base p lands at cum[p] + ins_at[p] when kept.
    out_base_idx = jnp.where(keep[:, :L] > 0, m_map[:, :L], OOB)
    out = jnp.full((B, L + pad_coding), 4, jnp.uint8)  # pad with N
    out = jax.vmap(lambda o, i, v: o.at[i].set(v, mode="drop"))(
        out, out_base_idx, base
    )
    # inserted bases at cum[pos] + j — ONE scatter over the flattened
    # (K, A) slot grid instead of A separate scatters.
    ins_start = jnp.take_along_axis(cum, jnp.where(ins_m, pos, L), axis=1)
    j_idx = jnp.arange(A, dtype=jnp.int32)[None, None, :]        # (1,1,A)
    ins_ok = ins_m[:, :, None] & (j_idx < ins_len[:, :, None])
    flat_idx = jnp.where(
        ins_ok, ins_start[:, :, None] + j_idx, OOB
    ).reshape(B, K * A)
    out = jax.vmap(lambda o, i, v: o.at[i].set(v, mode="drop"))(
        out, flat_idx, ins_codes.reshape(B, K * A).astype(jnp.uint8)
    )

    # 4. Exon splice in modified coordinates: coding position c belongs to
    #    exon e when cs_e <= c < cs_e + le_e.
    #
    #    band_k > 0 (edit_bound <= band_k, static): the per-genome shift
    #    sigma_e = mlo_e - cs_e deviates from the static reference offset
    #    base_e = lo_e - cs_ref_e by at most 2*edit_bound, so the splice
    #    is a per-genome one-hot depthwise CONVOLUTION over a +-2k window
    #    instead of a (B, S_pad) gather (~6 ns/element on TPU, ~6 ms at
    #    the product shape; the conv runs in ~1.5 ms and stays one fused
    #    op). band_k == 0 keeps the general gather.
    c_idx = jnp.arange(S_pad, dtype=jnp.int32)[None, :]  # (1, S_pad)
    use_conv = band_k > 0
    cs = jnp.zeros((B, 1), jnp.int32)
    if use_conv:
        R = 2 * band_k
        outf = jnp.pad(out, ((0, 0), (R, R + S_pad))).astype(jnp.float32)
        coding = jnp.full((B, S_pad), 4, jnp.uint8)
        cs_ref = 0
        for e, (lo, hi) in enumerate(exon_bounds):
            mlo = m_map[:, int(lo)][:, None]
            mhi = m_map[:, int(hi)][:, None]
            le = mhi - mlo
            base = int(lo) - cs_ref  # static per-exon reference offset
            # window[u] = out[base - R + u]; filter tap s selects shift
            # sigma - base = s - R, so z[c] = out[c + sigma] exactly.
            win = jax.lax.dynamic_slice_in_dim(
                outf, base, S_pad + 2 * R, axis=1
            )
            delta = jnp.clip((mlo - cs)[:, 0] - base + R, 0, 2 * R)
            filt = jax.nn.one_hot(delta, 2 * R + 1, dtype=jnp.float32)
            z = jax.lax.conv_general_dilated(
                win[None], filt[:, None, :], window_strides=(1,),
                padding="VALID", feature_group_count=B,
                precision=jax.lax.Precision.HIGHEST,
            )[0]
            sel = (c_idx >= cs) & (c_idx < cs + le)
            coding = jnp.where(sel, jnp.rint(z).astype(jnp.uint8), coding)
            cs = cs + le
            cs_ref += int(hi) - int(lo)
        coding_len = cs[:, 0]
    else:
        gather_idx = jnp.zeros((B, S_pad), jnp.int32)
        in_any = jnp.zeros((B, S_pad), bool)
        for e, (lo, hi) in enumerate(exon_bounds):
            mlo = m_map[:, int(lo)][:, None]
            mhi = m_map[:, int(hi)][:, None]
            le = mhi - mlo
            sel = (c_idx >= cs) & (c_idx < cs + le)
            gather_idx = jnp.where(sel, mlo + (c_idx - cs), gather_idx)
            in_any = in_any | sel
            cs = cs + le
        coding_len = cs[:, 0]
        coding = jnp.take_along_axis(
            out, jnp.clip(gather_idx, 0, L + pad_coding - 1), axis=1
        )
        coding = jnp.where(in_any, coding, 4)
    if reverse_strand:
        rev_idx = jnp.clip(coding_len[:, None] - 1 - c_idx, 0, S_pad - 1)
        coding = jnp.where(
            c_idx < coding_len[:, None],
            _complement_codes(jnp.take_along_axis(coding, rev_idx, axis=1)),
            4,
        )

    # 5. Translation + validity with per-genome lengths.
    if use_pallas:
        from .variant_apply import translate_batch_pallas

        interpret = jax.default_backend() not in ("tpu", "axon")
        amino = translate_batch_pallas(coding, amino_lut, interpret=interpret)
    else:
        from .variant_apply import translate_batch

        amino = translate_batch(coding, amino_lut)
    n_amino = coding_len // 3
    M = amino.shape[1]
    a_idx = jnp.arange(M, dtype=jnp.int32)[None, :]
    is_stop = amino == stop_code
    starts_ok = jnp.isin(amino[:, 0], start_codes) & (n_amino > 0)
    last_amino = jnp.take_along_axis(
        amino, jnp.clip(n_amino[:, None] - 1, 0, M - 1), axis=1
    )[:, 0]
    ends_ok = (last_amino == stop_code) & (n_amino > 0)
    internal_stops = jnp.sum(is_stop & (a_idx < n_amino[:, None] - 1), axis=1)
    validity_code = jnp.maximum(
        jnp.maximum(
            (~ends_ok).astype(jnp.int32),
            2 * (internal_stops > 0).astype(jnp.int32),
        ),
        3 * (~starts_ok).astype(jnp.int32),
    )
    validity_code = jnp.where(coding_len % 3 != 0, 4, validity_code)

    # 6. Distance vs the (uniform-length) reference coding sequence.
    ref_coding = _splice_slices(
        region[None, :], jnp.asarray(exon_bounds[:, 0], jnp.int32),
        tuple(exon_lens_ref),
    )
    if reverse_strand:
        ref_coding = _complement_codes(ref_coding[:, ::-1])
    ref_b = jnp.broadcast_to(ref_coding, (B, S_ref)).astype(jnp.int32)
    len_ref = jnp.full((B,), S_ref, jnp.int32)
    if use_pallas and band_k > 0:
        # Banded Myers bit-vector DP with per-genome coding lengths
        # (indels shift la; capture latches at (coding_len, S_ref)).
        from .pallas_myers import myers_distance_padded

        interpret = jax.default_backend() not in ("tpu", "axon")
        Mx = max(S_pad, S_ref)
        distance = myers_distance_padded(
            coding.astype(jnp.int32), coding_len,
            ref_coding.astype(jnp.int32),
            jnp.full((B,), S_ref, jnp.int32),
            max_len=Mx, band_k=band_k, interpret=interpret, shared_b=True,
        )
    elif use_pallas:
        from .pallas_edit_distance import BLOCK_B, _pallas_call

        interpret = jax.default_backend() not in ("tpu", "axon")
        Mx = max(S_pad, S_ref)
        W = ((Mx + 1 + 127) // 128) * 128
        Bp = ((B + BLOCK_B - 1) // BLOCK_B) * BLOCK_B
        a_p = jnp.zeros((Bp, W), jnp.int32).at[:B, :S_pad].set(
            coding.astype(jnp.int32)
        )
        b_rev = jnp.zeros((Bp, W), jnp.int32).at[:B, :S_ref].set(ref_b)[:, ::-1]
        la = jnp.zeros((Bp, 128), jnp.int32).at[:B, :].set(coding_len[:, None])
        lb = jnp.zeros((Bp, 128), jnp.int32).at[:B, :].set(S_ref)
        distance = _pallas_call(
            a_p, b_rev, la, lb, max_len=Mx, interpret=interpret
        )[:B, 0]
    else:
        distance = _batched_levenshtein_impl(
            coding.astype(jnp.int32), coding_len, ref_b, len_ref, S_pad, S_ref
        )

    return IndelForwardOutputs(
        mutated_coding=coding, coding_len=coding_len, amino=amino,
        distance=distance, validity_code=validity_code,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "reverse_strand", "stop_code", "pad_coding", "band_k", "use_pallas",
        "exon_bounds_key",
    ),
)
def _forward_indel_jit(
    region, pos, kind, del_len, ins_codes, ins_len, alt_code, valid,
    amino_lut, complement_lut, start_codes,
    *, exon_bounds_key, reverse_strand, stop_code, pad_coding, band_k,
    use_pallas,
):
    exon_bounds = np.asarray(exon_bounds_key, dtype=np.int64)
    return _forward_indel(
        region, exon_bounds, reverse_strand, pos, kind, del_len, ins_codes,
        ins_len, alt_code, valid, amino_lut, complement_lut, stop_code,
        start_codes, pad_coding, band_k, use_pallas,
    )


def make_indel_forward_step(
    region_codes: np.ndarray,
    exon_intervals: np.ndarray,
    region_start: int,
    reverse_strand: bool = False,
    table_name: str = "NCBI_TABLE_1",
    use_pallas: bool = False,
    pad_coding: int = 0,
    band_k: int = 0,
):
    """Jitted general (SNP+indel) forward step closed over the transcript
    geometry. step(pos, kind, del_len, ins_codes, ins_len, alt_code, valid)
    -> IndelForwardOutputs. pad_coding is the static coding slack (rounded
    up to a multiple of 3)."""
    from ..sequence.alphabet import AminoAcid

    table = amino_translation_table(table_name)
    exon_intervals = np.asarray(exon_intervals, dtype=np.int64)
    exon_bounds = tuple(
        (int(lo - region_start), int(hi - region_start))
        for lo, hi in exon_intervals
    )
    region = jnp.asarray(region_codes, dtype=jnp.uint8)
    amino_lut = jnp.asarray(table.amino_lut, dtype=jnp.uint8)
    complement_lut = jnp.asarray(DNA5.COMPLEMENT, dtype=jnp.uint8)
    start_codes = jnp.asarray(
        np.unique(table.amino_lut[table.start_lut]), dtype=jnp.uint8
    )
    pad_coding = ((max(pad_coding, 3) + 2) // 3) * 3

    def step(pos, kind, del_len, ins_codes, ins_len, alt_code, valid):
        return _forward_indel_jit(
            region, pos, kind, del_len, ins_codes, ins_len, alt_code, valid,
            amino_lut, complement_lut, start_codes,
            exon_bounds_key=exon_bounds, reverse_strand=reverse_strand,
            stop_code=AminoAcid.STOP, pad_coding=pad_coding, band_k=band_k,
            use_pallas=use_pallas,
        )

    return step


@functools.partial(
    jax.jit,
    static_argnames=("exon_lens", "reverse_strand", "stop_code", "use_pallas"),
)
def _forward_jit(
    region, exon_starts, positions, alt_codes, valid,
    amino_lut, complement_lut, start_codes,
    *, exon_lens, reverse_strand, stop_code, use_pallas,
):
    return _forward(
        region, exon_starts, exon_lens, reverse_strand,
        positions, alt_codes, valid, amino_lut, complement_lut,
        stop_code, start_codes, use_pallas=use_pallas,
    )


def make_forward_step(
    region_codes: np.ndarray,
    exon_intervals: np.ndarray,
    region_start: int,
    reverse_strand: bool = False,
    table_name: str = "NCBI_TABLE_1",
    use_pallas: bool = False,
):
    """Build a jitted forward step closed over the transcript geometry.

    step_fn(positions, alt_codes, valid) -> ForwardOutputs. Transcripts
    with the same (region length, exon-length signature, batch shapes)
    share one compiled executable — the geometry is passed as arguments
    to a module-level jit, not baked in as constants.
    """
    from ..sequence.alphabet import AminoAcid

    table = amino_translation_table(table_name)
    exon_intervals = np.asarray(exon_intervals, dtype=np.int64)
    exon_lens = tuple(int(hi - lo) for lo, hi in exon_intervals)
    exon_starts = jnp.asarray(
        exon_intervals[:, 0] - region_start, dtype=jnp.int32
    )
    region = jnp.asarray(region_codes, dtype=jnp.uint8)
    amino_lut = jnp.asarray(table.amino_lut, dtype=jnp.uint8)
    complement_lut = jnp.asarray(DNA5.COMPLEMENT, dtype=jnp.uint8)
    start_codes = jnp.asarray(
        np.unique(table.amino_lut[table.start_lut]), dtype=jnp.uint8
    )

    def step(positions, alt_codes, valid):
        return _forward_jit(
            region, exon_starts, positions, alt_codes, valid,
            amino_lut, complement_lut, start_codes,
            exon_lens=exon_lens, reverse_strand=reverse_strand,
            stop_code=AminoAcid.STOP, use_pallas=use_pallas,
        )

    return step


def make_multichip_indel_step(
    mesh: Mesh,
    region_codes: np.ndarray,
    exon_intervals: np.ndarray,
    region_start: int,
    reverse_strand: bool = False,
    table_name: str = "NCBI_TABLE_1",
    use_pallas: bool | None = None,
    pad_coding: int = 0,
    band_k: int = 0,
):
    """The general SNP+indel forward step under shard_map: sample batches
    sharded over the mesh, transcript geometry replicated — the multi-chip
    route for populations whose variant cocktails include canonical
    insertions/deletions (the single-chip step is _forward_indel; the
    reference's equivalent fan-out is the per-genome thread pool,
    kga_analysis_lib_seqmutation.cpp:116-140).

    step(pos, kind, del_len, ins_codes, ins_len, alt_code, valid) with the
    batch axis of every input sharded; returns (coding_len sharded,
    distance sharded, validity_code sharded).
    """
    from jax import shard_map

    from ..sequence.alphabet import AminoAcid

    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")

    axis = mesh.axis_names[0]
    table = amino_translation_table(table_name)
    exon_intervals = np.asarray(exon_intervals, dtype=np.int64)
    exon_bounds = np.asarray(
        [
            (int(lo - region_start), int(hi - region_start))
            for lo, hi in exon_intervals
        ],
        dtype=np.int64,
    )
    region = jnp.asarray(region_codes, dtype=jnp.uint8)
    amino_lut = jnp.asarray(table.amino_lut, dtype=jnp.uint8)
    complement_lut = jnp.asarray(DNA5.COMPLEMENT, dtype=jnp.uint8)
    start_codes = jnp.asarray(
        np.unique(table.amino_lut[table.start_lut]), dtype=jnp.uint8
    )
    pad_c = ((max(pad_coding, 3) + 2) // 3) * 3

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None, None), P(axis, None), P(axis, None),
                  P(axis, None)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    def step(pos, kind, del_len, ins_codes, ins_len, alt_code, valid):
        out = _forward_indel(
            region, exon_bounds, reverse_strand, pos, kind, del_len,
            ins_codes, ins_len, alt_code, valid, amino_lut, complement_lut,
            AminoAcid.STOP, start_codes, pad_c, band_k, use_pallas,
        )
        return out.coding_len, out.distance, out.validity_code

    return step


def make_multichip_step(
    mesh: Mesh,
    region_codes: np.ndarray,
    exon_intervals: np.ndarray,
    region_start: int,
    reverse_strand: bool = False,
    table_name: str = "NCBI_TABLE_1",
    use_pallas: bool | None = None,
):
    """The full step under shard_map: samples sharded over the mesh axis,
    transcript geometry replicated, allele counts psum-merged over ICI.

    step(positions, alt_codes, valid, zygosity) where the batch axis of
    every input is sharded; returns (distances sharded, allele counts
    replicated, population AC replicated).

    use_pallas routes each shard's DP through the SAME Pallas kernels as
    the single-chip step (banded when the SNP budget bounds the band, full
    wavefront otherwise) so per-chip throughput matches 1-chip; default is
    auto (on for TPU backends, interpret-mode on the CPU test mesh when
    explicitly requested).
    """
    from jax import shard_map

    from ..sequence.alphabet import AminoAcid

    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")

    axis = mesh.axis_names[0]
    table = amino_translation_table(table_name)
    region = jnp.asarray(region_codes, dtype=jnp.uint8)
    exon_intervals = np.asarray(exon_intervals, dtype=np.int64)
    exon_lens = tuple(int(hi - lo) for lo, hi in exon_intervals)
    exon_starts = jnp.asarray(
        exon_intervals[:, 0] - region_start, dtype=jnp.int32
    )
    amino_lut = jnp.asarray(table.amino_lut, dtype=jnp.uint8)
    complement_lut = jnp.asarray(DNA5.COMPLEMENT, dtype=jnp.uint8)
    start_codes = jnp.asarray(
        np.unique(table.amino_lut[table.start_lut]), dtype=jnp.uint8
    )

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
        out_specs=(P(axis), P(), P()),
        # pallas_call out_shapes carry no varying-mesh-axes annotation; the
        # out_specs above pin the sharding explicitly.
        check_vma=False,
    )
    def step(positions, alt_codes, valid, zygosity):
        out = _forward(
            region, exon_starts, exon_lens, reverse_strand,
            positions, alt_codes, valid,
            amino_lut, complement_lut, AminoAcid.STOP, start_codes,
            use_pallas=use_pallas,
        )
        # Merge per-shard allele counts and zygosity AC over the mesh.
        allele_counts = jax.lax.psum(out.allele_counts, axis)
        pop_ac = jax.lax.psum(
            jnp.sum(zygosity.astype(jnp.int32), axis=0), axis
        )
        return out.distance, allele_counts, pop_ac

    return step
