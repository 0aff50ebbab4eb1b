"""Banded Myers bit-vector Levenshtein kernel: 32 DP cells per int32 lane.

The reference's edlib packs 64 DP cells per machine word and computes the
banded NW distance with bit-parallel column updates (contrib/edlib/
edlib.cpp:13 "Myers", banded block activate/deactivate edlib.cpp:161-316).
This kernel is the TPU re-design: the Hyyro/Myers block recurrence runs on
the VPU with PAIRS across (sublane, lane) — 1024 pairs per vreg op at
block_b = 1024 — and the pattern's match bitmasks (Peq) packed 32 cells
per uint32. Per text column the kernel touches NB = 2*shift+1 blocks of
32 cells (the band window) instead of 2k+1 one-cell-per-lane lanes, ~20x
fewer vector issues than ops/pallas_banded.py at the same band.

Band windowing (the TPU answer to edlib's firstBlock/lastBlock sliding):
the window of NB 32-row blocks slides down ONE block every 32 columns —
exactly chunk-aligned when band_k = 32*shift - 1 (k in 31, 63, 127, 255,
511) — so the grid iterates 32-column chunks with a STATIC per-chunk
window; the window state rotates through an (NB, Bs, 128) VMEM scratch
with static slot indices (no dynamic sublane addressing). A block
entering the window is in its init state (VP = ~0: vertical deltas +1, a
safe overestimate of out-of-band cells); the carry into the window's top
block is pinned to +1 (the exact row-0 boundary when the window sits at
the top, an out-of-band overestimate otherwise). Standard banded-DP
argument: every computed cell >= the true distance, with equality on the
optimal path whenever that path stays inside the band.

Final-cell capture, per pair, without popcounts: the score S_cap tracks
the COMPUTED value of row la across columns — its horizontal delta at
column j is bit (la-1)&31 of the PRE-shift Ph/Mh carry words of the
window block holding row la (selected by static masks; +1/column while
that block is below the window, i.e. still in its +1-vertical init
state, which keeps the running value consistent) — and is latched into
the output when j == lb. Rows stay in-window for every in-band column
(32*wb <= j-k <= la <= j+k <= window bottom), so the captured value is
the computed D[la][lb].

Exactness contract (same as banded_levenshtein): the returned value is
>= the true distance, equal iff result <= band_k and |la-lb| <= band_k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "myers_banded_levenshtein",
    "myers_distance_padded",
    "myers_band_for",
    "adaptive_myers_levenshtein",
    "myers_pairs_device",
    "MYERS_BANDS",
]

MYERS_BANDS = (31, 63, 127, 255, 511)  # 32*shift - 1: chunk-aligned windows


def _myers_layout(band_k: int, max_len: int):
    """(shift, NB, NBtot, M_pad) for a banded Myers call."""
    if (band_k + 1) % 32:
        raise ValueError(f"band_k must be 32*s - 1, got {band_k}")
    shift = (band_k + 1) // 32
    M_pad = ((max_len + 31) // 32) * 32
    NBtot = max(M_pad // 32, 1)
    M_pad = NBtot * 32
    NB = min(2 * shift + 1, NBtot)
    return shift, NB, NBtot, M_pad


def _myers_kernel(text_ref, la_ref, lb_ref, lab_ref, bit_ref, *rest,
                  NB: int, NBtot: int, shift: int, Bs: int, unroll: int,
                  shared_text: bool):
    """One (pair-block, column-chunk) grid step: 32 text columns over the
    NB-block band window. rest = NB peq tile refs, out ref, then scratch
    (vp, vn, s_cap, cap). Pattern bits arrive as THREE bit-plane words
    (values 0..7 per cell); Eq is the AND of per-plane XNORs against the
    text char's bits — 6 vector ops and 3 DMA tiles per block instead of
    a 5-symbol mask blend. shared_text: the text is one sequence common
    to every pair (the mutant-vs-reference pipelines) delivered as
    per-column SMEM scalars, which removes the (B, M_pad) text transpose
    from the prep entirely."""
    peq_refs = rest[:NB]
    out_ref = rest[NB]
    vp_ref, vn_ref = rest[NB + 1], rest[NB + 2]
    scap_ref, cap_ref = rest[NB + 3], rest[NB + 4]
    g = pl.program_id(1)
    full = jnp.uint32(0xFFFFFFFF)
    zero = jnp.uint32(0)

    @pl.when(g == 0)
    def _init():
        vp_ref[:] = jnp.full((NB, Bs, 128), full, jnp.uint32)
        vn_ref[:] = jnp.zeros((NB, Bs, 128), jnp.uint32)
        scap_ref[:] = la_ref[:]  # D[la][0] = la
        cap_ref[:] = la_ref[:]   # lb = 0 pairs never hit a column latch

    # Window advance: one block down per chunk while the band interior
    # slides (edlib's lastBlock++ / firstBlock++, edlib.cpp:161-316).
    advance = (g >= shift + 1) & (g <= NBtot - NB + shift)

    @pl.when(advance)
    def _slide():
        for t in range(NB - 1):
            vp_ref[t] = vp_ref[t + 1]
            vn_ref[t] = vn_ref[t + 1]
        vp_ref[NB - 1] = jnp.full((Bs, 128), full, jnp.uint32)
        vn_ref[NB - 1] = jnp.zeros((Bs, 128), jnp.uint32)

    wb_eff = jnp.clip(g - shift, 0, NBtot - NB)
    la_slot = lab_ref[:] - wb_eff          # window slot of row la's block
    la_bit = bit_ref[:]                    # 1 << ((la-1) & 31)
    lb_col = lb_ref[:]
    vps = tuple(vp_ref[t] for t in range(NB))
    vns = tuple(vn_ref[t] for t in range(NB))

    def col(r, carry):
        s_cap, cap, vps, vns = carry
        j = g * 32 + r + 1                 # 1-based text column
        if shared_text:
            c = text_ref[0, 0, r]          # scalar text char (SMEM)
        else:
            c = text_ref[0, r].astype(jnp.int32)  # (Bs, 128) column chars
        # plane masks: m_i = all-ones iff bit i of the text char is set
        m0 = jnp.where((c & 1) != 0, full, zero)
        m1 = jnp.where((c & 2) != 0, full, zero)
        m2 = jnp.where((c & 4) != 0, full, zero)
        ph_in = jnp.uint32(1)  # top boundary: row-0 delta / band overestimate
        mh_in = zero
        new_vps, new_vns = [], []
        ph_sel = zero * la_bit
        mh_sel = ph_sel
        for t in range(NB):
            p = peq_refs[t]
            # Eq bit set where all three pattern bit-planes agree with the
            # text char's bits (XNOR-AND identity).
            eq = ~((p[0, 0] ^ m0) | (p[1, 0] ^ m1) | (p[2, 0] ^ m2))
            pv, mv = vps[t], vns[t]
            # Hyyro/Myers block recurrence with {P,M} carry bits
            # (edlib calculateBlock, contrib/edlib/edlib.cpp:84-106).
            xv = eq | mv
            eq2 = eq | mh_in
            xh = (((eq2 & pv) + pv) ^ pv) | eq2
            ph = mv | ~(xh | pv)
            mh = pv & xh
            # pre-shift Ph/Mh bit r = horizontal delta at row 32*blk+r+1:
            # stash the words of row la's block for the score update.
            in_slot = la_slot == t
            ph_sel = jnp.where(in_slot, ph, ph_sel)
            mh_sel = jnp.where(in_slot, mh, mh_sel)
            ph_out = ph >> 31
            mh_out = mh >> 31
            ph = (ph << 1) | ph_in
            mh = (mh << 1) | mh_in
            new_vps.append(mh | ~(xv | ph))
            new_vns.append(ph & xv)
            ph_in, mh_in = ph_out, mh_out
        bit_delta = (
            jnp.where((ph_sel & la_bit) != 0, 1, 0)
            - jnp.where((mh_sel & la_bit) != 0, 1, 0)
        )
        # Row la below the window: its value chains from the window's
        # bottom row through init (+1-vertical) blocks, so its horizontal
        # delta equals the LAST block's carry-out. Above the window
        # (la_slot < 0): only la == 0 still matters (D[0][j] = j, +1);
        # la > 0 rows exit the window only after their latch column.
        hout_delta = ph_in.astype(jnp.int32) - mh_in.astype(jnp.int32)
        delta = jnp.where(
            la_slot < 0, 1,
            jnp.where(la_slot < NB, bit_delta, hout_delta),
        )
        s_cap = s_cap + delta
        cap = jnp.where(lb_col == j, s_cap, cap)
        return (s_cap, cap, tuple(new_vps), tuple(new_vns))

    s_cap, cap, vps, vns = jax.lax.fori_loop(
        0, 32, col, (scap_ref[:], cap_ref[:], vps, vns), unroll=unroll
    )
    for t in range(NB):
        vp_ref[t] = vps[t]
        vn_ref[t] = vns[t]
    scap_ref[:] = s_cap
    cap_ref[:] = cap

    @pl.when(g == NBtot - 1)
    def _emit():
        out_ref[:] = cap


def _pack_planes(a_m: jnp.ndarray, NBtot: int) -> jnp.ndarray:
    """Bit-plane Peq pack on the MXU: (B, M_pad) masked codes -> packed
    (3, B, NBtot) uint32 words (32 pattern cells per word). Three {0,1}
    planes contract against 16-bit halves of the weight vector (exact in
    f32) — one small matmul replaces five cross-lane reduces (the
    lane-dim reduce form cost ~3 ms at the 256x3kb pipeline shape)."""
    B = a_m.shape[0]
    planes = jnp.stack(
        [((a_m >> i) & 1).astype(jnp.float32) for i in range(3)]
    ).reshape(3 * B * NBtot, 32)
    wmat = np.zeros((32, 2), np.float32)
    for k in range(16):
        wmat[k, 0] = float(1 << k)
        wmat[k + 16, 1] = float(1 << k)
    halves = jnp.dot(planes, jnp.asarray(wmat),
                     preferred_element_type=jnp.float32)
    return (
        halves[:, 0].astype(jnp.uint32)
        | (halves[:, 1].astype(jnp.uint32) << 16)
    ).reshape(3, B, NBtot)


@functools.partial(
    jax.jit,
    static_argnames=("max_len", "band_k", "block_b", "interpret", "shared_b"),
)
def _myers_call(a, la, b, lb, peq_packed=None, *, max_len: int, band_k: int,
                block_b: int = 1024, interpret: bool = False,
                shared_b: bool = False):
    """Traceable banded Myers distance. a: (B, W) integer code arrays
    (codes 0..4); la, lb: (B,) lengths. b: (B, W) per-pair text, or
    (1, W) when shared_b (one text common to all pairs — skips the text
    transpose; per-column chars ride SMEM). Returns (B,) int32 distances
    (>= true; exact iff <= band_k and |la-lb| <= band_k). B must be a
    multiple of 128."""
    B = a.shape[0]
    shift, NB, NBtot, M_pad = _myers_layout(band_k, max_len)
    if B % 128:
        raise ValueError("B must be a multiple of 128")
    # Mosaic block constraint: the pair-sublane block dim must be a
    # multiple of 8 or cover the whole axis — so either B <= 1024 (one
    # block over the full axis) or B is a multiple of 1024 (Bs = 8).
    if B <= min(block_b, 1024):
        block_b = B
    elif B % 1024 == 0:
        block_b = min(block_b, 1024) if block_b % 1024 == 0 else 1024
    else:
        raise ValueError("B > 1024 must be a multiple of 1024")
    Bs = block_b // 128

    idx = jnp.arange(M_pad, dtype=jnp.int32)[None, :]
    la = la.astype(jnp.int32)
    lb = lb.astype(jnp.int32)

    def fit(x):
        w = x.shape[1]
        if w < M_pad:
            return jnp.pad(x.astype(jnp.int32), ((0, 0), (0, M_pad - w)))
        return x[:, :M_pad].astype(jnp.int32)

    # pattern rows beyond la: sentinel -1 (bit planes = 7, matching no
    # char); text columns beyond lb: selector 5 — pads never match.
    if peq_packed is None:
        a_m = jnp.where(idx < la[:, None], fit(a), -1)
        peq = _pack_planes(a_m, NBtot)
    else:
        peq = peq_packed  # (3, B, NBtot) pre-packed (pool gather path)
    peq = peq.transpose(0, 2, 1).reshape(3, NBtot, B // 128, 128)

    if shared_b:
        # One text for every pair; valid up to the largest lb (pairs with
        # smaller lb latch earlier and never read the tail columns).
        idx1 = jnp.arange(M_pad, dtype=jnp.int32)[None, :]
        b_m = jnp.where(idx1 < jnp.max(lb), fit(b), 5)
        text = b_m.reshape(NBtot, 1, 32)  # per-column SMEM scalars
    else:
        b_m = jnp.where(idx < lb[:, None], fit(b), 5).astype(jnp.int8)
        # text transposed to (chunk, column, pair-sublane, lane); int8
        # quarters the transpose + DMA traffic (~400 MB at the 32k-pair
        # all-pairs shape); the kernel widens per column
        text = b_m.reshape(B, NBtot, 32).transpose(1, 2, 0).reshape(
            NBtot, 32, B // 128, 128
        )

    def cols(x):
        return x.reshape(B // 128, 128)

    la_col = cols(la)
    lb_col = cols(lb)
    lab_col = cols((la - 1) >> 5)                       # block of row la
    bit_col = cols(
        (jnp.uint32(1) << ((la - 1).astype(jnp.uint32) & 31))
    )

    kernel = functools.partial(
        _myers_kernel, NB=NB, NBtot=NBtot, shift=shift, Bs=Bs,
        unroll=1 if interpret else 32, shared_text=shared_b,
    )

    def _col_spec():
        return pl.BlockSpec((Bs, 128), lambda i, g: (i, 0),
                            memory_space=pltpu.VMEM)

    def _peq_spec(t):
        return pl.BlockSpec(
            (3, 1, Bs, 128),
            lambda i, g, t=t: (
                0, jnp.clip(g - shift, 0, NBtot - NB) + t, i, 0
            ),
            memory_space=pltpu.VMEM,
        )

    if shared_b:
        text_spec = pl.BlockSpec((1, 1, 32), lambda i, g: (g, 0, 0),
                                 memory_space=pltpu.SMEM)
    else:
        text_spec = pl.BlockSpec((1, 32, Bs, 128), lambda i, g: (g, 0, i, 0),
                                 memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(B // block_b, NBtot),
        in_specs=[
            text_spec,
            _col_spec(), _col_spec(), _col_spec(), _col_spec(),
            *[_peq_spec(t) for t in range(NB)],
        ],
        out_specs=pl.BlockSpec((Bs, 128), lambda i, g: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // 128, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((NB, Bs, 128), jnp.uint32),
            pltpu.VMEM((NB, Bs, 128), jnp.uint32),
            pltpu.VMEM((Bs, 128), jnp.int32),
            pltpu.VMEM((Bs, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * B * M_pad * NB,
            bytes_accessed=4 * B * M_pad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(text, la_col, lb_col, lab_col, bit_col, *([peq] * NB))
    captured = out.reshape(B)
    # |la-lb| > band_k: the latch column can fire with row la outside the
    # window — return a safe overestimate that still exceeds the band.
    return jnp.where(
        jnp.abs(la - lb) > band_k, jnp.maximum(la, lb), captured
    )


def myers_distance_padded(a, la, b, lb, *, max_len: int, band_k: int,
                          interpret: bool = False, shared_b: bool = False):
    """Traceable wrapper that pads the pair axis to the kernel's block
    quantum and slices the result back — the drop-in distance stage for
    fused pipelines (ops/pipeline.py _forward/_forward_indel).

    Compiled path pads to FULL 1024-pair blocks: Mosaic ops on sub-vreg
    (Bs < 8) sublane shapes pay ~20x per-op relayout overhead (measured
    25 ms vs 1.2 ms for the same 94-chunk DP at B = 256), so 4x padded
    work at Bs = 8 is far cheaper than unpadded work at Bs = 2. The
    interpreter path keeps 128 (padding = real interpreted work there).

    The optimization barrier pins the caller's (possibly expensive)
    sequence producers — e.g. the fused SNP-scatter/splice chain — so
    XLA cannot duplicate them into each of the Peq pack's five
    reductions plus the text transpose (producer-duplicating fusion is
    the classic cost explosion on stacked reduce patterns here)."""
    a, la, b, lb = jax.lax.optimization_barrier((a, la, b, lb))
    B = a.shape[0]
    q = 128 if interpret else 1024
    Bp = ((B + q - 1) // q) * q
    if Bp != B:
        a = jnp.pad(a.astype(jnp.int32), ((0, Bp - B), (0, 0)))
        if not shared_b:
            b = jnp.pad(b.astype(jnp.int32), ((0, Bp - B), (0, 0)))
        la = jnp.pad(la.astype(jnp.int32), (0, Bp - B))
        lb = jnp.pad(lb.astype(jnp.int32), (0, Bp - B))
    return _myers_call(
        a, la, b, lb, max_len=max_len, band_k=band_k, interpret=interpret,
        shared_b=shared_b,
    )[:B]


def myers_band_for(bound: int, max_band: int = 511):
    """Smallest chunk-aligned Myers band covering an edit bound, or None
    when the bound exceeds max_band."""
    for k in MYERS_BANDS:
        if k > max_band:
            break
        if bound <= k:
            return k
    return None


def adaptive_myers_levenshtein(
    seq_a: np.ndarray, len_a: np.ndarray, seq_b: np.ndarray, len_b: np.ndarray,
    start_k: int = 63, max_band: int = 511, interpret: bool | None = None,
) -> np.ndarray:
    """Edlib band-doubling on the Myers kernel (edlib.cpp:161-185):
    distances verified against the band; overflow pairs re-run at the
    next chunk-aligned band; final stragglers use the exact full
    wavefront kernel."""
    from .pallas_edit_distance import pallas_batched_levenshtein

    len_a = np.asarray(len_a, dtype=np.int32)
    len_b = np.asarray(len_b, dtype=np.int32)
    B = len(len_a)
    result = np.full(B, -1, dtype=np.int32)
    pending = np.arange(B)
    bands = [k for k in MYERS_BANDS if start_k <= k <= max_band] or [
        max(k for k in MYERS_BANDS if k <= max_band)
    ]
    for k in bands:
        if not len(pending):
            break
        d = myers_banded_levenshtein(
            np.asarray(seq_a)[pending], len_a[pending],
            np.asarray(seq_b)[pending], len_b[pending], band_k=k,
            interpret=interpret,
        )
        ok = (d <= k) & (np.abs(len_a[pending] - len_b[pending]) <= k)
        result[pending[ok]] = d[ok]
        pending = pending[~ok]
    if len(pending):
        d = pallas_batched_levenshtein(
            np.asarray(seq_a)[pending], len_a[pending],
            np.asarray(seq_b)[pending], len_b[pending], interpret=interpret,
        )
        result[pending] = d
    return result


def myers_banded_levenshtein(
    seq_a: np.ndarray, len_a: np.ndarray, seq_b: np.ndarray, len_b: np.ndarray,
    band_k: int = 63, interpret: bool | None = None, block_b: int = 1024,
) -> np.ndarray:
    """Banded Myers distance (host wrapper). Exact iff result <= band_k
    and |la - lb| <= band_k; overflow values are >= the true distance
    (the adaptive band-doubling contract of banded_levenshtein)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    seq_a = np.asarray(seq_a)
    seq_b = np.asarray(seq_b)
    la = np.asarray(len_a, dtype=np.int32)
    lb = np.asarray(len_b, dtype=np.int32)
    B = seq_a.shape[0]
    M = max(seq_a.shape[1], seq_b.shape[1], 1)
    q = 128 if interpret else 1024  # sub-vreg sublane blocks are ~20x slower
    Bp = ((B + q - 1) // q) * q
    a_p = np.zeros((Bp, seq_a.shape[1]), np.int32)
    a_p[:B] = seq_a
    b_p = np.zeros((Bp, seq_b.shape[1]), np.int32)
    b_p[:B] = seq_b
    la_p = np.zeros(Bp, np.int32)
    la_p[:B] = la
    lb_p = np.zeros(Bp, np.int32)
    lb_p[:B] = lb
    out = _myers_call(
        jnp.asarray(a_p), jnp.asarray(la_p), jnp.asarray(b_p),
        jnp.asarray(lb_p), max_len=M, band_k=band_k, block_b=block_b,
        interpret=interpret,
    )
    return np.asarray(out)[:B]


def _myers_pairs_impl(seqs, lens, iu, ju, *, band_k: int, max_len: int,
                      block_b: int = 1024, interpret: bool = False):
    """Traceable all-pairs driver: gather (iu, ju) rows of a device pool
    and run the Myers kernel — only pair INDICES cross the host link (the
    UPGMA matrix workload, kgl_classification/
    kgl_distance_tree_upgma.cpp:53-69)."""
    P = iu.shape[0]
    q = 128 if interpret else 1024  # sub-vreg sublane blocks are ~20x slower
    Bp = ((P + q - 1) // q) * q
    pad = Bp - P
    iu = jnp.pad(iu.astype(jnp.int32), (0, pad))
    ju = jnp.pad(ju.astype(jnp.int32), (0, pad))
    # Pack the POOL's Peq planes once (n x NBtot words) and gather packed
    # words per pair — the per-pair plane build + pack over the expanded
    # (P, M_pad) batch was most of the all-pairs prep.
    shift, NB, NBtot, M_pad = _myers_layout(band_k, max_len)
    n, W = seqs.shape
    idx = jnp.arange(M_pad, dtype=jnp.int32)[None, :]
    pool = seqs.astype(jnp.int32)
    if W < M_pad:
        pool = jnp.pad(pool, ((0, 0), (0, M_pad - W)))
    else:
        pool = pool[:, :M_pad]
    pool_m = jnp.where(idx < lens[:, None].astype(jnp.int32), pool, -1)
    pool_peq = _pack_planes(pool_m, NBtot)          # (3, n, NBtot)
    peq_pairs = pool_peq[:, iu, :]                  # (3, Bp, NBtot)
    b = seqs[ju]
    la = lens[iu].astype(jnp.int32)
    lb = lens[ju].astype(jnp.int32)
    # `a` is only consulted when peq_packed is absent — a (Bp, 1) dummy
    # avoids a 400 MB gather of the raw pattern rows.
    return _myers_call(
        jnp.zeros((Bp, 1), jnp.int32), la, b, lb, peq_pairs,
        max_len=max_len, band_k=band_k, block_b=block_b,
        interpret=interpret,
    )[:P]


_myers_pairs_gather = jax.jit(
    _myers_pairs_impl,
    static_argnames=("band_k", "max_len", "block_b", "interpret"),
)


def myers_pairs_device(seqs_dev, lens_dev, iu: np.ndarray, ju: np.ndarray,
                       band_k: int = 63, block_b: int = 1024,
                       interpret: bool | None = None) -> np.ndarray:
    """Banded Myers distances for an index-pair batch over a
    device-resident sequence pool (drop-in for banded_pairs_device)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    out = _myers_pairs_gather(
        seqs_dev, lens_dev, jnp.asarray(iu, jnp.int32),
        jnp.asarray(ju, jnp.int32), band_k=band_k,
        max_len=int(seqs_dev.shape[1]), block_b=block_b, interpret=interpret,
    )
    return np.asarray(out)
