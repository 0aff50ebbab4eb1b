"""Banded Levenshtein Pallas kernel with edlib-style band doubling.

The reference's edlib computes NW distance inside a +-k band, doubling k
until the distance fits (contrib/edlib/edlib.cpp:161-185, start k = 64).
This kernel is the TPU re-design of that algorithm: the DP runs ROW-wise
over a band of width 2k+1 held in lanes; the serial in-row dependency
(insertion chain) is resolved with a LOGARITHMIC prefix-min over lanes
(min-plus scan), so each row costs ~log2(band) roll+min ops on the VPU
instead of a serial loop. With k = 63 the whole band is ONE (8, 128) tile,
versus the full wavefront kernel's ~24 tiles per diagonal at M = 3,000 —
~50x fewer cell updates when the band holds.

Memory layout: rows are processed in groups of 128 so both `a` (one base
per row) and the sliding `b` window are read with STATIC 128-aligned lane
slices (Mosaic requires provable lane alignment); within a group the small
register copies advance with cheap 1-tile rolls.

Band semantics: cells with |i - j| > k are +inf. A banded result is exact
iff result <= k and |len_a - len_b| <= k; adaptive_banded_levenshtein
doubles k until that holds, falling back to the exact full kernel.

Row recurrence in band coordinates (cur[c] = D[i, i - k + c]):
    base[c] = min(prev[c+1] + 1, prev[c] + cost[c])      # delete / subst
    cur[c]  = min over c' <= c of (base[c'] + (c - c'))  # insertion chain
with cost[c] = (a[i-1] != b[i-1-k+c]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "banded_levenshtein",
    "adaptive_banded_levenshtein",
    "banded_pairs_device",
    "band_layout",
    "MAX_BAND",
]

BLOCK_B = 32  # pairs per block (amortises per-row loop overhead)
B_LEAD = 128  # default leading sentinel pad on b (k < 128 band layouts)
MAX_BAND = 511  # widest multi-tile band before the full wavefront takes over


def band_layout(band_k: int, max_len: int):
    """(lead, band_w, win_w, Wa) for a banded call: the leading sentinel
    pad must cover the band reach-back (multi-tile bands k >= 128 need a
    wider lead; edlib band doubling beyond one tile,
    contrib/edlib/edlib.cpp:161-185)."""
    lead = max(B_LEAD, ((band_k + 127) // 128) * 128)
    band_w = ((2 * band_k + 1 + 127) // 128) * 128
    win_w = band_w + lead + 128
    Wa = ((max_len + 127) // 128) * 128
    return lead, band_w, win_w, Wa


def _prefix_min_chain(base: jnp.ndarray, width: int) -> jnp.ndarray:
    """cur[c] = min_{c'<=c}(base[c'] + (c-c')) via log-step shifts."""
    col = jax.lax.broadcasted_iota(jnp.int32, base.shape, 1)
    g = base - col
    shift = 1
    while shift < width:
        rolled = pltpu.roll(g, shift, 1)
        valid = col >= shift  # lanes c < shift must not see wrapped values
        g = jnp.minimum(g, jnp.where(valid, rolled, g))
        shift *= 2
    return g + col


def _banded_kernel(a_ref, *rest, max_len: int, band_k: int, band_w: int,
                   win_w: int, n_groups: int, w_tiles: int,
                   lead: int = B_LEAD, unroll: int = 128,
                   block_b: int = BLOCK_B, uniform_cap: bool = False):
    """One (pair-block, row-group) grid step of the banded DP.

    Grid is (B // block_b, n_groups) with the row-group axis fastest: the
    band wavefront lives in scratch (prev_ref) and persists across the
    group steps of one pair block; only a (block_b, 128) tile of `a` and
    the w_tiles x 128-lane window of `b` stream into VMEM per step. The
    windowed view is built by passing the SAME b buffer w_tiles times with
    group-offset index maps — no host-side window expansion, and per-block
    VMEM stays ~(5 + w_tiles) x 128 lanes regardless of sequence length,
    which is what lets block_b reach 1024 rows (the whole-buffer layout
    capped out at 256 inside ~16 MB VMEM).

    prev_ref: (B, band_w) band wavefront (band_w = 2k+1 padded to 128s).
    cap_ref: (B, band_w) capture accumulator — rows contribute
    ELEMENTWISE (no per-row cross-lane reduction); one reduction at the
    final group folds it to the (B,) result.
    uniform_cap: static promise that la == lb == max_len for every pair
    (the fused mutant-vs-reference path) — capture then reads the final
    wavefront row directly and the per-row capture work disappears.
    """
    b_parts = rest[:w_tiles]
    len_a_ref, len_b_ref, out_ref, prev_ref, cap_ref = rest[w_tiles:]
    M = max_len
    K = band_k
    Wp = band_w
    Wg = win_w
    BIG = jnp.int32(2 * M + 7)
    g = pl.program_id(1)

    c_idx = jax.lax.broadcasted_iota(jnp.int32, (block_b, Wp), 1)
    la = len_a_ref[:, 0:1]
    lb = len_b_ref[:, 0:1]

    @pl.when(g == 0)
    def _init():
        # Row 0: D[0, j] = j for j >= 0 within the band, +inf outside.
        j0 = c_idx - K
        prev_ref[:] = jnp.where((j0 >= 0) & (j0 <= K), jnp.maximum(j0, 0), BIG)
        if not uniform_cap:
            cap_ref[:] = jnp.zeros((block_b, Wp), jnp.int32)

    def row_step(i, a_col, bwin):
        """One DP row; a_col (B, 1) = a[i-1]; bwin (B, Wg) has
        bwin[c] = b[i-1-K+c] for c in [0, Wp)."""
        j_idx = i - K + c_idx
        cost = (bwin[:, :Wp] != a_col).astype(jnp.int32)

        prev = prev_ref[:]
        up = pltpu.roll(prev, Wp - 1, 1)   # prev[c+1] (-1 roll)
        up = jnp.where(c_idx == Wp - 1, BIG, up)  # mask the wrap lane
        base = jnp.minimum(up + 1, prev + cost)
        base = jnp.where(j_idx == 0, i, base)  # boundary D[i, 0] = i
        invalid = (j_idx < 0) | (j_idx > M)
        base = jnp.where(invalid, BIG, base)
        cur = _prefix_min_chain(base, Wp)
        cur = jnp.where(invalid, BIG, cur)
        prev_ref[:] = cur

        if not uniform_cap:
            # capture D[la, lb] at row i == la, band cell c = lb - la + K:
            # elementwise accumulate; reduced across lanes ONCE at the end.
            hit = (la == i) & (c_idx == lb - la + K)
            cap_ref[:] = cap_ref[:] + jnp.where(hit, cur, 0)

    a_grp0 = a_ref[:].astype(jnp.int32)  # (block_b, 128) tile of this group
    # b window for the group: b_buf[g*128 ..) where b_buf[l] = b[l - lead];
    # assembled from the w_tiles offset views of the same buffer.
    b_grp = jnp.concatenate(
        [p[:].astype(jnp.int32) for p in b_parts], axis=1
    )
    # bwin[c] must equal b[g*128 + r - K + c] = b_grp[lead + r - K + c];
    # initialise for r = 0 with a roll by -(lead - K), advance -1/row.
    bwin0 = pltpu.roll(b_grp, (Wg - (lead - K)) % Wg, 1)

    g128 = g * 128

    def row_body(r, carry):
        a_grp, bwin = carry
        i = g128 + r + 1  # 1-based DP row

        @pl.when(i <= M)
        def _():
            row_step(i, a_grp[:, 0:1], bwin)

        return (pltpu.roll(a_grp, 127, 1), pltpu.roll(bwin, Wg - 1, 1))

    jax.lax.fori_loop(0, 128, row_body, (a_grp0, bwin0), unroll=unroll)

    @pl.when(g == n_groups - 1)
    def _capture():
        if uniform_cap:
            # la == lb == M: the final wavefront row IS row la; D[la, lb]
            # sits at band cell c = K.
            captured = jnp.sum(
                jnp.where(c_idx == K, prev_ref[:], 0), axis=1, keepdims=True
            )
        else:
            # Degenerate la == 0 pairs never hit a row capture (rows are
            # 1-based): D[0, lb] = lb directly.
            captured = jnp.where(
                la == 0, lb, jnp.sum(cap_ref[:], axis=1, keepdims=True)
            )
        out_ref[:] = captured + jnp.zeros((block_b, 128), jnp.int32)


def _banded_choices_kernel(a_ref, *rest, max_len: int, band_k: int,
                           band_w: int, win_w: int, n_groups: int,
                           w_tiles: int, lead: int, unroll: int,
                           block_b: int):
    """Streaming banded DP that EMITS a per-cell traceback CODE instead of
    a distance, one uint8 per cell (halving HBM traffic vs separate
    choice/run tensors): 0 = left(I), 1 = up(D), 2 = diag-substitute,
    3+r = diagonal MATCH run of length r (saturating at 253). Tie-break
    priority matches the host traceback (diag, then up, then left).
    Written as (128, block_b, band_w) blocks per row-group; feeds
    ops/traceback.py's path walk — the DP half of the batched CIGAR
    pipeline at Pallas speed (the XLA scan version ran ~12x slower per
    row)."""
    b_parts = rest[:w_tiles]
    code_ref = rest[w_tiles]
    prev_ref, run_ref = rest[w_tiles + 1], rest[w_tiles + 2]
    M = max_len
    K = band_k
    Wp = band_w
    Wg = win_w
    BIG = jnp.int32(2 * M + 7)
    g = pl.program_id(1)

    c_idx = jax.lax.broadcasted_iota(jnp.int32, (block_b, Wp), 1)

    @pl.when(g == 0)
    def _init():
        j0 = c_idx - K
        prev_ref[:] = jnp.where((j0 >= 0) & (j0 <= K), jnp.maximum(j0, 0), BIG)
        run_ref[:] = jnp.zeros((block_b, Wp), jnp.int32)

    a_grp0 = a_ref[:].astype(jnp.int32)
    b_grp = jnp.concatenate([p[:].astype(jnp.int32) for p in b_parts], axis=1)
    bwin0 = pltpu.roll(b_grp, (Wg - (lead - K)) % Wg, 1)
    g128 = g * 128

    def row_body(r, carry):
        a_grp, bwin = carry
        i = g128 + r + 1  # 1-based DP row

        @pl.when(i <= M)
        def _():
            j_idx = i - K + c_idx
            cost = (bwin[:, :Wp] != a_grp[:, 0:1]).astype(jnp.int32)
            prev = prev_ref[:]
            up = pltpu.roll(prev, Wp - 1, 1)
            up = jnp.where(c_idx == Wp - 1, BIG, up)
            diag_val = prev + cost
            up_val = up + 1
            base = jnp.minimum(up_val, diag_val)
            base = jnp.where(j_idx == 0, i, base)
            invalid = (j_idx < 0) | (j_idx > M)
            base = jnp.where(invalid, BIG, base)
            cur = _prefix_min_chain(base, Wp)
            cur = jnp.where(invalid, BIG, cur)
            prev_ref[:] = cur
            is_diag = cur == diag_val
            is_match = is_diag & (cost == 0)
            # saturate at 252 so code = run + 2 never exceeds 255 (a wrap
            # would corrupt the tape into the host-fallback path)
            run = jnp.where(
                is_match, jnp.minimum(run_ref[:], 252) + 1, 0
            )
            run_ref[:] = run
            # packed code: 0 left / 1 up / 2 diag-sub / 3+run diag-match
            code = jnp.where(
                is_match, run + 2,
                jnp.where(is_diag, 2, jnp.where(cur == up_val, 1, 0)),
            )
            code_ref[pl.ds(r, 1)] = code.astype(jnp.uint8)[None]

        return (pltpu.roll(a_grp, 127, 1), pltpu.roll(bwin, Wg - 1, 1))

    jax.lax.fori_loop(0, 128, row_body, (a_grp0, bwin0), unroll=unroll)


@functools.partial(
    jax.jit,
    static_argnames=("max_len", "band_k", "interpret", "block_b"),
)
def _banded_choices_call(seq_a, seq_b_buf, max_len: int, band_k: int,
                         interpret: bool = False, block_b: int = 128):
    """Packed traceback codes: (M_pad, B, band_w) uint8 tensor for the
    batched traceback. seq_a (B, Wa) int32; seq_b_buf the lead-padded b
    buffer."""
    B, Wa = seq_a.shape
    lead, band_w, win_w, _ = band_layout(band_k, max_len)
    n_groups = Wa // 128
    w_tiles = win_w // 128
    grid = (B // block_b, n_groups)
    kernel = functools.partial(
        _banded_choices_kernel, max_len=max_len, band_k=band_k,
        band_w=band_w, win_w=win_w, n_groups=n_groups, w_tiles=w_tiles,
        lead=lead, unroll=1 if interpret else 128, block_b=block_b,
    )

    def _b_spec(t):
        return pl.BlockSpec(
            (block_b, 128), lambda i, g, t=t: (i, g + t),
            memory_space=pltpu.VMEM,
        )

    M_pad = n_groups * 128
    out_spec = pl.BlockSpec(
        (128, block_b, band_w), lambda i, g: (g, i, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, 128), lambda i, g: (i, g),
                         memory_space=pltpu.VMEM),
            *[_b_spec(t) for t in range(w_tiles)],
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, B, band_w), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((block_b, band_w), jnp.int32),
            pltpu.VMEM((block_b, band_w), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * B * max_len * band_w,
            bytes_accessed=B * max_len * band_w,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seq_a, *([seq_b_buf] * w_tiles))


@functools.partial(
    jax.jit,
    static_argnames=("max_len", "band_k", "interpret", "block_b", "uniform_cap"),
)
def _banded_call(seq_a, seq_b_buf, len_a_col, len_b_col, max_len: int,
                 band_k: int, interpret: bool = False, block_b: int = BLOCK_B,
                 uniform_cap: bool = False):
    B, Wa = seq_a.shape
    lead, band_w, win_w, _ = band_layout(band_k, max_len)
    n_groups = Wa // 128
    w_tiles = win_w // 128
    grid = (B // block_b, n_groups)
    kernel = functools.partial(
        _banded_kernel, max_len=max_len, band_k=band_k, band_w=band_w,
        win_w=win_w, n_groups=n_groups, w_tiles=w_tiles, lead=lead,
        unroll=1 if interpret else 128,
        block_b=block_b, uniform_cap=uniform_cap,
    )

    def _b_spec(t):
        return pl.BlockSpec(
            (block_b, 128), lambda i, g, t=t: (i, g + t),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, 128), lambda i, g: (i, g),
                         memory_space=pltpu.VMEM),
            *[_b_spec(t) for t in range(w_tiles)],
            pl.BlockSpec((block_b, 128), lambda i, g: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda i, g: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 128), lambda i, g: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((block_b, band_w), jnp.int32),
            pltpu.VMEM((block_b, band_w), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * B * max_len * band_w,
            bytes_accessed=3 * B * seq_b_buf.shape[1] * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seq_a, *([seq_b_buf] * w_tiles), len_a_col, len_b_col)


def banded_levenshtein(
    seq_a: np.ndarray, len_a: np.ndarray, seq_b: np.ndarray, len_b: np.ndarray,
    band_k: int = 63, interpret: bool | None = None,
) -> np.ndarray:
    """Banded distance. Exact iff result <= band_k and |la - lb| <= band_k."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if band_k > MAX_BAND:
        raise ValueError(f"band_k must be <= {MAX_BAND}; use the full kernel beyond")
    seq_a = np.asarray(seq_a)
    seq_b = np.asarray(seq_b)
    len_a = np.asarray(len_a, dtype=np.int32)
    len_b = np.asarray(len_b, dtype=np.int32)
    B = seq_a.shape[0]
    M = max(seq_a.shape[1], seq_b.shape[1])
    lead, band_w, win_w, Wa = band_layout(band_k, M)
    Bp = ((B + BLOCK_B - 1) // BLOCK_B) * BLOCK_B

    a_p = np.zeros((Bp, Wa), dtype=np.int32)
    a_p[:B, : seq_a.shape[1]] = seq_a
    # b buffer: `lead` sentinel lanes, then b, then window slack.
    b_buf = np.full((Bp, lead + Wa + win_w), -1, dtype=np.int32)
    b_buf[:B, lead : lead + seq_b.shape[1]] = seq_b
    la = np.zeros((Bp, 128), dtype=np.int32)
    lb = np.zeros((Bp, 128), dtype=np.int32)
    la[:B, :] = len_a[:, None]
    lb[:B, :] = len_b[:, None]
    out = _banded_call(
        jnp.asarray(a_p), jnp.asarray(b_buf), jnp.asarray(la), jnp.asarray(lb),
        max_len=M, band_k=band_k, interpret=interpret,
    )
    return np.asarray(out)[:B, 0]


def _banded_pairs_impl(seqs, lens, iu, ju, *, band_k: int,
                       block_b: int = BLOCK_B, interpret: bool = False,
                       uniform_cap: bool = False):
    """Traceable (jit/shard_map-composable) body of the device pair pool:
    gather (iu, ju) rows of the sequence pool ON DEVICE and run the banded
    kernel — the all-pairs driver that keeps the O(n^2) pair traffic off
    the host link (the reference's UPGMA matrix loop,
    kgl_classification/kgl_distance_tree_upgma.cpp:53-69, re-shaped so only
    pair INDICES cross the host boundary)."""
    n, S = seqs.shape
    lead, band_w, win_w, Wa = band_layout(band_k, S)
    P = iu.shape[0]
    Bp = ((P + block_b - 1) // block_b) * block_b
    a = seqs[iu].astype(jnp.int32)
    b = seqs[ju].astype(jnp.int32)
    a_p = jnp.zeros((Bp, Wa), jnp.int32).at[:P, :S].set(a)
    b_buf = jnp.full((Bp, lead + Wa + win_w), -1, jnp.int32).at[
        :P, lead : lead + S
    ].set(b)
    la = jnp.zeros((Bp, 128), jnp.int32).at[:P, :].set(lens[iu][:, None])
    lb = jnp.zeros((Bp, 128), jnp.int32).at[:P, :].set(lens[ju][:, None])
    return _banded_call(
        a_p, b_buf, la, lb, max_len=S, band_k=band_k, block_b=block_b,
        interpret=interpret, uniform_cap=uniform_cap,
    )[:P, 0]


_banded_pairs_gather = jax.jit(
    _banded_pairs_impl,
    static_argnames=("band_k", "block_b", "interpret", "uniform_cap"),
)


def banded_pairs_device(seqs_dev, lens_dev, iu: np.ndarray, ju: np.ndarray,
                        band_k: int = 63, block_b: int = BLOCK_B,
                        interpret: bool | None = None,
                        uniform_cap: bool = False) -> np.ndarray:
    """Banded distances for an index-pair batch over a device-resident
    sequence pool. Exact iff result <= band_k and |la - lb| <= band_k.
    uniform_cap: static promise that every pair's la == lb == the pool's
    padded width (skips per-row capture work in the kernel)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    out = _banded_pairs_gather(
        seqs_dev, lens_dev, jnp.asarray(iu, jnp.int32), jnp.asarray(ju, jnp.int32),
        band_k=band_k, block_b=block_b, interpret=interpret,
        uniform_cap=uniform_cap,
    )
    return np.asarray(out)


def adaptive_banded_levenshtein(
    seq_a: np.ndarray, len_a: np.ndarray, seq_b: np.ndarray, len_b: np.ndarray,
    start_k: int = 63, max_band: int = MAX_BAND, interpret: bool | None = None,
) -> np.ndarray:
    """Edlib band-doubling: distances verified against the band; pairs that
    overflow re-run at 2k (multi-tile bands up to MAX_BAND); final
    stragglers use the exact full kernel."""
    from .pallas_edit_distance import pallas_batched_levenshtein

    len_a = np.asarray(len_a, dtype=np.int32)
    len_b = np.asarray(len_b, dtype=np.int32)
    B = len(len_a)
    result = np.full(B, -1, dtype=np.int32)
    pending = np.arange(B)
    k = start_k
    while len(pending) and k <= max_band:
        d = banded_levenshtein(
            np.asarray(seq_a)[pending], len_a[pending],
            np.asarray(seq_b)[pending], len_b[pending], band_k=k,
            interpret=interpret,
        )
        ok = (d <= k) & (np.abs(len_a[pending] - len_b[pending]) <= k)
        result[pending[ok]] = d[ok]
        pending = pending[~ok]
        if k >= max_band:
            break
        k = min(2 * k + 1, max_band)
    if len(pending):
        d = pallas_batched_levenshtein(
            np.asarray(seq_a)[pending], len_a[pending],
            np.asarray(seq_b)[pending], len_b[pending], interpret=interpret,
        )
        result[pending] = d
    return result
