"""Batched banded alignment traceback: CIGARs for pair batches on device.

The reference's edlib returns full alignment paths for any pair at
production scale (contrib/edlib/edlib.h:96-249, traceback
edlib.cpp:161-316); the host `compare_sequences` (analysis/legacy.py:48)
covers single pairs. This module closes the batched gap TPU-first:

  1. A banded DP (band cell c = j - i + k, the same coordinate system as
     ops/pallas_banded.py) runs as a lax.scan over rows, recording a 2-bit
     CHOICE per cell — diag / up(D) / left(I) with the host traceback's
     tie-break priority (diag first, then D, then I) — into an
     (M, B, band_w) tensor that stays on device.
  2. A second scan walks the path for all pairs simultaneously (one lane
     per pair), emitting per-step op codes; only the (B, steps) op tape
     crosses the host link.
  3. Host-side vectorized run-length encoding turns op tapes into CIGAR
     strings ("12M1X3M2D..."), the exact format of
     legacy.edit_items_to_cigar.

Exact iff distance <= band_k and |la - lb| <= band_k (the banded
exactness condition); callers route overflow pairs to the host DP.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["banded_traceback_ops", "batched_cigar", "OP_CHARS"]

# op tape codes (0 terminates)
OP_END, OP_M, OP_X, OP_D, OP_I = 0, 1, 2, 3, 4
OP_CHARS = {OP_M: "M", OP_X: "X", OP_D: "D", OP_I: "I"}

_CH_DIAG, _CH_UP, _CH_LEFT = 0, 1, 2


@functools.partial(
    jax.jit, static_argnames=("band_k", "max_len", "max_steps")
)
def _tb_walk(codes, la, lb, *, band_k: int, max_len: int, max_steps: int):
    """Joint path walk over the Pallas-emitted packed code tensor
    ((M_pad, B, band_w) uint8: 0 left / 1 up / 2 diag-sub / >=3
    diag-match, run = code - 2). Returns (ops, counts): (B, max_steps)
    uint8/int32 run tapes in REVERSE path order (end -> start). Runs of
    consecutive diagonal MATCHES collapse into one tape entry (count <=
    254, the match-run counter's width): the traceback's sequential
    gather steps scale with the EDIT count, not the sequence length —
    the hot-loop economics of edlib's O(d) path walk
    (edlib.cpp:161-316)."""
    K = band_k
    B = codes.shape[1]
    Wp = codes.shape[2]
    M = max_len
    pair_idx = jnp.arange(B, dtype=jnp.int32)

    def tb_step(state, _):
        i, j = state
        done = (i <= 0) & (j <= 0)
        c = jnp.clip(j - i + K, 0, Wp - 1)
        i_row = jnp.clip(i - 1, 0, M - 1)
        code = codes[i_row, pair_idx, c].astype(jnp.int32)
        both = (i > 0) & (j > 0)
        is_match = both & (code >= 3)
        take_diag = both & (code >= 2)
        # boundary rows: i == 0 -> I, j == 0 -> D
        take_up = (both & (code == 1)) | ((i > 0) & (j <= 0))
        take_left = ~take_diag & ~take_up
        op = jnp.where(
            take_diag, jnp.where(is_match, OP_M, OP_X),
            jnp.where(take_up, OP_D, OP_I),
        ).astype(jnp.uint8)
        op = jnp.where(done, OP_END, op)
        # match runs jump (code - 2) rows/cols at once; others single-step
        count = jnp.where(is_match, jnp.maximum(code - 2, 1), 1)
        count = jnp.where(done, 0, count)
        ni = jnp.where(done, i, jnp.where(take_left, i, i - count))
        nj = jnp.where(done, j, jnp.where(take_up, j, j - count))
        return (ni, nj), (op, count)

    (_i, _j), (ops, counts) = jax.lax.scan(
        tb_step, (la.astype(jnp.int32), lb.astype(jnp.int32)),
        None, length=max_steps,
    )
    return ops.T, counts.T  # (B, max_steps), reverse path order


def banded_traceback_ops(
    seq_a: np.ndarray, len_a: np.ndarray,
    seq_b: np.ndarray, len_b: np.ndarray,
    band_k: int = 127,
) -> Tuple[np.ndarray, np.ndarray]:
    """(ops, counts) run tapes, each (B, steps), in reverse path order;
    seq_a is the reference (rows/D ops), seq_b the mutant (columns/I ops)."""
    import jax

    interpret = jax.default_backend() not in ("tpu", "axon")
    la = np.asarray(len_a, dtype=np.int32)
    lb = np.asarray(len_b, dtype=np.int32)
    B = seq_a.shape[0]
    M = int(max(la.max(initial=0), lb.max(initial=0), 1))
    # In-band worst case: up to 2*band_k+1 non-match/segment entries can
    # interleave with match runs of at most 253 bases per tape entry, so
    # the bound uses the 253 divisor (a tighter 255 once truncated
    # borderline in-band pairs into the ~100 ms/pair host DP silently).
    # Band-overflow pairs may still truncate — batched_cigar verifies tape
    # completion and reroutes them to the host DP, counting reroutes.
    max_steps = int(min(
        (la + lb).max(initial=1), 2 * band_k + 1 + (M + 252) // 253 + 8
    ))
    # output double-buffering puts two (128, block_b, band_w) uint8 blocks
    # per tensor in VMEM — narrow the block as the band widens
    from .pallas_banded import band_layout

    _lead, band_w, _win_w, _Wa = band_layout(band_k, M)
    # output double-buffering: two (128, block_b, band_w) uint8 blocks must
    # fit VMEM alongside the DP state — scale the block down as the band
    # widens (k = 511 at block 64 tripped the 16 MB scoped-vmem limit)
    block_b = 128 if band_w <= 128 else max(16, 16384 // band_w)
    Bp = ((B + block_b - 1) // block_b) * block_b
    # Only raw uint8 code slices cross the host link; the int32 padded DP
    # buffers, the sentinel fill and the length columns all materialise
    # ON DEVICE inside one fused program (the host-side np.full/astype
    # versions of these buffers dominated wall time on a throttled host).
    a_u8 = np.zeros((Bp, seq_a.shape[1]), np.uint8)
    a_u8[:B] = seq_a
    b_u8 = np.zeros((Bp, seq_b.shape[1]), np.uint8)
    b_u8[:B] = seq_b
    la_p = np.zeros(Bp, np.int32)
    la_p[:B] = la
    lb_p = np.full(Bp, -1, np.int32)  # pad rows: b never matches
    lb_p[:B] = lb
    ops, counts = _tapes_fused(
        jnp.asarray(a_u8), jnp.asarray(b_u8), jnp.asarray(la_p),
        jnp.asarray(lb_p), band_k=band_k, max_len=M, max_steps=max_steps,
        block_b=block_b, interpret=interpret,
    )
    return np.asarray(ops)[:B], np.asarray(counts)[:B]


@functools.partial(
    jax.jit,
    static_argnames=("band_k", "max_len", "max_steps", "block_b", "interpret"),
)
def _tapes_fused(a_u8, b_u8, la, lb, *, band_k: int, max_len: int,
                 max_steps: int, block_b: int, interpret: bool):
    """One device program: pad/convert the uint8 sequences, run the Pallas
    choices DP, walk the paths. Only (B, steps) run tapes come back."""
    from .pallas_banded import _banded_choices_call, band_layout

    Bp = a_u8.shape[0]
    lead, band_w, win_w, Wa = band_layout(band_k, max_len)
    a_p = jnp.zeros((Bp, Wa), jnp.int32).at[
        :, : a_u8.shape[1]
    ].set(a_u8.astype(jnp.int32))
    # mask beyond la with a negative sentinel distinct from b's so pad
    # rows/columns can never fake a diagonal match
    col = jnp.arange(Wa, dtype=jnp.int32)[None, :]
    a_p = jnp.where(col < la[:, None], a_p, -3)
    b_buf = jnp.full((Bp, lead + Wa + win_w), -1, jnp.int32)
    b_buf = b_buf.at[:, lead : lead + b_u8.shape[1]].set(
        b_u8.astype(jnp.int32)
    )
    bcol = jnp.arange(lead + Wa + win_w, dtype=jnp.int32)[None, :] - lead
    b_buf = jnp.where(
        (bcol >= 0) & (bcol < lb[:, None]) , b_buf, -1
    )
    codes = _banded_choices_call(
        a_p, b_buf, max_len=max_len, band_k=band_k,
        interpret=interpret, block_b=block_b,
    )
    return _tb_walk(
        codes, jnp.maximum(la, 0), jnp.maximum(lb, 0),
        band_k=band_k, max_len=max_len, max_steps=max_steps,
    )


def _runs_to_cigar(ops: np.ndarray, counts: np.ndarray) -> str:
    """One reverse-order (op, count) run tape -> forward CIGAR string."""
    live = ops != OP_END
    o = ops[live][::-1]
    n = counts[live][::-1]
    if len(o) == 0:
        return ""
    starts = np.concatenate([[0], np.flatnonzero(o[1:] != o[:-1]) + 1])
    sums = np.add.reduceat(n, starts)
    return "".join(
        f"{s}{OP_CHARS[op]}"
        for s, op in zip(sums.tolist(), o[starts].tolist())
    )


def _cigar_pass(seq_a, la, seq_b, lb, indices, band_k, distances,
                chunk_pairs, out):
    """One banded pass over `indices` at band_k; fills out[] for pairs
    proven exact and returns the indices that overflowed the band (or
    truncated their tapes)."""
    failed: List[int] = []
    # The choices tensor is (M_pad, chunk, band_w) uint8: cap the chunk so
    # wide bands stay within a ~3 GB HBM budget (k = 511 at 3 kb would
    # need 25 GB at the default 8192-pair chunk).
    M = int(max(la[indices].max(initial=0), lb[indices].max(initial=0), 1))
    from .pallas_banded import band_layout

    _lead, band_w, _w, _Wa = band_layout(band_k, M)
    M_pad = ((M + 127) // 128) * 128
    chunk_pairs = min(
        chunk_pairs, max(512, int(3e9 // max(M_pad * band_w, 1)) // 512 * 512)
    )
    for lo in range(0, len(indices), chunk_pairs):
        sel = indices[lo : lo + chunk_pairs]
        ops, counts = banded_traceback_ops(
            seq_a[sel], la[sel], seq_b[sel], lb[sel], band_k=band_k
        )
        # edit cost recovered from the tape; must match the banded band
        # exactness condition AND the tape must be complete (a truncated
        # scan consumes fewer than la/lb bases)
        edit = (ops == OP_X) | (ops == OP_D) | (ops == OP_I)
        costs = np.sum(counts * edit, axis=1)
        ref_used = np.sum(
            counts * ((ops == OP_M) | (ops == OP_X) | (ops == OP_D)), axis=1
        )
        mut_used = np.sum(
            counts * ((ops == OP_M) | (ops == OP_X) | (ops == OP_I)), axis=1
        )
        for p, idx in enumerate(sel):
            exact = (
                costs[p] <= band_k
                and abs(int(la[idx]) - int(lb[idx])) <= band_k
                and ref_used[p] == la[idx]
                and mut_used[p] == lb[idx]
                and (distances is None or costs[p] == distances[idx])
            )
            if exact:
                out[idx] = _runs_to_cigar(ops[p], counts[p])
            else:
                failed.append(idx)
    return failed


def batched_cigar(
    seq_a: np.ndarray, len_a: np.ndarray,
    seq_b: np.ndarray, len_b: np.ndarray,
    band_k: int = 127,
    distances: Optional[np.ndarray] = None,
    chunk_pairs: int = 8192,
    max_band: int = 511,
) -> List[str]:
    """CIGAR strings for a batch of (reference, mutant) pairs via the
    banded device traceback. Pairs whose distance overflows the band
    retry with a DOUBLED band (edlib's k -> 2k+1 schedule, contrib/edlib/
    edlib.cpp:161-185; multi-tile bands reach max_band=511) before the
    ~100 ms/pair host DP; reroutes are counted and logged so the perf
    cliff is never silent."""
    from ..utils.logging import log

    la = np.asarray(len_a, dtype=np.int32)
    lb = np.asarray(len_b, dtype=np.int32)
    B = len(la)
    out: List[str] = [""] * B
    if distances is not None:
        distances = np.asarray(distances)
        # Known distances: route every pair straight to the smallest band
        # that provably holds it (no doubling retries — a distance-300
        # batch would otherwise burn full passes at 127 and 255 first).
        bound = np.maximum(distances, np.abs(la - lb))
        bands = [band_k] + [
            b for b in (127, 255, 511) if band_k < b <= max_band
        ]
        pending = np.nonzero(bound > bands[-1])[0].tolist()
        lo_bound = -1
        for k in bands:
            group = np.nonzero((bound > lo_bound) & (bound <= k))[0]
            lo_bound = k
            if len(group):
                pending += _cigar_pass(
                    seq_a, la, seq_b, lb, group, k, distances,
                    chunk_pairs, out,
                )
    else:
        pending = list(range(B))
        k = band_k
        while pending:
            pending = _cigar_pass(
                seq_a, la, seq_b, lb, np.asarray(pending, np.int64), k,
                distances, chunk_pairs, out,
            )
            if not pending or k >= max_band:
                break
            k = min(2 * k + 1, max_band)
    if pending:
        from ..analysis.legacy import compare_sequences, edit_items_to_cigar
        from ..sequence.sequence import DNA5SequenceLinear

        log.info(
            "batched_cigar: %d/%d pairs overflowed band %d; host DP fallback",
            len(pending), B, max_band,
        )
        for p in pending:
            items = compare_sequences(
                DNA5SequenceLinear(np.asarray(seq_a[p][: la[p]], np.uint8)),
                DNA5SequenceLinear(np.asarray(seq_b[p][: lb[p]], np.uint8)),
            )
            out[p] = edit_items_to_cigar(items, int(la[p]))
    return out
