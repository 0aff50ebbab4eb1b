"""Banded Myers bit-vector kernel parity tests (interpreter mode on CPU).

The kernel is the TPU counterpart of edlib's banded Myers NW distance
(contrib/edlib/edlib.cpp:13,161-316); the oracle is the row-DP
levenshtein_numpy. Exactness contract: result >= true, equal iff
result <= band_k and |la - lb| <= band_k.
"""

import numpy as np
import pytest

from kgl_gene_tpu.ops.edit_distance import levenshtein_numpy
from kgl_gene_tpu.ops.pallas_myers import (
    MYERS_BANDS,
    adaptive_myers_levenshtein,
    myers_band_for,
    myers_banded_levenshtein,
    myers_pairs_device,
)


def _mutated_pairs(rng, B, M, edits):
    base = rng.integers(0, 5, M).astype(np.int32)
    sa = np.tile(base, (B, 1))
    sb = sa.copy()
    for i in range(B):
        n = min(edits + i, M)
        pos = rng.choice(M, n, replace=False)
        sb[i, pos] = (sb[i, pos] + 1 + rng.integers(0, 4, n)) % 5
    return sa, sb


def _indel_mutate(rng, base, n_ops):
    s = list(base)
    for _ in range(n_ops):
        op = rng.integers(0, 3)
        pos = int(rng.integers(0, max(len(s), 1)))
        if op == 0 and s:
            s[pos % len(s)] = int((s[pos % len(s)] + 1 + rng.integers(0, 4)) % 5)
        elif op == 1 and s:
            del s[pos % len(s)]
        else:
            s.insert(pos, int(rng.integers(0, 5)))
    return np.array(s, np.int32)


class TestMyersBanded:
    def test_single_window_exact(self):
        rng = np.random.default_rng(0)
        B, M = 6, 150  # M_pad = 160 = 5 blocks <= NB: window never slides
        sa, sb = _mutated_pairs(rng, B, M, 4)
        la = np.full(B, M, np.int32)
        got = myers_banded_levenshtein(sa, la, sb, la, band_k=63, interpret=True)
        want = [levenshtein_numpy(sa[i], sb[i]) for i in range(B)]
        np.testing.assert_array_equal(got, want)

    def test_sliding_window_exact(self):
        rng = np.random.default_rng(1)
        B, M = 6, 640  # 20 blocks > NB = 5: the window slides 15 times
        sa, sb = _mutated_pairs(rng, B, M, 4)
        la = np.full(B, M, np.int32)
        got = myers_banded_levenshtein(sa, la, sb, la, band_k=63, interpret=True)
        want = [levenshtein_numpy(sa[i], sb[i]) for i in range(B)]
        np.testing.assert_array_equal(got, want)

    def test_variable_lengths(self):
        rng = np.random.default_rng(2)
        B, M = 6, 320
        sa, sb0 = _mutated_pairs(rng, B, M, 3)
        sb = np.zeros((B, M + 16), np.int32)
        sb[:, :M] = sb0
        la = np.full(B, M, np.int32)
        lb = la + rng.integers(-16, 17, B).astype(np.int32)
        got = myers_banded_levenshtein(sa, la, sb, lb, band_k=31, interpret=True)
        want = [levenshtein_numpy(sa[i, : la[i]], sb[i, : lb[i]]) for i in range(B)]
        np.testing.assert_array_equal(got, want)

    def test_empty_sequences(self):
        sa = np.zeros((2, 8), np.int32)
        la = np.array([0, 4], np.int32)
        lb = np.array([3, 0], np.int32)
        got = myers_banded_levenshtein(sa, la, sa, lb, band_k=63, interpret=True)
        np.testing.assert_array_equal(got, [3, 4])

    def test_overflow_is_overestimate(self):
        rng = np.random.default_rng(3)
        B, M = 4, 300
        sa, sb = _mutated_pairs(rng, B, M, 60)  # distances >> 31
        la = np.full(B, M, np.int32)
        got = myers_banded_levenshtein(sa, la, sb, la, band_k=31, interpret=True)
        want = np.array([levenshtein_numpy(sa[i], sb[i]) for i in range(B)])
        assert np.all(got >= want)

    def test_length_gap_beyond_band(self):
        # |la - lb| > k must return an overestimate that exceeds the band.
        sa = np.zeros((1, 200), np.int32)
        got = myers_banded_levenshtein(
            sa, np.array([200], np.int32), sa, np.array([40], np.int32),
            band_k=31, interpret=True,
        )
        assert got[0] > 31 and got[0] >= 160

    def test_indel_fuzz_all_bands(self):
        rng = np.random.default_rng(42)
        for M, k in [(90, 31), (640, 63), (1030, 127)]:
            B = 8
            W = M + 40
            sa = np.zeros((B, W), np.int32)
            sb = np.zeros((B, W), np.int32)
            la = np.zeros(B, np.int32)
            lb = np.zeros(B, np.int32)
            for i in range(B):
                base = rng.integers(0, 5, M).astype(np.int32)
                mut = _indel_mutate(rng, base, int(rng.integers(0, k)))[:W]
                sa[i, :M] = base
                la[i] = M
                lb[i] = len(mut)
                sb[i, : len(mut)] = mut
            got = myers_banded_levenshtein(sa, la, sb, lb, band_k=k,
                                           interpret=True)
            want = np.array(
                [levenshtein_numpy(sa[i, : la[i]], sb[i, : lb[i]])
                 for i in range(B)]
            )
            exact = (want <= k) & (np.abs(la - lb) <= k)
            np.testing.assert_array_equal(got[exact], want[exact])
            assert np.all(got >= want)

    def test_band_alignment_required(self):
        with pytest.raises(ValueError):
            myers_banded_levenshtein(
                np.zeros((1, 8), np.int32), np.array([4]),
                np.zeros((1, 8), np.int32), np.array([4]),
                band_k=64, interpret=True,
            )

    def test_band_for(self):
        assert myers_band_for(10) == 31
        assert myers_band_for(63) == 63
        assert myers_band_for(64) == 127
        assert myers_band_for(600) is None
        assert MYERS_BANDS[-1] == 511


def test_adaptive_escalates_out_of_band():
    rng = np.random.default_rng(5)
    B, M = 6, 150
    sa, sb = _mutated_pairs(rng, B, M, 4)
    sb[0] = rng.integers(0, 5, M)  # far pair: distance >> the start band
    la = np.full(B, M, np.int32)
    got = adaptive_myers_levenshtein(sa, la, sb, la, start_k=31,
                                     interpret=True)
    want = [levenshtein_numpy(sa[i], sb[i]) for i in range(B)]
    np.testing.assert_array_equal(got, want)


def test_myers_pairs_device_matches_oracle():
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    base = rng.integers(0, 4, 640).astype(np.int32)
    n = 5
    seqs = np.tile(base, (n, 1))
    for i in range(1, n):
        idx = rng.choice(640, 9, replace=False)
        seqs[i, idx] = (seqs[i, idx] + 1 + rng.integers(0, 3, 9)) % 4
    lens = np.full(n, 640, np.int32)
    iu, ju = np.triu_indices(n, k=1)
    d = myers_pairs_device(
        jnp.asarray(seqs), jnp.asarray(lens), iu, ju, band_k=63,
        interpret=True,
    )
    want = [levenshtein_numpy(seqs[i], seqs[j]) for i, j in zip(iu, ju)]
    np.testing.assert_array_equal(d, want)


def test_shared_text_matches_per_pair():
    """shared_b=True (one text, SMEM per-column chars) must equal the
    per-pair path — the mutant-vs-reference pipeline route."""
    import jax.numpy as jnp

    from kgl_gene_tpu.ops.pallas_myers import myers_distance_padded

    rng = np.random.default_rng(9)
    M, B = 400, 6
    ref = rng.integers(0, 5, M).astype(np.int32)
    sa = np.tile(ref, (B, 1))
    la = np.full(B, M, np.int32)
    for i in range(B):
        pos = rng.choice(M, 3 + i, replace=False)
        sa[i, pos] = (sa[i, pos] + 1 + rng.integers(0, 4, len(pos))) % 5
    la[3] = M - 10  # one shorter mutant exercises per-pair la with shared lb
    lb = np.full(B, M, np.int32)
    got = np.asarray(myers_distance_padded(
        jnp.asarray(sa), jnp.asarray(la), jnp.asarray(ref[None, :]),
        jnp.asarray(lb), max_len=M, band_k=31, interpret=True, shared_b=True,
    ))
    want = np.array([levenshtein_numpy(sa[i, : la[i]], ref) for i in range(B)])
    np.testing.assert_array_equal(got, want)


def test_wide_band_255_sliding_exact():
    """k = 255 (NB = 17 window blocks) with a sliding window: exactness
    holds for distances up to the band across indel-heavy pairs."""
    rng = np.random.default_rng(21)
    M = 700  # 22 blocks > NB = 17: the window slides
    B = 4
    W = M + 120
    sa = np.zeros((B, W), np.int32)
    sb = np.zeros((B, W), np.int32)
    la = np.zeros(B, np.int32)
    lb = np.zeros(B, np.int32)
    for i in range(B):
        base = rng.integers(0, 5, M).astype(np.int32)
        mut = _indel_mutate(rng, base, 120 + 20 * i)[:W]
        sa[i, :M] = base
        la[i] = M
        lb[i] = len(mut)
        sb[i, : len(mut)] = mut
    got = myers_banded_levenshtein(sa, la, sb, lb, band_k=255, interpret=True)
    want = np.array([levenshtein_numpy(sa[i, : la[i]], sb[i, : lb[i]])
                     for i in range(B)])
    exact = (want <= 255) & (np.abs(la - lb) <= 255)
    np.testing.assert_array_equal(got[exact], want[exact])
    assert np.all(got >= want)
