"""Banded Pallas kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import pytest

from kgl_gene_tpu.ops.edit_distance import levenshtein_numpy
from kgl_gene_tpu.ops.pallas_banded import (
    adaptive_banded_levenshtein,
    banded_levenshtein,
)


def _mutated_pairs(rng, B, M, edits):
    base = rng.integers(0, 4, M).astype(np.int32)
    sa = np.tile(base, (B, 1))
    sb = sa.copy()
    for i in range(B):
        pos = rng.choice(M, edits + i, replace=False)
        sb[i, pos] = (sb[i, pos] + 1 + rng.integers(0, 3, len(pos))) % 4
    return sa, sb


class TestBandedLevenshtein:
    def test_in_band_exact(self):
        rng = np.random.default_rng(0)
        B, M = 6, 150
        sa, sb = _mutated_pairs(rng, B, M, 4)
        la = np.full(B, M, dtype=np.int32)
        got = banded_levenshtein(sa, la, sb, la, band_k=63)
        want = [levenshtein_numpy(sa[i], sb[i]) for i in range(B)]
        np.testing.assert_array_equal(got, want)

    def test_variable_lengths(self):
        rng = np.random.default_rng(1)
        B, M = 6, 120
        sa, sb0 = _mutated_pairs(rng, B, M, 3)
        sb = np.zeros((B, M + 8), dtype=np.int32)
        sb[:, :M] = sb0
        la = np.full(B, M, dtype=np.int32)
        lb = la + rng.integers(-8, 9, B).astype(np.int32)
        got = banded_levenshtein(sa, la, sb, lb, band_k=63)
        want = [levenshtein_numpy(sa[i, : la[i]], sb[i, : lb[i]]) for i in range(B)]
        np.testing.assert_array_equal(got, want)

    def test_adaptive_escalates_out_of_band(self):
        rng = np.random.default_rng(2)
        B, M = 6, 150
        sa, sb = _mutated_pairs(rng, B, M, 4)
        sb[0] = rng.integers(0, 4, M)  # far pair: distance >> band
        la = np.full(B, M, dtype=np.int32)
        got = adaptive_banded_levenshtein(sa, la, sb, la, start_k=15)
        want = [levenshtein_numpy(sa[i], sb[i]) for i in range(B)]
        np.testing.assert_array_equal(got, want)

    def test_empty_sequences(self):
        sa = np.zeros((2, 8), dtype=np.int32)
        la = np.array([0, 4], dtype=np.int32)
        lb = np.array([3, 0], dtype=np.int32)
        got = banded_levenshtein(sa, la, sa, lb, band_k=63)
        np.testing.assert_array_equal(got, [3, 4])


def test_banded_pairs_device_matches_oracle():
    """Device-resident pair-gather driver equals the oracle (interpret)."""
    import jax.numpy as jnp

    from kgl_gene_tpu.ops.edit_distance import levenshtein_numpy
    from kgl_gene_tpu.ops.pallas_banded import banded_pairs_device

    rng = np.random.default_rng(11)
    base = rng.integers(0, 4, 640).astype(np.int32)
    n = 5
    seqs = np.tile(base, (n, 1))
    for i in range(1, n):
        idx = rng.choice(640, 9, replace=False)
        seqs[i, idx] = (seqs[i, idx] + 1 + rng.integers(0, 3, 9)) % 4
    lens = np.full(n, 640, np.int32)
    iu, ju = np.triu_indices(n, k=1)
    d = banded_pairs_device(
        jnp.asarray(seqs), jnp.asarray(lens), iu, ju, band_k=63, interpret=True
    )
    want = [levenshtein_numpy(seqs[i], seqs[j]) for i, j in zip(iu, ju)]
    assert d.tolist() == want
    # uniform_cap specialisation (la == lb == pool width) must agree.
    d2 = banded_pairs_device(
        jnp.asarray(seqs), jnp.asarray(lens), iu, ju, band_k=63,
        interpret=True, uniform_cap=True,
    )
    assert d2.tolist() == want


class TestMultiTileBand:
    """Multi-tile bands (k = 255 / 511): exactness past the single-tile
    127 cliff — the divergent Pf var-gene-family regime (edlib band
    doubling, contrib/edlib/edlib.cpp:161-185)."""

    @pytest.mark.parametrize("band_k", [255, 511])
    def test_exact_divergent_pairs(self, band_k):
        from kgl_gene_tpu.ops.edit_distance import levenshtein_numpy
        from kgl_gene_tpu.ops.pallas_banded import banded_levenshtein

        rng = np.random.default_rng(band_k)
        B, S = 4, 900
        base = rng.integers(0, 4, S).astype(np.int32)
        seq_a = np.tile(base, (B, 1))
        seq_b = np.tile(base, (B, 1))
        # salt ~band_k/2 edits into b so distances land inside the band
        for i in range(B):
            for p in rng.choice(S, size=band_k // 2 - 10, replace=False):
                seq_b[i, p] = (seq_b[i, p] + 1 + rng.integers(0, 3)) % 4
        la = np.full(B, S, np.int32)
        got = banded_levenshtein(seq_a, la, seq_b, la, band_k=band_k)
        for i in range(B):
            expect = levenshtein_numpy(seq_a[i], seq_b[i])
            assert expect <= band_k  # exactness condition holds
            assert got[i] == expect, i

    def test_adaptive_reaches_multi_tile(self):
        """Band doubling escalates 63 -> 127 -> 255 before the full
        kernel; a ~200-edit pair must resolve exactly inside the band."""
        from kgl_gene_tpu.ops.edit_distance import levenshtein_numpy
        from kgl_gene_tpu.ops.pallas_banded import adaptive_banded_levenshtein

        rng = np.random.default_rng(1)
        S = 700
        a = rng.integers(0, 4, S).astype(np.int32)
        b = a.copy()
        for p in rng.choice(S, size=200, replace=False):
            b[p] = (b[p] + 1 + rng.integers(0, 3)) % 4
        got = adaptive_banded_levenshtein(
            a[None, :], np.array([S], np.int32), b[None, :],
            np.array([S], np.int32), start_k=63,
        )
        assert got[0] == levenshtein_numpy(a, b)

    def test_unequal_lengths_multi_tile(self):
        from kgl_gene_tpu.ops.edit_distance import levenshtein_numpy
        from kgl_gene_tpu.ops.pallas_banded import banded_levenshtein

        rng = np.random.default_rng(9)
        a = rng.integers(0, 4, 640).astype(np.int32)
        b = np.concatenate([a[:300], a[460:]])  # 160-base deletion
        got = banded_levenshtein(
            a[None, :], np.array([640], np.int32),
            np.pad(b, (0, 640 - len(b)))[None, :],
            np.array([len(b)], np.int32), band_k=255,
        )
        assert got[0] == levenshtein_numpy(a, b)
