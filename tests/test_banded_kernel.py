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
