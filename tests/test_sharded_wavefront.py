"""Sharded long-pair wavefront vs the NumPy oracle on the 8-device CPU mesh.

SURVEY.md §5 long-sequence story: one very long pair's anti-diagonal DP
sharded across devices with chunked ppermute halo exchange, exact at every
size (the multi-device replacement for edlib's single-core banded Myers,
contrib/edlib/edlib.cpp:161-185, at chromosome scale)."""

import jax
import numpy as np
from jax.sharding import Mesh

from kgl_gene_tpu.ops.edit_distance import levenshtein_numpy
from kgl_gene_tpu.ops.sharded_wavefront import sharded_levenshtein


def _mesh():
    return Mesh(np.array(jax.devices()), ("wave",))


def _pad(rows, width):
    out = np.zeros((len(rows), width), dtype=np.int32)
    lens = np.zeros(len(rows), dtype=np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
        lens[i] = len(r)
    return out, lens


def test_small_pairs_match_oracle():
    rng = np.random.default_rng(0)
    a_rows = [rng.integers(0, 4, n) for n in (257, 100, 31, 256)]
    b_rows = [rng.integers(0, 4, n) for n in (190, 211, 257, 256)]
    seq_a, len_a = _pad(a_rows, 257)
    seq_b, len_b = _pad(b_rows, 257)
    got = sharded_levenshtein(seq_a, len_a, seq_b, len_b, mesh=_mesh(), halo=32)
    want = [levenshtein_numpy(a, b) for a, b in zip(a_rows, b_rows)]
    assert got.tolist() == want


def test_degenerate_lengths():
    seq_a = np.zeros((3, 8), dtype=np.int32)
    seq_b = np.zeros((3, 8), dtype=np.int32)
    seq_b[1, :5] = [1, 2, 3, 0, 1]
    len_a = np.array([0, 0, 1], dtype=np.int32)
    len_b = np.array([0, 5, 0], dtype=np.int32)
    got = sharded_levenshtein(seq_a, len_a, seq_b, len_b, mesh=_mesh(), halo=16)
    assert got.tolist() == [0, 5, 1]


def test_related_mutant_pair():
    """A realistic long pair: 4,000 bases with SNPs + indels."""
    rng = np.random.default_rng(1)
    a = rng.integers(0, 4, 4000)
    b = a.copy()
    idx = rng.choice(4000, 25, replace=False)
    b[idx] = (b[idx] + 1 + rng.integers(0, 3, 25)) % 4
    b = np.delete(b, rng.choice(len(b), 7, replace=False))
    b = np.insert(b, rng.choice(len(b), 5, replace=False), rng.integers(0, 4, 5))
    seq_a, len_a = _pad([a], 4000)
    seq_b, len_b = _pad([b], 4000)
    got = sharded_levenshtein(seq_a, len_a, seq_b, len_b, mesh=_mesh())
    assert got[0] == levenshtein_numpy(a, b)


def test_32k_pair_matches_oracle():
    """The VERDICT #10 acceptance: >= 32k-base pair, exact on the mesh."""
    rng = np.random.default_rng(2)
    n = 32_768
    a = rng.integers(0, 4, n)
    b = a.copy()
    idx = rng.choice(n, 300, replace=False)
    b[idx] = (b[idx] + 1 + rng.integers(0, 3, 300)) % 4
    b = np.delete(b, rng.choice(len(b), 40, replace=False))
    seq_a, len_a = _pad([a], n)
    seq_b, len_b = _pad([b], n)
    got = sharded_levenshtein(seq_a, len_a, seq_b, len_b, mesh=_mesh())
    want = levenshtein_numpy(a, b)
    assert got[0] == want
    assert want >= 300  # the edit set really is that large
