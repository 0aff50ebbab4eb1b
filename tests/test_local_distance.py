"""Local (infix / edlib HW-mode) Levenshtein metric family
(kgl_classification/kgl_sequence_distance_impl.h:49-122)."""

import numpy as np
import pytest

from kgl_gene_tpu.ops.edit_distance import (
    _hw_distance_numpy,
    batched_levenshtein_local,
    levenshtein_local_numpy,
    levenshtein_numpy,
)


def _scalar_hw_oracle(query, target):
    """Textbook O(mn) scalar infix DP (independent of the vector oracle)."""
    m, n = len(query), len(target)
    prev = [0] * (n + 1)
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cost = 0 if query[i - 1] == target[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return min(prev)


class TestLocalOracle:
    def test_exact_substring_is_zero(self):
        t = np.array([0, 1, 2, 3, 0, 1, 2], np.uint8)
        q = t[2:5]
        assert levenshtein_local_numpy(q, t) == 0

    def test_symmetric(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 4, 30).astype(np.uint8)
        b = rng.integers(0, 4, 80).astype(np.uint8)
        assert levenshtein_local_numpy(a, b) == levenshtein_local_numpy(b, a)

    @pytest.mark.parametrize("seed", range(6))
    def test_matches_scalar_dp(self, seed):
        rng = np.random.default_rng(seed)
        q = rng.integers(0, 4, int(rng.integers(1, 25))).astype(np.uint8)
        t = rng.integers(0, 4, int(rng.integers(1, 60))).astype(np.uint8)
        if len(q) > len(t):
            q, t = t, q
        assert _hw_distance_numpy(q, t) == _scalar_hw_oracle(list(q), list(t))

    def test_local_leq_global(self):
        rng = np.random.default_rng(3)
        a = rng.integers(0, 4, 40).astype(np.uint8)
        b = rng.integers(0, 4, 90).astype(np.uint8)
        assert levenshtein_local_numpy(a, b) <= levenshtein_numpy(a, b)

    def test_empty_query(self):
        assert levenshtein_local_numpy(np.empty(0, np.uint8),
                                       np.array([1, 2], np.uint8)) == 0


class TestBatchedLocal:
    @pytest.mark.parametrize("seed", [0, 7])
    def test_matches_oracle(self, seed):
        rng = np.random.default_rng(seed)
        B = 24
        A = np.zeros((B, 40), np.uint8)
        T = np.zeros((B, 70), np.uint8)
        la = np.zeros(B, np.int32)
        lb = np.zeros(B, np.int32)
        for i in range(B):
            la[i] = int(rng.integers(0, 41))
            lb[i] = int(rng.integers(1, 71))
            A[i, : la[i]] = rng.integers(0, 4, la[i])
            T[i, : lb[i]] = rng.integers(0, 4, lb[i])
        got = batched_levenshtein_local(A, la, T, lb)
        for i in range(B):
            expect = levenshtein_local_numpy(A[i, : la[i]], T[i, : lb[i]])
            assert got[i] == expect, i

    def test_longer_query_swaps(self):
        """Pairs where a is longer than b: symmetrization inside."""
        a = np.array([[0, 1, 2, 3, 0, 1]], np.uint8)
        b = np.array([[1, 2, 3, 0, 0, 0]], np.uint8)
        got = batched_levenshtein_local(a, np.array([6], np.int32),
                                        b, np.array([4], np.int32))
        assert got[0] == levenshtein_local_numpy(a[0], b[0, :4])


class TestTypedMetrics:
    def test_family_surface(self):
        from kgl_gene_tpu.classify.distance import (
            batched_metric,
            global_blosum80_amino,
            levenshtein_global_coding,
            levenshtein_local_amino,
            levenshtein_local_coding,
        )
        from kgl_gene_tpu.sequence.sequence import DNA5SequenceCoding, StrandSense

        rng = np.random.default_rng(1)
        s1 = DNA5SequenceCoding(rng.integers(0, 4, 30).astype(np.uint8),
                                StrandSense.FORWARD)
        s2 = DNA5SequenceCoding(rng.integers(0, 4, 60).astype(np.uint8),
                                StrandSense.FORWARD)
        d_local = levenshtein_local_coding(s1, s2)
        d_global = levenshtein_global_coding(s1, s2)
        assert 0 <= d_local <= d_global
        assert global_blosum80_amino(s1, s2) == 0.0
        batch = batched_metric(levenshtein_local_coding, [s1], [s2])
        assert batch[0] == d_local
        batch_amino = batched_metric(levenshtein_local_amino, [s1, s2], [s2, s1])
        assert batch_amino[0] == batch_amino[1] == d_local
