"""Edit distance kernel + UPGMA classification tests.

The JAX anti-diagonal kernel is validated against a brute-force
recursive/DP oracle and random fuzzing (edlib NW-distance parity class)."""

import numpy as np
import pytest

from kgl_gene_tpu.classify.upgma import DistanceMatrix, newick, upgma_tree
from kgl_gene_tpu.ops.edit_distance import (
    batched_levenshtein,
    levenshtein_numpy,
    pairwise_distance_matrix,
)
from kgl_gene_tpu.sequence.alphabet import DNA5


def _py_levenshtein(a: str, b: str) -> int:
    """Classic quadratic DP in plain Python as the independent oracle."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
        prev = cur
    return prev[n]


def _pad(strings, width=None):
    width = width or max(len(s) for s in strings)
    out = np.zeros((len(strings), width), dtype=np.uint8)
    lens = np.zeros(len(strings), dtype=np.int32)
    for i, s in enumerate(strings):
        codes = DNA5.from_string(s)
        out[i, : len(codes)] = codes
        lens[i] = len(codes)
    return out, lens


class TestNumpyOracle:
    @pytest.mark.parametrize(
        "a,b,expected",
        [
            ("", "", 0),
            ("A", "", 1),
            ("", "ACGT", 4),
            ("ACGT", "ACGT", 0),
            ("ACGT", "AGGT", 1),
            ("ACGT", "AGT", 1),
            ("ACGT", "ACGTT", 1),
            ("AAAA", "TTTT", 4),
            ("GATTACA", "GCATGCT", 4),  # lit. example wait-verified below
        ],
    )
    def test_known_values(self, a, b, expected):
        got = levenshtein_numpy(DNA5.from_string(a) if a else np.empty(0, np.uint8),
                                DNA5.from_string(b) if b else np.empty(0, np.uint8))
        assert got == _py_levenshtein(a, b)
        if (a, b) != ("GATTACA", "GCATGCT"):
            assert got == expected

    def test_fuzz_vs_python(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            la, lb = rng.integers(0, 30, size=2)
            a = "".join(rng.choice(list("ACGT"), la))
            b = "".join(rng.choice(list("ACGT"), lb))
            ca = DNA5.from_string(a) if a else np.empty(0, np.uint8)
            cb = DNA5.from_string(b) if b else np.empty(0, np.uint8)
            assert levenshtein_numpy(ca, cb) == _py_levenshtein(a, b)


class TestBatchedJAX:
    def test_batch_matches_oracle(self):
        strings_a = ["ACGT", "AAAA", "GATTACA", "A", "ACGTACGTAC"]
        strings_b = ["AGGT", "TTTT", "GCATGCT", "ACGT", "ACG"]
        sa, la = _pad(strings_a, 12)
        sb, lb = _pad(strings_b, 12)
        got = np.asarray(batched_levenshtein(sa, la, sb, lb))
        want = [_py_levenshtein(a, b) for a, b in zip(strings_a, strings_b)]
        np.testing.assert_array_equal(got, want)

    def test_empty_and_degenerate(self):
        sa, la = _pad(["", "A", ""], 4)
        sb, lb = _pad(["", "", "AC"], 4)
        got = np.asarray(batched_levenshtein(sa, la, sb, lb))
        np.testing.assert_array_equal(got, [0, 1, 2])

    def test_fuzz_batch(self):
        rng = np.random.default_rng(1)
        strings_a, strings_b = [], []
        for _ in range(64):
            la, lb = rng.integers(0, 24, size=2)
            strings_a.append("".join(rng.choice(list("ACGT"), la)))
            strings_b.append("".join(rng.choice(list("ACGT"), lb)))
        sa, la = _pad(strings_a, 24)
        sb, lb = _pad(strings_b, 24)
        got = np.asarray(batched_levenshtein(sa, la, sb, lb))
        want = [_py_levenshtein(a, b) for a, b in zip(strings_a, strings_b)]
        np.testing.assert_array_equal(got, want)

    def test_asymmetric_padding(self):
        sa, la = _pad(["ACGTACGT"], 16)
        sb, lb = _pad(["ACG"], 5)
        assert int(batched_levenshtein(sa, la, sb, lb)[0]) == 5


class TestPairwiseMatrix:
    def test_matrix_symmetric_exact(self):
        strings = ["ACGT", "AGGT", "ACGG", "TTTT"]
        seqs, lens = _pad(strings)
        m = pairwise_distance_matrix(seqs, lens, batch_pairs=3)
        assert m.shape == (4, 4)
        np.testing.assert_array_equal(m, m.T)
        assert np.all(np.diag(m) == 0)
        for i in range(4):
            for j in range(4):
                assert m[i, j] == _py_levenshtein(strings[i], strings[j])


class TestUPGMA:
    def test_textbook_example(self):
        # Classic 4-taxon example with known merge order.
        names = ["a", "b", "c", "d"]
        m = np.array(
            [
                [0, 2, 6, 6],
                [2, 0, 6, 6],
                [6, 6, 0, 4],
                [6, 6, 4, 0],
            ],
            dtype=float,
        )
        root = upgma_tree(m, names)
        assert root.leaf_count == 4
        assert sorted(l.name for l in root.leaves()) == names
        # (a,b) merge first at height 1; (c,d) at height 2; root at height 3.
        text = newick(root)
        assert text.endswith(";")
        assert "(b:1,a:1)" in text  # row node first, as in the reference
        assert "(d:2,c:2)" in text
        assert root.height == 3.0

    def test_distance_matrix_helpers(self):
        dm = DistanceMatrix(3)
        dm.set_distance(1, 0, 5.0)
        dm.set_distance(2, 0, 3.0)
        dm.set_distance(2, 1, 4.0)
        assert dm.minimum() == (3.0, 2, 0)
        assert dm.maximum() == (5.0, 1, 0)
        dm.normalize_distance()
        assert dm.get_distance(1, 0) == 1.0

    def test_single_leaf(self):
        root = upgma_tree(np.zeros((1, 1)), ["only"])
        assert root.is_leaf() and root.name == "only"

    def test_newick_depth_cap(self):
        m = np.array([[0, 1, 4], [1, 0, 4], [4, 4, 0]], dtype=float)
        root = upgma_tree(m, ["x", "y", "z"])
        text = newick(root, max_depth=1)
        assert text.startswith("Clade_Depth_1_Leaves_3")
