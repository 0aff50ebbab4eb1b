"""Pallas wavefront kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import pytest

from kgl_gene_tpu.ops.edit_distance import levenshtein_numpy
from kgl_gene_tpu.ops.pallas_edit_distance import pallas_batched_levenshtein


class TestPallasLevenshtein:
    def test_matches_oracle_random(self):
        rng = np.random.default_rng(42)
        B, M = 12, 40
        sa = rng.integers(0, 4, (B, M)).astype(np.int32)
        sb = rng.integers(0, 4, (B, M)).astype(np.int32)
        la = rng.integers(0, M + 1, B).astype(np.int32)
        lb = rng.integers(0, M + 1, B).astype(np.int32)
        got = pallas_batched_levenshtein(sa, la, sb, lb)
        want = [levenshtein_numpy(sa[i, : la[i]], sb[i, : lb[i]]) for i in range(B)]
        np.testing.assert_array_equal(got, want)

    def test_degenerate_lengths(self):
        sa = np.zeros((3, 8), dtype=np.int32)
        sb = np.zeros((3, 8), dtype=np.int32)
        la = np.array([0, 1, 0], dtype=np.int32)
        lb = np.array([0, 0, 1], dtype=np.int32)
        got = pallas_batched_levenshtein(sa, la, sb, lb)
        np.testing.assert_array_equal(got, [0, 1, 1])

    def test_identical_sequences(self):
        rng = np.random.default_rng(0)
        sa = rng.integers(0, 4, (8, 33)).astype(np.int32)
        la = np.full(8, 33, dtype=np.int32)
        got = pallas_batched_levenshtein(sa, la, sa, la)
        np.testing.assert_array_equal(got, np.zeros(8, dtype=np.int32))

    def test_pipeline_pallas_path_matches_scan(self):
        """The forward step with use_pallas=True (interpret on CPU) equals
        the scan-based path."""
        from kgl_gene_tpu.ops import pallas_edit_distance as ped
        from kgl_gene_tpu.ops.pipeline import make_forward_step

        # Force interpret inside jit for CPU execution.
        orig = ped._pallas_call
        rng = np.random.default_rng(1)
        region = rng.integers(0, 4, size=96).astype(np.uint8)
        exons = np.array([[10, 40], [50, 80]], dtype=np.int64)
        positions = rng.integers(0, 96, size=(8, 4)).astype(np.int32)
        alts = rng.integers(0, 4, size=(8, 4)).astype(np.uint8)
        valid = rng.random((8, 4)) < 0.7

        import functools

        ped_interp = functools.partial(orig, interpret=True)
        try:
            ped._pallas_call = ped_interp
            pallas_step = make_forward_step(region, exons, 0, use_pallas=True)
            pallas_out = pallas_step(positions, alts, valid)
        finally:
            ped._pallas_call = orig
        scan_step = make_forward_step(region, exons, 0, use_pallas=False)
        scan_out = scan_step(positions, alts, valid)
        np.testing.assert_array_equal(
            np.asarray(pallas_out.distance), np.asarray(scan_out.distance)
        )
        np.testing.assert_array_equal(
            np.asarray(pallas_out.amino), np.asarray(scan_out.amino)
        )


class TestFusedBandedForward:
    def test_pipeline_banded_branch_matches_scan(self):
        """With few SNP slots and a long transcript the forward step routes
        the distance through the banded kernel (provably exact: every
        variant is a substitution so Levenshtein <= Hamming <= K). Must
        equal the scan path bit-for-bit."""
        from kgl_gene_tpu.ops.pipeline import make_forward_step

        rng = np.random.default_rng(7)
        region = rng.integers(0, 4, size=1200).astype(np.uint8)
        exons = np.array([[100, 400], [500, 800]], dtype=np.int64)  # S=600
        B, K = 8, 6  # K <= 63 -> band_k = 63 branch
        positions = rng.integers(0, 1200, size=(B, K)).astype(np.int32)
        alts = rng.integers(0, 4, size=(B, K)).astype(np.uint8)
        valid = rng.random((B, K)) < 0.8

        banded_step = make_forward_step(region, exons, 0, use_pallas=True)
        banded_out = banded_step(positions, alts, valid)
        scan_step = make_forward_step(region, exons, 0, use_pallas=False)
        scan_out = scan_step(positions, alts, valid)
        np.testing.assert_array_equal(
            np.asarray(banded_out.distance), np.asarray(scan_out.distance)
        )
        np.testing.assert_array_equal(
            np.asarray(banded_out.amino), np.asarray(scan_out.amino)
        )
        # distances are bounded by the number of applied SNPs
        assert int(np.max(np.asarray(banded_out.distance))) <= K
