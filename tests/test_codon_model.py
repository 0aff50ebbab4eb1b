"""Codon (omega) substitution model tests."""

import math

import numpy as np
import pytest

from kgl_gene_tpu.phylo.codon import (
    CodonSubstitutionModel,
    codon_alignment,
    codon_log_likelihood,
    codon_states,
)
from kgl_gene_tpu.phylo.mcmc import Chain, ChainState
from kgl_gene_tpu.phylo.tree import parse_newick
from kgl_gene_tpu.sequence.alphabet import DNA5


class TestCodonModel:
    def test_states(self):
        sense, amino = codon_states()
        assert len(sense) == 61  # standard code: 64 - 3 stops
        from kgl_gene_tpu.sequence.alphabet import AminoAcid

        assert AminoAcid.STOP not in amino

    def test_q_matrix_properties(self):
        model = CodonSubstitutionModel(kappa=2.0, omega=0.5)
        Q = model.q_matrix()
        np.testing.assert_allclose(Q.sum(axis=1), 0.0, atol=1e-12)
        # only single-base changes have non-zero rates
        bases = [(c // 16, (c // 4) % 4, c % 4) for c in model.sense]
        for i in range(0, 61, 7):
            for j in range(0, 61, 11):
                if i == j:
                    continue
                ndiff = sum(a != b for a, b in zip(bases[i], bases[j]))
                if ndiff > 1:
                    assert Q[i, j] == 0.0

    def test_transition_matrix_stochastic(self):
        model = CodonSubstitutionModel()
        P = model.transition_matrix(0.3)
        np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-9)
        assert P.min() >= 0.0

    def test_omega_increases_nonsyn_rate(self):
        low = CodonSubstitutionModel(omega=0.1)
        high = CodonSubstitutionModel(omega=2.0)
        # Find a nonsynonymous single-step pair and compare relative rates.
        Ql, Qh = low.q_matrix(), high.q_matrix()
        bases = [(c // 16, (c // 4) % 4, c % 4) for c in low.sense]
        found = False
        for i in range(61):
            for j in range(61):
                if i != j and Ql[i, j] > 0 and low.amino[i] != low.amino[j]:
                    # normalised rates: nonsyn/total is higher under high omega
                    assert Qh[i, j] / -Qh[i, i] > Ql[i, j] / -Ql[i, i]
                    found = True
                    break
            if found:
                break
        assert found

    def test_alignment_conversion(self):
        model = CodonSubstitutionModel()
        dna = np.stack([
            DNA5.from_string("ATGGCTTAA"),  # M A [stop]
            DNA5.from_string("ATGGCTANG"),  # M A [N -> ambiguous]
        ])
        states = codon_alignment(dna, model)
        assert states.shape == (2, 3)
        assert states[0, 2] == -1  # stop codon -> ambiguity
        assert states[1, 2] == -1  # N codon -> ambiguity
        assert states[0, 0] == states[1, 0]  # both ATG

    def test_likelihood_identical_sequences(self):
        """Identical sequences at t->0 approach log(pi) per site."""
        model = CodonSubstitutionModel()
        tree = parse_newick("(a:0.0001,b:0.0001);")
        dna = np.stack([DNA5.from_string("ATGGCT"), DNA5.from_string("ATGGCT")])
        states = codon_alignment(dna, model)
        ll = codon_log_likelihood(tree, states, model)
        want = 2 * math.log(1 / 61)  # two sites, uniform codon freqs
        assert abs(ll - want) < 0.01

    def test_codon_chain_smoke(self):
        rng = np.random.default_rng(0)
        model = CodonSubstitutionModel()
        n_cod = 30
        sense, _ = codon_states()
        base_states = rng.integers(0, 61, n_cod)
        mut = base_states.copy()
        mut[:3] = (mut[:3] + 1) % 61
        states = np.stack([base_states, base_states, mut]).astype(np.int32)
        tree = parse_newick("((a:0.1,b:0.1):0.05,c:0.2);")
        chain = Chain(
            states, ChainState(tree, model),
            likelihood_fn=codon_log_likelihood,
            updaters=("branch_length", "omega", "kappa"),
        )
        ll0 = chain.state.log_like
        for _ in range(5):
            chain.next_step()
        assert chain.state.log_like >= ll0 - 1.0  # sane, mostly improving
        assert chain.try_counts["omega"] == 5
