"""Phylogenetics tests: tree IO, substitution models, likelihood (vs
hand-computed JC69 values), MCMC sampler behaviour, NEXUS IO, strom
driver."""

import math
import random
import os

import numpy as np
import pytest

from kgl_gene_tpu.phylo.likelihood import TreeLikelihood, leaf_partials, log_likelihood
from kgl_gene_tpu.phylo.mcmc import ChainState, MCMCSampler
from kgl_gene_tpu.phylo.model import SubstitutionModel, discrete_gamma_rates
from kgl_gene_tpu.phylo.nexus import read_nexus, write_nexus_trees
from kgl_gene_tpu.phylo.strom import Strom, StromConfig
from kgl_gene_tpu.phylo.tree import parse_newick, random_tree
from kgl_gene_tpu.sequence.alphabet import DNA5


class TestTree:
    def test_newick_round_trip(self):
        text = "((a:0.1,b:0.2):0.05,c:0.3);"
        tree = parse_newick(text)
        assert sorted(tree.leaf_names) == ["a", "b", "c"]
        assert abs(tree.tree_length() - 0.65) < 1e-12
        reparsed = parse_newick(tree.newick())
        assert reparsed.splits() == tree.splits()

    def test_traversal_arrays(self):
        tree = parse_newick("((a:0.1,b:0.2):0.05,c:0.3);")
        arrays = tree.traversal_arrays()
        assert arrays["n_nodes"] == 5
        assert arrays["n_internals"] == 2
        # Root is last in postorder numbering.
        assert arrays["root_index"] == 4

    def test_random_tree(self):
        tree = random_tree(["t1", "t2", "t3", "t4", "t5"])
        assert sorted(tree.leaf_names) == ["t1", "t2", "t3", "t4", "t5"]
        assert len(tree.internal_nodes()) == 4  # bifurcating


class TestModel:
    def test_jc_q_matrix(self):
        q = SubstitutionModel.jc69().q_matrix()
        # JC: off-diagonals 1/3, diagonal -1.
        assert abs(q[0, 1] - 1 / 3) < 1e-12
        assert abs(q[0, 0] + 1.0) < 1e-12
        np.testing.assert_allclose(q.sum(axis=1), 0, atol=1e-12)

    def test_jc_transition_probability(self):
        """JC69 closed form: P(same) = 1/4 + 3/4 e^{-4t/3}."""
        model = SubstitutionModel.jc69()
        for t in (0.01, 0.1, 1.0):
            P = model.transition_matrices(np.array([t]))[0, 0]
            same = 0.25 + 0.75 * math.exp(-4.0 * t / 3.0)
            diff = 0.25 - 0.25 * math.exp(-4.0 * t / 3.0)
            assert abs(P[0, 0] - same) < 1e-10
            assert abs(P[0, 1] - diff) < 1e-10
            np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-10)

    def test_hky_rows_sum_one(self):
        model = SubstitutionModel.hky85(4.0, np.array([0.3, 0.2, 0.2, 0.3]))
        P = model.transition_matrices(np.array([0.5]))[0, 0]
        np.testing.assert_allclose(P.sum(axis=1), 1.0, atol=1e-10)
        # Detailed balance: pi_i P_ij == pi_j P_ji.
        pi = model.frequencies
        for i in range(4):
            for j in range(4):
                assert abs(pi[i] * P[i, j] - pi[j] * P[j, i]) < 1e-10

    def test_discrete_gamma(self):
        rates = discrete_gamma_rates(0.5, 4)
        assert len(rates) == 4
        assert abs(rates.mean() - 1.0) < 1e-9
        assert np.all(np.diff(rates) > 0)
        assert discrete_gamma_rates(1.0, 1)[0] == 1.0


class TestLikelihood:
    def test_two_taxon_jc(self):
        """Two taxa, one site: L = sum_x pi_x P(x->a, t1) P(x->b, t2)
        which for JC collapses to 1/4 P(a->b, t1+t2)."""
        tree = parse_newick("(a:0.1,b:0.2);")
        model = SubstitutionModel.jc69()
        t = 0.3
        same = 0.25 + 0.75 * math.exp(-4.0 * t / 3.0)
        diff = 0.25 - 0.25 * math.exp(-4.0 * t / 3.0)
        # identical site A/A
        codes = np.array([[DNA5.A], [DNA5.A]], dtype=np.uint8)
        want = math.log(0.25 * same)
        assert abs(log_likelihood(tree, codes, model) - want) < 1e-9
        # different site A/C
        codes = np.array([[DNA5.A], [DNA5.C]], dtype=np.uint8)
        want = math.log(0.25 * diff)
        assert abs(log_likelihood(tree, codes, model) - want) < 1e-9

    def test_n_is_uninformative(self):
        tree = parse_newick("(a:0.1,b:0.2);")
        model = SubstitutionModel.jc69()
        codes = np.array([[DNA5.A], [DNA5.N]], dtype=np.uint8)
        # Summing over the unknown leaf gives probability 1/4 total... i.e.
        # site likelihood = sum_x pi_x P(x->A) = pi = 0.25.
        assert abs(log_likelihood(tree, codes, model) - math.log(0.25)) < 1e-9

    def test_jitted_matches_numpy(self):
        rng = np.random.default_rng(0)
        tree = parse_newick("((a:0.1,b:0.2):0.05,(c:0.15,d:0.25):0.1);")
        codes = rng.integers(0, 4, size=(4, 40)).astype(np.uint8)
        model = SubstitutionModel.gtr(
            [1.0, 2.0, 1.0, 1.0, 2.0, 1.0], [0.3, 0.2, 0.2, 0.3],
            gamma_shape=0.7, n_rate_categories=4,
        )
        want = log_likelihood(tree, codes, model)
        device = TreeLikelihood(tree, codes, n_rate_categories=4)
        got = device(tree, model)
        # device path is float32 — tolerance accordingly
        assert abs(got - want) < 1e-3

    def test_pinvar(self):
        tree = parse_newick("(a:0.1,b:0.2);")
        model = SubstitutionModel.jc69()
        model.p_invariant = 0.3
        codes = np.array([[DNA5.A], [DNA5.A]], dtype=np.uint8)
        # Variable-site rates rescale by 1/(1-pinv) so the expected overall
        # substitution rate stays 1 (the standard +I normalisation).
        t = 0.3 / 0.7
        same = 0.25 + 0.75 * math.exp(-4.0 * t / 3.0)
        want = math.log(0.7 * 0.25 * same + 0.3 * 0.25)
        assert abs(log_likelihood(tree, codes, model) - want) < 1e-9


class TestMCMC:
    @pytest.fixture(scope="class")
    def alignment(self):
        """Simulate 2-clade data so the MCMC has signal."""
        rng = np.random.default_rng(42)
        n_sites = 120
        base = rng.integers(0, 4, n_sites)
        def mutate(seq, n):
            out = seq.copy()
            pos = rng.choice(n_sites, n, replace=False)
            out[pos] = (out[pos] + 1 + rng.integers(0, 3, n)) % 4
            return out
        a = mutate(base, 5)
        b = mutate(base, 5)
        c = mutate(base, 40)
        d = mutate(c, 5)
        return np.stack([a, b, c, d]).astype(np.uint8)

    def test_sampler_improves_likelihood(self, alignment):
        tree = random_tree(["a", "b", "c", "d"])
        state = ChainState(tree, SubstitutionModel.jc69())
        sampler = MCMCSampler(alignment, state, n_chains=1, seed=3)
        initial_ll = sampler.cold_chain.state.log_like
        sampler.run(60, sample_freq=10, burn_in=0)
        final_ll = sampler.cold_chain.state.log_like
        assert final_ll >= initial_ll
        assert len(sampler.samples) == 6

    def test_heated_chains_swap(self, alignment):
        tree = random_tree(["a", "b", "c", "d"])
        state = ChainState(tree, SubstitutionModel.jc69())
        sampler = MCMCSampler(alignment, state, n_chains=3, heat_factor=0.4, seed=5)
        sampler.run(30, sample_freq=10, swap_freq=2)
        assert sampler.swap_attempts > 0
        powers = sorted(c.heating_power for c in sampler.chains)
        assert powers[0] < powers[-1] == 1.0


class TestNexusAndStrom:
    def _write_nexus(self, path, taxa, seqs, tree_text=None):
        with open(path, "w") as f:
            f.write("#NEXUS\nbegin data;\n")
            f.write(f"  dimensions ntax={len(taxa)} nchar={len(seqs[0])};\n")
            f.write("  format datatype=dna missing=? gap=-;\n  matrix\n")
            for t, s in zip(taxa, seqs):
                f.write(f"    {t} {s}\n")
            f.write("  ;\nend;\n")
            if tree_text:
                f.write(f"begin trees;\n  tree start = [&U] {tree_text}\nend;\n")

    def test_read_nexus(self, tmp_path):
        path = str(tmp_path / "test.nex")
        self._write_nexus(path, ["tax1", "tax2"], ["ACGTAC", "ACGTTC"],
                          "(tax1:0.1,tax2:0.2);")
        data = read_nexus(path)
        assert data.taxa == ["tax1", "tax2"]
        assert data.n_sites == 6
        assert "start" in data.trees
        assert sorted(data.trees["start"].leaf_names) == ["tax1", "tax2"]

    def test_strom_end_to_end(self, tmp_path):
        rng = np.random.default_rng(1)
        base = rng.integers(0, 4, 60)
        letters = "ACGT"
        seqs = []
        for i in range(3):
            seq = base.copy()
            pos = rng.choice(60, 6, replace=False)
            seq[pos] = (seq[pos] + 1) % 4
            seqs.append("".join(letters[b] for b in seq))
        path = str(tmp_path / "data.nex")
        self._write_nexus(path, ["s1", "s2", "s3"], seqs)
        config = StromConfig(
            data_file=path, n_iterations=20, sample_freq=5, burn_in=0,
            n_chains=2, output_prefix=str(tmp_path / "out"),
        )
        Strom(config).execute_app()
        assert os.path.isfile(str(tmp_path / "out.p.tsv"))
        assert os.path.isfile(str(tmp_path / "out.t.nex"))
        trees_back = read_nexus(str(tmp_path / "out.t.nex"))
        assert len(trees_back.trees) == 4  # 20/5 samples


class TestVmappedChains:
    def test_batched_likelihood_matches_host(self):
        from kgl_gene_tpu.phylo.vmapped import ChainParams, VmappedChains

        rng = np.random.default_rng(0)
        tree = parse_newick("((a:0.1,b:0.2):0.05,(c:0.15,d:0.25):0.1);")
        codes = rng.integers(0, 4, size=(4, 30)).astype(np.uint8)
        chains = VmappedChains(tree, codes, n_chains=3, n_rate_categories=1)
        ll = np.asarray(chains._loglike(chains.params))
        # All chains initialised identically -> equal likelihoods, and they
        # match the host Felsenstein value (JC69 at the init params).
        model = SubstitutionModel.jc69()
        want = log_likelihood(tree, codes, model)
        np.testing.assert_allclose(ll, want, rtol=1e-4)

    def test_device_run_improves(self):
        from kgl_gene_tpu.phylo.vmapped import VmappedChains

        rng = np.random.default_rng(1)
        base = rng.integers(0, 4, 60)
        def mutate(n):
            out = base.copy()
            pos = rng.choice(60, n, replace=False)
            out[pos] = (out[pos] + 1) % 4
            return out
        codes = np.stack([base, mutate(4), mutate(25), mutate(28)]).astype(np.uint8)
        tree = parse_newick("((a:0.3,b:0.3):0.1,(c:0.3,d:0.3):0.1);")
        chains = VmappedChains(tree, codes, n_chains=2, seed=3)
        trace = chains.run(40)
        assert len(trace) == 40
        # The cold chain's likelihood trend is non-decreasing overall.
        assert trace[-5:].mean() >= trace[:5].mean() - 1.0
        assert np.isfinite(chains.loglike).all()


class TestTreeSummary:
    def test_splits_and_consensus(self):
        from kgl_gene_tpu.phylo.summary import TreeSummary

        summary = TreeSummary()
        # 3 trees agreeing on (a,b), 1 disagreeing.
        for _ in range(3):
            summary.add_tree(parse_newick("((a:0.1,b:0.1):0.2,(c:0.1,d:0.1):0.2);"))
        summary.add_tree(parse_newick("((a:0.1,c:0.1):0.2,(b:0.1,d:0.1):0.2);"))
        freqs = summary.split_frequencies()
        assert freqs[frozenset(["a", "b"])] == 0.75
        assert freqs[frozenset(["a", "c"])] == 0.25
        top = summary.best_topologies()
        assert abs(top[0][0] - 0.75) < 1e-12
        consensus = summary.majority_consensus()
        assert frozenset(["a", "b"]) in {
            frozenset(l.name for l in n.leaves())
            for n in consensus.edges() if not n.is_leaf()
        }
        assert sorted(consensus.leaf_names) == ["a", "b", "c", "d"]


class TestPartition:
    def test_uniform_partition_equals_unpartitioned(self):
        from kgl_gene_tpu.phylo.partition import (
            PartitionModel,
            partition_log_likelihood,
        )

        rng = np.random.default_rng(0)
        tree = parse_newick("((a:0.1,b:0.2):0.05,c:0.3);")
        codes = rng.integers(0, 4, size=(3, 30)).astype(np.uint8)
        partition = PartitionModel.by_codon_position(30)
        want = log_likelihood(tree, codes, SubstitutionModel.jc69())
        got = partition_log_likelihood(tree, codes, partition)
        assert abs(got - want) < 1e-9  # unit relrates, same JC model

    def test_relrates_normalised(self):
        from kgl_gene_tpu.phylo.partition import PartitionModel

        partition = PartitionModel.by_codon_position(30, None)
        partition.relative_rates = np.array([2.0, 1.0, 1.0])
        partition._normalise()
        weights = partition._site_weights()
        assert abs(np.sum(weights * partition.relative_rates) - 1.0) < 1e-12

    def test_subset_relrate_updater(self):
        import random as _random

        from kgl_gene_tpu.phylo.partition import (
            PartitionModel,
            partition_log_likelihood,
            update_subset_relrates,
        )

        rng = np.random.default_rng(5)
        tree = parse_newick("((a:0.1,b:0.2):0.05,c:0.3);")
        codes = rng.integers(0, 4, size=(3, 60)).astype(np.uint8)
        partition = PartitionModel.by_codon_position(60)
        ll = partition_log_likelihood(tree, codes, partition)
        r = _random.Random(1)
        accepted = 0
        for _ in range(10):
            partition, ll, ok = update_subset_relrates(tree, codes, partition, ll, r)
            accepted += ok
            weights = partition._site_weights()
            assert abs(np.sum(weights * partition.relative_rates) - 1.0) < 1e-9
        assert np.isfinite(ll)


class TestPolytomyMove:
    def _alignment(self, rng, n_sites=100, n_taxa=5):
        base = rng.integers(0, 4, n_sites)
        seqs = []
        for _ in range(n_taxa):
            out = base.copy()
            pos = rng.choice(n_sites, 6, replace=False)
            out[pos] = (out[pos] + 1 + rng.integers(0, 3, 6)) % 4
            seqs.append(out)
        return np.stack(seqs).astype(np.uint8)

    def test_dimension_jumps_both_ways(self):
        """The reversible-jump move must both create polytomies (delete
        edge) and resolve them (add edge) over a run, with the tree always
        remaining a valid likelihood input."""
        from kgl_gene_tpu.phylo.mcmc import Chain

        rng = np.random.default_rng(11)
        alignment = self._alignment(rng)
        names = [f"t{i}" for i in range(5)]
        tree = random_tree(names)
        state = ChainState(tree, SubstitutionModel.jc69())
        chain = Chain(alignment, state, rng=random.Random(2),
                      updaters=("branch_length", "polytomy"))
        saw_polytomy = saw_binary = False
        for _ in range(80):
            chain.next_step()
            max_deg = max(
                len(n.children) for n in chain.state.tree.internal_nodes()
            )
            if max_deg >= 3:
                saw_polytomy = True
            else:
                saw_binary = True
            assert np.isfinite(chain.state.log_like)
        assert saw_polytomy and saw_binary
        assert chain.try_counts["polytomy"] > 0

    def test_collapse_then_resolve_roundtrip(self):
        """Collapsing an internal edge and re-adding the same subset
        restores the original splits (the reverse-move bookkeeping the
        Hastings ratio relies on)."""
        from kgl_gene_tpu.phylo.tree import parse_newick

        t = parse_newick("((a:1,b:1):0.5,(c:1,d:1):0.5);")
        splits_before = t.splits()
        # collapse the (a,b) internal node
        node = next(n for n in t.internal_nodes() if n.parent is not None)
        parent, children = node.parent, list(node.children)
        parent.children.remove(node)
        for ch in children:
            ch.parent = parent
            parent.children.append(ch)
        t.renumber()
        assert max(len(n.children) for n in t.internal_nodes()) == 3
        # resolve it back
        from kgl_gene_tpu.phylo.tree import PhyloNode

        v = PhyloNode(index=-1, edge_length=0.5, parent=parent)
        for ch in children:
            parent.children.remove(ch)
            ch.parent = v
            v.children.append(ch)
        parent.children.append(v)
        t.renumber()
        assert t.splits() == splits_before

    def test_fixed_topology_disables_polytomy(self):
        from kgl_gene_tpu.phylo.mcmc import Chain

        rng = np.random.default_rng(3)
        alignment = self._alignment(rng, n_taxa=4)
        tree = random_tree(["t0", "t1", "t2", "t3"])
        state = ChainState(tree, SubstitutionModel.jc69())
        chain = Chain(alignment, state, fixed_topology=True)
        assert "polytomy" not in chain.updaters
        assert "larget_simon" not in chain.updaters


class TestCachedPartials:
    """Incremental (Beagle-style) cached-partials likelihood: the path
    update must equal the full device recompute and the host reference,
    and branch proposals must actually take the incremental route
    (kpl_phylogenetic/kpl_likelihood.h:43-105)."""

    def _setup(self, seed=0, n_leaves=8, n_sites=60):
        import random as _random

        rng = _random.Random(seed)
        np_rng = np.random.default_rng(seed)
        tree = random_tree([f"T{i}" for i in range(n_leaves)], rng)
        aln = np_rng.integers(0, 4, size=(n_leaves, n_sites)).astype(np.uint8)
        model = SubstitutionModel(
            np.ones(6), np.array([0.25, 0.25, 0.25, 0.25]), 1.0, 1, 0.0
        )
        return tree, aln, model

    def test_path_update_equals_full(self):
        from kgl_gene_tpu.phylo.likelihood import (
            CachedPartialsLikelihood, log_likelihood,
        )

        tree, aln, model = self._setup()
        backend = CachedPartialsLikelihood(aln)
        ll0 = backend.loglike(tree, model)
        backend.on_accept()
        host0 = log_likelihood(tree, aln, model)
        assert abs(ll0 - host0) < 1e-3

        # change one branch; incremental vs full must agree
        node = tree.edges()[3]
        node.edge_length *= 1.7
        ll_inc = backend.loglike(tree, model, changed_node_index=node.index)
        assert backend.path_evals == 1
        backend.on_reject()
        fresh = CachedPartialsLikelihood(aln)
        ll_full = fresh.loglike(tree, model)
        host1 = log_likelihood(tree, aln, model)
        assert abs(ll_inc - ll_full) < 1e-6
        assert abs(ll_inc - host1) < 1e-3

    def test_reject_keeps_committed_state(self):
        from kgl_gene_tpu.phylo.likelihood import CachedPartialsLikelihood

        tree, aln, model = self._setup(seed=2)
        backend = CachedPartialsLikelihood(aln)
        ll0 = backend.loglike(tree, model)
        backend.on_accept()
        node = tree.edges()[1]
        keep = node.edge_length
        node.edge_length *= 3.0
        backend.loglike(tree, model, changed_node_index=node.index)
        backend.on_reject()
        node.edge_length = keep
        # committed partials unchanged: next incremental from the original
        node2 = tree.edges()[4]
        node2.edge_length *= 1.3
        ll2 = backend.loglike(tree, model, changed_node_index=node2.index)
        fresh = CachedPartialsLikelihood(aln)
        ll2_full = fresh.loglike(tree, model)
        assert abs(ll2 - ll2_full) < 1e-6

    def test_chain_with_backend_runs_incremental(self, ):
        import random as _random

        from kgl_gene_tpu.phylo.likelihood import CachedPartialsLikelihood
        from kgl_gene_tpu.phylo.mcmc import Chain, ChainState

        tree, aln, model = self._setup(seed=3)
        backend = CachedPartialsLikelihood(aln)
        chain = Chain(
            aln, ChainState(tree, model), rng=_random.Random(1),
            updaters=("branch_length", "state_freq", "larget_simon"),
            backend=backend,
        )
        for _ in range(12):
            chain.next_step()
        # branch moves took the path route; model/topology moves recomputed
        assert backend.path_evals >= 8
        assert backend.full_evals >= 2
        # final committed loglike equals a fresh full evaluation
        from kgl_gene_tpu.phylo.likelihood import log_likelihood

        host = log_likelihood(chain.state.tree, aln, chain.state.model)
        assert abs(chain.state.log_like - host) < 1e-2


class TestSamplerBackend:
    """MCMCSampler backend wiring (VERDICT r3 #2): the product sampler can
    run the Beagle-equivalent device likelihood, heated chains share one
    tip-partials copy, and seeded traces match the host engine."""

    def _setup(self):
        import random as _random

        rng = np.random.default_rng(5)
        tree = random_tree([f"T{i}" for i in range(8)], _random.Random(5))
        aln = rng.integers(0, 4, size=(8, 120)).astype(np.uint8)
        model = SubstitutionModel(
            np.ones(6), np.full(4, 0.25), 1.0, 1, 0.0
        )
        return tree, aln, model

    def _run(self, tree, aln, model, backend, pooled_sweep=True):
        from kgl_gene_tpu.phylo.mcmc import MCMCSampler

        np.random.seed(42)  # dirichlet proposals draw from the global RNG
        s = MCMCSampler(aln, ChainState(tree.copy(), model), n_chains=2,
                        seed=9, backend=backend, pooled_sweep=pooled_sweep)
        return s, s.run(24, sample_freq=4, burn_in=0)

    def test_device_backend_constructs_and_shares_tips(self):
        from kgl_gene_tpu.phylo.likelihood import CachedPartialsLikelihood
        from kgl_gene_tpu.phylo.mcmc import MCMCSampler

        tree, aln, model = self._setup()
        s = MCMCSampler(aln, ChainState(tree, model), n_chains=3,
                        backend="device")
        assert all(
            isinstance(c.backend, CachedPartialsLikelihood) for c in s.chains
        )
        tips = s.chains[0].backend.tips
        assert all(c.backend.tips is tips for c in s.chains[1:])

    def test_host_backend_is_default_off_tpu(self):
        import jax

        from kgl_gene_tpu.phylo.mcmc import MCMCSampler

        tree, aln, model = self._setup()
        s = MCMCSampler(aln, ChainState(tree, model), backend="auto")
        on_tpu = jax.default_backend() in ("tpu", "axon")
        assert (s.chains[0].backend is not None) == on_tpu

    def test_seeded_traces_match_host(self):
        """Same seed, device vs host engine: identical sampled topologies,
        log-likelihoods within fp32-vs-fp64 accumulation tolerance."""
        tree, aln, model = self._setup()
        _s1, host_samples = self._run(tree, aln, model, "host")
        # pooled_sweep=False: the seeded-parity contract needs the host
        # RNG driving every proposal (the pooled device sweep has its own
        # RNG stream by design; test_param_sweep_consistency covers it).
        s2, dev_samples = self._run(tree, aln, model, "device",
                                    pooled_sweep=False)
        assert len(host_samples) == len(dev_samples) == 6
        for a, b in zip(host_samples, dev_samples):
            assert a["newick"] == b["newick"]
            assert abs(a["log_like"] - b["log_like"]) < 0.5
        # the device engine actually took incremental branch updates
        assert s2.cold_chain.backend.path_evals > 0

    def test_topology_moves_keep_one_full_program(self):
        """Larget-Simon / polytomy moves change n_internals and arity; the
        padded static shapes must keep the compiled-program count bounded
        (one full program per arity bucket, not per topology)."""
        tree, aln, model = self._setup()
        # pooled_sweep=False exercises the classic per-proposal full/path
        # programs whose cache-size bound this test pins; the pooled path
        # has its own caches (checked below).
        s, _ = self._run(tree, aln, model, "device", pooled_sweep=False)
        be = s.cold_chain.backend
        assert be.full_evals > 5
        assert len(be._jit_full_cache) <= 2  # arity buckets 4 (and maybe 8)
        s2, _ = self._run(tree, aln, model, "device")
        be2 = s2.cold_chain.backend
        assert len(getattr(be2, "_jit_sweep_cache", {})) <= 2
        assert len(getattr(be2, "_jit_topo2_cache", {})) <= 2


class TestParamSweep:
    """The pooled device parameter sweep (CachedPartialsLikelihood
    .param_sweep): one program covering branch-length, tree-length,
    frequency and exchangeability moves."""

    def _setup(self):
        import random as _random

        rng = np.random.default_rng(3)
        taxa = [f"T{i}" for i in range(6)]
        tree = random_tree(taxa, _random.Random(5))
        aln = rng.integers(0, 4, size=(6, 120)).astype(np.uint8)
        model = SubstitutionModel(np.ones(6), np.full(4, 0.25), 1.0, 1, 0.0)
        return tree, aln, model

    def test_sweep_ll_consistent_with_recompute(self):
        """The sweep's returned log-likelihood must equal an independent
        full evaluation on the returned state (same device family)."""
        from kgl_gene_tpu.phylo.likelihood import CachedPartialsLikelihood

        tree, aln, model = self._setup()
        be = CachedPartialsLikelihood(aln)
        res = be.param_sweep(tree, model, heating_power=1.0)
        # apply returned state
        for i, e in enumerate(tree.edges()):
            e.edge_length = float(res["edge_lengths"][i])
        model.frequencies = np.asarray(res["frequencies"], np.float64)
        model.exchangeabilities = np.asarray(
            res["exchangeabilities"], np.float64
        ) * float(np.sum(model.exchangeabilities))
        res2 = be.param_sweep(tree, model, heating_power=0.0)
        # heating 0: every ratio uses heat*(dll)=0 but priors/hastings
        # remain; instead verify via a fresh full loglike:
        ll_full = be.loglike(tree, model)
        assert abs(res["log_like"] - ll_full) < 0.05, (
            res["log_like"], ll_full,
        )

    def test_sweep_drives_sampler(self):
        """MCMCSampler with pooled sweep: all four sweep updaters get
        try counts, chain advances, log-likelihood stays finite."""
        from kgl_gene_tpu.phylo.mcmc import MCMCSampler

        tree, aln, model = self._setup()
        np.random.seed(1)
        s = MCMCSampler(aln, ChainState(tree.copy(), model), n_chains=1,
                        seed=2, backend="device")
        s.run(6, sample_freq=3)
        chain = s.cold_chain
        for name in ("branch_length", "tree_length", "state_freq",
                     "exchangeability"):
            assert chain.try_counts[name] == 6, chain.try_counts
        assert np.isfinite(chain.state.log_like)
        # host tree/model state mirrors the device decisions
        assert chain.state.tree.tree_length() > 0
        f = chain.state.model.frequencies
        assert abs(float(np.sum(f)) - 1.0) < 1e-3

    def test_pooled_topo_pair_consistent(self):
        """After pooled topology decisions, the host tree/model state must
        reproduce the device-reported log-likelihood (same family)."""
        from kgl_gene_tpu.phylo.mcmc import MCMCSampler

        tree, aln, model = self._setup()
        np.random.seed(7)
        s = MCMCSampler(aln, ChainState(tree.copy(), model), n_chains=1,
                        seed=11, backend="device")
        s.run(8, sample_freq=4)
        chain = s.cold_chain
        assert chain.try_counts["larget_simon"] == 8
        # device-family recompute on the final host state matches the
        # pooled program's reported value
        ll_full = chain.backend.loglike(chain.state.tree, chain.state.model)
        assert abs(ll_full - chain.state.log_like) < 0.05, (
            ll_full, chain.state.log_like,
        )

    def test_fused_vs_sequential_statistics(self):
        """Long-run statistical agreement between the fused device
        iteration and the sequential per-proposal path: acceptance rates
        and the equilibrium log-likelihood band must match (a wrong
        Hastings sign or a broken slot map shows up here immediately)."""
        from kgl_gene_tpu.phylo.mcmc import MCMCSampler

        tree, aln, model = self._setup()

        def run(pooled, seed):
            np.random.seed(seed)
            s = MCMCSampler(aln, ChainState(tree.copy(), model), n_chains=1,
                            seed=seed, backend="device",
                            pooled_sweep=pooled)
            s.run(150, sample_freq=15)
            c = s.cold_chain
            rates = {k: c.accept_counts[k] / max(c.try_counts[k], 1)
                     for k in ("branch_length", "tree_length", "state_freq",
                               "exchangeability", "larget_simon")}
            return rates, c.state.log_like

        r_fused, ll_fused = run(True, 5)
        r_seq, ll_seq = run(False, 6)
        for k in r_fused:
            assert abs(r_fused[k] - r_seq[k]) < 0.35, (k, r_fused, r_seq)
        # both chains settle in the same log-likelihood region
        assert abs(ll_fused - ll_seq) < 25.0, (ll_fused, ll_seq)
