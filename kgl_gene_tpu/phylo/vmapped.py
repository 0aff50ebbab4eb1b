"""Vmapped MCMC chains: all heated chains advance in ONE device program.

The TPU-native form of the reference's chain-level parallelism
(SURVEY.md section 2.8 item 5: heated MCMC chains stepped and swapped —
"TPU equivalent: vmapped chains"). Topology is FIXED (the dominant regime
once the chain has found the tree; the object-based sampler in mcmc.py
handles topology moves); continuous parameters (branch lengths, state
frequencies, exchangeabilities) batch across chains, the GTR
eigendecomposition and pruning likelihood evaluate under vmap, and the
Metropolis accept + parallel-tempering swap are vector ops — the entire
run is a single lax.fori_loop on device.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .likelihood import leaf_partials
from .model import SubstitutionModel, discrete_gamma_rates
from .tree import PhyloTree

__all__ = ["VmappedChains"]

N_STATES = 4


class ChainParams(NamedTuple):
    edge_lengths: jnp.ndarray     # (C, E)
    frequencies: jnp.ndarray      # (C, 4) (normalised)
    exchangeabilities: jnp.ndarray  # (C, 6) (sum-normalised)


def _q_eigen(exchangeabilities, frequencies):
    """GTR eigendecomposition in JAX (symmetric-similarity form)."""
    pi = frequencies / jnp.sum(frequencies)
    pairs = jnp.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
    R = jnp.zeros((4, 4))
    R = R.at[pairs[:, 0], pairs[:, 1]].set(exchangeabilities)
    R = R.at[pairs[:, 1], pairs[:, 0]].set(exchangeabilities)
    Q = R * pi[None, :]
    Q = Q - jnp.diag(jnp.sum(Q, axis=1))
    scale = -jnp.sum(pi * jnp.diag(Q))
    Q = Q / jnp.maximum(scale, 1e-12)
    sqrt_pi = jnp.sqrt(pi)
    S = Q * sqrt_pi[:, None] / sqrt_pi[None, :]
    lam, U = jnp.linalg.eigh((S + S.T) / 2.0)
    V = U / sqrt_pi[:, None]
    Vinv = U.T * sqrt_pi[None, :]
    return lam, V, Vinv


class VmappedChains:
    def __init__(self, tree: PhyloTree, alignment_codes: np.ndarray,
                 n_chains: int = 4, heat_factor: float = 0.5,
                 gamma_shape: float = 1.0, n_rate_categories: int = 1,
                 seed: int = 0):
        arrays = tree.traversal_arrays()
        self.arrays = arrays
        self.n_leaves = tree.n_leaves
        self.n_chains = n_chains
        self.edges = tree.edges()
        self.n_edges = len(self.edges)
        # Map edge slot -> (internal k, child c) for likelihood assembly.
        edge_slot = {}
        for k in range(arrays["n_internals"]):
            for c in range(arrays["child_index"].shape[1]):
                child = arrays["child_index"][k, c]
                if child >= 0:
                    edge_slot[int(child)] = (k, c)
        self._edge_kc = np.array(
            [edge_slot[e.index] for e in self.edges], dtype=np.int64
        )
        self.tips = jnp.asarray(leaf_partials(alignment_codes))
        self.n_sites = alignment_codes.shape[1]
        # Fixed gamma category rates (shape not sampled in the vmapped run).
        self.rates = jnp.asarray(discrete_gamma_rates(gamma_shape, n_rate_categories))
        self.n_rates = n_rate_categories
        self.powers = jnp.asarray(
            [1.0 / (1.0 + heat_factor * c) for c in range(n_chains)]
        )
        init_edges = np.array([e.edge_length for e in self.edges])
        self.params = ChainParams(
            edge_lengths=jnp.tile(init_edges[None, :], (n_chains, 1)),
            frequencies=jnp.full((n_chains, 4), 0.25),
            exchangeabilities=jnp.full((n_chains, 6), 1.0 / 6.0),
        )
        self.key = jax.random.PRNGKey(seed)
        self._run_jit = jax.jit(self._run, static_argnames=("n_iters",))

    # ------------------------------------------------------------------ #
    def _loglike_one(self, edge_lengths, frequencies, exchangeabilities):
        """Single-chain pruning likelihood from parameter vectors."""
        arrays = self.arrays
        lam, V, Vinv = _q_eigen(exchangeabilities, frequencies)
        # (E, R, 4, 4) transition matrices.
        t = edge_lengths[:, None, None] * self.rates[None, :, None]
        e = jnp.exp(lam[None, None, :] * t)
        P_edges = jnp.einsum("ik,erk,kj->erij", V, e, Vinv)
        # Scatter edge P into (n_internals, max_children, R, 4, 4).
        n_int = arrays["n_internals"]
        max_c = arrays["child_index"].shape[1]
        child_P = jnp.tile(
            jnp.eye(4)[None, None, None], (n_int, max_c, self.n_rates, 1, 1)
        )
        kc = jnp.asarray(self._edge_kc)
        child_P = child_P.at[kc[:, 0], kc[:, 1]].set(P_edges)

        partials = jnp.ones((arrays["n_nodes"], self.n_rates, self.n_sites, N_STATES))
        partials = partials.at[: self.n_leaves].set(
            jnp.broadcast_to(
                self.tips[:, None, :, :],
                (self.n_leaves, self.n_rates, self.n_sites, N_STATES),
            )
        )
        child_index = jnp.asarray(arrays["child_index"])
        internal_index = jnp.asarray(arrays["internal_index"])

        def step(partials, k):
            acc = jnp.ones((self.n_rates, self.n_sites, N_STATES))
            for c in range(max_c):
                child = child_index[k, c]
                valid = child >= 0
                lifted = jnp.einsum(
                    "rij,rsj->rsi", child_P[k, c], partials[jnp.maximum(child, 0)]
                )
                acc = acc * jnp.where(valid, lifted, 1.0)
            return partials.at[internal_index[k]].set(acc), 0

        partials, _ = jax.lax.scan(step, partials, jnp.arange(n_int))
        pi = frequencies / jnp.sum(frequencies)
        site = jnp.einsum("rsi,i->rs", partials[arrays["root_index"]], pi)
        site = jnp.mean(site, axis=0)
        return jnp.sum(jnp.log(jnp.maximum(site, 1e-300)))

    def _loglike(self, params: ChainParams) -> jnp.ndarray:
        return jax.vmap(self._loglike_one)(
            params.edge_lengths, params.frequencies, params.exchangeabilities
        )

    # ------------------------------------------------------------------ #
    def _run(self, params: ChainParams, key, n_iters: int):
        loglike = self._loglike(params)
        C, E = self.n_chains, self.n_edges

        def mh_accept(key, log_ratio):
            u = jax.random.uniform(key, (C,))
            return jnp.log(u + 1e-300) < log_ratio

        def iteration(carry, _):
            params, loglike, key = carry
            key, k_edge, k_fac, k_acc, k_tl, k_tacc, k_freq, k_facc, k_swap, k_sacc = (
                jax.random.split(key, 10)
            )
            # --- branch-length scaler on a random edge per chain ---------
            edge_idx = jax.random.randint(k_edge, (C,), 0, E)
            factor = jnp.exp(0.5 * (jax.random.uniform(k_fac, (C,)) - 0.5))
            old_lengths = params.edge_lengths[jnp.arange(C), edge_idx]
            proposal_edges = params.edge_lengths.at[jnp.arange(C), edge_idx].set(
                jnp.maximum(old_lengths * factor, 1e-8)
            )
            prop_params = params._replace(edge_lengths=proposal_edges)
            prop_like = self._loglike(prop_params)
            prior = -10.0 * (
                jnp.sum(proposal_edges, axis=1) - jnp.sum(params.edge_lengths, axis=1)
            )
            ratio = self.powers * (prop_like - loglike) + prior + jnp.log(factor)
            accept = mh_accept(k_acc, ratio)
            params = params._replace(
                edge_lengths=jnp.where(accept[:, None], proposal_edges,
                                       params.edge_lengths)
            )
            loglike = jnp.where(accept, prop_like, loglike)

            # --- whole-tree length scaler --------------------------------
            factor = jnp.exp(0.3 * (jax.random.uniform(k_tl, (C,)) - 0.5))
            proposal_edges = jnp.maximum(
                params.edge_lengths * factor[:, None], 1e-8
            )
            prop_params = params._replace(edge_lengths=proposal_edges)
            prop_like = self._loglike(prop_params)
            prior = -10.0 * (
                jnp.sum(proposal_edges, axis=1) - jnp.sum(params.edge_lengths, axis=1)
            )
            ratio = (
                self.powers * (prop_like - loglike) + prior + E * jnp.log(factor)
            )
            accept = mh_accept(k_tacc, ratio)
            params = params._replace(
                edge_lengths=jnp.where(accept[:, None], proposal_edges,
                                       params.edge_lengths)
            )
            loglike = jnp.where(accept, prop_like, loglike)

            # --- state frequencies (Dirichlet kernel) --------------------
            conc = 500.0
            alpha = jnp.maximum(params.frequencies * conc, 1e-3)
            new_freqs = jax.random.dirichlet(k_freq, alpha)
            alpha_new = jnp.maximum(new_freqs * conc, 1e-3)
            log_fwd = jax.vmap(jax.scipy.stats.dirichlet.logpdf)(new_freqs, alpha)
            log_back = jax.vmap(jax.scipy.stats.dirichlet.logpdf)(
                params.frequencies, alpha_new
            )
            prop_params = params._replace(frequencies=new_freqs)
            prop_like = self._loglike(prop_params)
            ratio = self.powers * (prop_like - loglike) + (log_back - log_fwd)
            accept = mh_accept(k_facc, ratio)
            params = params._replace(
                frequencies=jnp.where(accept[:, None], new_freqs, params.frequencies)
            )
            loglike = jnp.where(accept, prop_like, loglike)

            # --- tempering swap between a random adjacent pair -----------
            if C > 1:
                i = jax.random.randint(k_swap, (), 0, C - 1)
                j = i + 1
                log_ratio = (self.powers[i] - self.powers[j]) * (
                    loglike[j] - loglike[i]
                )
                do_swap = jnp.log(
                    jax.random.uniform(k_sacc) + 1e-300
                ) < log_ratio

                def swap_rows(x):
                    xi, xj = x[i], x[j]
                    return x.at[i].set(jnp.where(do_swap, xj, xi)).at[j].set(
                        jnp.where(do_swap, xi, xj)
                    )

                params = ChainParams(*(swap_rows(arr) for arr in params))
                loglike = swap_rows(loglike)

            return (params, loglike, key), loglike[0]

        (params, loglike, key), trace = jax.lax.scan(
            iteration, (params, loglike, key), None, length=n_iters
        )
        return params, loglike, key, trace

    def run(self, n_iters: int) -> np.ndarray:
        """Advance all chains n_iters iterations on device; returns the
        cold chain's log-likelihood trace."""
        params, loglike, key, trace = self._run_jit(self.params, self.key, n_iters)
        self.params = params
        self.key = key
        self.loglike = np.asarray(loglike)
        return np.asarray(trace)
