"""Inbreeding-coefficient estimation, vectorized over genomes on device.

Capability parity with the reference inbreeding plugin's four algorithms
(kga_analytic/kga_inbreed/kga_analysis_inbreed_calc.h:72,113-118 and
.cpp:94-432): Ritland multi-locus, Simple (F = 1 - obs/exp heterozygosity),
Hall expectation-maximisation, and maximum log-likelihood. The reference
runs one genome per thread with an nlopt Nelder-Mead optimiser; here every
genome's locus classification is a row of a (genomes x loci) array and all
four estimators are jit/vmap-compiled JAX reductions — the MLE uses a
vectorized golden-section refinement instead of nlopt, and the EM is a
lax.while_loop, so thousands of samples solve in one device launch.

Locus classes (kga_analysis_inbreed_freq.cpp:426-515): for each biallelic
SNP locus with minor allele frequency p (q = 1-p), a diploid genome is
MAJOR_HOMOZYGOUS (no minor allele, first-allele freq q), MAJOR_HETEROZYGOUS
(one minor, freqs p and q), or MINOR_HOMOZYGOUS (two minor, freq p).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "LocusData",
    "ritland_f",
    "simple_f",
    "hall_me_f",
    "loglikelihood_f",
    "inbreeding_all",
    "synthetic_diploid_population",
]

_SMALL_PROB = 1e-10
_MIN_RITLAND_FREQ = 0.001  # rare-homozygote guard (processRitlandLocus)
_EM_TOL = 1e-4
_EM_MAX_ITER = 1000


@dataclass
class LocusData:
    """Per-genome locus classification arrays.

    zygosity: (G, L) uint8 in {0 = major hom, 1 = het, 2 = minor hom};
    minor_freq: (L,) minor allele frequency p from the super-population;
    valid: (G, L) bool mask of usable loci (frequency known, biallelic).
    """

    zygosity: np.ndarray
    minor_freq: np.ndarray
    valid: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.valid is None:
            ok = (self.minor_freq > 0.0) & (self.minor_freq < 1.0)
            self.valid = np.broadcast_to(ok, self.zygosity.shape).copy()

    @classmethod
    def from_variant_view(cls, view, minor_freq: np.ndarray) -> "LocusData":
        return cls(zygosity=np.asarray(view.zygosity), minor_freq=np.asarray(minor_freq))


def _first_allele_freq(z: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """First-allele frequency per class: hom-major -> q, het -> p, hom-minor -> p."""
    q = 1.0 - p
    return jnp.where(z == 0, q, p)


# --------------------------------------------------------------------------- #
# estimators — each maps (zygosity row, p, valid row) -> scalar F
# --------------------------------------------------------------------------- #
def _ritland_row(z, p, valid):
    first = _first_allele_freq(z, p)
    is_hom = (z == 0) | (z == 2)
    hom_ok = is_hom & (first > _MIN_RITLAND_FREQ) & valid
    het_ok = (z == 1) & valid
    contrib = jnp.where(hom_ok, 1.0 / jnp.where(hom_ok, first, 1.0) - 1.0, 0.0)
    contrib = contrib + jnp.where(het_ok, -1.0, 0.0)
    count = jnp.sum(hom_ok) + jnp.sum(het_ok)
    return jnp.where(count > 0, jnp.sum(contrib) / count, 0.0)


def _simple_row(z, p, valid):
    q = 1.0 - p
    obs_hom = jnp.sum(((z == 0) | (z == 2)) & valid)
    exp_hom = jnp.sum(jnp.where(valid, p * p + q * q, 0.0))
    n = jnp.sum(valid)
    denom = n - exp_hom
    return jnp.where(denom != 0, (obs_hom - exp_hom) / denom, 0.0)


def _hall_me_row(z, p, valid):
    first = _first_allele_freq(z, p)
    is_hom = ((z == 0) | (z == 2)) & valid
    n = jnp.sum(valid)

    def em_step(state):
        f, _, it = state
        denom = f + (1.0 - f) * first
        term = jnp.where(is_hom & (denom != 0), f / denom, 0.0)
        new_f = jnp.where(n > 0, jnp.sum(term) / n, 0.0)
        return new_f, f, it + 1

    def cond(state):
        f, prev, it = state
        return (jnp.abs(f - prev) > _EM_TOL) & (it < _EM_MAX_ITER)

    f, _, _ = jax.lax.while_loop(cond, em_step, (0.25, 1.0, 0))
    return f


def _loglik(f, z, p, valid):
    first = _first_allele_freq(z, p)
    q = 1.0 - p
    second = jnp.where(z == 1, q, first)
    hom_prob = f * first + (1.0 - f) * first * first
    het_prob = 2.0 * (1.0 - f) * first * second
    prob = jnp.where((z == 0) | (z == 2), hom_prob, het_prob)
    prob = jnp.clip(prob, _SMALL_PROB, 1.0)
    return jnp.sum(jnp.where(valid, jnp.log(prob), 0.0))


def _loglik_row(z, p, valid):
    """MLE of f in [-1, 1]: coarse grid then golden-section refinement
    (replaces the nlopt LN_NELDERMEAD call, kga_analysis_inbreed_calc.cpp:131)."""
    grid = jnp.linspace(-1.0, 1.0, 65)
    vals = jax.vmap(lambda f: _loglik(f, z, p, valid))(grid)
    k = jnp.argmax(vals)
    lo = jnp.clip(grid[k] - 0.04, -1.0, 1.0)
    hi = jnp.clip(grid[k] + 0.04, -1.0, 1.0)
    gr = 0.618033988749895

    def golden_step(state, _):
        lo, hi = state
        a = hi - gr * (hi - lo)
        b = lo + gr * (hi - lo)
        fa = _loglik(a, z, p, valid)
        fb = _loglik(b, z, p, valid)
        new_lo = jnp.where(fa < fb, a, lo)
        new_hi = jnp.where(fa < fb, hi, b)
        return (new_lo, new_hi), None

    (lo, hi), _ = jax.lax.scan(golden_step, (lo, hi), None, length=40)
    return (lo + hi) / 2.0


_ESTIMATORS = {
    "RitlandLocus": _ritland_row,
    "Simple": _simple_row,
    "HallME": _hall_me_row,
    "Loglikelihood": _loglik_row,
}


@functools.partial(jax.jit, static_argnames=("algorithm",))
def _run(algorithm: str, zygosity, minor_freq, valid):
    row_fn = _ESTIMATORS[algorithm]
    return jax.vmap(lambda z, v: row_fn(z, minor_freq, v))(zygosity, valid)


def _estimate(algorithm: str, data: LocusData) -> np.ndarray:
    return np.asarray(
        _run(
            algorithm,
            jnp.asarray(data.zygosity, dtype=jnp.int32),
            jnp.asarray(data.minor_freq, dtype=jnp.float64
                        if jax.config.jax_enable_x64 else jnp.float32),
            jnp.asarray(data.valid),
        )
    )


def ritland_f(data: LocusData) -> np.ndarray:
    return _estimate("RitlandLocus", data)


def simple_f(data: LocusData) -> np.ndarray:
    return _estimate("Simple", data)


def hall_me_f(data: LocusData) -> np.ndarray:
    return _estimate("HallME", data)


def loglikelihood_f(data: LocusData) -> np.ndarray:
    return _estimate("Loglikelihood", data)


def inbreeding_all(data: LocusData) -> Dict[str, np.ndarray]:
    """All four estimators per genome (the reference's algoMap)."""
    return {name: _estimate(name, data) for name in _ESTIMATORS}


# --------------------------------------------------------------------------- #
# synthetic validation data (InbreedSynthetic analogue,
# kga_analysis_inbreed_synthetic.h:56)
# --------------------------------------------------------------------------- #
def synthetic_diploid_population(
    n_genomes: int,
    n_loci: int,
    inbreeding: np.ndarray,
    seed: int = 0,
    freq_low: float = 0.05,
    freq_high: float = 0.45,
) -> LocusData:
    """Generate diploid genotypes with known per-genome inbreeding
    coefficients: with probability f the genome is IBD at a locus (genotype
    drawn as one allele), else HWE."""
    rng = np.random.default_rng(seed)
    p = rng.uniform(freq_low, freq_high, size=n_loci)
    inbreeding = np.asarray(inbreeding, dtype=np.float64)
    z = np.zeros((n_genomes, n_loci), dtype=np.uint8)
    for g in range(n_genomes):
        f = inbreeding[g]
        ibd = rng.random(n_loci) < f
        one_draw = rng.random(n_loci) < p
        a1 = np.where(ibd, one_draw, rng.random(n_loci) < p)
        a2 = np.where(ibd, one_draw, rng.random(n_loci) < p)
        z[g] = a1.astype(np.uint8) + a2.astype(np.uint8)
    return LocusData(zygosity=z, minor_freq=p)
