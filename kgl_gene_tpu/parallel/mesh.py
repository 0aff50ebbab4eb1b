"""Device mesh + sharded population reductions — the distributed backend.

The reference's "distributed backend" is intra-node multithreading
(kel_thread/: WorkflowThreads fan-out per genome, mutex-merged results —
SURVEY.md section 2.8). The TPU-native equivalent implemented here:
population arrays are sharded sample-major (genomes) across a
jax.sharding.Mesh; per-shard partial statistics merge with psum/all_gather
collectives inside shard_map over ICI. The reference genome and variant
coordinate columns are replicated; only the genomes x variants zygosity
matrix (the big operand) is sharded.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "sample_mesh",
    "pad_to_multiple",
    "shard_samples",
    "sharded_allele_counts",
    "sharded_het_hom",
    "sharded_inbreeding",
    "sharded_pairwise_distances",
]


def sample_mesh(n_devices: Optional[int] = None, axis_name: str = "samples") -> Mesh:
    """1-D device mesh over the sample (genome) axis."""
    devices = np.asarray(jax.devices()[: n_devices or len(jax.devices())])
    return Mesh(devices, (axis_name,))


def pad_to_multiple(array: np.ndarray, multiple: int, axis: int = 0,
                    fill=0) -> np.ndarray:
    """Pad an axis up to a multiple (static-shape sharding requirement)."""
    size = array.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return array
    pad = [(0, 0)] * array.ndim
    pad[axis] = (0, target - size)
    return np.pad(array, pad, constant_values=fill)


def shard_samples(array: np.ndarray, mesh: Mesh) -> jax.Array:
    """Device-put an array sharded along axis 0 (samples)."""
    axis = mesh.axis_names[0]
    padded = pad_to_multiple(np.asarray(array), mesh.devices.size, axis=0)
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(padded, sharding)


# --------------------------------------------------------------------------- #
# sharded reductions
# --------------------------------------------------------------------------- #
def sharded_allele_counts(zygosity: np.ndarray, mesh: Mesh) -> np.ndarray:
    """AC per variant: psum of per-shard zygosity sums.

    Replaces the mutex-guarded merge of PopulationDB::addVariant counts
    (kgl_variant_db_population.h:106-110) with a single ICI collective.
    """
    axis = mesh.axis_names[0]
    z = shard_samples(zygosity.astype(np.int32), mesh)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=P(axis, None), out_specs=P(),
    )
    def _counts(z_local):
        return jax.lax.psum(jnp.sum(z_local, axis=0, dtype=jnp.int32), axis)

    return np.asarray(_counts(z))


def sharded_het_hom(zygosity: np.ndarray, mesh: Mesh) -> tuple:
    """(het, hom) counts per variant via psum over sample shards."""
    axis = mesh.axis_names[0]
    z = shard_samples(zygosity.astype(np.int32), mesh)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=P(axis, None), out_specs=(P(), P()),
    )
    def _counts(z_local):
        het = jax.lax.psum(jnp.sum(z_local == 1, axis=0, dtype=jnp.int32), axis)
        hom = jax.lax.psum(jnp.sum(z_local == 2, axis=0, dtype=jnp.int32), axis)
        return het, hom

    het, hom = _counts(z)
    return np.asarray(het), np.asarray(hom)


def sharded_inbreeding(
    zygosity: np.ndarray,
    minor_freq: np.ndarray,
    mesh: Mesh,
    algorithm: str = "Simple",
) -> np.ndarray:
    """Per-genome inbreeding F with genomes sharded across devices.

    Each shard vmaps the estimator over its local genomes (the reference's
    thread-per-genome pool, kga_analysis_inbreed: one F per sample); results
    come back sample-sharded and are gathered host-side.
    """
    from ..stats.inbreeding import _ESTIMATORS

    axis = mesh.axis_names[0]
    n_genomes = zygosity.shape[0]
    z = shard_samples(zygosity.astype(np.int32), mesh)
    p = jnp.asarray(minor_freq, dtype=jnp.float32)
    valid = (p > 0.0) & (p < 1.0)
    row_fn = _ESTIMATORS[algorithm]

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(axis, None), P(None), P(None)),
        out_specs=P(axis),
    )
    def _estimate(z_local, p_full, valid_full):
        return jax.vmap(
            lambda zrow: row_fn(zrow, p_full, jnp.broadcast_to(valid_full, zrow.shape))
        )(z_local)

    result = np.asarray(_estimate(z, p, valid))
    return result[:n_genomes]


def sharded_pairwise_distances(
    seqs: np.ndarray, lens: np.ndarray, mesh: Mesh,
    band_k: Optional[int] = None,
) -> np.ndarray:
    """All-pairs Levenshtein matrix with PAIR batches sharded over the mesh.

    The classification scale-out (SURVEY.md section 7 M3): sequences
    replicate to every device; the upper-triangle pair list shards; each
    device runs its local pairs through the SAME kernels as the single-chip
    path — the banded Pallas pool when band_k is given (exact: overflow
    pairs re-run through the adaptive band-doubling path host-side), the
    wavefront DP otherwise; results gather host-side into the symmetric
    matrix. This is the multi-chip form of
    ops.edit_distance.pairwise_distance_matrix.
    """
    from ..ops.edit_distance import _batched_levenshtein_impl

    axis = mesh.axis_names[0]
    seqs = np.asarray(seqs)
    lens = np.asarray(lens, dtype=np.int32)
    n, M = seqs.shape
    iu, ju = np.triu_indices(n, k=1)
    pairs = np.stack([iu, ju], axis=1).astype(np.int32)
    n_pairs = len(pairs)
    pairs_padded = pad_to_multiple(pairs, mesh.devices.size, axis=0)
    pair_shard = jax.device_put(
        pairs_padded, NamedSharding(mesh, P(axis, None))
    )
    seqs_d = jnp.asarray(seqs.astype(np.int32))
    lens_d = jnp.asarray(lens)

    if band_k is not None:
        from ..ops.pallas_banded import _banded_pairs_impl

        interpret = jax.default_backend() not in ("tpu", "axon")
        uniform = bool(np.all(lens == M))

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis, None), P(None, None), P(None)),
            out_specs=P(axis),
            # pallas_call out_shapes carry no vma annotation; out_specs pin
            # the sharding explicitly.
            check_vma=False,
        )
        def _banded_distances(local_pairs, all_seqs, all_lens):
            return _banded_pairs_impl(
                all_seqs, all_lens, local_pairs[:, 0], local_pairs[:, 1],
                band_k=band_k, interpret=interpret, uniform_cap=uniform,
            )

        distances = np.asarray(
            _banded_distances(pair_shard, seqs_d, lens_d)
        )[:n_pairs].astype(np.int64)
        # Band-overflow pairs re-run exactly (host adaptive path), same
        # routing as pairwise_distance_matrix's single-chip banded route.
        ok = (distances <= band_k) & (np.abs(lens[iu] - lens[ju]) <= band_k)
        pending = np.nonzero(~ok)[0]
        if pending.size:
            from ..ops.edit_distance import _rerun_overflow_pairs

            bi, bj = iu[pending], ju[pending]
            distances[pending] = _rerun_overflow_pairs(
                seqs[bi], lens[bi], seqs[bj], lens[bj], band_k
            )
    else:

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis, None), P(None, None), P(None)),
            out_specs=P(axis),
        )
        def _distances(local_pairs, all_seqs, all_lens):
            a = all_seqs[local_pairs[:, 0]]
            b = all_seqs[local_pairs[:, 1]]
            la = all_lens[local_pairs[:, 0]]
            lb = all_lens[local_pairs[:, 1]]
            return _batched_levenshtein_impl(a, la, b, lb, a.shape[1], b.shape[1])

        distances = np.asarray(_distances(pair_shard, seqs_d, lens_d))[:n_pairs]
    out = np.zeros((n, n), dtype=np.float64)
    out[iu, ju] = distances
    out[ju, iu] = distances
    return out
