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
    "streamed_inbreeding",
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
    """Device-put an array sharded along axis 0 (samples).

    Single-device meshes take the plain device_put path: on a
    remote-attached device the NamedSharding layout path transfers ~27x
    slower than a direct put (55 s vs 2 s measured for a 131 MB block),
    and with one device the sharding is trivially equivalent.
    """
    padded = pad_to_multiple(np.asarray(array), mesh.devices.size, axis=0)
    if mesh.devices.size == 1:
        # Uncommitted put: an explicit device/sharding target routes the
        # axon tunnel through a layout path that transfers ~7-27x slower
        # (131 MB: 2 s plain vs 30 s committed vs 55 s NamedSharding).
        return jax.device_put(padded)
    axis = mesh.axis_names[0]
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


def _inbreed_moments(packed, p_block, acc):
    """Accumulate per-genome inbreeding moment partials for one 2-bit
    packed zygosity chunk: packed (W/4, G) uint8 carries 4 loci/byte in
    VARIANT-major orientation (link traffic is the binding resource on a
    remote-attached device, and the host-side densify streams
    sequentially only in this layout — see dense_block_t). Reductions run
    over the variant axis; acc is (G, 5)."""
    from ..stats.inbreeding import _MIN_RITLAND_FREQ

    G = packed.shape[1]
    r_contrib = jnp.zeros((G,), jnp.float32)
    r_count = jnp.zeros((G,), jnp.float32)
    s_obs = jnp.zeros((G,), jnp.float32)
    s_exp = jnp.float32(0.0)
    s_n = jnp.float32(0.0)
    # Four independent slab passes (one per 2-bit lane) instead of a
    # stacked unpack->reshape: the giant reshaped intermediate made XLA's
    # fusion pass pathologically slow to COMPILE (~4 min), and a
    # compile-cache miss then dominated the whole analysis.
    for j, s in enumerate((0, 2, 4, 6)):
        z = ((packed >> s) & 3).astype(jnp.int32)      # (W/4, G)
        p = p_block[j::4].astype(jnp.float32)          # (W/4,)
        valid = (p > 0.0) & (p < 1.0)
        q = 1.0 - p
        first = jnp.where(z == 0, q[:, None], p[:, None])
        is_hom = (z == 0) | (z == 2)
        hom_ok = is_hom & (first > _MIN_RITLAND_FREQ) & valid[:, None]
        het_ok = (z == 1) & valid[:, None]
        r_contrib = r_contrib + jnp.sum(
            jnp.where(hom_ok, 1.0 / jnp.where(hom_ok, first, 1.0) - 1.0, 0.0)
            - het_ok.astype(jnp.float32),
            axis=0,
        )
        r_count = r_count + jnp.sum(hom_ok | het_ok, axis=0).astype(jnp.float32)
        s_obs = s_obs + jnp.sum(is_hom & valid[:, None], axis=0).astype(jnp.float32)
        s_exp = s_exp + jnp.sum(jnp.where(valid, p * p + q * q, 0.0))
        s_n = s_n + jnp.sum(valid).astype(jnp.float32)
    upd = jnp.stack(
        [r_contrib, r_count, s_obs,
         jnp.full_like(s_obs, s_exp), jnp.full_like(s_obs, s_n)],
        axis=1,
    )
    return acc + upd


@functools.lru_cache(maxsize=8)
def _inbreed_accumulator(mesh: Mesh):
    """Module-cached accumulate step for streamed_inbreeding (a fresh jit
    closure per call would retrace/recompile every invocation).

    Single-device meshes get a PLAIN jit: the shard_map executable misses
    the persistent compilation cache across processes on the axon backend
    (~36 s recompile per run), while plain jits hit it; with one device
    the sharding is trivial anyway.
    """
    if mesh.devices.size == 1:
        return jax.jit(_inbreed_moments)

    axis = mesh.axis_names[0]
    return jax.jit(functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(None), P(axis, None)),
        out_specs=P(axis, None),
    )(_inbreed_moments))


def streamed_inbreeding(
    csr,
    minor_freq: np.ndarray,
    mesh: Mesh,
    block_variants: Optional[int] = None,
    algorithms: Sequence[str] = ("Simple", "RitlandLocus"),
) -> dict:
    """Per-genome inbreeding over ALL variants of a population too large to
    densify at once: VariantMajorCSR dense blocks stream through the chip
    and per-genome moment partials accumulate in device-resident state; the
    host fetches ONE result set at the end.

    Simple (F = (obs_hom - exp_hom)/(n - exp_hom)) and Ritland multi-locus
    (mean of per-locus hom/het contributions, kga_analysis_inbreed_calc.cpp)
    are exact sums of per-locus terms, so chunk accumulation reproduces the
    single-shot estimators bit-for-bit in fp32 ordering. Uploads are uint8
    (the zygosity codes) so link traffic is G x V bytes. Chunks are sized
    as LARGE as host/device memory allows (~4 GB of zygosity per chunk):
    on a remote-attached device each program execution carries a fixed
    multi-second round-trip cost, so fewer, bigger chunks win; XLA tiles
    the row-reductions internally, no small-block pipelining needed.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    G = csr.genome_count
    if block_variants is None:
        # fit ~4 GB of zygosity per chunk, but never pad a small V up to
        # the memory bound — round V to 128k columns so compile shapes
        # stay few and tail padding stays <= 128k columns.
        mem_cols = max(131072, int(4e9) // max(G, 1))
        v_cols = ((max(csr.variant_count, 1) + 131071) // 131072) * 131072
        block_variants = min(mem_cols, v_cols)
    _accumulate = _inbreed_accumulator(mesh)

    Gp = ((G + n_dev - 1) // n_dev) * n_dev
    if n_dev == 1:
        acc = jax.device_put(np.zeros((Gp, 5), np.float32))
    else:
        acc = jax.device_put(
            jnp.zeros((Gp, 5), jnp.float32), NamedSharding(mesh, P(axis, None))
        )
    block_variants = ((block_variants + 3) // 4) * 4  # 2-bit pack granularity
    V = csr.variant_count
    minor_freq = np.asarray(minor_freq, dtype=np.float32)
    for v_lo in range(0, V, block_variants):
        v_hi = min(v_lo + block_variants, V)
        block = csr.dense_block_t(v_lo, v_hi)  # (width, G) uint8
        if v_hi - v_lo < block_variants:  # static shape for the jit
            block = np.pad(block, ((0, block_variants - (v_hi - v_lo)), (0, 0)))
        # 2-bit pack, 4 loci/byte along the variant axis
        packed = (block[0::4] | (block[1::4] << 2)
                  | (block[2::4] << 4) | (block[3::4] << 6))
        if Gp > G:
            packed = np.pad(packed, ((0, 0), (0, Gp - G)))
        p_blk = minor_freq[v_lo:v_hi]
        if len(p_blk) < block_variants:
            # pad with p = 0 -> invalid loci, excluded from every sum
            p_blk = np.pad(p_blk, (0, block_variants - len(p_blk)))
        if n_dev == 1:
            z_dev = jax.device_put(packed)
        else:
            z_dev = jax.device_put(
                packed, NamedSharding(mesh, P(None, axis))
            )
        acc = _accumulate(z_dev, jnp.asarray(p_blk), acc)
    a = np.asarray(acc)[:G]
    r_contrib, r_count, s_obs, s_exp, s_n = (a[:, i] for i in range(5))
    out = {}
    for name in algorithms:
        if name == "Simple":
            denom = s_n - s_exp
            out[name] = np.where(denom != 0, (s_obs - s_exp) / denom, 0.0)
        elif name == "RitlandLocus":
            out[name] = np.where(r_count > 0, r_contrib / np.maximum(r_count, 1.0), 0.0)
        else:
            raise ValueError(
                f"{name} is not chunk-decomposable; use sharded_inbreeding "
                "on a dense window for HallME/Loglikelihood"
            )
    return out


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
        from ..ops.pallas_myers import _myers_pairs_impl, myers_band_for

        band_k = myers_band_for(band_k) or 511
        interpret = jax.default_backend() not in ("tpu", "axon")

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
            return _myers_pairs_impl(
                all_seqs, all_lens, local_pairs[:, 0], local_pairs[:, 1],
                band_k=band_k, max_len=M, interpret=interpret,
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
