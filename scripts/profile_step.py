"""Profile the forward step's components on the real chip.

Times, in one process (to share remote-compile warmth):
  1. full forward step (bench.py workload),
  2. pre-DP part only (apply + splice + translate + validity + counts),
  3. banded kernel alone, device-resident padded inputs,
  4. banded kernel with the in-step padding (.at[].set) included,
  5. a trivial jitted add (dispatch floor through the tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kgl_gene_tpu.ops.pipeline import make_forward_step
from kgl_gene_tpu.ops.variant_apply import apply_snp_batch, gather_splice, translate_batch
from kgl_gene_tpu.ops.pallas_banded import B_LEAD, _banded_call

rng = np.random.default_rng(0)
REGION, BATCH, SNPS = 4800, 256, 48
EXONS = np.array([[400, 1900], [2400, 3900]], dtype=np.int64)
S = int((EXONS[:, 1] - EXONS[:, 0]).sum())

region = rng.integers(0, 4, size=REGION).astype(np.uint8)
positions = rng.integers(0, REGION, size=(BATCH, SNPS)).astype(np.int32)
alt_codes = rng.integers(0, 4, size=(BATCH, SNPS)).astype(np.uint8)
valid = rng.random((BATCH, SNPS)) < 0.8


def _fetch(out):
    """Force execution: under the axon tunnel block_until_ready does not
    flush deferred remote executions — a device->host transfer does."""
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(leaves[0]).ravel()[:1]


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)  # fetch inside the window so the chain must complete
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:8.3f} ms")
    return dt


print("device:", jax.devices()[0])

step = make_forward_step(region, EXONS, region_start=0, use_pallas=True)
# device-resident inputs
d_pos = jax.device_put(positions)
d_alt = jax.device_put(alt_codes)
d_val = jax.device_put(valid)
timeit("full step (device inputs)", step, d_pos, d_alt, d_val)
timeit("full step (host inputs, like bench)", step, positions, alt_codes, valid)

# pre-DP only
from kgl_gene_tpu.sequence.alphabet import AminoAcid
from kgl_gene_tpu.sequence.tables import amino_translation_table
from kgl_gene_tpu.ops.variant_apply import build_splice_index

table = amino_translation_table("NCBI_TABLE_1")
splice = jnp.asarray(build_splice_index(EXONS, 0), dtype=jnp.int32)
region_j = jnp.asarray(region, dtype=jnp.uint8)
amino_lut = jnp.asarray(table.amino_lut, dtype=jnp.uint8)
start_codes = jnp.asarray(np.unique(table.amino_lut[table.start_lut]), dtype=jnp.uint8)


@jax.jit
def pre_dp(positions, alt_codes, valid):
    mutated = apply_snp_batch(region_j, positions, alt_codes, valid)
    coding = gather_splice(mutated, splice)
    amino = translate_batch(coding, amino_lut)
    starts_ok = jnp.isin(amino[:, 0], start_codes)
    ends_ok = amino[:, -1] == AminoAcid.STOP
    internal_stops = jnp.sum(amino[:, :-1] == AminoAcid.STOP, axis=1)
    allele_counts = jnp.sum(valid.astype(jnp.int32), axis=0)
    return coding, amino, starts_ok & ends_ok & (internal_stops == 0), allele_counts


timeit("pre-DP (apply+splice+translate+valid)", pre_dp, d_pos, d_alt, d_val)


# banded kernel alone, padded device-resident inputs
band_k = 63
band_w = ((2 * band_k + 1 + 127) // 128) * 128  # same formula as _banded_call
win_w = band_w + 256
Wa = ((S + 127) // 128) * 128
block_b = 256
coding_np = rng.integers(0, 4, size=(BATCH, S)).astype(np.int32)
ref_np = rng.integers(0, 4, size=(1, S)).astype(np.int32)
a_p = np.zeros((BATCH, Wa), np.int32)
a_p[:, :S] = coding_np
b_buf = np.full((BATCH, B_LEAD + Wa + win_w), -1, np.int32)
b_buf[:, B_LEAD:B_LEAD + S] = ref_np
len_col = np.full((BATCH, 128), S, np.int32)
d_a = jax.device_put(a_p)
d_b = jax.device_put(b_buf)
d_l = jax.device_put(len_col)


def banded_only(a, b, l):
    return _banded_call(a, b, l, l, max_len=S, band_k=band_k, block_b=block_b,
                        interpret=False)


timeit("banded kernel alone (device padded)", banded_only, d_a, d_b, d_l)


@jax.jit
def banded_with_pad(coding, ref):
    a_p = jnp.zeros((BATCH, Wa), jnp.int32).at[:, :S].set(coding)
    b_buf = jnp.full((BATCH, B_LEAD + Wa + win_w), -1, jnp.int32).at[
        :, B_LEAD:B_LEAD + S].set(jnp.broadcast_to(ref, (BATCH, S)))
    len_col = jnp.full((BATCH, 128), S, jnp.int32)
    return _banded_call(a_p, b_buf, len_col, len_col, max_len=S, band_k=band_k,
                        block_b=block_b, interpret=False)


d_cod = jax.device_put(coding_np)
d_ref = jax.device_put(ref_np)
timeit("banded kernel + in-step padding", banded_with_pad, d_cod, d_ref)


@jax.jit
def trivial(x):
    return x + 1


d_x = jax.device_put(np.zeros((8, 128), np.float32))
timeit("trivial jitted add (dispatch floor)", trivial, d_x)
