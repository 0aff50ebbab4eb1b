"""All-pairs banded pool at bench shape: block_b 128 vs 256."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from kgl_gene_tpu.ops.pallas_banded import _banded_pairs_gather

n, S, K = 256, 3000, 127
rng = np.random.default_rng(0)
base = rng.integers(0, 4, size=S).astype(np.int32)
seqs = np.tile(base, (n, 1))
for i in range(n):
    idx = rng.integers(0, S, size=40)
    seqs[i, idx] = (seqs[i, idx] + 1) % 4
lens = np.full(n, S, np.int32)
iu, ju = np.triu_indices(n, k=1)
n_pairs = len(iu)
P = ((n_pairs + 511) // 512) * 512
iu_p = np.concatenate([iu, np.full(P - n_pairs, iu[0])]).astype(np.int32)
ju_p = np.concatenate([ju, np.full(P - n_pairs, ju[0])]).astype(np.int32)
seqs_dev = jax.device_put(jnp.asarray(seqs)); lens_dev = jax.device_put(jnp.asarray(lens))
iu_d, ju_d = jax.device_put(jnp.asarray(iu_p)), jax.device_put(jnp.asarray(ju_p))

for block_b in (1024,):
    try:
        r = np.asarray(_banded_pairs_gather(seqs_dev, lens_dev, iu_d, ju_d,
                                            band_k=K, block_b=block_b, uniform_cap=True))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(_banded_pairs_gather(seqs_dev, lens_dev, iu_d, ju_d,
                                            band_k=K, block_b=block_b, uniform_cap=True))
            best = min(best, time.perf_counter() - t0)
        print(f"block_b={block_b}: {best*1000:.1f} ms -> {n_pairs*S*S/best/1e9:.0f} GCUPS  sum={int(r[:n_pairs].sum())}")
    except Exception as e:
        print(f"block_b={block_b}: FAILED {type(e).__name__} {str(e)[:150]}")
