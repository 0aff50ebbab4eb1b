"""Does the banded kernel's per-row cost amortize with wider blocks?
B=2048 pairs, S=3000, k=63, block_b in {128, 256, 512, 1024, 2048}."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kgl_gene_tpu.ops.pallas_banded import _banded_call, band_layout

B, S, K = 2048, 3000, 63
rng = np.random.default_rng(0)
lead, band_w, win_w, Wa = band_layout(K, S)
a = rng.integers(0, 4, size=(B, S)).astype(np.int32)
b = a.copy()
idx = rng.integers(0, S, size=(B, 40))
for i in range(B):
    b[i, idx[i]] = (b[i, idx[i]] + 1) % 4
a_p = np.zeros((B, Wa), np.int32); a_p[:, :S] = a
b_buf = np.full((B, lead + Wa + win_w), -1, np.int32); b_buf[:, lead:lead + S] = b
la = np.full((B, 128), S, np.int32)
a_d, b_d, l_d = jax.device_put(a_p), jax.device_put(b_buf), jax.device_put(la)

for block_b in (128, 256, 512, 1024, 2048):
    try:
        out = _banded_call(a_d, b_d, l_d, l_d, max_len=S, band_k=K,
                           block_b=block_b, uniform_cap=True)
        r = np.asarray(out)  # warm
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(_banded_call(a_d, b_d, l_d, l_d, max_len=S, band_k=K,
                                    block_b=block_b, uniform_cap=True))
            best = min(best, time.perf_counter() - t0)
        cells = B * S * S
        print(f"block_b={block_b}: {best*1000:.1f} ms  ({cells/best/1e9:.0f} eff-GCUPS)  sum={int(r[:,0].sum())}")
    except Exception as e:
        print(f"block_b={block_b}: FAILED {type(e).__name__}: {str(e)[:200]}")
