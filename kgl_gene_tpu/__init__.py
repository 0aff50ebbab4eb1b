"""kgl_gene_tpu — a TPU-native population-genomics framework.

A from-scratch re-design of the capabilities of the KGL_Gene C++ toolkit
for JAX/XLA/Pallas on TPU: host-side ingest into columnar device arrays,
vectorized variant application and translation, Pallas DP kernels for
edit distance, and shard_map data parallelism for population statistics.
"""

__version__ = "0.1.0"
