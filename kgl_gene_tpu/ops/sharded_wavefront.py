"""Sharded anti-diagonal wavefront: ONE very long pair's edit-distance DP
split across the device mesh (SURVEY.md §5 long-sequence story — the
genomics analogue of ring attention).

The reference handles chromosome-scale pairs with edlib's banded Myers
bit-vector on one core (contrib/edlib/edlib.cpp:161-185); beyond ~32k
bases a single-core wavefront (or a single-TPU-core Pallas program) is
either too slow or too large. Here the wavefront's lane axis (DP row
index i) is sharded over the mesh: each device owns a contiguous slice of
lanes plus a HALO of `halo` lanes to its left, and the diagonal recurrence
runs locally for `halo` steps between collectives.

Correctness of the chunked halo (redundant-compute) scheme: at a chunk
boundary every lane holds exact values for diagonals d-1 and d-2. During
the next t steps, lane k's value is exact iff k >= t (the dependency cone
grows one lane per step), so owned lanes (k >= halo) stay exact for up to
`halo` steps — exactly the chunk length. One ppermute per chunk then
refreshes the halo from the left neighbour's exact owned lanes. Result
capture reads owned lanes only, so every captured value is exact; the
distance is psum-merged (each pair's capture lane is owned by exactly one
device).

Communication: 2 x (B, halo) int32 lanes every `halo` diagonals — rides
ICI under shard_map, O(W/halo) messages total versus per-step neighbour
exchange. Character access is a per-step static-length dynamic slice of
the sentinel-padded reversed text (no gathers in the hot loop).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["sharded_levenshtein"]


def _build_kernel(n_dev: int, axis: str, Wl: int, H: int, Ma: int, Mb: int,
                  n_chunks: int, a_lpad: int, b_lpad: int):
    """Kernel closed over static geometry; runs per device under shard_map."""
    BIG = jnp.int32(Ma + Mb + 1)

    def kernel(a_pad, b_rev_pad, len_a, len_b):
        # a_pad:     (B, a_lpad + n_dev*Wl + 1) sentinel-padded codes
        # b_rev_pad: (B, b_lpad + Mb + b_rpad)  reversed, sentinel-padded
        # len_a/b:   (B,) int32
        r = jax.lax.axis_index(axis)
        k = jnp.arange(Wl + H, dtype=jnp.int32)              # local lane
        i_g = r * Wl - H + k                                  # global lane = DP row i
        la = len_a[:, None]
        lb = len_b[:, None]
        B = len_a.shape[0]

        # Per-lane a character a[i_g - 1] via one static-length slice.
        # a_pad[a_lpad + x] = a[x] (sentinel -1 outside [0, Ma)).
        a_start = a_lpad + r * Wl - H - 1
        a_g = jax.lax.dynamic_slice_in_dim(a_pad, a_start, Wl + H, axis=1)

        invalid_lane = (i_g < 0) | (i_g > Ma)

        # Diagonal d=0 (D[0,0]=0) and d=1 (D[1,0]=D[0,1]=1).
        diag_pp0 = jnp.where((i_g == 0)[None, :], 0, BIG) + (la + lb) * 0
        diag_p0 = jnp.where(((i_g >= 0) & (i_g <= 1))[None, :], 1, BIG) + (la + lb) * 0

        # Degenerate result (la + lb < 2) credited once, by the owner of
        # lane la (owned global lanes of device r: [r*Wl, (r+1)*Wl)).
        owns_la = (la >= r * Wl) & (la < (r + 1) * Wl)
        result0 = jnp.where((la + lb < 2) & owns_la, la + lb, 0)[:, 0]

        owned = (k >= H)[None, :]

        def chunk(carry, c):
            diag_pp, diag_p, result = carry
            d0 = 2 + c * H

            def step(t, inner):
                diag_pp, diag_p, result = inner
                d = d0 + t
                j = d - i_g                                   # (Wl+H,)
                # b[j-1] = b_rev_pad[b_lpad + Mb - d + i_g]; consecutive in
                # k, so one dynamic slice (sentinels land on invalid lanes).
                b_start = b_lpad + Mb - d + (r * Wl - H)
                bj = jax.lax.dynamic_slice_in_dim(
                    b_rev_pad, b_start, Wl + H, axis=1
                )
                cost = (a_g != bj).astype(jnp.int32)
                up = jnp.roll(diag_p, 1, axis=1)              # D[i-1, j]
                diagv = jnp.roll(diag_pp, 1, axis=1)          # D[i-1, j-1]
                cand = jnp.minimum(jnp.minimum(up + 1, diag_p + 1), diagv + cost)
                cand = jnp.where((j == 0)[None, :], i_g[None, :], cand)
                cand = jnp.where((i_g == 0)[None, :], j[None, :], cand)
                bad = invalid_lane[None, :] | (j < 0)[None, :] | (j > Mb)[None, :]
                cand = jnp.where(bad, BIG, cand)

                hit = (la + lb == d) & (i_g[None, :] == la) & owned
                result = result + jnp.sum(jnp.where(hit, cand, 0), axis=1)
                return (diag_p, cand, result)

            diag_pp, diag_p, result = jax.lax.fori_loop(
                0, H, step, (diag_pp, diag_p, result)
            )

            # Halo refresh: my rightmost H owned lanes are the right
            # neighbour's halo. Device 0's halo stays at BIG (i_g < 0).
            send = jnp.stack([diag_p[:, Wl:], diag_pp[:, Wl:]])
            recv = jax.lax.ppermute(
                send, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
            )
            halo_bad = invalid_lane[None, :H]
            diag_p = diag_p.at[:, :H].set(jnp.where(halo_bad, BIG, recv[0]))
            diag_pp = diag_pp.at[:, :H].set(jnp.where(halo_bad, BIG, recv[1]))
            return (diag_pp, diag_p, result), None

        (_, _, result), _ = jax.lax.scan(
            chunk, (diag_pp0, diag_p0, result0),
            jnp.arange(n_chunks, dtype=jnp.int32),
        )
        return jax.lax.psum(result, axis)

    return kernel


@functools.lru_cache(maxsize=16)
def _compiled(n_dev: int, axis: str, Wl: int, H: int, Ma: int, Mb: int,
              n_chunks: int, a_lpad: int, b_lpad: int, mesh_devices):
    mesh = Mesh(np.array(mesh_devices), (axis,))
    kernel = _build_kernel(n_dev, axis, Wl, H, Ma, Mb, n_chunks, a_lpad, b_lpad)
    from jax import shard_map

    fn = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
    )
    return jax.jit(fn)


def sharded_levenshtein(
    seq_a: np.ndarray,
    len_a: np.ndarray,
    seq_b: np.ndarray,
    len_b: np.ndarray,
    mesh: Optional[Mesh] = None,
    halo: int = 128,
) -> np.ndarray:
    """Exact Levenshtein for (a small batch of) very long pairs, the DP
    wavefront sharded over the mesh's first axis.

    seq_a: (B, Ma), seq_b: (B, Mb) integer codes; len_* the true lengths.
    Returns (B,) int32 distances (replicated; equal to the NumPy oracle).
    """
    seq_a = np.asarray(seq_a)
    seq_b = np.asarray(seq_b)
    len_a = np.asarray(len_a, dtype=np.int32)
    len_b = np.asarray(len_b, dtype=np.int32)
    if mesh is None:
        devices = jax.devices()
        mesh = Mesh(np.array(devices), ("wave",))
    axis = mesh.axis_names[0]
    mesh_devices = tuple(mesh.devices.flatten())
    n_dev = len(mesh_devices)

    B, Ma = seq_a.shape
    Mb = seq_b.shape[1]
    # Lane axis: i = 0..Ma, padded to n_dev * Wl with Wl a 128-multiple.
    Wl = ((Ma + 1 + n_dev - 1) // n_dev + 127) // 128 * 128
    H = min(halo, Wl)
    steps = Ma + Mb - 1  # diagonals d = 2 .. Ma+Mb
    n_chunks = (steps + H - 1) // H

    # Sentinel-padded a: index a_lpad + x holds a[x]; slices start as low
    # as a_lpad - H - 1 and end as high as a_lpad + n_dev*Wl - 2 + 1.
    a_lpad = H + 1
    a_buf = np.full((B, a_lpad + n_dev * Wl), -1, dtype=np.int32)
    a_buf[:, a_lpad : a_lpad + Ma] = seq_a
    # Reversed b with sentinels: b_rev_pad[b_lpad + y] = b[Mb - 1 - y].
    # Slice starts span b_lpad + Mb - d + i_g for d in [2, 2 + n_chunks*H)
    # and i_g in [-H, n_dev*Wl): pad left by the max deficit, right by the
    # max overshoot (+ slice width).
    d_max = 2 + n_chunks * H - 1
    b_lpad = max(0, d_max + H)  # covers Mb - d + i_g >= Mb - d_max - H
    b_rpad = n_dev * Wl + H + 2
    b_buf = np.full((B, b_lpad + Mb + b_rpad), -2, dtype=np.int32)
    b_buf[:, b_lpad : b_lpad + Mb] = seq_b[:, ::-1]

    fn = _compiled(
        n_dev, axis, Wl, H, Ma, Mb, n_chunks, a_lpad, b_lpad, mesh_devices
    )
    out = fn(
        jnp.asarray(a_buf), jnp.asarray(b_buf),
        jnp.asarray(len_a), jnp.asarray(len_b),
    )
    return np.asarray(out)
