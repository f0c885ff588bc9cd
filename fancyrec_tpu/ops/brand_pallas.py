"""Pallas TPU kernel: fused brand-aspect dropout + mean.

The brand tower (reference model.py:406-428,594) computes
    out_bc = mean_a( dropout( w_ba * asp_ac ) )
i.e. elementwise dropout on the (B, A=2000, C=1024) outer product of the
per-brand aspect weights and the shared aspect matrix, then a mean over
the aspect axis. At recipe scale that intermediate is 131M elements per
64-post batch: XLA's lowering pays threefry RNG for every element
(~3.4 ms forward at B=64 on v5e-1) and saves the 131 MB mask as an
autodiff residual that the backward pass re-reads.

This kernel never materializes the product or the mask: it streams
(batch-block, aspect-block) tiles through VMEM, draws the mask from the
TPU hardware PRNG, and accumulates the masked contraction on the fly.
The backward kernel REPLAYS the identical PRNG stream (the seed is a
pure function of the tile ids, so iteration order does not matter)
instead of loading a stored mask, so the only HBM traffic in either
direction is the inputs/outputs themselves.

Numerics: inverted dropout, mask = (random uint32 <= thr) with
thr = keep * 2^32 - 1, scaled by 1/(A*keep) -- Bernoulli(keep) exactly
for keep = k/2^32. The TPU stream differs from jax.random's threefry
stream (dropout patterns are different random draws, same distribution);
runs remain bit-reproducible for a fixed seed. Off-TPU callers must use
the XLA path (the hardware PRNG has no interpreter-mode lowering);
models fall back automatically (models/brand.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_A_BLOCK = 128
_B_BLOCK = 64
_CHUNK = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _mask(shape, thr):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits <= thr


def _tile_seed(seed_ref, i, j, na):
    # seed is a pure function of the (batch, aspect) tile ids: the
    # backward kernel replays the identical stream regardless of its own
    # grid iteration order. Two seed words keep the effective key space
    # at 64 bits -- with one word, steps whose base seeds differ by less
    # than the tile count would reuse shifted mask streams.
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + i * na + j)


def _fwd_kernel(seed_ref, thr_ref, scale_ref, w_ref, asp_ref, out_ref):
    """grid = (batch_blocks, aspect_blocks); out accumulates over j."""
    i, j = pl.program_id(0), pl.program_id(1)
    _tile_seed(seed_ref, i, j, pl.num_programs(1))

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    thr = thr_ref[0]
    acc = out_ref[:]
    for c in range(_A_BLOCK // _CHUNK):
        sl = slice(c * _CHUNK, (c + 1) * _CHUNK)
        w_c = w_ref[:, sl]                        # (Bblk, CHUNK)
        asp_c = asp_ref[sl, :]                    # (CHUNK, C)
        prod = w_c[:, :, None] * asp_c[None]      # (Bblk, CHUNK, C)
        m = _mask(prod.shape, thr)
        acc = acc + jnp.sum(jnp.where(m, prod, 0.0), axis=1)
    out_ref[:] = acc

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = out_ref[:] * scale_ref[0]


def _bwd_kernel(seed_ref, thr_ref, scale_ref, w_ref, asp_ref, g_ref,
                dw_ref, dasp_ref):
    """grid = (aspect_blocks, batch_blocks): dasp (indexed by the outer
    aspect block) stays VMEM-resident while the inner batch loop
    accumulates into it; dw tiles are written once each."""
    j, i = pl.program_id(0), pl.program_id(1)
    _tile_seed(seed_ref, i, j, pl.num_programs(0))

    @pl.when(i == 0)
    def _():
        dasp_ref[:] = jnp.zeros_like(dasp_ref)

    thr = thr_ref[0]
    scale = scale_ref[0]
    g = g_ref[:]                                   # (Bblk, C)
    dasp_deltas = []
    for c in range(_A_BLOCK // _CHUNK):
        sl = slice(c * _CHUNK, (c + 1) * _CHUNK)
        w_c = w_ref[:, sl]                         # (Bblk, CHUNK)
        asp_c = asp_ref[sl, :]                     # (CHUNK, C)
        # PRNG replay: identical draw order to the forward kernel's tile
        m = _mask((w_c.shape[0], _CHUNK, asp_c.shape[1]), thr)
        mg = jnp.where(m, g[:, None, :], 0.0)      # (Bblk, CHUNK, C)
        dw_ref[:, sl] = jnp.sum(mg * asp_c[None], axis=2) * scale
        dasp_deltas.append(jnp.sum(mg * w_c[:, :, None], axis=0) * scale)
    dasp_ref[:] = dasp_ref[:] + jnp.concatenate(dasp_deltas, axis=0)


def _prep(w, asp, keep):
    b, a = w.shape
    c = asp.shape[1]
    bp = _round_up(max(b, 8), 8)
    bblk = _B_BLOCK if bp >= _B_BLOCK else bp
    bp = _round_up(bp, bblk)
    ap = _round_up(a, _A_BLOCK)
    w_p = jnp.pad(w.astype(jnp.float32), ((0, bp - b), (0, ap - a)))
    asp_p = jnp.pad(asp.astype(jnp.float32), ((0, ap - a), (0, 0)))
    thr = jnp.asarray(
        [min(int(keep * 2 ** 32) - 1, 2 ** 32 - 1)], jnp.uint32)
    scale = jnp.asarray([1.0 / (a * keep)], jnp.float32)
    return w_p, asp_p, thr, scale, bp, bblk, ap, b, a, c


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def aspect_dropout_mean(w, asp, seed, keep: float = 0.5):
    """mean over aspects of dropout(w[:, :, None] * asp[None]), fused.

    w: (B, A) aspect weights, asp: (A, C) aspect matrix, seed: (2,) int32
    PRNG seed words (derive from the flax dropout rng), keep: keep
    probability.
    Returns (B, C) f32. TPU only -- callers fall back to the XLA path
    off-TPU or under a multi-device mesh.
    """
    return _fwd_impl(w, asp, seed, keep)


def _fwd_impl(w, asp, seed, keep):
    w_p, asp_p, thr, scale, bp, bblk, ap, b, a, c = _prep(w, asp, keep)
    grid = (bp // bblk, ap // _A_BLOCK)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bblk, _A_BLOCK), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_A_BLOCK, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bblk, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(seed.astype(jnp.int32), thr, scale, w_p, asp_p)
    return out[:b]


def _adm_fwd(w, asp, seed, keep):
    return _fwd_impl(w, asp, seed, keep), (w, asp, seed)


def _adm_bwd(keep, res, g):
    w, asp, seed = res
    w_p, asp_p, thr, scale, bp, bblk, ap, b, a, c = _prep(w, asp, keep)
    g_p = jnp.pad(g.astype(jnp.float32), ((0, bp - b), (0, 0)))
    grid = (ap // _A_BLOCK, bp // bblk)
    dw_p, dasp_p = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bblk, _A_BLOCK), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_A_BLOCK, c), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, c), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bblk, _A_BLOCK), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_A_BLOCK, c), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, ap), jnp.float32),
            jax.ShapeDtypeStruct((ap, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(seed.astype(jnp.int32), thr, scale, w_p, asp_p, g_p)
    dw = dw_p[:b, :a].astype(w.dtype)
    dasp = dasp_p[:a].astype(asp.dtype)
    return dw, dasp, None


aspect_dropout_mean.defvjp(_adm_fwd, _adm_bwd)
