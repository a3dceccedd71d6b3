"""Run-coalescing row gather — beating the per-row gather latency floor.

TPU gathers cost ~13-30 ns per ROW regardless of width (one descriptor per
row); fusion's dominant index streams (the z-buffer index map, its inverse
slot->pixel map, the projective-ICP pixel lookups) are however 96-100% runs
of consecutive slots, because the map pool is appended in image order
(measured on the bench sequence: aligned 8-blocks exactly consecutive
97-100% of frames). This module fetches each aligned ``seg``-row output
segment (``seg = 128 / width``) with ONE DMA of the aligned (2, 128)-lane
window containing it — ``seg``x fewer descriptors — and realigns lanes with
an exact one-hot matmul on the MXU. Segments not covered by one window
(object boundaries, augment jumps) fall back to one (1, 128) window per row
inside the same kernel, steered by precomputed flags, so the result equals
``src[idx]`` for every valid index.

This is the TPU-native answer to the reference's cache-friendly sequential
model reads in ``examples/fusion.cpp:172-226`` (a CPU core gets the same
win from its cache lines automatically).

Layout requirements: ``src`` is ``(C, 8)`` or ``(C, 16)`` float32 with
``C`` a multiple of ``seg``. Other shapes take the plain XLA gather path.

Negative indices are WILDCARDS: their output rows are unspecified (callers
mask them), which keeps mixed valid/invalid segments on the fast path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NSEGB = 1024     # segments per grid step (SMEM slice alignment unit)
SLOTS = 16       # outstanding DMA window


def _make_kernel(seg):
    def _kernel(wins_ref, rwins_ref, good_ref, src_ref, raw_ref,
                sem, ssem, swin, srwin, sgood):
        i = pl.program_id(0)
        # Stage this block's plan into SMEM (three small aligned copies).
        cps = [
            pltpu.make_async_copy(
                wins_ref.at[pl.ds(i * NSEGB, NSEGB)], swin, ssem.at[0]
            ),
            pltpu.make_async_copy(
                rwins_ref.at[pl.ds(i * NSEGB * seg, NSEGB * seg)],
                srwin,
                ssem.at[1],
            ),
            pltpu.make_async_copy(
                good_ref.at[pl.ds(i * NSEGB, NSEGB)], sgood, ssem.at[2]
            ),
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

        # Rows 2..seg of fast-path segments are never DMA'd; zero the block
        # so stale/uninitialized lanes cannot poison the one-hot
        # realignment (0 * NaN = NaN).
        raw_ref[...] = jnp.zeros(raw_ref.shape, raw_ref.dtype)

        def good_dma(j):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(swin[j], 2), :],
                raw_ref.at[pl.ds(seg * j, 2), :],
                sem.at[j % SLOTS],
            )

        def bad_dma(j, k):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(srwin[seg * j + k], 1), :],
                raw_ref.at[pl.ds(seg * j + k, 1), :],
                sem.at[j % SLOTS],
            )

        def issue(j):
            @pl.when(sgood[j] != 0)
            def _():
                good_dma(j).start()

            @pl.when(sgood[j] == 0)
            def _():
                def one(k, c):
                    bad_dma(j, k).start()
                    return c

                jax.lax.fori_loop(0, seg, one, 0)

        def finish(j):
            @pl.when(sgood[j] != 0)
            def _():
                good_dma(j).wait()

            @pl.when(sgood[j] == 0)
            def _():
                def one(k, c):
                    bad_dma(j, k).wait()
                    return c

                jax.lax.fori_loop(0, seg, one, 0)

        def body(j, c):
            @pl.when(j >= SLOTS)
            def _():
                finish(j - SLOTS)

            issue(j)
            return c

        jax.lax.fori_loop(0, NSEGB, body, 0)

        def drain(j, c):
            finish(NSEGB - SLOTS + j)
            return c

        jax.lax.fori_loop(0, SLOTS, drain, 0)

    return _kernel


@partial(jax.jit, static_argnames=("seg", "interpret"))
def _window_fetch(src128, wins, rwins, good, *, seg, interpret=False):
    nseg = wins.shape[0]
    grid = nseg // NSEGB
    # Inside a shard_map(check_vma=True) body the output must declare how it
    # varies over mesh axes: it varies exactly like the union of the inputs.
    vma = frozenset()
    for o in (src128, wins, rwins, good):
        vma |= frozenset(getattr(jax.typeof(o), "vma", ()) or ())
    return pl.pallas_call(
        _make_kernel(seg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid,),
            in_specs=[
                # Plan arrays stay in HBM; the kernel DMA-stages each grid
                # step's aligned slice into SMEM scratch (whole-array SMEM
                # inputs would not fit scalar memory).
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (seg * NSEGB, LANES),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((SLOTS,)),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SMEM((NSEGB,), jnp.int32),
                pltpu.SMEM((NSEGB * seg,), jnp.int32),
                pltpu.SMEM((NSEGB,), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (seg * nseg, LANES), src128.dtype, vma=vma
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(wins, rwins, good, src128)


def _plan(idx, c, seg):
    """Vectorized coalescing plan. Returns (wins, rwins, good, code) —
    per-segment window starts (in 128-lane rows), per-row fallback window
    starts, per-segment fast-path flags, and the per-row one-hot
    realignment code in [0, seg*seg)."""
    nseg = idx.shape[0] // seg
    blk = idx.reshape(nseg, seg)
    valid = blk >= 0
    big = jnp.where(valid, blk, jnp.int32(2 ** 30))
    lo = jnp.min(big, axis=1)
    any_valid = valid.any(axis=1)
    lo = jnp.where(any_valid, lo, 0)
    hi = jnp.max(jnp.where(valid, blk, -1), axis=1)
    wins = jnp.clip(lo // seg, 0, c // seg - 2)
    # Segment rides the fast path iff every valid row falls inside the
    # (2, 128) window at wins (2*seg pool rows).
    good = hi < (wins + 2) * seg
    # Fallback per-row windows (one (1, 128) row each).
    safe = jnp.clip(blk, 0, c - 1)
    rwins = safe // seg  # (nseg, seg)
    # Realign codes: d = raw_row * seg + lane_group; raw rows laid out per
    # segment as [2 window rows, ...] (good) or [seg single rows] (bad).
    d_good = jnp.clip(safe - wins[:, None] * seg, 0, 2 * seg - 1)
    r_bad = jnp.broadcast_to(jnp.arange(seg, dtype=jnp.int32), blk.shape)
    d_bad = r_bad * seg + (safe % seg)
    code = jnp.where(good[:, None], d_good, d_bad)       # (nseg, seg)
    return (
        wins.astype(jnp.int32),
        rwins.reshape(-1).astype(jnp.int32),
        good.astype(jnp.int32),
        code.astype(jnp.int32),
    )


@partial(jax.jit, static_argnames=("interpret",))
def coalesced_gather(
    src: jax.Array, idx: jax.Array, *, interpret: bool | None = None
) -> jax.Array:
    """``src[idx]`` with run-coalesced DMA fetches.

    ``src``: (C, 8) or (C, 16) float32 with C % (128/width) == 0 and
    C >= 2 * (128/width) (the kernel's window unit); other shapes take the
    plain XLA gather path.
    ``idx``: (N,) int32; negative entries are wildcards (unspecified output
    rows). Exact for all non-negative indices regardless of contiguity;
    fast when the stream is mostly runs.

    ``interpret=None`` (default) selects the Mosaic kernel on TPU backends
    and the Pallas interpreter elsewhere (CPU tests, any future non-TPU
    backend) — call sites need no backend probe.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, w = src.shape
    n = idx.shape[0]
    # Pallas' HLO interpreter cannot propagate varying-manual-axes through
    # kernel-internal dynamic_slice (JAX limitation under
    # shard_map(check_vma=True)); inside a checked shard_map body the
    # CPU/interpret path takes the plain gather instead. The Mosaic TPU
    # path is unaffected (kernel exactness is covered by tests and the
    # sharded results are asserted bit-identical either way).
    from .vma import operand_vma

    if interpret and operand_vma(src, idx):
        return src[jnp.clip(idx, 0, c - 1)]
    if w not in (8, 16) or LANES % w or c % (LANES // w) \
            or c < 2 * (LANES // w) or src.dtype != jnp.float32:
        return src[jnp.clip(idx, 0, c - 1)]
    seg = LANES // w

    block_rows = seg * NSEGB
    n_pad = (-n) % block_rows
    idx_p = jnp.concatenate(
        [idx, jnp.zeros((n_pad,), jnp.int32)]
    ) if n_pad else idx
    nseg = idx_p.shape[0] // seg

    wins, rwins, good, code = _plan(idx_p, c, seg)
    src128 = src.reshape(c // seg, LANES)
    raw = _window_fetch(src128, wins, rwins, good, seg=seg,
                        interpret=interpret)
    # Exact one-hot lane realignment on the MXU: out[s, k] = the w-float
    # block d = code[s, k] of the segment's raw region (seg rows of 128
    # lanes = seg*seg blocks of w).
    rawb = raw.reshape(nseg, seg * seg, w)
    onehot = (
        code[..., None] == jnp.arange(seg * seg, dtype=jnp.int32)
    ).astype(src.dtype)                          # (nseg, seg, seg*seg)
    out = jnp.einsum(
        "skd,sdw->skw", onehot, rawb,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(-1, w)[:n]
