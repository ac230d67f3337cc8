"""Fused Pallas TPU kernel for FAST-9/16 corner score + 3x3 nonmax.

The pure-jnp path (ops/fast.py) materializes a (16, H, W) circle stack and
~100 shifted intermediates in HBM per pyramid level; under XLA these fuse
only partially, so the op is HBM-bandwidth bound. This kernel keeps one
row-slab of the image resident in VMEM and produces the nonmax-suppressed
score map in a single pass: HBM traffic drops to ~2x the image size
(read slab + write scores) regardless of how many shifted views the math
uses. Replaces the per-cell cv::FAST of the reference
(src/ORBextractor.cc:607-614) on the TPU compute path.

Semantics are identical to ops/fast.py `detect` (which remains the oracle
and the CPU fallback): OpenCV FAST_9_16 corner score (max threshold at
which the segment test still passes, minus 1) with strict 3x3 nonmax.

Arc-min trick: the min over each of the 16 contiguous 9-arcs is computed
with doubling (min over 2, 4, 8, then 8+1) — 64 `minimum`s per polarity
instead of 16x9.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import CIRCLE_OFFSETS

TILE_H = 64  # output rows per grid step
HALO = 8     # 3 (circle) + 1 (nonmax) on each side


def _arc9_max(diffs: list[jax.Array]) -> jax.Array:
    """max over the 16 starts of (min over the 9-long contiguous arc)."""
    m2 = [jnp.minimum(diffs[i], diffs[(i + 1) % 16]) for i in range(16)]
    m4 = [jnp.minimum(m2[i], m2[(i + 2) % 16]) for i in range(16)]
    m8 = [jnp.minimum(m4[i], m4[(i + 4) % 16]) for i in range(16)]
    m9 = [jnp.minimum(m8[i], diffs[(i + 8) % 16]) for i in range(16)]
    out = m9[0]
    for m in m9[1:]:
        out = jnp.maximum(out, m)
    return out


def _fast_kernel(threshold: float, t_rows: int, p_ref, out_ref, slab, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        p_ref.at[pl.ds(i * t_rows, t_rows + HALO), :], slab, sem
    )
    cp.start()
    cp.wait()

    wq = out_ref.shape[1]
    th, sh = t_rows + 2, wq + 2  # score block: out block + 1px nonmax ring

    def sl(dy, dx):
        # score-block-aligned slice of the slab at circle offset (dy, dx):
        # score row r (block-local) reads slab row r + 3 + dy.
        return slab[3 + dy : 3 + dy + th, 3 + dx : 3 + dx + sh]

    center = sl(0, 0)
    bright = [sl(dy, dx) - center for dy, dx in CIRCLE_OFFSETS]
    dark = [-d for d in bright]
    maxv = jnp.maximum(_arc9_max(bright), _arc9_max(dark))
    score = jnp.where(maxv > threshold, maxv - 1.0, 0.0)

    # strict 3x3 nonmax on the interior (t_rows, wq) window
    c = score[1 : 1 + t_rows, 1 : 1 + wq]
    neigh = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0):
                continue
            n = score[1 + dy : 1 + dy + t_rows, 1 + dx : 1 + dx + wq]
            neigh = n if neigh is None else jnp.maximum(neigh, n)
    out_ref[:] = jnp.where((c > neigh) & (c > 0), c, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_detect_tpu(
    img: jax.Array, threshold: float, interpret: bool = False
) -> jax.Array:
    """Nonmax-suppressed FAST-9/16 score map, (H, W) f32 -> (H, W) f32.

    The image is zero-padded by 4 on every side (plus lane/slab alignment);
    zero padding can only create corners *inside the pad*, which the crop
    removes, and cannot suppress interior maxima the reference would keep
    because callers mask a >= 19px border anyway (EDGE_THRESHOLD).
    """
    # with threshold <= 0 the zero-pad ring could score nonzero and diverge
    # from the jnp oracle's -inf nonmax padding; real FAST thresholds are >= 7
    assert threshold > 0, f"FAST threshold must be positive, got {threshold}"
    h, w = img.shape
    wq = -(-w // 128) * 128          # output width, lane-aligned
    wp = wq + 128                    # slab width: 4px halo each side, then
                                     # padded to the 128 lane tiling (DMA
                                     # slices must be lane-aligned)
    n_tiles = -(-h // TILE_H)
    hp = n_tiles * TILE_H + HALO
    padded = jnp.zeros((hp, wp), img.dtype)
    padded = jax.lax.dynamic_update_slice(padded, img, (4, 4))

    out = pl.pallas_call(
        functools.partial(_fast_kernel, threshold, TILE_H),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (TILE_H, wq), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_H, wq), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return out[:h, :w]
