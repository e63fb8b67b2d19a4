"""Shape-stable interpolation ops for ViLT's visual path.

HF's ``ViltEmbeddings.visual_embed`` (modeling_vilt.py:94-180) interpolates the
pretrained 12x12 patch position-embedding grid to each image's *own* valid
patch extent (h_i, w_i) with ``F.interpolate(mode="bilinear",
align_corners=True)`` and zero-pads to the batch grid — a data-dependent-shape
loop over the batch that cannot be traced by XLA.

TPU-native reformulation: output shape is always the static (H', W') grid;
source coordinates are *computed from traced* (h_i, w_i), so only values — not
shapes — depend on the data.  Positions beyond the valid extent are zeroed,
matching HF's ``F.pad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpolate_pos_grid(grid: jax.Array, h: jax.Array, w: jax.Array,
                         out_h: int, out_w: int) -> jax.Array:
    """Align-corners bilinear resize of a (G, G, C) grid to per-image (h_i, w_i)
    extents, zero-padded on a static (out_h, out_w) canvas.

    Args:
      grid: (G, G, C) pretrained position-embedding grid.
      h, w: (B,) int32 valid extents per image (1 <= h_i <= out_h).
      out_h, out_w: static output grid size.

    Returns:
      (B, out_h, out_w, C) float array; zeros outside [0,h_i) x [0,w_i).
    """
    g = grid.shape[0]
    hf = h.astype(jnp.float32)[:, None, None]
    wf = w.astype(jnp.float32)[:, None, None]

    r = jax.lax.broadcasted_iota(jnp.float32, (1, out_h, out_w), 1)
    c = jax.lax.broadcasted_iota(jnp.float32, (1, out_h, out_w), 2)

    # align_corners=True: src = dst * (src_size - 1) / (dst_size - 1)
    sy = jnp.where(hf > 1, r * (g - 1) / jnp.maximum(hf - 1, 1), 0.0)
    sx = jnp.where(wf > 1, c * (g - 1) / jnp.maximum(wf - 1, 1), 0.0)
    sy = jnp.clip(sy, 0.0, g - 1)
    sx = jnp.clip(sx, 0.0, g - 1)

    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, g - 1)
    x1 = jnp.minimum(x0 + 1, g - 1)
    wy = (sy - y0.astype(jnp.float32))[..., None]
    wx = (sx - x0.astype(jnp.float32))[..., None]

    v00 = grid[y0, x0]  # (B, out_h, out_w, C) via advanced-index gather
    v01 = grid[y0, x1]
    v10 = grid[y1, x0]
    v11 = grid[y1, x1]

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy

    valid = ((r < hf) & (c < wf))[..., None]
    return jnp.where(valid, out, 0.0).astype(grid.dtype)


def downsample_mask_nearest(mask: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Torch ``F.interpolate(mode='nearest')`` downsample of a (B, H, W) {0,1}
    mask to (B, out_h, out_w): src_idx = floor(dst_idx * in/out)."""
    in_h, in_w = mask.shape[-2:]
    ri = jnp.floor(jnp.arange(out_h, dtype=jnp.float32) * (in_h / out_h)).astype(jnp.int32)
    ci = jnp.floor(jnp.arange(out_w, dtype=jnp.float32) * (in_w / out_w)).astype(jnp.int32)
    return mask[:, ri][:, :, ci]
