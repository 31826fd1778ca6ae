"""Fixed-size tiling of full-image inference.

Replaces the reference's split_input/merge_output 10k-pixel python chunking
(utils/general.py:23-50) with a static tile size + padded final tile so every
tile hits the same compiled executable (one XLA program, no retraces).
"""

from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np

import jax
import jax.numpy as jnp


def iter_pixel_tiles(total_pixels: int, tile: int = 10000):
    """Yield (start, size, pad) so that start:start+size tiles cover the image
    and `size + pad == tile` always."""
    for start in range(0, total_pixels, tile):
        size = min(tile, total_pixels - start)
        yield start, size, tile - size


def render_in_tiles(
    render_fn: Callable[[Dict[str, jnp.ndarray]], Dict[str, jnp.ndarray]],
    inputs: Dict[str, np.ndarray],
    total_pixels: int,
    tile: int = 10000,
) -> Dict[str, np.ndarray]:
    """Run a per-tile render function over the full pixel grid.

    ``inputs`` has 'uv' (B, HW, 2) and 'object_mask' (B, HW); other entries
    pass through untouched.  The final tile is padded by repeating the last
    pixel so all invocations share one compiled shape.
    """
    outs: List[Dict[str, np.ndarray]] = []
    uv = inputs["uv"]
    mask = inputs["object_mask"]
    for start, size, pad in iter_pixel_tiles(total_pixels, tile):
        sl = slice(start, start + size)
        uv_t = uv[:, sl]
        mask_t = mask[:, sl]
        if pad:
            uv_t = np.concatenate([uv_t, np.repeat(uv_t[:, -1:], pad, axis=1)], axis=1)
            mask_t = np.concatenate(
                [mask_t, np.repeat(mask_t[:, -1:], pad, axis=1)], axis=1)
        tile_inputs = dict(inputs)
        tile_inputs["uv"] = jnp.asarray(uv_t)
        tile_inputs["object_mask"] = jnp.asarray(mask_t)
        out = render_fn(tile_inputs)
        # outputs are flattened over rays: (tile,) or (tile, C); drop padding
        outs.append({k: np.asarray(v)[:size] for k, v in out.items()})
    merged = {}
    for k in outs[0]:
        merged[k] = np.concatenate([o[k] for o in outs], axis=0)
    return merged
