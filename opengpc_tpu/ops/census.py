"""Dense 5x5 census transform (optional extra op).

Parity target: the reference's census5x5Naive
(/root/reference/lib/gpc/filter.hpp:692-712) — 24-bit codes, bit i set iff
neighbor > center, neighbors scanned px-major (-2..2) skipping the center;
valid for y in [2, h-4] (all-x in the reference modulo wrap pixels; here
x in [2, w-3] where the window is fully in-bounds).  Dead code in the
reference (never called by any sample) but kept as a supported op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def census5x5(img: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape
    pad = 2
    padded = jnp.pad(img.astype(jnp.int16), pad)
    center = img.astype(jnp.int16)
    code = jnp.zeros((h, w), jnp.int32)
    bit = 0
    for px in range(-2, 3):
        for py in range(-2, 3):
            if px == 0 and py == 0:
                continue
            nb = jax.lax.slice(padded, (pad + py, pad + px), (pad + py + h, pad + px + w))
            code = code | jnp.where(nb > center, jnp.int32(1 << bit), 0)
            bit += 1
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    valid = (ys >= 2) & (ys <= h - 4) & (xs >= 2) & (xs <= w - 3)
    return jnp.where(valid, code, 0)
