"""Dense leaf-code extraction.

The reference's hot kernel (gpcFilter/gpcFilterTau,
/root/reference/lib/gpc/filter.hpp:237-282, 547-683) evaluates <=32
pixel-pair tests per candidate pixel and packs the bits into a 32-bit
leaf code.  TPU-first recast: compute codes for *every* pixel as 2*T
statically shifted image slices (offsets are compile-time constants baked
from the forest, like the reference's width-specific FilterMask), compare,
and shift-accumulate.  Invalid pixels are masked downstream — dense masked
compute beats gather on TPU.

Bit order follows the scalar contract (gpcFilterNaive filter.hpp:243-251):
test 0 lands at the MSB of the T-bit code.  Tau semantics are the naive
integer form ``img[p+i] > img[p+j] - tau`` (filter.hpp:274-279), *not* the
SSE path's saturating-subtract variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from opengpc_tpu.forest import FilterMask, PATCH_HALF


def leaf_codes(smooth: jnp.ndarray, mask: FilterMask) -> jnp.ndarray:
    """Compute the (h, w) int32 leaf-code image of a smoothed uint8 image.

    Codes are meaningful where the 27x27 patch fits (margin >= 13);
    callers combine with :func:`opengpc_tpu.ops.candidate_mask`.
    """
    h, w = smooth.shape
    pad = PATCH_HALF
    padded = jnp.pad(smooth.astype(jnp.int16), pad)

    def window(dy: int, dx: int) -> jnp.ndarray:
        return jax.lax.slice(padded, (pad + dy, pad + dx), (pad + dy + h, pad + dx + w))

    code = jnp.zeros((h, w), jnp.int32)
    i_off = np.asarray(mask.i_off)
    j_off = np.asarray(mask.j_off)
    tau = np.asarray(mask.tau)
    for t in range(mask.num_tests):
        a = window(int(i_off[t, 0]), int(i_off[t, 1]))
        b = window(int(j_off[t, 0]), int(j_off[t, 1]))
        bit = (a > b - jnp.int16(tau[t])).astype(jnp.int32)
        code = code * 2 + bit  # test t at bit (T-1-t): test 0 ends at MSB
    return code
