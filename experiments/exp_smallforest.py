"""Small-forest single-operand matcher sort: does packing pos INTO the key
pay when codes are small enough?

The matcher sort carries (key, pos) — two int32 operands — because a
30-test code plus an 11-bit position cannot share one int32.  But a forest
with <= 17 tests leaves room: packed = code * 2W + pos < 2^28, sentinels at
2^29 + pos stay unique and above every valid packed key, and pos/code are
recovered with a shift/mask after the sort.  The measured 1-op vs 2-op
delta on the flat global sort was 0.47 vs 0.82 ms (README ledger); this
measures the per-row epipolar analog on the SHIPPED masked pipeline:

  A) the 2-op path: match_epipolar_masked with num_tests=None
  B) the SHIPPED 1-op path: match_epipolar_masked with num_tests=17
     (match._sort_key_pos packs pos into the key — adopted r4; the
     builders thread mask.num_tests automatically)

Support sets asserted equal (the detect/emit code is shared, only the
sort differs).  Run: python experiments/exp_smallforest.py
"""
import functools
import json
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.infer import (_interior_rows, _key_image, _pad_rows,
                               masked_supports_to_numpy)
from opengpc_tpu.match import MASKED_SENTINEL, match_epipolar_masked
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

H, W, DISP = 436, 1024, 7


def packed_masked(key, disp_high, w):
    """Variant B: the SHIPPED single-operand path (num_tests=17)."""
    return match_epipolar_masked(None, None, None, None, disp_high,
                                 key=key, num_tests=17)


def main():
    use_pallas = jax.default_backend() == "tpu"
    # 17-test mask: the pretrained forest truncated by the reference's own
    # file-order cap rule
    mask = make_filter_mask(load_forest("forests/defaultZeroForest.txt"),
                            max_tests=17)
    assert mask.num_tests == 17
    settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                                 disp_high=128, epipolar_mode=True,
                                 capacity=1 << 19)
    left, right = make_pair(H, W, DISP, seed=11)

    def key_image(l, r):
        return _key_image(l, r, mask, settings, use_pallas)

    def dep(s, args):
        a, b = args
        upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape(1, 1)
        a = jax.lax.dynamic_update_slice(a, upd, (0, 0))
        return (a, b)

    def step_2op(a, b):
        key, m = _interior_rows(key_image(a, b))
        buf, counts = match_epipolar_masked(None, None, None, None,
                                            settings.disp_high, key=key)
        return buf.sum(dtype=jnp.int32) + counts.sum(dtype=jnp.int32)

    def step_1op(a, b):
        key, m = _interior_rows(key_image(a, b))
        buf, counts = packed_masked(key, settings.disp_high, W)
        return buf.sum(dtype=jnp.int32) + counts.sum(dtype=jnp.int32)

    # parity gate before timing
    key0, m0 = _interior_rows(jax.jit(key_image)(left, right))
    key0 = jnp.asarray(key0)
    want = masked_supports_to_numpy(
        *(np.asarray(_pad_rows(o, m0, pad, value=v)) for o, pad, v in zip(
            jax.jit(functools.partial(match_epipolar_masked,
                                      disp_high=settings.disp_high))(
                None, None, None, None, key=key0),
            (-2, -1), (MASKED_SENTINEL, 0))),
        settings.disp_high)
    got = masked_supports_to_numpy(
        *(np.asarray(_pad_rows(o, m0, pad, value=v)) for o, pad, v in zip(
            jax.jit(functools.partial(packed_masked,
                                      disp_high=settings.disp_high, w=W))(
                key0),
            (-2, -1), (MASKED_SENTINEL, 0))),
        settings.disp_high)
    sw, sg = set(map(tuple, want.tolist())), set(map(tuple, got.tolist()))
    assert sw == sg and len(sw) > 1000, (len(sw), len(sg))
    print(json.dumps({"exp": "parity", "supports": len(sw)}), flush=True)

    for name, step in (("masked_2op_sort", step_2op),
                       ("masked_1op_packed_sort", step_1op)):
        sec = device_time_per_iter(step, (left, right), dep, 3, 43,
                                   repeats=5)
        print(json.dumps({"exp": name, "ms": round(sec * 1e3, 3),
                          "mpix_s": round(2 * H * W / 1e6 / sec, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
