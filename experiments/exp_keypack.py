"""Fused single-operand key packing A/B (VERDICT r4 #7).

On the small-forest fast preset (17-test mask at Sintel width: 17 +
bit_length(2W-1) = 28 <= 30 bits), the matcher sort is single-operand
with keys ``(code << pb) | pos`` — today ``fused_keys`` emits
``code | sentinel`` and match._pack_keypos adds the pos bits in one XLA
(H, 2W) elementwise pass.  Variant: emit the packed key DIRECTLY from the
Pallas kernel (fused_keys(pack_bits=pb)), skipping that pass.

  baseline : production masked impl (fused keys + XLA _pack_keypos)
  packed   : kernel-packed keys + direct 1-op sort + same detect/emit

Gate: identical decoded support set.  Adopt or dead-end per the number.

Run on the TPU: python experiments/exp_keypack.py
"""
import json
import os
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.infer import (_interior_rows, _pad_rows,
                               _sparsematch_masked_impl,
                               masked_supports_to_numpy)
from opengpc_tpu.match import (MASKED_SENTINEL, SENTINEL_BASE,
                               _detect_pairs_packed, _masked_emit,
                               _pack_ok, _pos_bits, _unpack_keypos)
from opengpc_tpu.ops.fused import fused_keys
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

H, W = 436, 1024
use_pallas = jax.default_backend() == "tpu"

forest = load_forest("forests/defaultZeroForest.txt")
mask17 = make_filter_mask(forest, max_tests=17)
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=128, epipolar_mode=True,
                             capacity=1 << 19)
assert _pack_ok(mask17.num_tests, 2 * W)
PB = _pos_bits(2 * W)
left, right = make_pair(H, W, 16)


def packed_impl(l, r):
    """Kernel-packed single-operand masked pipeline."""
    key = jnp.concatenate([
        fused_keys(l, mask17, settings.gradient_threshold, 0,
                   SENTINEL_BASE, interpret=not use_pallas, pack_bits=PB),
        fused_keys(r, mask17, settings.gradient_threshold, W,
                   SENTINEL_BASE, interpret=not use_pallas, pack_bits=PB),
    ], axis=1)
    key, m = _interior_rows(key)
    packed_s = jax.lax.sort((key,), dimension=1, num_keys=1,
                            is_stable=False)[0]
    key_s, pos_s = _unpack_keypos(packed_s, PB)
    keep, src_x, d = _detect_pairs_packed(key_s, pos_s, W,
                                          settings.disp_high)
    buf, counts = _masked_emit(keep, src_x, d, W, settings.disp_high)
    return (_pad_rows(buf, m, -2, value=MASKED_SENTINEL),
            _pad_rows(counts, m, -1))


def base_impl(l, r):
    return _sparsematch_masked_impl(l, r, mask=mask17, settings=settings,
                                    use_pallas=use_pallas)


# gate: identical decoded sets
bb, bc = jax.jit(base_impl)(left, right)
pb_, pc = jax.jit(packed_impl)(left, right)
want = set(map(tuple, masked_supports_to_numpy(
    bb, bc, settings.disp_high).tolist()))
got = set(map(tuple, masked_supports_to_numpy(
    pb_, pc, settings.disp_high).tolist()))
assert got == want and len(want) > 1000, (len(got), len(want))
print(f"gate ok: packed set == baseline set ({len(want)} supports)",
      file=sys.stderr)

_FAST = os.environ.get("OGPC_EXP_FAST", "") not in ("", "0")


def dep(s, args):
    a, b = args
    a = jax.lax.dynamic_update_slice(
        a, (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape(1, 1), (0, 0))
    return (a, b)


def t(step, n_long=203):
    if _FAST:
        n_long = 4
    return device_time_per_iter(step, (left, right), dep, 3, n_long,
                                repeats=1 if _FAST else 7)


def report(name, sec):
    print(json.dumps({"exp": name, "ms": round(sec * 1e3, 4),
                      "mpix_s": round(2 * H * W / 1e6 / max(sec, 1e-9), 1)}),
          flush=True)


def consume(fn):
    def step(a, b):
        buf, counts = fn(a, b)
        return buf.sum(dtype=jnp.int32) + counts.sum(dtype=jnp.int32)
    return step


report("baseline_xla_pack", t(consume(base_impl)))
report("kernel_pack", t(consume(packed_impl)))
