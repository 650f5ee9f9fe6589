"""Roofline experiments for the matcher sort (VERDICT round-1 item 2).

Run ON TPU:  python experiments/exp_sort.py
Every number printed is device time per iteration via
utils.device_time_per_iter (chained fori_loop differencing — wall-clocking
single dispatches through the axon relay measures the tunnel, not the chip).

Measures, on the Sintel-sized bench pair (436x1024, defaultZeroForest):

  A. isolated per-row sorts of the (436, 2048) key image:
     1-operand vs 2-operand lax.sort, stable vs unstable, plus the
     hypothetical sort at half width (what per-row candidate compaction
     would buy IF density allowed — it does not: measured candidate
     density is ~0.79 with row max ~900/1024, so the next-pow2 of a
     2048-wide candidate row is still 2048; see README)
  B. the full sparsematch pipeline, stable vs unstable packed sort
     (support sets asserted identical)
  C. per-row candidate compaction + sort at the SAME width (isolates pure
     compaction overhead — the only regime available at bench density)
  D. an MXU-based non-comparison collision counter prototype (per-row
     pairwise hamming-distance==0 counts via bit-plane matmuls) — the
     "histogram/matmul detector" alternative

Results are printed as one JSON line per measurement.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.infer import _sparsematch_impl, supports_to_numpy
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

H, W = 436, 1024
TRUE_DISP = 16


def report(name, seconds, note=""):
    print(json.dumps({"exp": name, "ms": round(seconds * 1e3, 4),
                      "note": note}), flush=True)


def dep_xor(s, args):
    """Fold a scalar into the first arg so chained iterations can't fuse."""
    a = list(args)
    a[0] = a[0].at[0, 0].set(
        (a[0][0, 0] ^ s.astype(a[0].dtype)) & jnp.array(1, a[0].dtype)
        | (a[0][0, 0] & ~jnp.array(1, a[0].dtype))
    )
    return tuple(a)


def time_fn(step, args, n_short=3, n_long=43):
    return device_time_per_iter(step, args, dep_xor, n_short, n_long,
                                repeats=5)


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    left, right = make_pair(H, W, TRUE_DISP)
    forest = load_forest("forests/defaultZeroForest.txt")
    mask = make_filter_mask(forest)
    settings = InferenceSettings(
        gradient_threshold=5, vertical_tolerance=0, disp_high=128,
        epipolar_mode=True, capacity=1 << 19,
    )
    use_pallas = jax.default_backend() == "tpu"

    rng = np.random.default_rng(0)
    key_img = rng.integers(0, 1 << 30, size=(H, 2 * W), dtype=np.int32)
    key_dev = jnp.asarray(key_img)
    pos = jnp.broadcast_to(jnp.arange(2 * W, dtype=jnp.int32)[None], (H, 2 * W))

    # --- A: isolated sorts --------------------------------------------
    for stable in (True, False):
        s = time_fn(
            lambda k: jax.lax.sort((k,), dimension=1, num_keys=1,
                                   is_stable=stable)[0].sum(),
            (key_dev,),
        )
        report(f"sort1_{'stable' if stable else 'unstable'}", s,
               "(436,2048) int32, key only")
        s = time_fn(
            lambda k: sum(
                o.sum() for o in jax.lax.sort(
                    (k, pos), dimension=1, num_keys=1, is_stable=stable)
            ),
            (key_dev,),
        )
        report(f"sort2_{'stable' if stable else 'unstable'}", s,
               "(436,2048) int32, key+payload")

    half = key_dev[:, :W]
    pos_h = pos[:, :W]
    s = time_fn(
        lambda k: sum(
            o.sum() for o in jax.lax.sort(
                (k, pos_h), dimension=1, num_keys=1, is_stable=False)
        ),
        (half,),
    )
    report("sort2_unstable_halfwidth", s,
           "(436,1024): what compaction to W/2 WOULD buy if density allowed")

    # --- B: full pipeline ---------------------------------------------
    def step(l, r):
        return _sparsematch_impl(l, r, mask=mask, settings=settings,
                                 use_pallas=use_pallas)[3]

    def make_dep(count, args):
        l, r = args
        l = jax.lax.dynamic_update_slice(
            l, (count & 1).astype(jnp.uint8).reshape(1, 1), (0, 0))
        return (l, r)

    s = device_time_per_iter(step, (left, right), make_dep, 3, 43, repeats=5)
    mpix = 2 * H * W / 1e6 / s
    report("pipeline_packed", s, f"{mpix:.0f} Mpix/s (current default)")

    supp = supports_to_numpy(*jax.jit(
        lambda l, r: _sparsematch_impl(l, r, mask=mask, settings=settings,
                                       use_pallas=use_pallas))(left, right))
    acc = float((supp[:, 2] == TRUE_DISP).mean())
    print(f"supports: {len(supp)}, true-d acc {acc:.4f}", file=sys.stderr)
    assert acc > 0.99

    # --- C: compaction overhead at equal width -------------------------
    def compact_then_sort(k):
        valid = k < (1 << 29)  # ~50% of random keys, stands in for the mask
        within = jnp.cumsum(valid.astype(jnp.int32), axis=1)
        dest = jnp.where(valid, within - 1, 2 * W)
        buf = jnp.full((H, 2 * W + 1), 0x7F000000, jnp.int32)
        buf = buf.at[jnp.arange(H)[:, None], dest].set(k, mode="drop")
        packed = buf[:, : 2 * W] + jnp.arange(2 * W, dtype=jnp.int32)[None] * 0
        srt = jax.lax.sort((packed, pos), dimension=1, num_keys=1,
                           is_stable=False)
        return sum(o.sum() for o in srt)

    s = time_fn(compact_then_sort, (key_dev,))
    report("compact_plus_sort2_unstable", s,
           "per-row cumsum+scatter compaction then same-width sort: "
           "compaction overhead = this minus sort2_unstable")

    # --- D: MXU hamming-count prototype --------------------------------
    # counts[i] = #j with code_j == code_i, via hamming(i,j) =
    # |x_i| + |y_j| - 2<x_i, y_j> over 30 bit-planes, == 0.
    # One (2W x 30) @ (30 x 2W) matmul per row + a (2W, 2W) compare/reduce.
    # FLOP-bound estimate at bf16: ~117 GFLOP for all rows.
    nbits = 30

    def hamming_counts(codes):  # (H, 2W) int32 -> (H, 2W) counts
        bits = ((codes[..., None] >> jnp.arange(nbits, dtype=jnp.int32)) & 1
                ).astype(jnp.bfloat16)  # (H, 2W, 30)

        def per_row(b):  # (2W, 30)
            popc = b.sum(axis=1, dtype=jnp.float32)  # |x_i|
            gram = jax.lax.dot_general(
                b, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # <x_i, x_j>
            ham = popc[:, None] + popc[None, :] - 2.0 * gram
            return (ham < 0.5).sum(axis=1).astype(jnp.int32)

        return jax.lax.map(per_row, bits, batch_size=16)

    s = time_fn(lambda k: hamming_counts(k & ((1 << nbits) - 1)).sum(),
                (key_dev,))
    report("mxu_hamming_counts", s,
           "per-row equal-code counts via bit-plane matmuls (counts only; "
           "a full matcher still needs pair recovery on top)")


if __name__ == "__main__":
    main()
