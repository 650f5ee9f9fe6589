"""Round 2 of the sort-roofline experiments: position-recovery primitives
and pipeline stage breakdown.  Run ON TPU.  See exp_sort.py for method.

Questions:
  1. how much of the 0.60 ms pipeline is codes/key-build/sort/pair+compact?
  2. is a per-row gather (take_along_axis) cheap enough to support a
     searchsorted-based position recovery after a key-only sort
     (sort1_unstable 0.13 ms vs sort2_unstable 0.30 ms)?
  3. does an int16 payload sort cheaper than int32?
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.infer import _codes_and_candidates
from opengpc_tpu.match import SENTINEL_BASE, compact
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

H, W = 436, 1024
TRUE_DISP = 16


def report(name, seconds, note=""):
    print(json.dumps({"exp": name, "ms": round(seconds * 1e3, 4),
                      "note": note}), flush=True)


def dep_img(s, args):
    a = list(args)
    a[0] = jax.lax.dynamic_update_slice(
        a[0], (s.astype(jnp.uint32) & 1).astype(a[0].dtype).reshape(
            (1,) * a[0].ndim), (0,) * a[0].ndim)
    return tuple(a)


def time_fn(step, args, n_long=43):
    return device_time_per_iter(step, args, dep_img, 3, n_long, repeats=5)


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

    def codes(l, r):
        cs, vs = _codes_and_candidates(l, mask=mask, settings=settings,
                                       use_pallas=use_pallas)
        ct, vt = _codes_and_candidates(r, mask=mask, settings=settings,
                                       use_pallas=use_pallas)
        return cs, vs, ct, vt

    def key_of(l, r):
        cs, vs, ct, vt = codes(l, r)
        code = jnp.concatenate([cs, ct], axis=1).astype(jnp.int32)
        valid = jnp.concatenate([vs, vt], axis=1)
        pos = jnp.broadcast_to(
            jnp.arange(2 * W, dtype=jnp.int32)[None], (H, 2 * W))
        return jnp.where(valid, code, SENTINEL_BASE + pos), pos

    # stage 1: codes only
    def codes_sum(l, r):
        cs, vs, ct, vt = codes(l, r)
        return (cs.astype(jnp.int32).sum() + ct.astype(jnp.int32).sum()
                + vs.sum().astype(jnp.int32) + vt.sum().astype(jnp.int32))

    s = time_fn(codes_sum, (left, right))
    report("stage_codes", s, "fused preprocessing+codes kernel, both images")

    # stage 2: codes + key build
    s = time_fn(lambda l, r: key_of(l, r)[0].sum(dtype=jnp.int32) & 0xFFFF,
                (left, right))
    report("stage_codes_key", s)

    # stage 3: + unstable key+payload sort
    def to_sorted(l, r):
        key, pos = key_of(l, r)
        key_s, pos_s = jax.lax.sort((key, pos), dimension=1, num_keys=1,
                                    is_stable=False)
        return key_s, pos_s

    s = time_fn(lambda l, r: (to_sorted(l, r)[0].sum(dtype=jnp.int32)
                              + to_sorted(l, r)[1].sum(dtype=jnp.int32)) & 0xFF,
                (left, right))
    report("stage_codes_key_sort2", s)

    # stage 3b: + unstable KEY-ONLY sort
    s = time_fn(lambda l, r: jax.lax.sort(
        (key_of(l, r)[0],), dimension=1, num_keys=1, is_stable=False
    )[0].sum(dtype=jnp.int32) & 0xFF, (left, right))
    report("stage_codes_key_sort1", s)

    # full pipeline equivalent: sort2 + pair detect + compact
    def full(l, r):
        key, pos = key_of(l, r)
        key_s, pos_s = jax.lax.sort((key, pos), dimension=1, num_keys=1,
                                    is_stable=False)
        eq = key_s[:, :-1] == key_s[:, 1:]
        zeros = jnp.zeros_like(eq[:, :1])
        prev = jnp.concatenate([zeros, eq[:, :-1]], axis=1)
        nxt = jnp.concatenate([eq[:, 1:], zeros], axis=1)
        pair = eq & ~prev & ~nxt
        lo = jnp.minimum(pos_s[:, :-1], pos_s[:, 1:])
        hi = jnp.maximum(pos_s[:, :-1], pos_s[:, 1:])
        cross = (lo < W) & (hi >= W) & (hi < 2 * W)
        d = lo - (hi - W)
        keep = pair & cross & (jnp.abs(d) <= 128)
        ycoord = jnp.broadcast_to(
            jnp.arange(H, dtype=jnp.int32)[:, None], keep.shape)
        (_, _, _), count = compact(keep, (lo, ycoord, d), settings.capacity)
        return count

    s = time_fn(lambda l, r: full(l, r), (left, right))
    report("stage_full", s, "should match exp_sort pipeline_packed")

    # recovery primitive: per-row gather (one take_along_axis pass)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 30, (H, 2 * W), np.int32))
    idx = jnp.asarray(rng.integers(0, 2 * W, (H, 2 * W), np.int32))

    s = time_fn(lambda t, i: jnp.take_along_axis(t, i, axis=1)
                .sum(dtype=jnp.int32) & 0xFF, (table, idx))
    report("gather_row_full", s, "(436,2048) take_along_axis, random idx")

    # int16 payload sort
    pos16 = jnp.broadcast_to(
        jnp.arange(2 * W, dtype=jnp.int16)[None], (H, 2 * W))
    s = time_fn(lambda t: sum(
        o.sum(dtype=jnp.int32) for o in jax.lax.sort(
            (t, pos16), dimension=1, num_keys=1, is_stable=False)) & 0xFF,
        (table,))
    report("sort2_unstable_i16payload", s)

    # batched pipeline B=4 (aggregate utilization)
    lb = jnp.stack([jnp.asarray(left)] * 4)
    rb = jnp.stack([jnp.asarray(right)] * 4)
    s = time_fn(lambda a, b: jnp.sum(jax.vmap(full)(a, b)), (lb, rb),
                n_long=23)
    report("pipeline_batched4", s,
           f"{4 * 2 * H * W / 1e6 / s:.0f} Mpix/s aggregate")


if __name__ == "__main__":
    main()
