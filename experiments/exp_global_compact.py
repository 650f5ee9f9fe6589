"""Chunk-compacted GLOBAL mode: does the strided pre-compaction that bought
+27% on the masked epipolar contract (exp_lowdens.py, adopted r4) also pay
on the global contract?

Global mode's cost is dominated by ONE flat 2-operand sort over all 2HW
elements (0.82 ms of the 1.08 ms pipeline, exp_global.py) — and that sort
is density-INDEPENDENT: at 15% candidate density 85% of its input is
never-colliding sentinels.  Strided per-row chunk compaction (chunk c of a
row holds positions {p : p % nc == c}; per-chunk sort; keep first K) shrinks
the flat sort input from 2HW to H*nc*K = 2HW*(K/S) elements, overflow-guarded
exactly like the masked variant.

Why this is exact (when the overflow flag is False):
  - every VALID candidate survives (valid codes < SENTINEL_BASE sort left;
    the guard asserts no chunk holds > K of them), so the multiset of valid
    codes — the global uniqueness domain (inference.hpp:227-254) — is
    unchanged;
  - dropped elements are all sentinels.  Dropping sentinels can change
    equal-sentinel run LENGTHS (a column with 3 invalid pixels could drop
    to 2, forming a new "pair"), but equal sentinels are always same-image
    same-column (src sentinels are SENTINEL_BASE+[0,W), tar +[W,2W)), so the
    cross check (src_x < W <= tar_c) rejects every such pair — the same
    argument match_global_rows already relies on for un-compacted input.

Measures on the TPU, per scene (79%-dense make_pair and 15%-dense
make_sparse_pair): baseline match_global_rows vs compacted variants across
(S, K); decoded support sets asserted equal whenever no overflow.

Run: python experiments/exp_global_compact.py
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
from opengpc_tpu.infer import (_interior_rows, _key_image,
                               global_row_supports_to_numpy)
from opengpc_tpu.match import SENTINEL_BASE, match_global_rows
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair, make_sparse_pair

H, W = 436, 1024
DISP = 16


def global_compact(key_img, w, disp_high, vertical_tolerance, chunk, k,
                   y_offset):
    """Strided chunk-compacted global matcher: ((xs, ys, ds), counts,
    overflow).  Exact whenever overflow is False (see module docstring)."""
    h, w2 = key_img.shape
    pos = (jnp.arange(h, dtype=jnp.int32)[:, None] * w2
           + jnp.arange(w2, dtype=jnp.int32)[None, :])
    if w2 % chunk:
        # pad to a chunk multiple with GLOBALLY unique keys above every
        # real sentinel (real sentinels are SENTINEL_BASE + [0, 2W)) so
        # pads can never form an equal run; their pos is never decoded
        padn = chunk - w2 % chunk
        pad_k = (SENTINEL_BASE + w2
                 + jnp.arange(h, dtype=jnp.int32)[:, None] * padn
                 + jnp.arange(padn, dtype=jnp.int32)[None, :])
        key_img = jnp.concatenate([key_img, pad_k], axis=1)
        pos = jnp.concatenate(
            [pos, jnp.full((h, padn), h * w2, dtype=jnp.int32)], axis=1)
    w2p = key_img.shape[1]
    nc = w2p // chunk
    kc = key_img.reshape(h, chunk, nc).transpose(0, 2, 1).reshape(
        h * nc, chunk)
    pc = pos.reshape(h, chunk, nc).transpose(0, 2, 1).reshape(h * nc, chunk)
    vc = jnp.sum(kc < SENTINEL_BASE, axis=1, dtype=jnp.int32)
    overflow = jnp.any(vc > k)
    ks, ps = jax.lax.sort((kc, pc), dimension=1, num_keys=1, is_stable=False)
    key_c = ks[:, :k].reshape(-1)
    pos_c = ps[:, :k].reshape(-1)

    # --- match_global_rows core on the compacted flat arrays ---
    n = key_c.shape[0]
    key_s, pos_s = jax.lax.sort((key_c, pos_c), dimension=0, num_keys=1,
                                is_stable=False)
    eq = key_s[:-1] == key_s[1:]
    zeros = jnp.zeros_like(eq[:1])
    prev = jnp.concatenate([zeros, eq[:-1]])
    nxt = jnp.concatenate([eq[1:], zeros])
    pair = eq & ~prev & ~nxt
    col_l, row_l = pos_s[:-1] % w2, pos_s[:-1] // w2
    col_r, row_r = pos_s[1:] % w2, pos_s[1:] // w2
    l_is_src = col_l < w
    src_x = jnp.where(l_is_src, col_l, col_r)
    src_y = jnp.where(l_is_src, row_l, row_r)
    tar_c = jnp.where(l_is_src, col_r, col_l)
    tar_y = jnp.where(l_is_src, row_r, row_l)
    cross = (src_x < w) & (tar_c >= w)
    d = src_x - (tar_c - w)
    keep = (pair & cross & (jnp.abs(d) <= disp_high)
            & (jnp.abs(src_y - tar_y) <= vertical_tolerance))
    if y_offset:
        src_y = src_y + jnp.int32(y_offset)
    r = h
    c = -(-n // r)
    padn = r * c - (n - 1)
    keep = jnp.pad(keep, (0, padn))
    src_x = jnp.pad(src_x, (0, padn))
    src_y = jnp.pad(src_y, (0, padn))
    d = jnp.pad(d, (0, padn))
    bx = max(1, int(w - 1).bit_length())
    by = max(1, int(h - 1 + y_offset).bit_length())
    bd = max(1, int(2 * disp_high).bit_length())
    assert by + bx + bd <= 30
    pk = jnp.where(keep, (((src_y << bx) | src_x) << bd) | (d + disp_high),
                   jnp.int32(0x7FFFFFFF)).reshape(r, c)
    pk_s = jax.lax.sort((pk,), dimension=1, num_keys=1, is_stable=False)[0]
    counts = jnp.sum(keep.reshape(r, c), axis=1, dtype=jnp.int32)
    slot_ok = jnp.arange(c, dtype=jnp.int32)[None, :] < counts[:, None]
    ds = jnp.where(slot_ok, (pk_s & ((1 << bd) - 1)) - disp_high, 0)
    xs = jnp.where(slot_ok, (pk_s >> bd) & ((1 << bx) - 1), 0)
    ys = jnp.where(slot_ok, pk_s >> (bd + bx), 0)
    return (xs, ys, ds), counts, overflow


def main():
    use_pallas = jax.default_backend() == "tpu"
    mask = make_filter_mask(load_forest("forests/defaultZeroForest.txt"))
    settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                                 disp_high=128, epipolar_mode=False,
                                 capacity=1 << 19)

    def key_image(l, r):
        return _key_image(l, r, mask, settings, use_pallas)

    def dep(s, args):
        a, b = args
        upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape(1, 1)
        a = jax.lax.dynamic_update_slice(a, upd, (0, 0))
        return (a, b)

    def report(name, sec, extra=None):
        rec = {"exp": name, "ms": round(sec * 1e3, 3),
               "mpix_s": round(2 * H * W / 1e6 / max(sec, 1e-9), 1)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)

    scenes = {
        "dense": make_pair(H, W, DISP),
        "sparse": make_sparse_pair(H, W, DISP, density=0.15),
    }

    for sname, (l, r) in scenes.items():
        def base_step(a, b):
            key, m = _interior_rows(key_image(a, b))
            (xs, ys, ds), counts = match_global_rows(
                key, W, settings.disp_high, settings.vertical_tolerance,
                y_offset=m)
            return (xs.sum(dtype=jnp.int32) + ys.sum(dtype=jnp.int32)
                    + ds.sum(dtype=jnp.int32)
                    + counts.sum(dtype=jnp.int32))

        key0, m0 = _interior_rows(jax.jit(key_image)(l, r))
        (bxs, bys, bds), bcnt = jax.jit(functools.partial(
            match_global_rows, w=W, disp_high=settings.disp_high,
            vertical_tolerance=settings.vertical_tolerance,
            y_offset=m0))(jnp.asarray(key0))
        want = set(map(tuple, global_row_supports_to_numpy(
            bxs, bys, bds, bcnt).tolist()))

        sec = device_time_per_iter(base_step, (l, r), dep, 3, 43, repeats=5)
        report(f"baseline_global_{sname}", sec, {"supports": len(want)})

        for chunk, k in ((128, 64), (128, 32), (256, 128), (256, 64),
                         (512, 128)):
            name = f"gcompact_S{chunk}_K{k}_{sname}"

            def cstep(a, b, chunk=chunk, k=k):
                key, m = _interior_rows(key_image(a, b))
                (xs, ys, ds), counts, ovf = global_compact(
                    key, W, settings.disp_high,
                    settings.vertical_tolerance, chunk, k, m)
                return (xs.sum(dtype=jnp.int32) + ys.sum(dtype=jnp.int32)
                        + ds.sum(dtype=jnp.int32)
                        + counts.sum(dtype=jnp.int32)
                        + ovf.astype(jnp.int32))

            def cout(a, b, chunk=chunk, k=k):
                key, m = _interior_rows(key_image(a, b))
                return global_compact(key, W, settings.disp_high,
                                      settings.vertical_tolerance, chunk,
                                      k, m)

            (xs, ys, ds), counts, ovf = jax.jit(cout)(l, r)
            if bool(np.asarray(ovf)):
                report(name, float("nan"), {"overflow": True})
                continue
            got = set(map(tuple, global_row_supports_to_numpy(
                xs, ys, ds, counts).tolist()))
            assert got == want, (
                f"{name}: set mismatch ({len(got)} vs {len(want)})")
            sec = device_time_per_iter(cstep, (l, r), dep, 3, 43, repeats=5)
            report(name, sec, {"overflow": False})


if __name__ == "__main__":
    main()
