"""Round-5 on-chip validation sweep: the new paths on the REAL TPU
(Pallas kernels live, not interpret mode) against CPU-computed truth.

Covers: rows pyramid + compact pyramid (odd shapes too), the batched
hybrid pyramid fold, kernel-packed keys at an odd width, and multigrid
densify (float path — compared with tolerance; integer contracts are
compared as exact sets).

Run on the TPU: python experiments/exp_r5_validate.py
"""
import sys

sys.path.insert(0, ".")
import numpy as np

import jax

from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.pyramid import (build_pyramid_sparsematch,
                                 build_pyramid_sparsematch_compact,
                                 pyramid_supports_to_numpy)
from opengpc_tpu.utils.scenes import make_pair, make_sparse_pair

ON_TPU = jax.default_backend() == "tpu"
if not ON_TPU:
    print("WARNING: not on TPU — dry run exercises interpret mode",
          file=sys.stderr)

forest = load_forest("forests/defaultZeroForest.txt")
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=64, epipolar_mode=True,
                             capacity=1 << 18)


def pset(out):
    return set(map(tuple, pyramid_supports_to_numpy(*out).tolist()))


# CPU truth builders (jnp path, no Pallas)
cpu_pyr = build_pyramid_sparsematch(forest, settings, num_levels=3,
                                    use_pallas=False)
tpu_pyr = build_pyramid_sparsematch(forest, settings, num_levels=3,
                                    use_pallas=ON_TPU)

shapes = [(436, 1024, 16), (200, 999, 9), (131, 257, 5)]
for h, w, d in shapes:
    left, right = make_pair(h, w, d, seed=h + w)
    want = pset(cpu_pyr(left, right))
    got = pset(tpu_pyr(left, right))
    assert got == want, f"rows pyramid TPU != CPU at {(h, w)}"
    print(f"rows pyramid ok at {(h, w)}: {len(want)} supports", flush=True)

# compact pyramid on a sparse scene (on-chip kernel path)
sl, sr = make_sparse_pair(436, 1024, 16, density=0.15)
cpu_cp = build_pyramid_sparsematch_compact(forest, settings, num_levels=3,
                                           use_pallas=False)
tpu_cp = build_pyramid_sparsematch_compact(forest, settings, num_levels=3,
                                           use_pallas=ON_TPU)
w_out = cpu_cp(sl, sr)
g_out = tpu_cp(sl, sr)
assert not bool(np.asarray(w_out[-1])) and not bool(np.asarray(g_out[-1]))
assert pset(g_out[:-1]) == pset(w_out[:-1]), "compact pyramid TPU != CPU"
print(f"compact pyramid ok: {len(pset(w_out[:-1]))} supports", flush=True)

# batched hybrid fold on chip vs per-pair on chip
pairs = [make_pair(224, 512, 6 + b, seed=70 + b) for b in range(3)]
lb = np.stack([p[0] for p in pairs])
rb = np.stack([p[1] for p in pairs])
bout = tpu_pyr(lb, rb)
for b in range(3):
    got = set(map(tuple, pyramid_supports_to_numpy(
        *(np.asarray(o)[b] for o in bout)).tolist()))
    want = pset(tpu_pyr(lb[b], rb[b]))
    assert got == want, f"batched hybrid pair {b} != single-pair"
print("batched hybrid pyramid ok (3 pairs, on-chip)", flush=True)

# kernel-packed keys at an odd width (the pack_bits kernel on real TPU)
from opengpc_tpu.infer import _interior_rows, _pad_rows
from opengpc_tpu.match import (MASKED_SENTINEL, SENTINEL_BASE,
                               _detect_pairs_packed, _masked_emit,
                               _pack_ok, _pos_bits, _unpack_keypos)
from opengpc_tpu.ops.fused import fused_keys

import jax.numpy as jnp

h, w, d = 200, 999, 9
mask17 = make_filter_mask(forest, max_tests=17)
assert _pack_ok(mask17.num_tests, 2 * w)
pb = _pos_bits(2 * w)
left, right = make_pair(h, w, d, seed=5)


@jax.jit
def packed(l, r):
    key = jnp.concatenate([
        fused_keys(l, mask17, 5, 0, SENTINEL_BASE, interpret=not ON_TPU,
                   pack_bits=pb),
        fused_keys(r, mask17, 5, w, SENTINEL_BASE, interpret=not ON_TPU,
                   pack_bits=pb),
    ], axis=1)
    key, m = _interior_rows(key)
    ks = jax.lax.sort((key,), dimension=1, num_keys=1, is_stable=False)[0]
    k2, p2 = _unpack_keypos(ks, pb)
    keep, sx, dd = _detect_pairs_packed(k2, p2, w, settings.disp_high)
    buf, counts = _masked_emit(keep, sx, dd, w, settings.disp_high)
    return (_pad_rows(buf, m, -2, value=MASKED_SENTINEL),
            _pad_rows(counts, m, -1))


from opengpc_tpu.infer import (_sparsematch_masked_impl,
                               masked_supports_to_numpy)

gb, gc = packed(left, right)
wb, wc = jax.jit(lambda l, r: _sparsematch_masked_impl(
    l, r, mask=mask17, settings=settings, use_pallas=False))(left, right)
got = set(map(tuple, masked_supports_to_numpy(
    gb, gc, settings.disp_high).tolist()))
want = set(map(tuple, masked_supports_to_numpy(
    wb, wc, settings.disp_high).tolist()))
assert got == want and len(want) > 500, (len(got), len(want))
print(f"kernel-packed keys ok at odd width {(h, w)}: {len(want)}",
      flush=True)

# multigrid densify: TPU vs CPU within float tolerance, same filled mask
from opengpc_tpu.densify import densify_supports

supp = np.array(sorted(want))[:, :3]
tpu_d, tpu_f = densify_supports(supp, (h, w))
# cross-method sanity on chip: multigrid vs long jacobi, both on device
jac_d, jac_f = densify_supports(supp, (h, w), method="jacobi",
                                num_iters=600)
assert tpu_f.all() and jac_f.all()
diff = np.abs(tpu_d - jac_d)
print(f"densify on-chip: multigrid vs jacobi600 max diff {diff.max():.2f} "
      f"mean {diff.mean():.3f}", flush=True)
assert diff.mean() < 3.0, diff.mean()
print("ALL R5 ON-CHIP VALIDATIONS PASSED", flush=True)
