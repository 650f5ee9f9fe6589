"""Continuation-session on-chip validation: the one-call sparsematch()
API with the LIVE Pallas kernels (use_pallas=True on the real TPU)
against the jnp twin path (use_pallas=False — note both twins execute
on the same backend; this is a pallas-vs-jnp differential, the CPU
truth differential is tests/ + exp_tpu_fuzz), across every route the
auto-contract picker can take:

  - masked (epipolar, eligible)
  - segmented global (global mode, eligible)
  - flat fixed-capacity (disp_high beyond the 30-bit packed-key budget)
  - pyramid levels=3 (rows route) and the lossless global-mode pyramid
    fallback (tiny capacity MUST NOT truncate — r5 fix)

Run on the TPU: python experiments/exp_onecall_validate.py
CPU dry-run first (CLAUDE.md rule): JAX_PLATFORMS=cpu with empty
PALLAS_AXON_POOL_IPS — route/equality conclusions are device-independent
(the dry run exercises interpret-mode Pallas vs jnp).
"""
import sys

sys.path.insert(0, ".")
import numpy as np

import jax

from opengpc_tpu import InferenceSettings, load_forest, sparsematch
from opengpc_tpu.utils.scenes import make_pair

ON_TPU = jax.default_backend() == "tpu"
if not ON_TPU:
    print("WARNING: not on TPU — dry run exercises interpret mode",
          file=sys.stderr)

forest = load_forest("forests/defaultZeroForest.txt")
l, r = make_pair(200, 999, 9, seed=77)


def run(settings, levels=1, expect_route=None):
    from opengpc_tpu.infer import _MATCH_FN_CACHE

    want = sparsematch(l, r, forest, settings, use_pallas=False,
                       levels=levels)
    before = set(_MATCH_FN_CACHE)
    got = sparsematch(l, r, forest, settings, use_pallas=True,
                      levels=levels)
    routes = {k[-1] for k in set(_MATCH_FN_CACHE) - before}
    if expect_route is not None:
        assert routes == {expect_route}, (routes, expect_route)
    assert sorted(map(tuple, want.tolist())) == \
        sorted(map(tuple, got.tolist())), \
        f"{settings} levels={levels}: {len(want)} vs {len(got)}"
    return len(got)


base = dict(gradient_threshold=5, vertical_tolerance=0, capacity=1 << 18)
n = run(InferenceSettings(epipolar_mode=True, disp_high=64, **base),
        expect_route="masked")
print(f"masked route: {n} supports, pallas==jnp")
n = run(InferenceSettings(epipolar_mode=False, disp_high=64, **base),
        expect_route="global-rows")
print(f"global route: {n} supports, pallas==jnp")
# disp_high 1<<23 blows the 30-bit (x, d) packing at any width, so the
# auto picker MUST take the flat fixed-capacity contract (same forcing
# as tests/test_api.py's flat-fallback case)
n = run(InferenceSettings(epipolar_mode=True, disp_high=1 << 23, **base),
        expect_route="flat")
print(f"flat route: {n} supports, pallas==jnp")
n = run(InferenceSettings(epipolar_mode=True, disp_high=64, **base),
        levels=3, expect_route="pyramid-3")
print(f"pyramid rows route: {n} supports, pallas==jnp")
tiny = InferenceSettings(epipolar_mode=False, disp_high=64,
                         gradient_threshold=5, vertical_tolerance=0,
                         capacity=8)
n = run(tiny, levels=2, expect_route="pyramid-2")
assert n > 8, "capacity=8 must not truncate the lossless fallback"
print(f"pyramid global fallback (capacity=8): {n} supports, pallas==jnp")

# batched one-call (r5 continuation): a (B, H, W) stack through the live
# kernels must return per-pair arrays equal to B single-pair calls
pairs = [make_pair(200, 999, 9, seed=100 + i) for i in range(3)]
L = np.stack([p[0] for p in pairs])
R = np.stack([p[1] for p in pairs])
for name, st, lv in (
    ("masked", InferenceSettings(epipolar_mode=True, disp_high=64, **base),
     1),
    ("global", InferenceSettings(epipolar_mode=False, disp_high=64, **base),
     1),
    ("pyramid", InferenceSettings(epipolar_mode=True, disp_high=64, **base),
     3),
):
    got = sparsematch(L, R, forest, st, use_pallas=True, levels=lv)
    assert isinstance(got, list) and len(got) == 3
    for i, (li, ri) in enumerate(pairs):
        want = sparsematch(li, ri, forest, st, use_pallas=True, levels=lv)
        assert sorted(map(tuple, got[i].tolist())) == \
            sorted(map(tuple, want.tolist())), (name, i)
    print(f"batched one-call {name}: {[len(g) for g in got]} "
          "== per-pair calls")
print("ALL ONE-CALL ROUTES OK")
