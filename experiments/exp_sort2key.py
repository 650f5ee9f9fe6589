"""Companion to exp_sort64.py: the x64-free alternative for a default-
forest single-operand-ish sort — lax.sort with num_keys=2 over (hi, lo)
int32 operands (lexicographic comparator, no payload operand).

The 41-bit (code, pos) key splits as hi = code (30b), lo = pos (11b);
sorting (hi, lo) with num_keys=2 orders exactly like the packed int64 key
and returns pos in-operand, so no unpack and no x64 config.  Traffic is
identical to the 2-op payload sort — the question is whether the
lexicographic comparator (compare hi, tie-break lo) costs more or less
than the payload permute.

Run ON TPU:  python experiments/exp_sort2key.py
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

H, W2 = 436, 2048


def report(name, seconds, note=""):
    print(json.dumps({"exp": name, "ms": round(seconds * 1e3, 4),
                      "note": note}), flush=True)


def dep_xor(s, args):
    a = list(args)
    a[0] = a[0].at[0, 0].set(
        (a[0][0, 0] ^ s.astype(a[0].dtype)) & jnp.array(1, a[0].dtype)
        | (a[0][0, 0] & ~jnp.array(1, a[0].dtype))
    )
    return tuple(a)


def time_fn(step, args, n_short=3, n_long=None):
    import os

    from opengpc_tpu.utils import device_time_per_iter

    if n_long is None:
        n_long = 7 if os.environ.get("OGPC_BENCH_FAST") else 103
    return device_time_per_iter(step, args, dep_xor, n_short, n_long,
                                repeats=5)


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    key = rng.integers(0, 1 << 30, size=(H, W2), dtype=np.int32)
    pos_np = np.broadcast_to(np.arange(W2, dtype=np.int32)[None], (H, W2))
    key_dev = jnp.asarray(key)
    pos = jnp.asarray(pos_np)

    # correctness: num_keys=2 == 2-op sort up to unstable pos ties
    @jax.jit
    def sort_payload(k):
        return jax.lax.sort((k, pos), dimension=1, num_keys=1,
                            is_stable=False)

    @jax.jit
    def sort_lex(k):
        return jax.lax.sort((k, pos), dimension=1, num_keys=2,
                            is_stable=False)

    k1, p1 = (np.asarray(o) for o in sort_payload(key_dev))
    k2, p2 = (np.asarray(o) for o in sort_lex(key_dev))
    assert (k1 == k2).all()
    if not (p1 == p2).all():
        for r in np.nonzero((p1 != p2).any(axis=1))[0]:
            assert sorted(zip(k1[r], p1[r])) == sorted(zip(k2[r], p2[r]))
    print("correctness: num_keys=2 == payload sort (pos ties aside)",
          file=sys.stderr)

    s = time_fn(
        lambda k: sum(o.sum() for o in jax.lax.sort(
            (k, pos), dimension=1, num_keys=1, is_stable=False)),
        (key_dev,))
    report("sort2_payload_unstable", s,
           "(436,2048) int32 key + payload (shipped)")

    s = time_fn(
        lambda k: sum(o.sum() for o in jax.lax.sort(
            (k, pos), dimension=1, num_keys=2, is_stable=False)),
        (key_dev,))
    report("sort2_lexicographic_unstable", s,
           "(436,2048) int32 (hi, lo) num_keys=2 — x64-free 41-bit key")


if __name__ == "__main__":
    main()
