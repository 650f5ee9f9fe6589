"""Can the DEFAULT 30-test forest ride a single-operand matcher sort via
int64 keys?  (30-bit code + 11-bit pos = 41 bits > int32; the r4 1-op win
is gated at num_tests + pos_bits <= 30, so the shipped fast preset needs a
truncated forest.)

Hypothesis to kill or confirm: XLA TPU decomposes 64-bit sorts into
(hi, lo) 32-bit lane pairs, making an int64 1-op sort equivalent to (or
worse than) the 2-op int32 sort it would replace — TPU lanes are 32-bit
(the int16-payload dead end measured the same lesson in the other
direction).

Run ON TPU:  python experiments/exp_sort64.py
Prints one JSON line per measurement (device_time_per_iter — chained
fori_loop differencing; wall-clocking single dispatches through the relay
measures the tunnel).  Correctness: the unpacked (key, pos) rows of the
int64 sort are asserted identical to the 2-op int32 sort's before timing.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

jax.config.update("jax_enable_x64", True)

H, W2 = 436, 2048  # the bench pair's key-image shape (exp_sort.py)
PB = 11            # pos_bits(2048)


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

    if n_long is None:  # OGPC_BENCH_FAST=1 -> short chains for CPU dry-runs
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

    # correctness first: unpacked int64 sort == 2-op int32 sort
    @jax.jit
    def sort2(k):
        return jax.lax.sort((k, pos), dimension=1, num_keys=1,
                            is_stable=False)

    @jax.jit
    def sort64(k):
        packed = (k.astype(jnp.int64) << PB) | pos.astype(jnp.int64)
        s = jax.lax.sort((packed,), dimension=1, num_keys=1,
                         is_stable=False)[0]
        return (s >> PB).astype(jnp.int32), (s & ((1 << PB) - 1)).astype(
            jnp.int32)

    k2, p2 = (np.asarray(o) for o in sort2(key_dev))
    k64, p64 = (np.asarray(o) for o in sort64(key_dev))
    assert (k2 == k64).all(), "int64 sort changed the key order"
    # pos may differ where keys collide (unstable sort): compare as sets
    # per row only on collision rows, exact elsewhere
    if not (p2 == p64).all():
        for r in np.nonzero((p2 != p64).any(axis=1))[0]:
            assert sorted(zip(k2[r], p2[r])) == sorted(zip(k64[r], p64[r]))
    print("correctness: int64 1-op == int32 2-op (unstable-sort "
          "pos ties aside)", file=sys.stderr)

    s = time_fn(
        lambda k: sum(o.sum() for o in jax.lax.sort(
            (k, pos), dimension=1, num_keys=1, is_stable=False)),
        (key_dev,))
    report("sort2_int32_unstable", s, "(436,2048) int32 key+payload "
           "(the shipped default-forest sort)")

    packed64 = (key_dev.astype(jnp.int64) << PB) | pos.astype(jnp.int64)
    s = time_fn(
        lambda k: jax.lax.sort((k,), dimension=1, num_keys=1,
                               is_stable=False)[0].sum(),
        (packed64,))
    report("sort1_int64_unstable_presorted_input", s,
           "(436,2048) int64 single operand, pack cost excluded")

    s = time_fn(
        lambda k: sort64(k)[0].sum() + sort64(k)[1].sum(),
        (key_dev,))
    report("sort1_int64_pack_sort_unpack", s,
           "int32 in -> pack int64 -> 1-op sort -> unpack (the full "
           "replacement for the 2-op sort)")

    s = time_fn(
        lambda k: jax.lax.sort((k,), dimension=1, num_keys=1,
                               is_stable=False)[0].sum(),
        (key_dev,))
    report("sort1_int32_unstable", s, "(436,2048) int32 single operand "
           "(the small-forest fast-preset sort, for context)")


if __name__ == "__main__":
    main()
