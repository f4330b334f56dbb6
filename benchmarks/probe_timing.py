"""Validate the timing harness on this axon-tunneled TPU: compare
(a) N async dispatches + final block_until_ready,
(b) per-call block_until_ready,
(c) R reps chained inside ONE jit via fori_loop with a data dependency,
(d) tiny readback (np.asarray of 1 element) forcing real completion,
on ops with known cost (big matmul, stream, random gather)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t_async(f, *args, reps=5):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def t_sync(f, *args, reps=5):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def t_fetch(f, *args, reps=3):
    r = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
    return (time.perf_counter() - t0) / reps


rng = np.random.default_rng(0)

# --- known-cost op 1: 4096^3 matmul (137 GFLOP) -------------------------
A = jnp.asarray(rng.random((4096, 4096), dtype=np.float32))
B = jnp.asarray(rng.random((4096, 4096), dtype=np.float32))
mm = jax.jit(lambda a, b: a @ b)
log(f"matmul 4096^3: async={t_async(mm, A, B)*1e3:.3f} ms  "
    f"sync={t_sync(mm, A, B)*1e3:.3f} ms  fetch={t_fetch(mm, A, B)*1e3:.3f} ms"
    f"  (expect ~1.4 ms at 100 TF/s f32)")


# chained version: R matmuls inside one jit, each consuming the last
@jax.jit
def mm_chain(a, b):
    def body(i, acc):
        return (acc @ b) * 0.999 + a * 1e-9
    return lax.fori_loop(0, 8, body, a)


r = mm_chain(A, B)
jax.block_until_ready(r)
t0 = time.perf_counter()
r = mm_chain(A, B)
jax.block_until_ready(r)
t_chain = (time.perf_counter() - t0) / 8
log(f"matmul chained x8 in one jit: {t_chain*1e3:.3f} ms/matmul")

# --- known-cost op 2: stream 160 MB ------------------------------------
X = jnp.asarray(rng.random((40_000_000,), dtype=np.float32))
st = jax.jit(lambda x: x * 1.0001 + 1.0)
log(f"stream 160MB rw: async={t_async(st, X)*1e3:.3f} ms  "
    f"sync={t_sync(st, X)*1e3:.3f} ms  "
    f"(expect ~0.4 ms at 819 GB/s)")

# --- the op in question: 10M random gathers from [1M] -------------------
p = jnp.asarray(rng.random(1_000_000).astype(np.float32))
idx = jnp.asarray(rng.integers(0, 1_000_000, 10_000_000, dtype=np.int32))
g = jax.jit(lambda p, c: p[c])
log(f"gather 10M: async={t_async(g, p, idx)*1e3:.3f} ms  "
    f"sync={t_sync(g, p, idx)*1e3:.3f} ms  fetch={t_fetch(g, p, idx)*1e3:.3f} ms")


# chained gather: output feeds next round's indices (unhoistable)
@jax.jit
def g_chain(p, c):
    def body(i, carry):
        acc, c = carry
        pg = p[c]
        s = jnp.sum(pg[:8]).astype(jnp.int32)  # data-dependent scalar
        return acc + pg[0], (c + s % 2) % 1_000_000
    (acc, _) = lax.fori_loop(0, 8, body, (jnp.float32(0), c))[0], None
    return acc


r = g_chain(p, idx)
jax.block_until_ready(r)
t0 = time.perf_counter()
r = g_chain(p, idx)
jax.block_until_ready(r)
log(f"gather chained x8 in one jit: {(time.perf_counter()-t0)/8*1e3:.3f} "
    f"ms/gather-of-10M")

# --- scatter-max chained -------------------------------------------------
w = jnp.asarray(rng.random(10_000_000).astype(np.float32))


@jax.jit
def sc_chain(rows, w):
    def body(i, carry):
        acc, rows = carry
        out = jnp.full((1_000_000,), -1.0, jnp.float32).at[rows].max(
            w, mode="drop")
        s = jnp.sum(out[:8]).astype(jnp.int32)
        return acc + out[0], (rows + s % 2) % 1_000_000
    return lax.fori_loop(0, 8, body, (jnp.float32(0), idx))[0]


r = sc_chain(idx, w)
jax.block_until_ready(r)
t0 = time.perf_counter()
r = sc_chain(idx, w)
jax.block_until_ready(r)
log(f"scatter-max chained x8: {(time.perf_counter()-t0)/8*1e3:.3f} "
    f"ms/scatter-of-10M")
