import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Micro-benchmarks for hier v2 design choices on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp


def t(fn, *a, iters=20):
    out = fn(*a)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


B = 10240
T = 196
rng = np.random.default_rng(0)
xyz = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
xyz = xyz / jnp.linalg.norm(xyz, axis=1, keepdims=True)

from range_tpu.geometry import geo_sort_order
print(f"geo_sort_order f32 argsort: {t(jax.jit(geo_sort_order), xyz):.2f} ms")


@jax.jit
def sort_i32(x):
    lat = jnp.arcsin(jnp.clip(x[:, 2], -1, 1))
    lon = jnp.arctan2(x[:, 1], x[:, 0])
    band = jnp.floor((lat + jnp.pi / 2) / (jnp.pi / 12)).astype(jnp.int32)
    key = band * 4096 + ((lon + jnp.pi) * (4095 / (2 * jnp.pi))).astype(jnp.int32)
    return jnp.argsort(key)


print(f"argsort int32 key: {t(sort_i32, xyz):.2f} ms")


@jax.jit
def sort_packed(x):
    lat = jnp.arcsin(jnp.clip(x[:, 2], -1, 1))
    lon = jnp.arctan2(x[:, 1], x[:, 0])
    band = jnp.floor((lat + jnp.pi / 2) / (jnp.pi / 12)).astype(jnp.int32)
    key = band * 256 + ((lon + jnp.pi) * (255 / (2 * jnp.pi))).astype(jnp.int32)
    packed = key * 16384 + jnp.arange(x.shape[0], dtype=jnp.int32)
    s = jnp.sort(packed)
    return s % 16384


print(f"single-array packed int32 sort: {t(sort_packed, xyz):.2f} ms")

cents = jnp.asarray(rng.normal(size=(T, 3)), jnp.float32)


@jax.jit
def sort_home(x):
    home = jnp.argmax(x @ cents.T, axis=1).astype(jnp.int32)
    packed = home * 16384 + jnp.arange(x.shape[0], dtype=jnp.int32)
    return jnp.sort(packed) % 16384


print(f"home-tile argmax + packed sort: {t(sort_home, xyz):.2f} ms")

# top_k over [B, T] vs [B, 16896]
stats = jnp.asarray(rng.normal(size=(B, T)), jnp.float32)
print(f"top_k j=2 over [B,{T}]: {t(jax.jit(lambda s: jax.lax.top_k(s, 2)), stats):.2f} ms")
big = jnp.asarray(rng.normal(size=(B, 16896)), jnp.float32)
print(f"top_k j=2 over [B,16896]: {t(jax.jit(lambda s: jax.lax.top_k(s, 2)), big):.2f} ms")
nB = B // 256
tile = jnp.asarray(rng.normal(size=(nB, T)), jnp.float32)
print(f"top_k K=16 over [nB,{T}]: {t(jax.jit(lambda s: jax.lax.top_k(s, 16)), tile):.2f} ms")

# argmax-based top-2 (two passes of max+mask)
@jax.jit
def top2_mask(s):
    i1 = jnp.argmax(s, axis=1)
    s2 = s.at[jnp.arange(s.shape[0]), i1].set(-jnp.inf)
    i2 = jnp.argmax(s2, axis=1)
    return i1, i2


print(f"argmax-top2 over [B,{T}]: {t(top2_mask, stats):.2f} ms")

# bf16 [B,G] e materialization + reduce (XLA alternative to scan kernel)
G = 12544
gc = jnp.asarray(rng.normal(size=(G, 256)), jnp.bfloat16)
q = jnp.asarray(rng.normal(size=(B, 256)), jnp.bfloat16)


@jax.jit
def scan_xla(q):
    e = jnp.exp2(jnp.minimum(jnp.dot(q, gc.T, preferred_element_type=jnp.float32), 60.0)).astype(jnp.bfloat16)
    er = e.reshape(B, T, G // T)
    return er.max(axis=2), er.astype(jnp.float32).sum(axis=2)


print(f"XLA scan [B,{G}] bf16 e + tile reduce: {t(scan_xla, q):.2f} ms")
