"""The RANGE retrieval bank ("database") as a TPU-resident structure.

Counterpart of the reference's db handling (`range/range.py:77-100`): an npz
with ``locs [N,2] (lon,lat)``, ``satclip_embeddings [N,256]``,
``image_embeddings [N,1024]``.  At load time we L2-normalize the SatCLIP key
embeddings (range.py:89) and convert bank locations to unit-sphere xyz
(range.py:93-95).

TPU-first differences:
  * rows are padded to a tile multiple so Pallas kernels and shard_map see
    static aligned shapes; a row-validity count masks the tail;
  * the bank is a pytree, so it `jax.device_put`s under any NamedSharding —
    shard rows across the mesh and the sharded retrieval (parallel/sharded.py)
    combines per-shard partial softmaxes exactly via logsumexp + psum;
  * keys/values can be stored bf16 (HBM bandwidth is the retrieval bottleneck)
    while all softmax math stays f32.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import lonlat_deg_to_xyz


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GeoBank:
    """locs/keys/values, padded to ``pad_to`` rows.

    Fields (all jnp arrays, row-padded to the same length Np):
      locs_lonlat: [Np, 2] degrees (as stored in the npz)
      xyz:         [Np, 3] unit vectors of bank locations
      keys_sem:    [Np, Dk] L2-normalized SatCLIP image embeddings
      values:      [Np, Dv] high-res image embeddings (SatMAE, 1024-d)
      n_valid:     scalar int32, number of real rows
    """

    locs_lonlat: jnp.ndarray
    xyz: jnp.ndarray
    keys_sem: jnp.ndarray
    values: jnp.ndarray
    n_valid: jnp.ndarray
    # Scattered-validity banks (cluster-packed, bank/clustered.py) carry an
    # explicit [Np] {0,1} mask; None means the valid rows are the prefix
    # [0, n_valid).
    valid_mask: Optional[jnp.ndarray] = None
    # Set by `quantize_values`: values are int8 with per-row dequantization
    # scale [1, Np] f32 (row value = values[r] * value_scale[0, r]).  Halves
    # the dominant HBM stream in the fused retrieval kernel.
    value_scale: Optional[jnp.ndarray] = None

    @property
    def num_rows(self) -> int:
        return self.keys_sem.shape[0]

    @property
    def key_dim(self) -> int:
        return self.keys_sem.shape[1]

    @property
    def value_dim(self) -> int:
        return self.values.shape[1]

    @classmethod
    def from_arrays(
        cls,
        locs_lonlat: np.ndarray,
        satclip_embeddings: np.ndarray,
        image_embeddings: np.ndarray,
        *,
        pad_to: int = 1024,
        key_dtype=jnp.float32,
        value_dtype=jnp.float32,
        normalized: bool = False,
    ) -> "GeoBank":
        n = locs_lonlat.shape[0]
        np_rows = _round_up(n, pad_to)
        locs = np.zeros((np_rows, 2), np.float32)
        locs[:n] = locs_lonlat
        keys = np.zeros((np_rows, satclip_embeddings.shape[1]), np.float32)
        k = np.asarray(satclip_embeddings, np.float32)
        if not normalized:
            k = k / np.linalg.norm(k, ord=2, axis=1, keepdims=True)
        keys[:n] = k
        vals = np.zeros((np_rows, image_embeddings.shape[1]), np.float32)
        vals[:n] = image_embeddings
        xyz = np.zeros((np_rows, 3), np.float32)
        xyz[:n] = np.asarray(
            lonlat_deg_to_xyz(jnp.asarray(locs_lonlat, jnp.float32))
        )
        return cls(
            locs_lonlat=jnp.asarray(locs),
            xyz=jnp.asarray(xyz),
            keys_sem=jnp.asarray(keys, key_dtype),
            values=jnp.asarray(vals, value_dtype),
            n_valid=jnp.asarray(n, jnp.int32),
        )

    @classmethod
    def from_npz(cls, path: str, use_native: bool = True, **kw) -> "GeoBank":
        """Load a reference-format npz (range.py:78-90 key names).

        Uses the native mmap reader (range_tpu/native/bankio) when available
        (~3x faster than np.load on the ~0.5 GB reference db); falls back to
        numpy transparently."""
        db = None
        if use_native:
            try:
                from ..native.bankio import load_npz_native

                db = load_npz_native(
                    path, ["locs", "satclip_embeddings", "image_embeddings"])
            except Exception:
                db = None
        if db is None:
            db = np.load(path, allow_pickle=True)
        return cls.from_arrays(
            db["locs"].astype(np.float32),
            db["satclip_embeddings"].astype(np.float32),
            db["image_embeddings"].astype(np.float32),
            **kw,
        )

    def save_npz(self, path: str) -> None:
        """Write back in the reference npz schema (`generate_db.py:212-214`),
        gathering only the valid rows (scattered-mask banks included)."""
        if self.valid_mask is not None:
            sel = np.asarray(self.valid_mask) > 0
        else:
            sel = np.arange(self.num_rows) < int(self.n_valid)
        values = (dequantize_values(self) if self.value_scale is not None
                  else self.values)
        np.savez(
            path,
            locs=np.asarray(self.locs_lonlat)[sel],
            satclip_embeddings=np.asarray(self.keys_sem, np.float32)[sel],
            image_embeddings=np.asarray(values, np.float32)[sel],
        )

    @classmethod
    def synthetic(cls, rng: np.random.Generator | int, n: int, key_dim: int = 256,
                  value_dim: int = 1024, **kw) -> "GeoBank":
        """Random bank for benchmarks/tests (real db artifacts are HF-hosted)."""
        if isinstance(rng, int):
            rng = np.random.default_rng(rng)
        lons = rng.uniform(-180, 180, size=n)
        lats = np.degrees(np.arcsin(rng.uniform(-1, 1, size=n)))  # area-uniform
        locs = np.stack([lons, lats], 1).astype(np.float32)
        keys = rng.standard_normal((n, key_dim)).astype(np.float32)
        vals = rng.standard_normal((n, value_dim)).astype(np.float32)
        return cls.from_arrays(locs, keys, vals, **kw)

    @classmethod
    def synthetic_device(cls, seed: int, n: int, key_dim: int = 256,
                         value_dim: int = 1024, pad_to: int = 4096,
                         key_dtype=jnp.float32, value_dtype=jnp.float32) -> "GeoBank":
        """Synthetic bank generated *on device* with the jax PRNG — no
        host->device transfer (the tunnel to the benchmark TPU makes a
        hundreds-of-MB host push cost minutes)."""
        n_rows = _round_up(n, pad_to)
        k = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(k, 4)
        lons = jax.random.uniform(k1, (n_rows,), jnp.float32, -180.0, 180.0)
        lats = jnp.degrees(jnp.arcsin(jax.random.uniform(k2, (n_rows,), jnp.float32, -1.0, 1.0)))
        locs = jnp.stack([lons, lats], 1)
        row_ok = (jnp.arange(n_rows) < n)[:, None]
        keys = jax.random.normal(k3, (n_rows, key_dim), jnp.float32)
        keys = keys / jnp.linalg.norm(keys, axis=1, keepdims=True)
        keys = jnp.where(row_ok, keys, 0.0).astype(key_dtype)
        vals = jnp.where(row_ok, jax.random.normal(k4, (n_rows, value_dim), jnp.float32),
                         0.0).astype(value_dtype)
        locs = jnp.where(row_ok, locs, 0.0)
        return cls(
            locs_lonlat=locs,
            xyz=jnp.where(row_ok, lonlat_deg_to_xyz(locs), 0.0),
            keys_sem=keys,
            values=vals,
            n_valid=jnp.asarray(n, jnp.int32),
        )

    @classmethod
    def synthetic_informative(cls, seed: int, n: int, key_dim: int = 256,
                              value_dim: int = 1024, pad_to: int = 4096,
                              key_dtype=jnp.float32, value_dtype=jnp.float32,
                              key_noise: float = 0.25, tower_seed: int = 0,
                              ) -> "GeoBank":
        """Spatially autocorrelated synthetic bank, generated on device.

        Keys model the real bank's SatCLIP *image* embeddings: the (seeded
        random-init) SatCLIP location tower's embeddings of the bank
        locations plus `key_noise` gaussian perturbation, re-normalized.
        The tower is initialized with ``PRNGKey(tower_seed)`` — the SAME key
        `load_model(..., seed=tower_seed)` uses for its query tower — so
        query and bank embeddings are ALIGNED the way contrastive training
        aligns SatCLIP's location and image towers: a query's best key is
        usually (not always — that's what key_noise injects) geographically
        near it, with visually-similar far rows competing.  Values are a
        fixed random projection of the tower features plus noise —
        location-correlated like SatMAE features.  This is the generator
        RESULTS.md's probe experiments use; i.i.d. gaussian keys
        (`synthetic_device`) make the softmax maximally diffuse and are the
        WORST case for any locality-exploiting path.
        """
        from ..models.satclip import SatClipLocationConfig, SatClipLocationEncoder

        n_rows = _round_up(n, pad_to)
        k = jax.random.PRNGKey(seed + 7919)
        k1, k2, k4, k5 = jax.random.split(k, 4)
        lons = jax.random.uniform(k1, (n_rows,), jnp.float32, -180.0, 180.0)
        lats = jnp.degrees(jnp.arcsin(
            jax.random.uniform(k2, (n_rows,), jnp.float32, -1.0, 1.0)))
        locs = jnp.stack([lons, lats], 1)
        row_ok = (jnp.arange(n_rows) < n)[:, None]

        tower = SatClipLocationEncoder(SatClipLocationConfig(embed_dim=key_dim))
        tower_params = tower.init(jax.random.PRNGKey(tower_seed),
                                  dtype=jnp.float32)

        @jax.jit
        def feats(params, locs):
            # generator stability: pin to the UNFUSED basis->net compose so
            # the generated bank (and every hier-cache fingerprint derived
            # from it) is invariant to tower fast-path changes like the
            # fused-SH first layer (models/satclip.py _fused_first_preact)
            basis = tower.posenc(locs)
            return tower.nnet.apply(params, basis)

        # chunked tower evaluation: the [rows, L*L] SH basis is ~6.4 GB
        # f32 at 1M rows — evaluating all rows at once OOM'd HBM on the
        # 16 GB chip; 128k-row chunks keep the intermediate under ~0.9 GB
        # (131072 * 1600 * 4 B) with bit-identical output (the basis is
        # per-row)
        # (threshold above the standard 100k fixtures so their keys stay
        # bit-identical to every previously recorded number/cache)
        CH = 131_072
        if n_rows <= CH:
            f = feats(tower_params, locs)  # [n_rows, key_dim]
        else:
            f = jnp.concatenate(
                [feats(tower_params, locs[lo:min(lo + CH, n_rows)])
                 for lo in range(0, n_rows, CH)], axis=0)
        keys = f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)
        keys = keys + key_noise * jax.random.normal(
            k5, (n_rows, key_dim), jnp.float32) / jnp.sqrt(float(key_dim))
        keys = keys / jnp.maximum(jnp.linalg.norm(keys, axis=1, keepdims=True),
                                  1e-12)
        keys = jnp.where(row_ok, keys, 0.0).astype(key_dtype)
        kv, kn = jax.random.split(k4)
        w = jax.random.normal(kv, (key_dim, value_dim), jnp.float32)
        w = w / jnp.sqrt(float(key_dim))
        vals = jnp.tanh(f @ w) + 0.1 * jax.random.normal(
            kn, (n_rows, value_dim), jnp.float32)
        vals = jnp.where(row_ok, vals, 0.0).astype(value_dtype)
        locs = jnp.where(row_ok, locs, 0.0)
        return cls(
            locs_lonlat=locs,
            xyz=jnp.where(row_ok, lonlat_deg_to_xyz(locs), 0.0),
            keys_sem=keys,
            values=vals,
            n_valid=jnp.asarray(n, jnp.int32),
        )

    def row_mask(self) -> jnp.ndarray:
        """[Np] float32 {0,1} validity mask."""
        if self.valid_mask is not None:
            return self.valid_mask.astype(jnp.float32)
        return (
            jnp.arange(self.num_rows, dtype=jnp.int32) < self.n_valid
        ).astype(jnp.float32)


def quantize_values(bank: GeoBank) -> GeoBank:
    """Per-row symmetric int8 quantization of the value matrix.

    values[r] ~= int8[r] * scale[r] with scale = max|row| / 127 — exact in
    sign/zero rows, <=0.4% per-element rounding on gaussian-like embeddings,
    and the dual-softmax's weighted averaging smooths the retrieved-feature
    error well below that.  Keys and all softmax math are untouched, so
    recall is unaffected.  Runs on device (jit) — no host round-trip."""
    if bank.value_scale is not None:
        return bank

    @jax.jit
    def _q(values):
        v = values.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(v), axis=1), 1e-12) / 127.0
        v_i8 = jnp.clip(jnp.round(v / scale[:, None]), -127, 127).astype(jnp.int8)
        return v_i8, scale[None, :]

    v_i8, scale = _q(bank.values)
    return dataclasses.replace(bank, values=v_i8, value_scale=scale)


def dequantize_values(bank: GeoBank) -> jnp.ndarray:
    """[Np, Dv] f32 reconstruction of quantized values (for exact paths)."""
    if bank.value_scale is None:
        return bank.values.astype(jnp.float32)
    return bank.values.astype(jnp.float32) * bank.value_scale.T


def from_npz_device(path: str, *, pad_to: int = 1024,
                    key_dtype=jnp.float32, value_dtype=jnp.float32,
                    use_native: bool = True) -> GeoBank:
    """Device-prep npz load: ship the three RAW arrays with async
    `jax.device_put` (transfers overlap — no host-side normalize/pad on the
    critical path) and run L2-normalization, xyz conversion, padding, and
    dtype casts in ONE jitted program on device.

    Equivalent to `GeoBank.from_npz` (range.py:78-100 semantics); preferable
    for large banks on tunneled/remote devices where host round-trips
    dominate.  The host only touches bytes once (the mmap read)."""
    db = None
    if use_native:
        try:
            from ..native.bankio import load_npz_native

            def ship(_name, arr):
                # reader-thread hook: start the async device transfer the
                # moment THIS member finishes inflating, overlapping it
                # with the other members' decompression (ROADMAP item;
                # jax.device_put dispatches without blocking)
                if arr.dtype != np.float32:
                    arr = np.ascontiguousarray(arr, np.float32)
                return jax.device_put(arr)

            db = load_npz_native(
                path, ["locs", "satclip_embeddings", "image_embeddings"],
                on_member=ship)
        except Exception:
            db = None
    if db is None:
        db = np.load(path, allow_pickle=True)
    def dev(x):
        return x if hasattr(x, "devices") else jax.device_put(
            np.ascontiguousarray(x, np.float32))
    locs = dev(db["locs"])
    keys = dev(db["satclip_embeddings"])
    vals = dev(db["image_embeddings"])
    n = int(locs.shape[0])
    n_rows = _round_up(n, pad_to)

    @jax.jit
    def prep(locs, keys, vals):
        keys = keys / jnp.linalg.norm(keys, axis=1, keepdims=True)
        pad = n_rows - n
        locs_p = jnp.pad(locs, ((0, pad), (0, 0)))
        return (
            locs_p,
            jnp.pad(lonlat_deg_to_xyz(locs), ((0, pad), (0, 0))),
            jnp.pad(keys, ((0, pad), (0, 0))).astype(key_dtype),
            jnp.pad(vals, ((0, pad), (0, 0))).astype(value_dtype),
        )

    locs_p, xyz, keys_p, vals_p = prep(locs, keys, vals)
    return GeoBank(locs_lonlat=locs_p, xyz=xyz, keys_sem=keys_p,
                   values=vals_p, n_valid=jnp.asarray(n, jnp.int32))
