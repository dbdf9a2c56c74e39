"""Serving layer: bucketed padding, dynamic batching, HTTP surface."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import range_tpu
from range_tpu.serve import BucketedRunner, DynamicBatcher, EmbeddingServer


@pytest.fixture(scope="module")
def encoder():
    return range_tpu.load_model("Wrap")


def _rand_coords(n, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack([rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)],
                    1).astype(np.float32)


def test_bucketed_runner_matches_direct(encoder):
    runner = BucketedRunner(encoder, buckets=[4, 16], max_batch=16)
    for n in [1, 3, 4, 5, 16, 37]:  # crosses buckets and max_batch chunking
        coords = _rand_coords(n, seed=n)
        direct = np.asarray(encoder(coords))
        served = runner(coords)
        assert served.shape == direct.shape
        np.testing.assert_allclose(served, direct, rtol=1e-6, atol=1e-6)


def test_bucketed_runner_rejects_bad_shapes(encoder):
    runner = BucketedRunner(encoder, buckets=[4])
    with pytest.raises(ValueError):
        runner(np.zeros((3,), np.float32))
    with pytest.raises(ValueError):
        runner(np.zeros((3, 5), np.float32))


def test_dynamic_batcher_concurrent(encoder):
    runner = BucketedRunner(encoder, buckets=[8, 64], max_batch=64)
    batcher = DynamicBatcher(runner, max_wait_ms=5.0)
    try:
        inputs = [_rand_coords(n, seed=100 + n) for n in [2, 5, 7, 3]]
        results = [None] * len(inputs)

        def work(i):
            results[i] = batcher.embed(inputs[i])

        threads = [threading.Thread(target=work, args=(i,))
                   for i in range(len(inputs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i, c in enumerate(inputs):
            np.testing.assert_allclose(results[i], np.asarray(encoder(c)),
                                       rtol=1e-6, atol=1e-6)
    finally:
        batcher.close()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def test_http_server_roundtrip(encoder):
    with EmbeddingServer(encoder, port=0, buckets=[8], max_batch=8) as srv:
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["model"] == "Wrap"

        coords = _rand_coords(5, seed=7)
        out = _post(base + "/embed", {"coords": coords.tolist()})
        emb = np.asarray(out["embeddings"], np.float32)
        np.testing.assert_allclose(emb, np.asarray(encoder(coords)),
                                   rtol=1e-5, atol=1e-5)

        # malformed requests -> 400, wrong path -> 404
        for payload in [{"coords": [1, 2, 3]}, {"wrong": []}]:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(base + "/embed", payload)
            assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/nope", {})
        assert ei.value.code == 404


def test_topk_endpoint():
    """POST /topk returns nearest-bank-row ids + locations for RANGE
    encoders; non-retrieval encoders 400 on it."""
    from range_tpu.bank.bank import GeoBank
    from range_tpu.ops.retrieval import exact_nn
    import jax.numpy as jnp

    bank = GeoBank.synthetic(0, 1000, key_dim=256, value_dim=32, pad_to=512)
    enc = range_tpu.load_model("RANGE+", db_path=bank, chunk=512, seed=0)
    with EmbeddingServer(enc, port=0, buckets=[8], max_batch=8,
                         warmup=False) as srv:
        coords = _rand_coords(5, seed=9)
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/topk",
            data=json.dumps({"coords": coords.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = json.loads(resp.read())
        assert len(out["ids"]) == 5 and len(out["locs"]) == 5
        q = enc.model.query_embedding(enc.params, jnp.asarray(coords))
        true = np.asarray(exact_nn(q, bank, chunk=512))
        # hi/lo tier-matched top-1 equals exact NN on this tiny bank
        assert (np.asarray(out["ids"]) == true).mean() >= 0.8

    wrap = range_tpu.load_model("Wrap")
    with EmbeddingServer(wrap, port=0, buckets=[8], max_batch=8,
                         warmup=False) as srv:
        assert srv.topk is None
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/topk",
            data=json.dumps({"coords": coords.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 400


def test_topk_runner_hier_on_cpu_pads_coherently():
    """A hier-serving TopkRunner must (a) run off-TPU via the interpret
    fallback instead of 500ing, and (b) bucket-pad requests by repeating
    the last real coordinate — (0, 0) pads would be treated as valid
    queries and burn the k_tiles selection budget (advisor r2)."""
    from range_tpu.bank.bank import GeoBank
    from range_tpu.ops.retrieval import exact_nn
    from range_tpu.serve import TopkRunner
    import jax.numpy as jnp

    bank = GeoBank.synthetic_informative(4, 3000, key_dim=256, value_dim=32,
                                         pad_to=512)
    enc = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                               hier_bn=128, gsz_geo=16, chunk=512, seed=0)
    runner = TopkRunner(enc, buckets=[8], max_batch=8)
    assert runner.hier
    coords = _rand_coords(5, seed=13)  # 5 -> padded to bucket 8
    out = runner(coords)
    assert len(out["ids"]) == 5 and len(out["locs"]) == 5
    q = enc.model.query_embedding(enc.params, jnp.asarray(coords))
    true = np.asarray(exact_nn(q, enc.extra.bank, chunk=512))
    assert (np.asarray(out["ids"]) == true).mean() >= 0.8


def test_topk_k_and_mesh_serving():
    """k > 1 rides the k-carry kernel through TopkRunner, the /topk body
    accepts `"k"` (rejecting k > MAX_K with a 400), and a mesh-backed hier
    encoder routes through sharded_hier_topk (VERDICT r2 #3)."""
    from range_tpu.bank.bank import GeoBank
    from range_tpu.ops.topk import topk_sem
    from range_tpu.parallel.mesh import make_mesh
    from range_tpu.serve import TopkRunner
    import jax.numpy as jnp

    bank = GeoBank.synthetic_informative(4, 3000, key_dim=256, value_dim=32,
                                         pad_to=512)
    enc = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                               hier_bn=128, gsz_geo=16, chunk=512, seed=0)
    runner = TopkRunner(enc, buckets=[16], max_batch=16)
    coords = _rand_coords(10, seed=21)
    out = runner(coords, k=4)
    ids = np.asarray(out["ids"])
    assert ids.shape == (10, 4) and np.asarray(out["locs"]).shape == (10, 4, 2)
    q = enc.model.query_embedding(enc.params, jnp.asarray(coords))
    _, true4 = topk_sem(q, enc.extra.bank, k=4, chunk=512)
    hits = np.mean([np.isin(t, g).mean()
                    for t, g in zip(np.asarray(true4), ids)])
    assert hits >= 0.7, hits
    with pytest.raises(ValueError):
        runner(coords, k=9)

    # mesh-backed hier encoder -> sharded_hier_topk path
    mesh = make_mesh((8,), ("bank",))
    enc_m = range_tpu.load_model("RANGE+", db_path=bank, retrieval="hier",
                                 hier_bn=128, gsz_geo=16, chunk=512, seed=0,
                                 mesh=mesh)
    runner_m = TopkRunner(enc_m, buckets=[16], max_batch=16)
    assert runner_m.mesh is mesh
    out_m = runner_m(coords, k=1)
    assert len(out_m["ids"]) == 10
    # ground truth in the MESH build's own row order (shards>1 interleaves
    # tiles round-robin, so rows differ from the single-device build)
    q_m = enc_m.model.query_embedding(enc_m.params, jnp.asarray(coords))
    _, true_m = topk_sem(q_m, enc_m.extra.bank, k=1, chunk=512)
    assert (np.asarray(out_m["ids"]) == np.asarray(true_m)[:, 0]).mean() \
        >= 0.7

    # HTTP surface: k in the body; k > MAX_K -> 400
    from range_tpu.serve import EmbeddingServer
    with EmbeddingServer(enc, port=0, buckets=[16], max_batch=16,
                         warmup=False) as srv:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/topk",
            data=json.dumps({"coords": coords.tolist(), "k": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            got = json.loads(resp.read())
        assert np.asarray(got["ids"]).shape == (10, 3)
        bad = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/topk",
            data=json.dumps({"coords": coords.tolist(), "k": 99}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=60)
        assert e.value.code == 400


def test_serve_cli_profile_kwargs(monkeypatch):
    """`--profile` resolves through api.SERVING_PROFILES in serve's CLI
    and merges under explicit flags; `--hier-cache` passes through."""
    import range_tpu.serve as srv

    seen = {}

    def fake_load_model(model, profile=None, **kw):
        seen["model"] = model
        seen["profile"] = profile
        seen.update(kw)
        raise SystemExit(0)  # stop before binding a server

    monkeypatch.setattr("range_tpu.api.load_model", fake_load_model)
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        srv.main(["--model", "RANGE+", "--db-path", "bank.npz",
                  "--profile", "flagship", "--hier-cache", "/tmp/hc.npz"])
    assert seen["model"] == "RANGE+"
    assert seen["profile"] == "flagship"
    assert seen["db_path"] == "bank.npz"
    assert seen["hier_cache"] == "/tmp/hc.npz"


def test_serve_cli_hier_cache_without_hier_warns(monkeypatch, caplog):
    """--hier-cache with dense retrieval is silently unused by load_model;
    the CLI must warn so operators don't assume fast restarts."""
    import logging

    import range_tpu.serve as srv

    def fake_load_model(model, profile=None, **kw):
        raise SystemExit(0)

    monkeypatch.setattr("range_tpu.api.load_model", fake_load_model)
    import pytest as _pytest

    with caplog.at_level(logging.WARNING, logger="range_tpu"):
        with _pytest.raises(SystemExit):
            srv.main(["--model", "RANGE+", "--db-path", "b.npz",
                      "--hier-cache", "/tmp/hc.npz"])
    assert any("hier-cache" in r.message for r in caplog.records)


def test_serve_cli_explicit_retrieval_overrides_profile(monkeypatch):
    """An explicit --retrieval dense must reach load_model even though it
    equals the argparse-era default, so it overrides a hier profile's
    retrieval entry (advisor r3 #2)."""
    import range_tpu.serve as srv

    seen = {}

    def fake_load_model(model, profile=None, **kw):
        seen["profile"] = profile
        seen.update(kw)
        raise SystemExit(0)

    monkeypatch.setattr("range_tpu.api.load_model", fake_load_model)
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        srv.main(["--model", "RANGE+", "--db-path", "b.npz",
                  "--profile", "flagship", "--retrieval", "dense"])
    assert seen["retrieval"] == "dense"  # wins over the profile's 'hier'

    # and when the user passes nothing, the profile's choice is untouched
    seen.clear()
    with _pytest.raises(SystemExit):
        srv.main(["--model", "RANGE+", "--db-path", "b.npz",
                  "--profile", "flagship"])
    assert "retrieval" not in seen
