"""Production serving for geo-embedding encoders.

The reference ships offline scripts only (`save_embeddings` /
`utils/evaluate.py`); deployment-grade serving is this framework's extension,
built around two TPU/XLA facts:

  * `jit` compiles per shape — arbitrary request sizes would recompile
    constantly.  `BucketedRunner` pads every request up to a fixed bucket
    ladder so the compile cache stays small and warm.
  * one large device call beats many small ones (tunnel/dispatch overhead
    dominates tiny batches).  `DynamicBatcher` coalesces concurrent requests
    into single device calls up to `max_batch`, amortizing dispatch.

`serve_http` exposes the encoder over stdlib HTTP (POST /embed, GET /healthz)
so there is a wire surface with zero extra dependencies.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def _default_buckets(max_batch: int) -> Sequence[int]:
    b, out = 16, []
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


class BucketedRunner:
    """Pads [B, 2] coordinate batches to a fixed bucket ladder before the
    jitted call, so XLA compiles one program per bucket (not per request
    size).  Oversized requests are chunked at `max_batch`."""

    def __init__(self, encoder, buckets: Optional[Sequence[int]] = None,
                 max_batch: int = 4096):
        self.encoder = encoder
        self.buckets = sorted(buckets or _default_buckets(max_batch))
        self.max_batch = self.buckets[-1]

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.max_batch

    def warmup(self) -> None:
        """Pre-compile every bucket (first requests see no compile stall)."""
        for b in self.buckets:
            np.asarray(self.encoder(jnp.zeros((b, 2), jnp.float32)))

    def __call__(self, coords: np.ndarray) -> np.ndarray:
        coords = np.asarray(coords, np.float32)
        if coords.ndim != 2 or coords.shape[-1] != 2:
            raise ValueError(f"expected [B, 2] (lon, lat), got {coords.shape}")
        outs = []
        for start in range(0, len(coords), self.max_batch):
            chunk = coords[start:start + self.max_batch]
            b = self._bucket(len(chunk))
            padded = np.zeros((b, 2), np.float32)
            padded[: len(chunk)] = chunk
            out = np.asarray(self.encoder(jnp.asarray(padded)))
            outs.append(out[: len(chunk)])
        return np.concatenate(outs, 0) if len(outs) > 1 else outs[0]


class DynamicBatcher:
    """Coalesces concurrent `embed` calls into single device batches.

    A background thread drains the request queue: it takes the first pending
    request, then greedily folds in whatever else is queued (up to
    `max_batch` rows or `max_wait_ms`), runs ONE bucketed device call, and
    scatters results back through per-request events.
    """

    def __init__(self, runner: BucketedRunner, max_wait_ms: float = 2.0):
        self.runner = runner
        self.max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            rows = len(first[0])
            deadline = self.max_wait
            while rows < self.runner.max_batch:
                try:
                    item = self._q.get(timeout=deadline)
                except queue.Empty:
                    break
                batch.append(item)
                rows += len(item[0])
                deadline = 0.0  # drain whatever is already queued, don't wait
            coords = np.concatenate([b[0] for b in batch], 0)
            try:
                out = self.runner(coords)
                err = None
            except Exception as e:  # propagate to every waiter
                out, err = None, e
            offset = 0
            for c, slot, ev in batch:
                if err is None:
                    slot["out"] = out[offset:offset + len(c)]
                else:
                    slot["err"] = err
                offset += len(c)
                ev.set()

    def embed(self, coords: np.ndarray, timeout: float = 60.0) -> np.ndarray:
        coords = np.asarray(coords, np.float32)
        slot, ev = {}, threading.Event()
        self._q.put((coords, slot, ev))
        if not ev.wait(timeout):
            raise TimeoutError("embed request timed out")
        if "err" in slot:
            raise slot["err"]
        return slot["out"]

    def close(self):
        self._stop.set()
        self._thread.join(timeout=2.0)


class TopkRunner:
    """Nearest-bank-row serving (`POST /topk`, optional `"k"` 1..8): the
    recall-critical endpoint.

    Routes to `ops.retrieval_hier.hier_topk` when the encoder serves a
    prepared HierBank (recall@1 >= 0.999 measured, bench.py) — via
    `parallel.sharded_hier_topk` when the encoder runs on a mesh — else to
    the dense hi/lo tier-matched `ops.topk.topk_packed`.  Returns bank row
    ids ([B] for k=1, [B, k] otherwise) and their (lon, lat).  Request
    sizes are bucket-padded like embeddings.
    """

    MAX_K = 8  # the k-carry kernel's bound (ops/retrieval_hier.py)

    def __init__(self, encoder, buckets: Optional[Sequence[int]] = None,
                 max_batch: int = 4096):
        from .ops.retrieval_hier import HierBank

        self.encoder = encoder
        self.buckets = sorted(buckets or _default_buckets(max_batch))
        self.max_batch = self.buckets[-1]
        extra = getattr(encoder, "extra", None)
        self.hier = isinstance(extra, HierBank)
        self.bank = extra.bank if self.hier else extra
        cfg = getattr(getattr(encoder, "model", None), "config", None)
        self.mesh = getattr(cfg, "mesh", None)
        self.bank_axis = getattr(cfg, "bank_axis", "bank")
        if self.bank is None or not hasattr(encoder, "model") \
                or not hasattr(encoder.model, "query_embedding"):
            raise ValueError("topk serving needs a RANGE-family encoder "
                             "with a retrieval bank")

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.max_batch

    def _ids(self, coords: np.ndarray, k: int) -> np.ndarray:
        import jax

        from .geometry import lonlat_deg_to_xyz

        enc = self.encoder
        c = jnp.asarray(coords, jnp.float32)
        q = enc.model.query_embedding(enc.params, c)
        if self.hier:
            # interpret off-TPU, like every other hier call site — without
            # it `--retrieval hier` would 500 on CPU/GPU backends
            interpret = jax.default_backend() != "tpu"
            if self.mesh is not None:
                from .parallel.sharded import sharded_hier_topk

                return np.asarray(sharded_hier_topk(
                    q, lonlat_deg_to_xyz(c), enc.extra, self.mesh, k=k,
                    bank_axis=self.bank_axis, interpret=interpret))
            from .ops.retrieval_hier import hier_topk

            return np.asarray(hier_topk(
                q, lonlat_deg_to_xyz(c), enc.extra, k=k,
                interpret=interpret))
        from .ops.topk import topk_packed

        ids = np.asarray(topk_packed(q, self.bank, k=k, tier="high")[1])
        return ids[:, 0] if k == 1 else ids

    def __call__(self, coords: np.ndarray, k: int = 1) -> dict:
        if not 1 <= k <= self.MAX_K:
            raise ValueError(f"k must be in [1, {self.MAX_K}], got {k}")
        n = coords.shape[0]
        out = []
        for lo in range(0, n, self.max_batch):
            chunk = coords[lo:lo + self.max_batch]
            b = self._bucket(chunk.shape[0])
            pad = b - chunk.shape[0]
            if pad:
                # pad by REPEATING the last real coordinate: (0, 0)-padded
                # rows would be treated as valid queries, join the query
                # tiles, and burn hier_topk's k_tiles selection budget on
                # the gulf of Guinea, skewing recall for real queries there
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0)
            ids = self._ids(chunk, k)
            out.append(ids[: b - pad] if pad else ids)
        ids = np.concatenate(out)[:n]
        locs = np.asarray(self.bank.locs_lonlat)[ids]
        return {"ids": ids.tolist(), "locs": locs.tolist()}


def make_handler(batcher: DynamicBatcher, encoder_name: str,
                 topk: Optional[TopkRunner] = None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok", "model": encoder_name})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path not in ("/embed", "/topk"):
                return self._reply(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                coords = np.asarray(req["coords"], np.float32)
                if coords.ndim != 2 or coords.shape[-1] != 2:
                    raise ValueError("coords must be [[lon, lat], ...]")
                k = int(req.get("k", 1))
                if topk is not None and not 1 <= k <= topk.MAX_K:
                    raise ValueError(
                        f"k must be in [1, {topk.MAX_K}], got {k}")
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                return self._reply(400, {"error": str(e)})
            if self.path == "/topk":
                if topk is None:
                    return self._reply(400, {"error": "topk serving needs a "
                                             "RANGE-family encoder with a "
                                             "retrieval bank"})
                try:
                    return self._reply(200, topk(coords, k=k))
                except Exception as e:
                    return self._reply(500, {"error": str(e)})
            try:
                out = batcher.embed(coords)
            except Exception as e:
                return self._reply(500, {"error": str(e)})
            self._reply(200, {"embeddings": out.tolist()})

    return Handler


class EmbeddingServer:
    """HTTP front-end: POST /embed {"coords": [[lon, lat], ...]} ->
    {"embeddings": [[...], ...]}; GET /healthz.  `port=0` binds an ephemeral
    port (see `.port`)."""

    def __init__(self, encoder, host: str = "127.0.0.1", port: int = 0,
                 buckets: Optional[Sequence[int]] = None,
                 max_batch: int = 4096, warmup: bool = True,
                 max_wait_ms: float = 2.0):
        self.runner = BucketedRunner(encoder, buckets, max_batch)
        if warmup:
            self.runner.warmup()
        self.batcher = DynamicBatcher(self.runner, max_wait_ms)
        name = getattr(encoder, "name", type(encoder).__name__)
        try:
            self.topk = TopkRunner(encoder, buckets, max_batch)
        except ValueError:
            self.topk = None  # non-retrieval encoders serve /embed only
        self._httpd = ThreadingHTTPServer(
            (host, port), make_handler(self.batcher, name, self.topk))
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        self.batcher.close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *a):
        self.stop()


def serve_http(encoder, host: str = "127.0.0.1", port: int = 8080,
               **kwargs) -> None:
    """Blocking entry point: `python -m range_tpu.serve --model RANGE+ ...`"""
    server = EmbeddingServer(encoder, host, port, **kwargs).start()
    print(f"serving {getattr(encoder, 'name', '?')} on {host}:{server.port}")
    try:
        server._thread.join()
    except KeyboardInterrupt:
        server.stop()


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse

    from .api import load_model

    ap = argparse.ArgumentParser(description="Serve a geo-embedding encoder")
    ap.add_argument("--model", default="Direct")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-batch", type=int, default=4096)
    ap.add_argument("--db-path", default=None,
                    help="retrieval bank npz for RANGE/RANGE+")
    ap.add_argument("--value-quant", default=None, choices=["int8"],
                    help="quantize bank values (halves bank HBM footprint)")
    ap.add_argument("--retrieval", default=None, choices=["dense", "hier"],
                    help="hier = two-stage approximate serving "
                         "(ops/retrieval_hier.py; ~3x dense throughput). "
                         "Default: dense, or the --profile's choice; an "
                         "explicit value overrides the profile")
    ap.add_argument("--profile", default=None,
                    help="named serving-kwarg bundle (api.SERVING_PROFILES: "
                         "exact | flagship | turbo); explicit flags win")
    ap.add_argument("--hier-cache", default=None,
                    help="persist the prepacked hier bank to this npz "
                         "(validated build signature; serving restarts "
                         "load in seconds instead of re-clustering)")
    args = ap.parse_args(argv)
    kw = {"db_path": args.db_path} if args.db_path else {}
    if args.value_quant:
        kw["value_quant"] = args.value_quant
    if args.retrieval is not None:
        # forwarded whenever the user passed it, so an explicit
        # --retrieval dense genuinely overrides a hier profile
        kw["retrieval"] = args.retrieval
    if args.hier_cache:
        from .api import SERVING_PROFILES

        prof_retr = (SERVING_PROFILES.get(args.profile or "", {})
                     .get("retrieval"))
        eff_retr = args.retrieval if args.retrieval is not None else prof_retr
        if eff_retr != "hier":
            import logging

            logging.getLogger("range_tpu").warning(
                "--hier-cache given but retrieval is dense (no --retrieval "
                "hier / hier profile) — the cache will not be used")
        kw["hier_cache"] = args.hier_cache
    encoder = load_model(args.model, profile=args.profile, **kw)
    serve_http(encoder, args.host, args.port, max_batch=args.max_batch)


if __name__ == "__main__":
    main()
