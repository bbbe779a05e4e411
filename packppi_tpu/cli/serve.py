"""packppi-serve: persistent warm-model inference server (HTTP/JSON).

The reference has no serving story — every eval invocation pays model
load + device init per structure (reference: src/eval_diffusion.py
loads the checkpoint, builds the model, and exits after one complex).
On TPU the per-process cost dominates short requests (compile ~20-40 s
cold, and on tunnel-attached dev boxes ~40-60 s of device init +
executable loads, PERF.md "Tunnel-environment note"), so production
serving needs the model RESIDENT: packppi-serve keeps the jitted
sampler, proximal optimizer, and (lazily) the affinity model warm in
one process. Repeat requests at a seen length bucket are pure device
time (~31 ms sampling on one v5e) plus host featurization.

Endpoints (JSON bodies in, JSON out):

  GET  /healthz -> {"status": "ok", "backend", "devices", ...}
  POST /pack    -> {"pdb": <pdb text>, "n_samples"?, "use_proximal"?,
                    "seed"?, "metrics"?} -> {"pdb": packed, "metrics"}
  POST /prox    -> {"pdb": <pdb text>, "num_steps"?, "lamda"?, ...}
                   -> {"pdb": refined, "metrics"}
  POST /ddg     -> {"pdb": <pdb text>, "mutstr": "KI15G[,..]"}
                   -> {"ddg_pred": kcal/mol}

Concurrency: HTTP threads run host work (parsing, featurization, PDB
serialization) freely; a single lock serializes device dispatches —
one chip, one queue, no cross-request interference. Length bucketing
(data/batch.py) means new lengths reuse compiled executables at the
bucket shape; an unseen bucket pays one compile.
"""
from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="PackPPI-TPU inference server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8642,
                   help="TCP port (0 = pick a free port, printed on start)")
    p.add_argument("--ckpt", default=None, help="diffusion checkpoint (packing)")
    p.add_argument("--affinity_ckpt", default=None, help="affinity-net checkpoint")
    p.add_argument("--pre_ckpt", default=None,
                   help="frozen diffusion backbone for /ddg (defaults to --ckpt)")
    p.add_argument("--n_steps", type=int, default=30, help="reverse-diffusion steps")
    p.add_argument("--precision", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--no_fused", action="store_true")
    p.add_argument("--geometry", default="global", choices=["global", "local"])
    p.add_argument("--platform", default=None, help="jax platform override (cpu/axon)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--molprobity_loc", default=None)
    p.add_argument("--warmup", default=None, metavar="PDB",
                   help="pack this structure once at startup so the first "
                        "real request hits a warm executable")
    p.add_argument("--max_body_mb", type=int, default=16,
                   help="reject request bodies larger than this (413); a "
                        "memory-DoS guard for non-localhost --host binds")
    p.add_argument("--tmp_dir", default=None,
                   help="scratch dir for the metric suite (default: <cwd>/packppi_serve_tmp)")
    return p


class PackSession:
    """Warm packing + proximal state: model, params, jitted callables.

    All jitted functions cache by batch bucket shape — the session never
    re-traces for a repeat length bucket. Device work MUST go through
    ``self.device_lock`` (one chip, serialized dispatch)."""

    def __init__(self, args):
        from packppi_tpu.utils.platform import configure_platform
        configure_platform(getattr(args, "platform", None))
        import jax

        from packppi_tpu.data import stack_batch
        from packppi_tpu.geometry import atom14_coords_from_torsions
        from packppi_tpu.models import (NetworkConfig, SampleConfig,
                                        TorsionalDiffusion)
        from packppi_tpu.ops.clash import compute_residue_clash
        from packppi_tpu.sampling import proximal_optimize
        from packppi_tpu.structure.featurize import featurize
        from packppi_tpu.train import load_model_params

        self.args = args
        self.jax = jax
        self.stack_batch = stack_batch
        self.featurize = featurize
        self.device_lock = threading.Lock()
        self._key_lock = threading.Lock()

        fused = (not getattr(args, "no_fused", False)
                 and jax.default_backend().startswith(("tpu", "axon")))
        geometry = getattr(args, "geometry", "global")
        fm = (False if not fused
              else (True if geometry == "local" else "geom_lanes"))
        net_cfg = NetworkConfig(compute_dtype=args.precision, fused_messages=fm,
                                fused_chain=fused, geometry_mode=geometry)
        self.model = TorsionalDiffusion.create(net_cfg, SampleConfig())
        self._key = jax.random.key(args.seed)

        # params need a template batch; any tiny synthetic one works for
        # shape inference (the network is length-agnostic)
        init_feats, _ = _synthetic_feats()
        init_batch = stack_batch([init_feats])
        if args.ckpt:
            template = jax.eval_shape(
                lambda: self.model.init(jax.random.key(0), init_batch))
            self.params = load_model_params(args.ckpt, template)
            self.random_weights = False
        else:
            print("WARNING: no --ckpt given; serving randomly initialized weights")
            self.params = self.model.init(jax.random.key(args.seed), init_batch)
            self.random_weights = True

        cfg = self.model.sample_cfg
        n_steps = args.n_steps

        def _pack(p, k, b):
            sc = self.model.sample(p, k, b, n_steps=n_steps)
            clash = (compute_residue_clash(b, sc) * b.residue_mask).sum(-1)
            return sc, clash

        def _prox(b, sc, lamda, vt, ct, num_steps):
            return proximal_optimize(b, sc, vt, ct, lamda, num_steps)

        self._pack_fn = jax.jit(_pack)
        # num_steps sets a scan length; the tolerances key a host-side
        # bounds cache (ops/clash._bounds_cached) -> all trace-time static.
        # Distinct tolerance combos recompile, same as the one-shot CLIs.
        self._prox_fn = jax.jit(_prox, static_argnums=(2, 3, 4, 5))
        self._coords_fn = jax.jit(lambda b, sc: atom14_coords_from_torsions(
            b.X, b.residue_type, b.BB_D, sc))
        self.sample_cfg = cfg
        self.buckets_seen: list[int] = []

    def next_key(self, seed=None):
        if seed is not None:
            return self.jax.random.key(int(seed))
        with self._key_lock:
            self._key, k = self.jax.random.split(self._key)
            return k

    def _featurize_text(self, pdb_text: str):
        from packppi_tpu.structure import from_pdb_string

        prot = from_pdb_string(pdb_text, mse_to_met=True)
        feats = self.featurize(prot)
        return prot, feats

    MAX_SAMPLES = 32  # request-body batch cap: bounds device memory and
    #                   the per-shape compile cache against abusive clients

    def pack(self, pdb_text: str, n_samples: int = 1, use_proximal: bool = False,
             seed=None, want_metrics: bool = True) -> dict:
        from packppi_tpu.cli._directory import merge_output_structure
        from packppi_tpu.structure import to_pdb

        jnp = self.jax.numpy
        if not 1 <= int(n_samples) <= self.MAX_SAMPLES:
            raise ServeError(400, f"n_samples must be in [1, {self.MAX_SAMPLES}]")
        prot, feats = self._featurize_text(pdb_text)
        n_samples = int(n_samples)
        batch = self.stack_batch([feats] * n_samples)
        L_bucket = int(batch.residue_type.shape[1])
        with self._key_lock:  # buckets_seen shares the small-state lock
            if L_bucket not in self.buckets_seen:
                self.buckets_seen.append(L_bucket)
        key = self.next_key(seed)

        t0 = time.perf_counter()
        with self.device_lock:
            sc, clash = self._pack_fn(self.params, key, batch)
            best = int(jnp.argmin(clash))
            take = lambda x: np.asarray(x)[best:best + 1]
            batch1 = self.jax.tree.map(take, batch)
            sc1 = take(sc)
            accepted = None
            if use_proximal:
                cfg = self.sample_cfg
                res = self._prox_fn(batch1, sc1, cfg.lamda,
                                    cfg.violation_tolerance_factor,
                                    cfg.clash_overlap_tolerance, cfg.num_steps)
                accepted = bool(float(res.losses[-1]) < float(res.losses[0]))
                if accepted:
                    sc1 = res.SC_D
            coords = self._coords_fn(batch1, sc1)
            coords = np.asarray(coords)
        t_device = time.perf_counter() - t0

        L = len(feats["residue_type"])
        out_prot = merge_output_structure(prot, feats, batch1, coords, L)
        out_text = to_pdb(out_prot)
        metrics = {"device_seconds": t_device, "n_samples": n_samples,
                   "length_bucket": L_bucket,
                   "random_weights": self.random_weights}
        if use_proximal:
            metrics["proximal_accepted"] = accepted
        if want_metrics and feats["SC_D_mask"].sum() > 0:
            metrics.update(self._metric_suite(pdb_text, out_text))
        return {"pdb": out_text, "metrics": metrics}

    def prox(self, pdb_text: str, num_steps: int = 50, lamda: float = 1.0,
             violation_tolerance_factor: float = 12.0,
             clash_overlap_tolerance: float = 0.5,
             want_metrics: bool = True) -> dict:
        from packppi_tpu.cli._directory import merge_output_structure
        from packppi_tpu.structure import to_pdb

        if not 1 <= int(num_steps) <= 1000:
            raise ServeError(400, "num_steps must be in [1, 1000]")
        prot, feats = self._featurize_text(pdb_text)
        if feats["SC_D_mask"].sum() == 0:
            raise ServeError(400, "input structure has no side-chain chi "
                                  "angles to optimize")
        batch = self.stack_batch([feats])
        t0 = time.perf_counter()
        with self.device_lock:
            res = self._prox_fn(batch, batch.SC_D, float(lamda),
                                float(violation_tolerance_factor),
                                float(clash_overlap_tolerance), int(num_steps))
            accepted = bool(float(res.losses[-1]) < float(res.losses[0]))
            sc = res.SC_D if accepted else batch.SC_D
            coords = np.asarray(self._coords_fn(batch, sc))
        t_device = time.perf_counter() - t0

        L = len(feats["residue_type"])
        out_prot = merge_output_structure(prot, feats, batch, coords, L)
        out_text = to_pdb(out_prot)
        metrics = {"device_seconds": t_device, "accepted": accepted,
                   "objective_initial": float(res.losses[0]),
                   "objective_final": float(res.losses[-1])}
        if want_metrics:
            before = self._clashscore(pdb_text)
            after = self._clashscore(out_text)
            if before is not None:
                metrics["clashscore_before"] = before
            if after is not None:
                metrics["clashscore_after"] = after
        return {"pdb": out_text, "metrics": metrics}

    # -- host-side metric helpers (temp files: the analysis suite is
    #    path-based, shared with the CLIs) --------------------------------
    def _analysis(self):
        from packppi_tpu.utils.analysis import ProteinAnalysis

        tmp = self.args.tmp_dir or "packppi_serve_tmp"
        Path(tmp).mkdir(parents=True, exist_ok=True)
        return ProteinAnalysis(getattr(self.args, "molprobity_loc", None),
                               tmp_dir=tmp), Path(tmp)

    def _metric_suite(self, true_text: str, pred_text: str) -> dict:
        analysis, tmp = self._analysis()
        tag = f"{threading.get_ident()}_{time.monotonic_ns()}"
        t, q = tmp / f"true_{tag}.pdb", tmp / f"pred_{tag}.pdb"
        try:
            t.write_text(true_text)
            q.write_text(pred_text)
            m = analysis.get_metric(str(t), str(q)) or {}
            return {k: (float(v) if isinstance(v, (int, float, np.floating))
                        else v) for k, v in m.items()}
        finally:
            t.unlink(missing_ok=True)
            q.unlink(missing_ok=True)

    def _clashscore(self, pdb_text: str):
        analysis, tmp = self._analysis()
        f = tmp / f"cs_{threading.get_ident()}_{time.monotonic_ns()}.pdb"
        try:
            f.write_text(pdb_text)
            return analysis.get_clashscore(str(f))
        finally:
            f.unlink(missing_ok=True)


class DdgSession:
    """Lazy affinity state — built on the first /ddg request."""

    def __init__(self, args, device_lock):
        import jax

        from packppi_tpu.data.skempi import stack_affinity_batch
        from packppi_tpu.models import NetworkConfig
        from packppi_tpu.models.affinity import AffinityModel
        from packppi_tpu.train import load_model_params

        self.jax = jax
        self.device_lock = device_lock
        self.stack_affinity_batch = stack_affinity_batch
        self.model = AffinityModel.create(NetworkConfig(), mode="network")
        init = stack_affinity_batch([_synthetic_affinity_feats()])
        k_bb, k_net = jax.random.split(jax.random.key(args.seed))
        pre = args.pre_ckpt or args.ckpt
        self.random_weights = not (pre and args.affinity_ckpt)
        if pre:
            template = jax.eval_shape(
                lambda: self.model.backbone.init(jax.random.key(0), init.wild()))
            self.backbone_params = load_model_params(pre, template)
        else:
            self.backbone_params = self.model.backbone.init(k_bb, init.wild())
        if args.affinity_ckpt:
            template = jax.eval_shape(lambda: self.model.init(
                jax.random.key(0), init, self.backbone_params))
            self.params = load_model_params(args.affinity_ckpt, template)
        else:
            self.params = self.model.init(k_net, init, self.backbone_params)
        self._predict = jax.jit(
            lambda p, bp, b: self.model.predict(p, bp, b)[0])

    def ddg(self, pdb_text: str, mutstr: str) -> dict:
        from packppi_tpu.data.skempi import parse_mutation, skempi_features
        from packppi_tpu.structure import from_pdb_string

        prot = from_pdb_string(pdb_text, mse_to_met=True)
        mutations = [parse_mutation(m.strip()) for m in mutstr.split(",")]
        feats = skempi_features(prot, mutations)
        batch = self.stack_affinity_batch([feats])
        with self.device_lock:
            val = float(self._predict(self.params, self.backbone_params, batch)[0])
        return {"ddg_pred": val, "mutstr": mutstr,
                "random_weights": self.random_weights}


class ServeError(Exception):
    def __init__(self, code: int, message: str):
        super().__init__(message)
        self.code = code


def _synthetic_feats():
    """Tiny all-ALA features for parameter shape inference (no file I/O)."""
    from packppi_tpu.structure.featurize import featurize
    from packppi_tpu.structure.protein import Protein

    L = 8
    X = np.zeros((L, 14, 3), np.float32)
    X[:, :4] = (np.arange(L, dtype=np.float32) * 3.8)[:, None, None] \
        * np.array([1.0, 0, 0], np.float32) \
        + np.array([[0, 0, 0], [1.46, 0, 0], [2.0, 1.4, 0], [3.2, 1.5, 0]],
                   np.float32)
    X[:, 4] = X[:, 1] + np.array([0.5, -1.3, 0.6], np.float32)  # CB
    mask = np.zeros((L, 14), np.float32)
    mask[:, :5] = 1.0
    prot = Protein(atom_positions=X, atom_mask=mask,
                   aaindex=np.zeros(L, np.int64),      # all-ALA
                   residue_index=np.arange(1, L + 1),
                   chain_id=np.array(["A"] * L),
                   b_factors=np.zeros((L, 14), np.float32))
    return featurize(prot), prot


def _synthetic_affinity_feats():
    from packppi_tpu.data.skempi import parse_mutation, skempi_features

    _, prot = _synthetic_feats()
    return skempi_features(prot, [parse_mutation("AA1G")])


def _as_num(req: dict, key, default, lo, hi, cast=float):
    """Validate a client-supplied numeric field -> 400 on garbage (bare
    int()/float() would surface as a 500 server fault)."""
    val = req.get(key, default)
    try:
        val = cast(val)
    except (TypeError, ValueError):
        raise ServeError(400, f"'{key}' must be a number")
    if not lo <= val <= hi:
        raise ServeError(400, f"'{key}' must be in [{lo}, {hi}]")
    return val


def make_handler(sessions: dict, args):
    ddg_init_lock = threading.Lock()

    def get_ddg_session():
        # check-then-act on the shared dict must be synchronized (handler
        # threads race), and the constructor's device work (backbone init)
        # must not overlap an in-flight /pack dispatch
        with ddg_init_lock:
            if "ddg" not in sessions:
                with sessions["pack"].device_lock:
                    sessions["ddg"] = DdgSession(args,
                                                 sessions["pack"].device_lock)
        return sessions["ddg"]

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *a):  # quiet access log, errors still raise
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if code >= 400:
                # error paths may leave an unread body (e.g. chunked
                # encoding, which we don't parse) — close rather than let
                # stale bytes desync the next keep-alive request
                self.send_header("Connection", "close")
                self.close_connection = True
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": f"unknown path {self.path}"})
            import jax

            s = sessions["pack"]
            self._reply(200, {
                "status": "ok", "backend": jax.default_backend(),
                "devices": jax.device_count(),
                "random_weights": s.random_weights,
                "n_steps": args.n_steps,
                "buckets_warm": s.buckets_seen,
                "endpoints": ["/healthz", "/pack", "/prox", "/ddg"]})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n <= 0:
                    raise ServeError(400, "empty request body")
                if n > args.max_body_mb * 1024 * 1024:
                    # bound memory before reading: a client-supplied length
                    # must not size an unbounded read into RAM. Drain (and
                    # discard) up to a hard cap in small chunks so plain
                    # clients that write-then-read can still see the 413;
                    # past the cap the connection is dropped instead.
                    left = min(n, 64 * 1024 * 1024)
                    while left > 0:
                        chunk = self.rfile.read(min(left, 65536))
                        if not chunk:
                            break
                        left -= len(chunk)
                    self.close_connection = True
                    raise ServeError(413, f"request body {n} bytes exceeds "
                                          f"--max_body_mb={args.max_body_mb}")
                raw = self.rfile.read(n)
                try:
                    req = json.loads(raw)
                except json.JSONDecodeError:
                    # raw PDB text convenience: POST the file body directly
                    req = {"pdb": raw.decode("utf-8", "replace")}
                if not isinstance(req, dict) or not req.get("pdb"):
                    raise ServeError(400, "body must be JSON with a 'pdb' field "
                                          "(or raw PDB text)")
                if self.path == "/pack":
                    out = sessions["pack"].pack(
                        req["pdb"],
                        n_samples=_as_num(req, "n_samples", 1, 1,
                                          PackSession.MAX_SAMPLES, int),
                        use_proximal=bool(req.get("use_proximal", False)),
                        seed=req.get("seed"),
                        want_metrics=bool(req.get("metrics", True)))
                elif self.path == "/prox":
                    out = sessions["pack"].prox(
                        req["pdb"],
                        num_steps=_as_num(req, "num_steps", 50, 1, 1000, int),
                        lamda=_as_num(req, "lamda", 1.0, 0.0, 1e6),
                        violation_tolerance_factor=_as_num(
                            req, "violation_tolerance_factor", 12.0, 0.0, 1e6),
                        clash_overlap_tolerance=_as_num(
                            req, "clash_overlap_tolerance", 0.5, 0.0, 10.0),
                        want_metrics=bool(req.get("metrics", True)))
                elif self.path == "/ddg":
                    if not req.get("mutstr"):
                        raise ServeError(400, "/ddg needs a 'mutstr' field")
                    out = get_ddg_session().ddg(req["pdb"], req["mutstr"])
                else:
                    raise ServeError(404, f"unknown path {self.path}")
                self._reply(200, out)
            except ServeError as e:
                self._reply(e.code, {"error": str(e)})
            except Exception as e:  # featurization/parse errors etc.
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def make_server(args, sessions=None) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; used by main() and tests."""
    sessions = sessions if sessions is not None else {}
    sessions["pack"] = PackSession(args)
    if args.warmup:
        t0 = time.perf_counter()
        sessions["pack"].pack(Path(args.warmup).read_text(), want_metrics=False)
        print(f"warmup pack done in {time.perf_counter() - t0:.1f}s")
    return ThreadingHTTPServer((args.host, args.port),
                               make_handler(sessions, args))


def main():
    args = build_parser().parse_args()
    server = make_server(args)
    host, port = server.server_address[:2]
    print(f"packppi-serve listening on http://{host}:{port} "
          f"(POST /pack /prox /ddg, GET /healthz)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
