"""packppi-serve: warm-model HTTP inference server, end-to-end in-process.

The server is started on an ephemeral port inside the test process (CPU
backend via conftest) and driven with real HTTP requests. The reference
has no serving mode (its eval CLIs are one-shot, reference:
src/eval_diffusion.py); these tests lock the TPU build's addition: a
resident model, JSON contract, error handling, and output structures
that parse back losslessly.
"""
from __future__ import annotations

import http.client
import json
import threading
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"


def _serve_args(tmp_path, n_steps=2):
    return SimpleNamespace(
        host="127.0.0.1", port=0, ckpt=None, affinity_ckpt=None,
        pre_ckpt=None, n_steps=n_steps, precision="float32", no_fused=True,
        geometry="global", platform=None, seed=0, molprobity_loc=None,
        warmup=None, max_body_mb=1, tmp_dir=str(tmp_path / "serve_tmp"))


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from packppi_tpu.cli.serve import make_server

    tmp = tmp_path_factory.mktemp("serve")
    srv = make_server(_serve_args(tmp))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv.server_address
    srv.shutdown()


def _request(addr, method, path, body=None, headers=None):
    conn = http.client.HTTPConnection(*addr, timeout=600)
    conn.request(method, path, body=body, headers=headers or {})
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    return resp.status, payload


def test_healthz(server):
    status, out = _request(server, "GET", "/healthz")
    assert status == 200
    assert out["status"] == "ok"
    assert out["random_weights"] is True
    assert "/pack" in out["endpoints"]


def test_pack_roundtrip(server):
    from packppi_tpu.structure import from_pdb_string

    pdb_text = (FIXTURES / "2ftl.pdb").read_text()
    body = json.dumps({"pdb": pdb_text, "seed": 7})
    status, out = _request(server, "POST", "/pack", body)
    assert status == 200, out
    prot_in = from_pdb_string(pdb_text, mse_to_met=True)
    prot_out = from_pdb_string(out["pdb"])
    assert len(prot_out.aaindex) == len(prot_in.aaindex)
    m = out["metrics"]
    assert m["device_seconds"] > 0
    assert m["random_weights"] is True
    # chi metric suite ran (input has side chains)
    assert "chi_1_accuracy" in m or "atom_rmsd" in m

    # warm bucket recorded for /healthz observability
    _, health = _request(server, "GET", "/healthz")
    assert m["length_bucket"] in health["buckets_warm"]


def test_pack_is_seed_deterministic(server):
    pdb_text = (FIXTURES / "2ftl.pdb").read_text()
    body = json.dumps({"pdb": pdb_text, "seed": 11, "metrics": False})
    _, a = _request(server, "POST", "/pack", body)
    _, b = _request(server, "POST", "/pack", body)
    assert a["pdb"] == b["pdb"]


def test_pack_raw_pdb_body(server):
    """Convenience contract: POSTing the raw PDB file body (not JSON)
    packs with defaults."""
    pdb_text = (FIXTURES / "2ftl.pdb").read_text()
    status, out = _request(server, "POST", "/pack", pdb_text,
                           {"Content-Type": "text/plain"})
    assert status == 200, out
    assert out["pdb"].startswith(("ATOM", "MODEL"))


def test_prox_endpoint(server):
    pdb_text = (FIXTURES / "2ftl.pdb").read_text()
    body = json.dumps({"pdb": pdb_text, "num_steps": 3, "metrics": False})
    status, out = _request(server, "POST", "/prox", body)
    assert status == 200, out
    m = out["metrics"]
    assert {"accepted", "objective_initial", "objective_final"} <= set(m)
    # accept rule: structure only changes when the objective decreased
    if not m["accepted"]:
        assert out["pdb"]  # still returns the (unchanged) structure


def test_ddg_endpoint(server):
    pdb_text = (FIXTURES / "2ftl.pdb").read_text()
    # 2FTL chain I residue 15 is LYS (the reference README's KI15G example)
    body = json.dumps({"pdb": pdb_text, "mutstr": "KI15G"})
    status, out = _request(server, "POST", "/ddg", body)
    assert status == 200, out
    assert np.isfinite(out["ddg_pred"])
    assert out["random_weights"] is True


def test_error_handling(server):
    status, out = _request(server, "POST", "/pack", json.dumps({"nope": 1}))
    assert status == 400 and "error" in out

    status, out = _request(server, "POST", "/ddg",
                           json.dumps({"pdb": "ATOM", "mutstr": ""}))
    assert status == 400

    status, out = _request(server, "POST", "/unknown",
                           json.dumps({"pdb": "x"}))
    assert status == 404

    # garbage PDB -> structured 4xx/5xx JSON error, server stays up
    status, out = _request(server, "POST", "/pack",
                           json.dumps({"pdb": "not a pdb at all"}))
    assert status in (400, 500) and "error" in out
    status, _ = _request(server, "GET", "/healthz")
    assert status == 200


def test_request_validation(server):
    """Client-controlled numerics are bounded and type-checked: abusive or
    malformed values are 400 client errors, never device allocations or
    500 server faults."""
    pdb_text = (FIXTURES / "2ftl.pdb").read_text()
    status, out = _request(server, "POST", "/pack", json.dumps(
        {"pdb": pdb_text, "n_samples": 100000000}))
    assert status == 400 and "n_samples" in out["error"]

    status, out = _request(server, "POST", "/prox", json.dumps(
        {"pdb": pdb_text, "num_steps": "fast"}))
    assert status == 400 and "num_steps" in out["error"]

    status, out = _request(server, "POST", "/prox", json.dumps(
        {"pdb": pdb_text, "num_steps": 0}))
    assert status == 400

    # oversized bodies are rejected by Content-Length BEFORE the read —
    # a client-sized allocation must not reach RAM (--max_body_mb guard)
    status, out = _request(server, "POST", "/pack",
                           "x" * (1024 * 1024 + 1))
    assert status == 413 and "max_body_mb" in out["error"]
