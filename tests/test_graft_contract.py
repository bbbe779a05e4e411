"""Driver-contract guards: entry() compiles single-device; bench.py module
shape is intact."""
import json
import os
import subprocess
import sys

import jax


def test_entry_contract():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import entry

    fn, args = entry()
    assert callable(fn) and isinstance(args, tuple)
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 64, 4)


def test_bench_module_importable():
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main)
    assert mod.MEASURED_REFERENCE_SECONDS > 0
    assert "measured" in mod.BASELINE_SOURCE
