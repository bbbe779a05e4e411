"""Native C++ runtime parity: PDB parser vs the Python specification,
SASA sanity."""
import os
import time

import numpy as np
import pytest

from packppi_tpu import native
from packppi_tpu.structure import protein as protein_mod

from conftest import FIXTURES

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def _python_parse(path, **kw):
    """Force the pure-Python parser path."""
    text = open(path).read()
    os.environ["PACKPPI_NATIVE"] = "0"
    try:
        return protein_mod.from_pdb_string(text, **kw)
    finally:
        os.environ["PACKPPI_NATIVE"] = "1"


@pytest.mark.parametrize("fixture,kw", [
    ("t1124.pdb", {"mse_to_met": True}),
    ("1brs.pdb", {"mse_to_met": True}),
    ("2ftl.pdb", {}),
    ("1brs.pdb", {"chain_id": "A"}),
])
def test_native_parser_matches_python(fixture, kw):
    path = os.path.join(FIXTURES, fixture)
    py = _python_parse(path, **kw)
    nat = native.parse_pdb_native(open(path).read(), **kw)
    assert nat is not None
    np.testing.assert_array_equal(py.aaindex, nat["aaindex"])
    np.testing.assert_array_equal(py.residue_index, nat["residue_index"])
    np.testing.assert_array_equal(py.chain_id, nat["chain_id"])
    np.testing.assert_array_equal(py.atom_mask, nat["atom_mask"])
    m = py.atom_mask.astype(bool)
    np.testing.assert_allclose(py.atom_positions[m], nat["atom_positions"][m], atol=1e-4)
    np.testing.assert_allclose(py.b_factors, nat["b_factors"], atol=1e-4)


def test_native_parser_speed_regression_guard():
    """Absolute-bound guard only: comparative timing vs the Python parser is
    too noisy under CI load (both are ~2 ms warm; see PERF.md)."""
    text = open(os.path.join(FIXTURES, "t1124.pdb")).read()
    native.parse_pdb_native(text, mse_to_met=True)  # warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        native.parse_pdb_native(text, mse_to_met=True)
        times.append(time.perf_counter() - t0)
    assert min(times) < 0.05  # pathological-regression bound (typ. ~2 ms)


def test_sasa_isolated_atom_full_sphere():
    pos = np.array([[0.0, 0, 0], [100.0, 0, 0]])
    radii = np.array([1.7, 1.7])
    area = native.sasa_native(pos, radii, n_points=960)
    expected = 4 * np.pi * (1.7 + 1.4) ** 2
    np.testing.assert_allclose(area, expected, rtol=0.02)


def test_sasa_buried_atom_is_small():
    # central atom fully caged by 12 neighbors
    from itertools import product
    shell = [np.array(v, float) for v in product([-1.0, 1.0], repeat=3)]
    shell += [np.array(v) * 1.8 for v in
              [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]]]
    pos = np.concatenate([[[0.0, 0, 0]], np.stack(shell) * 1.6])
    radii = np.full(len(pos), 1.7)
    area = native.sasa_native(pos, radii, n_points=480)
    assert area[0] < 10.0  # mostly buried center
