"""Ideal hydrogen placement (mini-Reduce) + Probe-style clashscore tests.

The reference obtains its clashscore from the MolProbity binary with
``keep_hydrogens=True`` (reference: src/utils/protein_analysis.py:26-34);
our offline equivalent places ideal hydrogens and counts vdW overlaps.
"""
import dataclasses

import numpy as np
import pytest

from packppi_tpu.chem import RESTYPE_1TO3, RESTYPES
from packppi_tpu.structure import from_pdb_file
from packppi_tpu.structure.hydrogens import H_BOND_LENGTH, add_hydrogens, heavy_graph
from packppi_tpu.utils.metrics import probe_clashscore

FIXTURE = "tests/fixtures/1brs.pdb"

# residue-formula hydrogen counts for a mid-chain residue at standard
# protonation (amide H + HA + side chain; NE2 tautomer for HIS)
EXPECTED_H = {
    "ALA": 5, "ARG": 13, "ASN": 6, "ASP": 4, "CYS": 5, "GLN": 8, "GLU": 6,
    "GLY": 3, "HIS": 7, "ILE": 11, "LEU": 11, "LYS": 13, "MET": 9, "PHE": 9,
    "PRO": 7, "SER": 5, "THR": 7, "TRP": 10, "TYR": 9, "VAL": 9,
}


@pytest.fixture(scope="module")
def prot():
    return from_pdb_file(FIXTURE, mse_to_met=True)


@pytest.fixture(scope="module")
def hyd(prot):
    return add_hydrogens(prot)


def test_per_residue_hydrogen_counts(prot, hyd):
    """Mid-chain residues with complete side chains carry exactly the
    molecular-formula hydrogen count."""
    mask = np.asarray(prot.atom_mask)
    counts = np.bincount(hyd["parent_res"], minlength=len(prot.aaindex))
    checked = set()
    for i in range(1, len(prot.aaindex)):
        rn = RESTYPE_1TO3[RESTYPES[prot.aaindex[i]]]
        from packppi_tpu.chem import ATOM14_NAMES
        names = ATOM14_NAMES[rn]
        complete = all(mask[i, s] for s, nm in enumerate(names) if nm)
        # chain start OR chain break (no peptide bond to i-1) gets NH3+
        first = (prot.chain_id[i] != prot.chain_id[i - 1]
                 or not mask[i - 1, 2]
                 or np.linalg.norm(prot.atom_positions[i, 0]
                                   - prot.atom_positions[i - 1, 2]) > 2.0)
        if complete and not first and rn in EXPECTED_H:
            assert counts[i] == EXPECTED_H[rn], (i, rn, counts[i])
            checked.add(rn)
    assert len(checked) >= 15  # 1brs covers most residue types


def test_nterm_gets_nh3(prot, hyd):
    counts = np.bincount(hyd["parent_res"] * 100 + hyd["parent_slot"])
    # residue 0 slot 0 (N) carries 3 hydrogens at a chain start
    assert counts[0] == 3


def test_bond_lengths(prot, hyd):
    X = np.asarray(prot.atom_positions)
    parent_xyz = X[hyd["parent_res"], hyd["parent_slot"]]
    d = np.linalg.norm(hyd["positions"] - parent_xyz, axis=-1)
    assert d.min() > 0.9 and d.max() < 1.4  # within [O-H 0.96, S-H 1.34]
    # carbon hydrogens exactly at 1.09
    nonpolar = ~hyd["polar"]
    np.testing.assert_allclose(d[nonpolar], H_BOND_LENGTH["C"], atol=1e-6)


def test_no_h_overlaps_own_parent_neighbors(prot, hyd):
    """Placed H must not sit on top of the parent's bonded heavy atoms
    (tetrahedral/sp2 geometry sanity)."""
    coords, names, res_of, flat_index, sep = heavy_graph(prot)
    parent_flat = flat_index[hyd["parent_res"], hyd["parent_slot"]]
    # distance from each H to every heavy atom bonded to its parent
    bonded = {}
    for (a, b), d in sep.items():
        if d == 1:
            bonded.setdefault(a, []).append(b)
            bonded.setdefault(b, []).append(a)
    bad = 0
    for k in range(len(hyd["positions"])):
        for nb in bonded.get(int(parent_flat[k]), []):
            if np.linalg.norm(hyd["positions"][k] - coords[nb]) < 1.2:
                bad += 1
    assert bad == 0


def test_rotor_optimization_reduces_clashscore(prot):
    base = _count_with(prot, optimize=False)
    opt = _count_with(prot, optimize=True)
    assert opt <= base


def _count_with(prot, optimize):
    import packppi_tpu.structure.hydrogens as hmod
    import packppi_tpu.utils.metrics as mmod

    orig = hmod.add_hydrogens
    try:
        hmod_add = lambda p, optimize_rotors=False, graph=None, \
            rotor_phase_overrides=None, static_h=None: orig(
            p, optimize_rotors=optimize, graph=graph, static_h=static_h,
            rotor_phase_overrides=rotor_phase_overrides if optimize else None)
        mmod_probe = mmod.probe_clashscore
        # patch through the module attr the metric imports at call time
        hmod.add_hydrogens = hmod_add
        return mmod_probe(prot)
    finally:
        hmod.add_hydrogens = orig


def test_clashscore_deterministic_and_plausible(prot):
    a = probe_clashscore(prot)
    b = probe_clashscore(prot)
    assert a == b
    assert 0.0 < a < 100.0  # 1brs (1994, 2.0 A) scores high but finite


def test_injected_clash_increases_score(prot):
    """Pushing chain D into chain A must raise the clashscore."""
    base = probe_clashscore(prot)
    chain_d = prot.chain_id == prot.chain_id[-1]
    center_a = prot.atom_positions[~chain_d][:, 1].mean(0)
    center_d = prot.atom_positions[chain_d][:, 1].mean(0)
    shift = (center_a - center_d) * 0.5
    newX = prot.atom_positions.copy()
    newX[chain_d] += shift
    crashed = dataclasses.replace(prot, atom_positions=newX)
    assert probe_clashscore(crashed) > base


def test_hbond_pairs_not_counted():
    """A backbone-like N-H...O contact at H-bond distance is exempt."""
    prot = from_pdb_file(FIXTURE, mse_to_met=True)
    from packppi_tpu.structure.hydrogens import HBOND_ACCEPTORS
    assert "O" in HBOND_ACCEPTORS and "OD1" in HBOND_ACCEPTORS


class TestAmideFlips:
    def test_flip_count_deterministic_and_bounded(self, prot):
        from packppi_tpu.structure.hydrogens import optimize_amide_flips

        p1, n1 = optimize_amide_flips(prot)
        p2, n2 = optimize_amide_flips(prot)
        assert n1 == n2
        np.testing.assert_array_equal(p1.atom_positions, p2.atom_positions)
        n_flippable = sum(RESTYPE_1TO3[RESTYPES[i]] in ("ASN", "GLN", "HIS")
                          for i in prot.aaindex)
        assert 0 < n1 < n_flippable  # flips some, not all

    def test_flip_swaps_only_group_atoms(self, prot):
        from packppi_tpu.chem import ATOM14_NAMES
        from packppi_tpu.structure.hydrogens import FLIP_GROUPS, optimize_amide_flips

        flipped, _ = optimize_amide_flips(prot)
        moved = np.argwhere(
            np.abs(flipped.atom_positions - prot.atom_positions).sum(-1) > 0)
        for i, s in moved:
            rn = RESTYPE_1TO3[RESTYPES[prot.aaindex[i]]]
            assert rn in FLIP_GROUPS
            group = {a for pair in FLIP_GROUPS[rn] for a in pair}
            assert ATOM14_NAMES[rn][s] in group

    def test_flips_lower_clashscore_on_1brs(self, prot, monkeypatch):
        """With the flip/rotor network pass disabled the 1brs score is
        strictly higher (the deposited structure contains misoriented
        amides)."""
        import packppi_tpu.structure.hbond_networks as nmod

        with_flips = probe_clashscore(prot)
        monkeypatch.setattr(nmod, "optimize_hbond_networks",
                            lambda p, graph=None, **kw: (p, 0, {}, {}))
        without = probe_clashscore(prot)
        assert with_flips < without


def test_hbond_reward_increases_satisfied_donors(prot, monkeypatch):
    """The Reduce-style H-bond reward must resolve clash-equivalent flip and
    rotor states toward hydrogen bonding: on 1brs it strictly increases the
    number of polar H's within H-bond reach of an acceptor, without making
    the clashscore worse."""
    import packppi_tpu.structure.hbond_networks as nmod
    import packppi_tpu.structure.hydrogens as hmod

    def measure():
        from scipy.spatial import cKDTree

        from packppi_tpu.chem import RESTYPE_1TO3, RESTYPES
        from packppi_tpu.structure.hbond_networks import optimize_hbond_networks
        from packppi_tpu.structure.hydrogens import (
            add_hydrogens, heavy_graph, is_hbond_acceptor)

        score = probe_clashscore(prot)
        p2, _, phases, _ = optimize_hbond_networks(prot, graph=heavy_graph(prot))
        g2 = heavy_graph(p2)
        hyd = add_hydrogens(p2, optimize_rotors=True, graph=g2,
                            rotor_phase_overrides=phases)
        coords, names, res_of, _, _ = g2
        rn = [RESTYPE_1TO3[RESTYPES[p2.aaindex[r]]] for r in res_of]
        acc = np.asarray([is_hbond_acceptor(a, b) for a, b in zip(rn, names)])
        tree = cKDTree(np.asarray(coords).reshape(-1, 3)[acc])
        near = tree.query_ball_point(hyd["positions"][hyd["polar"]], 2.2)
        return score, sum(1 for n in near if n)

    score_rewarded, hb_rewarded = measure()
    monkeypatch.setattr(hmod, "HBOND_REWARD_WEIGHT", 0.0)
    monkeypatch.setattr(nmod, "HBOND_REWARD_WEIGHT", 0.0)
    score_plain, hb_plain = measure()

    assert hb_rewarded > hb_plain            # 172 vs 170 on 1brs
    assert score_rewarded <= score_plain + 1e-9


def test_residue_aware_acceptors():
    """GLN's amide NE2 and (NE2-H tautomer) HIS NE2 are donors, not
    acceptors, despite the name appearing in the acceptor list; HIS ND1
    and GLN OE1 remain acceptors."""
    from packppi_tpu.structure.hydrogens import is_hbond_acceptor

    assert not is_hbond_acceptor("GLN", "NE2")
    assert not is_hbond_acceptor("HIS", "NE2")
    assert is_hbond_acceptor("HIS", "ND1")
    assert is_hbond_acceptor("GLN", "OE1")
    assert is_hbond_acceptor("ALA", "O")


class TestSpikeIntegral:
    """The analytic Probe spike measure vs a brute-force dot oracle.

    Probe (Word et al. 1999) scores atoms by sampling dots on each vdW
    sphere and summing per-dot penetration into neighbors;
    ``spike_integral`` is the closed-form infinite-density limit. The
    oracle samples a Fibonacci sphere at high density and must converge.
    """

    @staticmethod
    def _dot_oracle(ra, rb, d, n_dots=200_000):
        # Fibonacci-sphere dots on A's surface; B on the +z axis
        i = np.arange(n_dots, dtype=np.float64)
        phi = np.pi * (3.0 - np.sqrt(5.0)) * i
        z = 1.0 - 2.0 * (i + 0.5) / n_dots
        r = np.sqrt(np.clip(1.0 - z * z, 0.0, None))
        dots = ra * np.stack([r * np.cos(phi), r * np.sin(phi), z], -1)
        pen = np.clip(rb - np.linalg.norm(dots - np.array([0.0, 0.0, d]), axis=-1), 0.0, None)
        area_per_dot = 4.0 * np.pi * ra * ra / n_dots
        return pen.sum() * area_per_dot

    def test_matches_dot_sampling(self):
        from packppi_tpu.structure.hydrogens import spike_integral

        rng = np.random.default_rng(0)
        for _ in range(25):
            ra = rng.uniform(1.0, 1.8)
            rb = rng.uniform(1.0, 1.8)
            # from barely touching to substantial overlap
            d = rng.uniform(0.55 * (ra + rb), 0.999 * (ra + rb))
            ana = float(spike_integral(ra, rb, d))
            mc = self._dot_oracle(ra, rb, d)
            assert ana == pytest.approx(mc, rel=2e-3, abs=1e-4), (ra, rb, d)

    def test_shallow_overlap_closed_form(self):
        """For shallow overlap o the integral is pi*ra*o^2*(rb - 2o/3)/d."""
        from packppi_tpu.structure.hydrogens import spike_integral

        ra, rb, d = 1.55, 1.4, 2.65
        o = ra + rb - d
        expect = np.pi * ra * o * o * (rb - 2.0 * o / 3.0) / d
        assert float(spike_integral(ra, rb, d)) == pytest.approx(expect, rel=1e-12)

    def test_zero_without_surface_penetration(self):
        from packppi_tpu.structure.hydrogens import spike_integral

        assert float(spike_integral(1.5, 1.5, 3.0)) == 0.0      # touching
        assert float(spike_integral(1.5, 1.5, 4.0)) == 0.0      # separated
        # B deep inside A, too small to reach A's surface
        assert float(spike_integral(2.0, 0.3, 0.1)) == 0.0

    def test_full_containment_of_a_in_b(self):
        """A entirely inside B: every dot penetrates; oracle still agrees."""
        from packppi_tpu.structure.hydrogens import spike_integral

        ra, rb, d = 0.6, 2.0, 0.5
        ana = float(spike_integral(ra, rb, d))
        mc = self._dot_oracle(ra, rb, d)
        assert ana == pytest.approx(mc, rel=2e-3)
        assert ana > 0.0

    def test_monotone_in_overlap(self):
        from packppi_tpu.structure.hydrogens import probe_spike_measure

        ra = rb = 1.55
        ds = np.linspace(3.10, 2.2, 40)
        vals = probe_spike_measure(ra, rb, ds)
        assert vals[0] == 0.0                        # exactly touching
        assert np.all(np.diff(vals[1:]) > 0.0)       # grows as spheres close

    def test_geometry_dependence_differs_from_linear(self):
        """Two pairs with the SAME linear overlap but different radii score
        differently — the property the linear term could not express."""
        from packppi_tpu.structure.hydrogens import probe_spike_measure

        o = 0.3
        small = float(probe_spike_measure(1.0, 1.0, 2.0 - o))
        large = float(probe_spike_measure(1.8, 1.8, 3.6 - o))
        assert large > small * 1.2


def test_disulfide_cys_not_protonated():
    """Half-cystines (SG-SG < 2.5 A) get no HG — Reduce never protonates
    disulfide-bonded SG; a free cysteine still does."""
    from packppi_tpu.structure.hydrogens import disulfide_cysteines

    # 2FTL (trypsin + BPTI) is disulfide-rich
    prot = from_pdb_file("tests/fixtures/2ftl.pdb", mse_to_met=True)
    ss = disulfide_cysteines(prot)
    assert len(ss) >= 2 and len(ss) % 2 == 0  # pairs of half-cystines

    from packppi_tpu.chem import ATOM14_NAMES
    sg_slot = ATOM14_NAMES["CYS"].index("SG")
    hyd = add_hydrogens(prot)
    sg_h_residues = {int(r) for r, s in zip(hyd["parent_res"], hyd["parent_slot"])
                     if s == sg_slot and RESTYPES[prot.aaindex[r]] == "C"}
    assert not (sg_h_residues & ss), "HG placed on a disulfide-bonded SG"

    # control: break one disulfide by moving its partner far away -> HG back
    a = sorted(ss)[0]
    pos = np.array(prot.atom_positions)
    partners = sorted(ss - {a})
    for b in partners:
        if np.linalg.norm(pos[a, sg_slot] - pos[b, sg_slot]) < 2.5:
            pos[b, sg_slot] += 100.0
    freed = dataclasses.replace(prot, atom_positions=pos)
    assert a not in disulfide_cysteines(freed)
    hyd2 = add_hydrogens(freed)
    sg_h2 = {int(r) for r, s in zip(hyd2["parent_res"], hyd2["parent_slot"])
             if s == sg_slot}
    assert a in sg_h2, "free cysteine lost its HG"


def test_static_hydrogen_probes_composition():
    """The static-H environment contains exactly the hydrogens no
    orientation search can move: backbone amide H present, rotor hydrogens
    (OH/SH/NH3+/methyl) and flip-group hydrogens (ASN ND2 etc.) absent."""
    from packppi_tpu.chem import ATOM14_NAMES
    from packppi_tpu.structure.hydrogens import static_hydrogen_probes

    prot = from_pdb_file(FIXTURE, chain_id="D", mse_to_met=True)
    sh = static_hydrogen_probes(prot)
    resnames = [RESTYPE_1TO3[RESTYPES[i]] for i in prot.aaindex]

    from packppi_tpu.structure.hydrogens import _place_hydrogens
    pos, pres, pslot, polar, rotors = _place_hydrogens(prot)
    assert len(sh["positions"]) < len(pos)   # something was excluded

    names_of = lambda r, s: ATOM14_NAMES[resnames[r]][s]
    # reconstruct kept (res, slot) pairs by matching positions
    kept = {tuple(np.round(p, 4)) for p in sh["positions"]}
    kept_names = {names_of(r, s) for p, r, s in zip(pos, pres, pslot)
                  if tuple(np.round(p, 4)) in kept}
    dropped_names = {names_of(r, s) for p, r, s in zip(pos, pres, pslot)
                     if tuple(np.round(p, 4)) not in kept}
    assert "N" in kept_names                       # backbone amide H
    assert not {"OG", "OG1", "SG", "OH", "NZ"} & kept_names  # rotors out
    assert "ND2" not in kept_names                 # flip-group H out
    assert {"OG", "OH", "NZ"} & dropped_names      # rotors were placed
