"""Structure-analysis harness: metric suite + external-tool wrappers.

Equivalent of the reference's ProteinAnalysis (reference:
src/utils/protein_analysis.py:12-140). External binaries (MolProbity
clashscore, SCWRL4, FASPR) are optional host-side subprocesses; when absent,
clashscore falls back to the on-device heavy-atom approximation so automated
evaluation never blocks on a missing binary.
"""
from __future__ import annotations

import re
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from packppi_tpu.structure.featurize import featurize
from packppi_tpu.structure.interface import interface_residue_mask
from packppi_tpu.structure.protein import from_pdb_file
from packppi_tpu.utils.logging import get_logger
from packppi_tpu.utils.metrics import chi_metrics, mean_squared_atom_deviation

log = get_logger(__name__)


class ProteinAnalysis:
    def __init__(self, molprobity_clash_loc: Optional[str] = None,
                 tmp_dir: str = ".packppi_tmp",
                 scwrl_loc: Optional[str] = None,
                 faspr_loc: Optional[str] = None):
        self.molprobity_clash_loc = molprobity_clash_loc
        self.scwrl_loc = scwrl_loc
        self.faspr_loc = faspr_loc
        self.tmp_dir = Path(tmp_dir)
        self.tmp_dir.mkdir(parents=True, exist_ok=True)

    # ---- clashscore ---------------------------------------------------------

    def get_clashscore(self, pdb: str) -> Optional[float]:
        """MolProbity clashscore via subprocess when the binary is configured;
        otherwise the native H-aware Probe-style count
        (utils.metrics.probe_clashscore: ideal H placement with rotor
        optimization + vdW overlap >= 0.4 A per 1000 atoms; flagged by
        is_exact=False on get_metric output)."""
        if self.molprobity_clash_loc:
            out = subprocess.run(
                [self.molprobity_clash_loc, f"model={pdb}", "keep_hydrogens=True"],
                capture_output=True, text=True)
            m = re.search(r"clashscore\s*=\s*([0-9.]+)", out.stdout + out.stderr)
            if m:
                return float(m.group(1))
            return None
        from packppi_tpu.utils.metrics import probe_clashscore
        return probe_clashscore(from_pdb_file(pdb, mse_to_met=True))

    # ---- metric suite -------------------------------------------------------

    def get_metric(self, true_pdb: str, pred_pdb: str,
                   strict_parity: bool = True) -> Optional[dict]:
        """Full packing metric suite between an experimental structure and a
        repacked prediction (chi acc/AE, interface acc, deviation, clash).

        ``strict_parity=False`` opts out of the reference's metric quirks:
        chi accuracy is scored on the periodicity-FOLDED error (boundary-
        invariant, exact matches count) and ``atom_rmsd`` becomes a true
        RMSD (sqrt, masked denominator). Default preserves bit-parity with
        the reference (see utils.metrics docstrings for the quirk list)."""
        true_prot = from_pdb_file(true_pdb, mse_to_met=True)
        pred_prot = from_pdb_file(pred_pdb, mse_to_met=True)
        ft = featurize(true_prot)
        fp = featurize(pred_prot)
        if ft["X"].shape[0] != fp["X"].shape[0]:
            log.warning("residue count mismatch between true and predicted structures")
            return None

        interface = interface_residue_mask(true_prot) * ft["residue_mask"]
        metric = chi_metrics(ft["SC_D"], fp["SC_D"], ft["SC_D_mask"],
                             ft["chi_1pi_periodic_mask"], interface,
                             strict_parity=strict_parity)

        import contextlib

        import jax
        import jax.numpy as jnp

        from packppi_tpu.geometry import atom14_coords_from_torsions

        # pin the coordinate rebuild to the host CPU backend: get_metric runs
        # on writer/metric threads overlapped with device packing (cli.pack
        # --metrics), and an eager dispatch to the accelerator here would
        # contend with the next chunk's pack_fn on the same device queue
        try:
            ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
        except RuntimeError:  # no CPU backend registered
            ctx = contextlib.nullcontext()
        with ctx:
            pred_coords = atom14_coords_from_torsions(
                jnp.asarray(ft["X"]), jnp.asarray(ft["residue_type"]),
                jnp.asarray(ft["BB_D"]), jnp.asarray(fp["SC_D"]))
        metric["atom_rmsd"] = mean_squared_atom_deviation(
            ft["X"], np.asarray(pred_coords), ft["atom_mask"],
            ft["residue_mask"], strict_parity=strict_parity)

        clashscore = self.get_clashscore(pred_pdb)
        metric["clashscore"] = clashscore
        # exact ONLY when the binary actually produced a number — a failed
        # parse returns None, and {'clashscore': None, 'is_exact': True}
        # would tell downstream tooling to trust a missing value
        metric["clashscore_is_exact"] = (self.molprobity_clash_loc is not None
                                         and clashscore is not None)
        return metric

    # ---- baseline packers ---------------------------------------------------

    def run_tool(self, in_pdb: str, tool_name: str) -> Optional[dict]:
        """Run an external side-chain packer and score it with the same suite
        (comparison baselines; reference: src/utils/protein_analysis.py:124-140)."""
        out_pdb = Path(self.tmp_dir) / "baseline.pdb"
        # a stale output from a previous call must never be scored as this
        # call's result (the packers give no useful exit codes, so absence
        # of a fresh file is the failure signal)
        out_pdb.unlink(missing_ok=True)
        if tool_name == "scwrl" and self.scwrl_loc:
            proc = subprocess.run([self.scwrl_loc, "-i", in_pdb, "-o", str(out_pdb)],
                                  stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)
        elif tool_name == "faspr" and self.faspr_loc:
            proc = subprocess.run([self.faspr_loc, "-i", in_pdb, "-o", str(out_pdb)],
                                  stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)
        else:
            raise ValueError(f"tool {tool_name!r} not configured")
        if not out_pdb.exists():
            err = (proc.stderr or b"").decode(errors="replace")[-500:]
            raise RuntimeError(f"{tool_name} produced no output for {in_pdb}"
                               + (f": {err}" if err.strip() else ""))
        return self.get_metric(in_pdb, str(out_pdb))
