"""Full-pipeline fixed-noise golden generator.

Runs the ENTIRE reference inference pipeline — ``TDiffusionModule.sampling``
(30-step ODE reverse diffusion), ``proximal_optimizer`` (50 Adam steps), and
``ProteinAnalysis.get_metric`` — on the 1BRS complex with a fixed seed, using
the reference's OWN code (reference: src/models/TorsionalDiffusion.py:254-298,
src/models/components/optimize.py:21-73, src/utils/protein_analysis.py:36-91),
and records the initial noise, the per-step chi trajectory (every network
input), the proximal loss list, and the final metric dict.

The paired test (tests/test_pipeline_golden.py) converts the recorded weights
to flax, replays the SAME initial noise through our lax.scan sampler (ODE mode
has no other randomness), and asserts trajectory-, proximal-, and metric-level
agreement — closing the end-to-end parity loop below the trained-checkpoint
level (the published checkpoint is not fetchable from this offline host).

Environment deps absent here (pytorch_lightning, torchmetrics, torch_scatter,
omegaconf, Bio, freesasa, torch_geometric) are stubbed with minimal fakes so
the reference source runs unmodified; none of the stubbed functionality is on
the recorded path (ODE sampling draws no scatter ops; parsing/interface use
our parity-tested host pipeline).
"""
from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import torch

REFERENCE_ROOT = Path("/root/reference")
REPO_ROOT = Path(__file__).resolve().parent.parent
CACHE_DIR = REPO_ROOT / "cache" / "reference_so2"
SEED = 11


class AttrDict(dict):
    __getattr__ = dict.__getitem__


def _install_stubs():
    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    # ---- pytorch_lightning ------------------------------------------------
    class LightningModule(torch.nn.Module):
        def save_hyperparameters(self, *a, **kw):
            import inspect
            loc = inspect.currentframe().f_back.f_locals
            d = {k: v for k, v in loc.items()
                 if k not in ("self", "__class__", "kwargs", "args")}
            d.update(loc.get("kwargs", {}))
            self._hparams = AttrDict(d)

        @property
        def hparams(self):
            return self._hparams

        @property
        def device(self):
            return torch.device("cpu")

        def log(self, *a, **kw):
            pass

    def rank_zero_only(fn):
        return fn

    pl = mod("pytorch_lightning", LightningModule=LightningModule)
    util = mod("pytorch_lightning.utilities", rank_zero_only=rank_zero_only)
    mod("pytorch_lightning.utilities.rank_zero", rank_zero_only=rank_zero_only)
    pl.utilities = util

    # ---- torchmetrics -----------------------------------------------------
    class MeanMetric:
        def update(self, *a, **kw): pass
        def reset(self): pass
        def compute(self): return 0.0
        def __call__(self, *a): pass
    mod("torchmetrics", MeanMetric=MeanMetric)

    # ---- omegaconf ---------------------------------------------------------
    mod("omegaconf", DictConfig=AttrDict)

    # ---- torch_scatter (exact CPU scatter_add; unused in ODE sampling) -----
    def scatter_add(src, index, dim=0):
        size = list(src.shape)
        size[dim] = int(index.max()) + 1 if index.numel() else 0
        return torch.zeros(size, dtype=src.dtype).index_add_(dim, index.reshape(-1), src)
    mod("torch_scatter", scatter_add=scatter_add)

    # ---- Bio / freesasa / torch_geometric (import-time only) ---------------
    bio = mod("Bio")
    bio_pdb = mod("Bio.PDB", PDBParser=object, NeighborSearch=object,
                  Selection=object, MMCIFParser=object)
    bio.PDB = bio_pdb
    mod("freesasa")

    class Data(SimpleNamespace):
        def keys(self):
            return list(self.__dict__.keys())

        def __getitem__(self, k):
            return self.__dict__[k]

        def __setitem__(self, k, v):
            self.__dict__[k] = v
    tg = mod("torch_geometric")
    tg.data = mod("torch_geometric.data", Data=Data)


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def load_reference():
    _install_stubs()
    for pkg in ("src", "src.utils", "src.models", "src.datamodules",
                "src.datamodules.components"):
        m = types.ModuleType(pkg)
        m.__path__ = []
        sys.modules.setdefault(pkg, m)
    r = REFERENCE_ROOT / "src"
    _load("src.utils.stereo_chemical_props", r / "utils/stereo_chemical_props.py")
    _load("src.utils.residue_constants", r / "utils/residue_constants.py")
    _load("src.utils.rigid_utils", r / "utils/rigid_utils.py")
    _load("src.utils.features", r / "utils/features.py")
    _load("src.utils.pylogger", r / "utils/pylogger.py")
    # helper.py imports these three names; none are called on the golden path
    sys.modules["src.utils.interface"] = types.ModuleType("src.utils.interface")
    for n in ("get_interface_residues", "extract_interface", "parse_interface_file"):
        setattr(sys.modules["src.utils.interface"], n, None)
    _load("src.utils.protein", r / "utils/protein.py")
    _load("src.datamodules.components.helper", r / "datamodules/components/helper.py")
    _load("src.models.components", r / "models/components/__init__.py")
    _load("src.models.components.layers", r / "models/components/layers.py")
    _load("src.models.components.encoder", r / "models/components/encoder.py")
    _load("src.models.components.mpnn", r / "models/components/mpnn.py")
    schedule = _load("src.models.components.schedule", r / "models/components/schedule.py")
    _load("src.models.components.clash", r / "models/components/clash.py")
    optimize = _load("src.models.components.optimize", r / "models/components/optimize.py")
    _load("src.datamodules.components.complex_dataset",
          r / "datamodules/components/complex_dataset.py")
    td = _load("src.models.TorsionalDiffusion", r / "models/TorsionalDiffusion.py")
    pa = _load("src.utils.protein_analysis", r / "utils/protein_analysis.py")

    # reference caches its SO(2) tables next to its own (read-only) source;
    # redirect to a writable repo-local cache with identical contents
    CACHE_DIR.mkdir(parents=True, exist_ok=True)

    class CachedSO2VESchedule(schedule.SO2VESchedule):
        def __init__(self, *a, **kw):
            kw.setdefault("cache_folder", str(CACHE_DIR))
            super().__init__(*a, **kw)

    td.SO2VESchedule = CachedSO2VESchedule
    return td, optimize, pa


def build_torch_batch(batch):
    """Our padded ProteinBatch (unpadded here: target_len == L) -> the
    attribute-style batch the reference model consumes."""
    t = lambda x: torch.from_numpy(np.asarray(x))
    L = batch.residue_mask.shape[1]
    return SimpleNamespace(
        X=t(batch.X).float(),
        atom_mask=t(batch.atom_mask).float(),
        residue_type=t(batch.residue_type).long(),
        residue_mask=t(batch.residue_mask).float(),
        residue_index=t(batch.residue_index).long(),
        chain_indices=t(batch.chain_indices).long(),
        BB_D=t(batch.BB_D).float(),
        BB_D_sincos=t(batch.BB_D_sincos).float(),
        SC_D=t(batch.SC_D).float(),
        SC_D_mask=t(batch.SC_D_mask).float(),
        chi_1pi_periodic_mask=t(batch.chi_1pi_periodic_mask).bool(),
        chi_2pi_periodic_mask=t(batch.chi_2pi_periodic_mask).bool(),
        num_proteins=1,
        max_size=L,
    )


def main():
    td_mod, optimize_mod, pa_mod = load_reference()
    from src.models.components import get_atom14_coords  # reference's own

    from packppi_tpu.data import stack_batch
    from packppi_tpu.structure import from_pdb_file, to_pdb
    from packppi_tpu.structure.featurize import featurize
    from packppi_tpu.structure.interface import interface_residue_mask

    fixture = REPO_ROOT / "tests/fixtures/1brs.pdb"
    prot = from_pdb_file(fixture, mse_to_met=True)
    feats = featurize(prot)
    L = len(feats["residue_type"])
    batch = stack_batch([feats], target_len=L)
    tb = build_torch_batch(batch)

    torch.manual_seed(SEED)
    np.random.seed(SEED)
    cfg_enc = AttrDict(node_in=35, edge_in=468, node_features=128,
                       edge_features=128, time_embedding_type="sinusoidal",
                       time_embedding_dim=16, num_positional_embeddings=16,
                       num_rbf=16, top_k=32, af2_relpos=True)
    cfg_model = AttrDict(hidden_dim=128, num_mpnn_layers=3, n_points=8,
                         dropout=0.1, act="relu", position_scale=1.0,
                         use_ipmp=True, k_neighbors=32)
    cfg_sample = AttrDict(annealed_temp=3, mode="ode",
                          violation_tolerance_factor=12.0,
                          clash_overlap_tolerance=0.5, lamda=1.0,
                          num_steps=50, eval_epochs=1,
                          sample_during_training=True)
    module = td_mod.TDiffusionModule(optimizer=None, scheduler=None,
                                     encoder_cfg=cfg_enc, model_cfg=cfg_model,
                                     sample_cfg=cfg_sample)
    module.eval()

    # record every network input (= the chi state entering each of the 30
    # denoising evaluations); records[0] is the t=1 noised initialization
    records = []
    orig_network = module.network

    def recording_network(b, SC_D_noised, t):
        records.append(SC_D_noised.detach().clone().reshape(1, L, 4))
        return orig_network(b, SC_D_noised, t)

    module.network = recording_network

    torch.manual_seed(SEED + 1)  # the t=1 chi noise — the only sampler RNG (ODE)
    with torch.no_grad():
        sc_sampled = module.sampling(tb, use_proximal=False)

    clash_mask = optimize_mod.find_clash_mask(tb, sc_sampled, 12.0, 0.5)
    resample_list, loss_list = optimize_mod.proximal_optimizer(
        tb, sc_sampled, 12.0, 0.5, 1.0, 50)
    accepted = loss_list[-1] < loss_list[0]
    sc_final = resample_list[-1] if accepted else sc_sampled

    # ---- reference metric math (get_metric), with structure round trip ----
    # predicted coords -> PDB (our parity-tested writer) -> re-featurize
    pred_coords = get_atom14_coords(tb.X, tb.residue_type, tb.BB_D, sc_final)
    import dataclasses
    pred_prot = dataclasses.replace(
        prot, atom_positions=np.asarray(pred_coords[0], np.float64))
    pred_pdb = REPO_ROOT / "cache" / "pipeline_golden_pred.pdb"
    pred_pdb.write_text(to_pdb(pred_prot))
    pred_feats = featurize(from_pdb_file(pred_pdb, mse_to_met=True))

    iface = interface_residue_mask(prot).astype(np.float32)
    t = lambda x: torch.from_numpy(np.asarray(x))
    true_data = SimpleNamespace(
        X=tb.X, SC_D=tb.SC_D, SC_D_mask=tb.SC_D_mask,
        chi_1pi_periodic_mask=tb.chi_1pi_periodic_mask,
        residue_type=tb.residue_type, BB_D=tb.BB_D,
        atom_mask=tb.atom_mask, residue_mask=tb.residue_mask,
        interface_mask=t(iface).float()[None],
    )
    pred_data = SimpleNamespace(
        X=t(pred_feats["X"]).float()[None],
        SC_D=t(pred_feats["SC_D"]).float()[None],
    )

    pa = pa_mod.ProteinAnalysis.__new__(pa_mod.ProteinAnalysis)
    pa.get_prot = lambda p, get_interface=True: true_data if "true" in p else pred_data
    pa.get_clashscore = lambda p: 0.0  # MolProbity binary absent; excluded
    metric = pa.get_metric("true.pdb", "pred.pdb")
    metric.pop("clashscore")
    metric = {k: float(v) for k, v in metric.items()}

    sd = {k: v.numpy() for k, v in module.state_dict().items()}
    np.savez_compressed(
        REPO_ROOT / "tests/golden/pipeline_golden.npz",
        init_sc=records[0].numpy(),
        traj=torch.stack(records, 0).numpy(),      # [30, 1, L, 4]
        final_sc=np.asarray(sc_sampled),
        clash_mask=np.asarray(clash_mask),
        prox_losses=np.asarray(loss_list, np.float32),
        prox_final_sc=np.asarray(resample_list[-1]),
        accepted=np.bool_(accepted),
        interface_mask=iface,
        pred_coords=np.asarray(pred_coords),
        pred_sc_refeat=np.asarray(pred_feats["SC_D"], np.float32),
        **{f"metric::{k}": np.float32(v) for k, v in metric.items()},
        **{f"sd::{k}": v for k, v in sd.items()},
    )
    print(f"wrote pipeline golden: {len(records)} network evals, "
          f"prox accepted={accepted}, metrics={metric}")


if __name__ == "__main__":
    main()
