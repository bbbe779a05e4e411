"""PackPPI-MSC task: joint chi-angle diffusion over protein complexes.

Functional counterpart of the reference task module (reference:
src/models/TorsionalDiffusion.py:21-341): bundles the score network with the
two SO(2) schedules (pi- and 2pi-periodic chis) and exposes pure functions —
``loss`` for training (single jitted step), ``sample`` for the 30-step
reverse diffusion (one lax.scan, so the whole trajectory compiles to a
single on-device loop with zero host round-trips).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from packppi_tpu.data.batch import ProteinBatch
from packppi_tpu.diffusion.so2 import SO2Schedule
from packppi_tpu.geometry.dihedrals import wrap_angle
from packppi_tpu.models.diffusion_net import ChiScoreNetwork, NetworkConfig


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    annealed_temp: float = 3.0
    mode: str = "ode"
    violation_tolerance_factor: float = 12.0
    clash_overlap_tolerance: float = 0.5
    lamda: float = 1.0
    num_steps: int = 50  # proximal refinement steps


@dataclasses.dataclass(frozen=True)
class TorsionalDiffusion:
    """Immutable model bundle; params live outside (train state / checkpoint)."""

    net: ChiScoreNetwork
    schedule_pi: SO2Schedule     # half-period pi/2 (symmetric side chains)
    schedule_2pi: SO2Schedule
    sample_cfg: SampleConfig

    @staticmethod
    def create(cfg: NetworkConfig = NetworkConfig(),
               sample_cfg: SampleConfig = SampleConfig()) -> "TorsionalDiffusion":
        return TorsionalDiffusion(
            net=ChiScoreNetwork(cfg),
            schedule_pi=SO2Schedule.create(True, sample_cfg.annealed_temp, sample_cfg.mode),
            schedule_2pi=SO2Schedule.create(False, sample_cfg.annealed_temp, sample_cfg.mode),
            sample_cfg=sample_cfg,
        )

    # ---- init ---------------------------------------------------------------

    def init(self, key, batch: ProteinBatch):
        t = jnp.zeros(batch.residue_mask.shape)
        return self.net.init(key, batch, batch.SC_D, t, True)

    def apply(self, params, batch: ProteinBatch, sc_d, t, deterministic=True,
              rngs=None, static=None, skip_last_edge_update=False):
        return self.net.apply(params, batch, sc_d, t, deterministic, static,
                              skip_last_edge_update, rngs=rngs)

    def encode_static(self, params, batch: ProteinBatch):
        """Backbone graph + edge embeddings, reusable across sampling steps."""
        return self.net.apply(params, batch, method="encode_static")

    # ---- noising ------------------------------------------------------------

    def add_chi_noise(self, key, batch: ProteinBatch, t):
        """Noise each chi by its periodicity's schedule; returns the noised
        angles (wrapped to [-pi, pi)) and the true wrapped score."""
        k1, k2 = jax.random.split(key)
        m1 = batch.chi_1pi_periodic_mask
        m2 = batch.chi_2pi_periodic_mask
        noised, score1 = self.schedule_pi.add_noise(k1, batch.SC_D, t, m1)
        noised, score2 = self.schedule_2pi.add_noise(k2, noised, t, m2)
        noised = wrap_angle(noised)
        return noised, jnp.where(m1, score1, score2)

    # ---- training loss ------------------------------------------------------

    def loss(self, params, key, batch: ProteinBatch, eps: float = 1e-6,
             deterministic: bool = False):
        """Score-matching loss, normalized per chi by E[score^2].

        One uniform t per protein, broadcast over residues (reference:
        src/models/TorsionalDiffusion.py:126-153).
        """
        kt, kn, kd = jax.random.split(key, 3)
        B, L = batch.residue_mask.shape
        t = jax.random.uniform(kt, (B,))[:, None] * jnp.ones((1, L))
        sigma = self.schedule_2pi.t_to_sigma(t)[..., None]  # same map for both

        noised, target = self.add_chi_noise(kn, batch, t)
        # deterministic=True turns dropout off: validation/test loss must
        # use it (the reference evaluates under Lightning eval mode — with
        # dropout active, val/loss compares dropout noise across epochs and
        # best-checkpoint selection keys on a lucky draw). t/noise sampling
        # stays stochastic in eval, as in the reference.
        # skip_last_edge_update: the stack returns h_V only, so the last
        # layer's edge update is dead in the loss. A/B measured NEUTRAL
        # (56.5-58.9 ms/step both ways at B=4/L=1024 — XLA already DCEs the
        # dead subgraph through the module boundaries); kept explicit so the
        # traced loss graph matches intent and skips tracing the dead pass
        pred, _ = self.apply(params, batch, noised, t,
                             deterministic=deterministic,
                             rngs={"dropout": kd},
                             skip_last_edge_update=True)

        sn_pi = self.schedule_pi.tables.lookup_score_norm(sigma)
        sn_2pi = self.schedule_2pi.tables.lookup_score_norm(sigma)
        score_norm = jnp.where(batch.chi_1pi_periodic_mask, sn_pi, sn_2pi)

        pred = pred * jnp.sqrt(score_norm) * batch.SC_D_mask
        chi_sum = jnp.maximum(batch.SC_D_mask.sum(), 1.0)
        return jnp.sum((target - pred) ** 2 / (score_norm + eps)) / chi_sum

    # ---- reverse-diffusion sampling -----------------------------------------

    def sample(self, params, key, batch: ProteinBatch,
               n_steps: Optional[int] = None,
               corrector_steps: int = 0,
               init_sc: Optional[jnp.ndarray] = None,
               return_trajectory: bool = False) -> jnp.ndarray:
        """30 denoising iterations as one lax.scan (reference:
        src/models/TorsionalDiffusion.py:254-298), optionally followed by
        Langevin corrector sub-steps per iteration. Returns SC_D [B, L, 4].

        ``init_sc`` overrides the t=1 noised chi initialization — used by the
        fixed-noise full-pipeline parity test, which replays the torch
        reference's recorded initial noise through this sampler (in ODE mode
        the initial noise is the sampler's only randomness).
        ``return_trajectory`` additionally returns the [n_steps, B, L, 4]
        per-step network inputs (the reference's recording points).
        """
        ts = np.linspace(1.0, 0.0, (n_steps or 30) + 1)
        times = jnp.asarray(ts[:-1], jnp.float32)
        dts = jnp.asarray(ts[:-1] - ts[1:], jnp.float32)

        B, L = batch.residue_mask.shape
        key, k0 = jax.random.split(key)
        if init_sc is None:
            sc, _ = self.add_chi_noise(k0, batch, jnp.ones((B, L)))
        else:
            sc = jnp.asarray(init_sc, jnp.float32)

        m1 = batch.chi_1pi_periodic_mask
        m2 = batch.chi_2pi_periodic_mask

        # the backbone never moves during sampling: build the kNN graph and
        # the 468-dim edge features ONCE instead of once per denoising step
        static = self.encode_static(params, batch)

        def step(carry, inputs):
            sc_in, key = carry
            time, dt = inputs
            key, k1, k2 = jax.random.split(key, 3)
            t = jnp.full((B, L), time)
            score, _ = self.apply(params, batch, sc_in, t, deterministic=True,
                                  static=static, skip_last_edge_update=True)
            sc = self.schedule_pi.step(k1, sc_in, score, time, dt, m1)
            sc = self.schedule_2pi.step(k2, sc, score, time, dt, m2)
            sc = wrap_angle(sc) * batch.SC_D_mask

            for _ in range(corrector_steps):
                # per-schedule Langevin correction: each periodicity's step
                # size comes from ITS OWN masked score/noise norms (reference:
                # src/models/components/schedule.py:237-273 — step_correct is
                # a per-schedule method applied under that schedule's mask)
                key, kc1, kc2 = jax.random.split(key, 3)
                score, _ = self.apply(params, batch, sc, t, deterministic=True,
                                      static=static, skip_last_edge_update=True)
                sc = self.schedule_pi.step_correct(kc1, sc, score, m1)
                sc = self.schedule_2pi.step_correct(kc2, sc, score, m2)
                sc = wrap_angle(sc) * batch.SC_D_mask
            return (sc, key), sc_in

        (sc, _), traj = jax.lax.scan(step, (sc, key), (times, dts))
        if return_trajectory:
            return sc, traj
        return sc
