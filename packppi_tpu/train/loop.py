"""Training loops for both task families (L9).

Functional replacement for the reference's Lightning harness (reference:
src/train_diffusion.py:19-106, src/train_affinity.py): seeded PRNG
threading, bucketed loaders, a single pjit-compiled train step per shape
bucket, per-epoch validation, top-k + last checkpointing with resume, and
periodic sampling evaluation. Distribution is SPMD over a (data, model)
mesh — no process-per-device orchestration.
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from packppi_tpu.train.checkpoints import load_model_params, load_params, save_params
from packppi_tpu.train.diffusion_task import init_state, make_ema_update, make_train_step
from packppi_tpu.utils.logging import MetricLogger, get_logger

log = get_logger(__name__)


def init_ema(cfg, params, resume):
    """Shared EMA bootstrap for all three trainers: returns
    ``(ema_decay, ema, ema_step)`` — ema/ema_step are None when disabled.

    ``jnp.array`` COPIES deliberately: ema_step donates the ema buffer, so
    it must not alias the live params. A ``<resume>_ema`` sidecar written
    by CheckpointManager resumes the EMA stream alongside the params."""
    ema_decay = float(cfg.trainer.get("ema_decay", 0.0) or 0.0)
    if ema_decay <= 0.0:
        return ema_decay, None, None
    ema = jax.tree.map(jnp.array, params)
    if resume and Path(f"{resume}_ema").exists():
        ema = load_params(f"{resume}_ema", jax.eval_shape(lambda: ema))
    ema_step = jax.jit(make_ema_update(ema_decay), donate_argnums=(0,))
    return ema_decay, ema, ema_step


class CheckpointManager:
    """top-k-by-metric + always-last retention over orbax saves."""

    def __init__(self, directory: str, top_k: int = 3, mode: str = "min"):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.top_k = top_k
        self.mode = mode
        self.index_file = self.dir / "index.json"
        self.index = json.loads(self.index_file.read_text()) if self.index_file.exists() else {}

    def save(self, step: int, state, metric: Optional[float] = None,
             ema=None) -> None:
        name = f"step_{step:08d}"
        save_params(self.dir / name, state)
        if ema is not None:
            # params-only sidecar (same layout as a converted checkpoint, so
            # `packppi-pack --ckpt <...>_ema` loads it directly)
            save_params(self.dir / f"{name}_ema", ema)
        self.index[name] = {"step": step, "metric": metric}
        self._prune()
        self.index_file.write_text(json.dumps(self.index))

    def _prune(self):
        scored = [(n, m["metric"]) for n, m in self.index.items() if m["metric"] is not None]
        scored.sort(key=lambda x: x[1], reverse=(self.mode == "max"))
        keep = {n for n, _ in scored[: self.top_k]}
        last = max(self.index, key=lambda n: self.index[n]["step"])
        keep.add(last)
        for name in list(self.index):
            if name not in keep:
                shutil.rmtree(self.dir / name, ignore_errors=True)
                shutil.rmtree(self.dir / f"{name}_ema", ignore_errors=True)
                del self.index[name]

    def latest(self) -> Optional[str]:
        if not self.index:
            return None
        return str(self.dir / max(self.index, key=lambda n: self.index[n]["step"]))

    def best(self) -> Optional[str]:
        scored = [(n, m["metric"]) for n, m in self.index.items() if m["metric"] is not None]
        if not scored:
            return self.latest()
        scored.sort(key=lambda x: x[1], reverse=(self.mode == "max"))
        return str(self.dir / scored[0][0])


def _setup_runtime(trainer_cfg) -> None:
    if trainer_cfg.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)


def make_lr(trainer_cfg, steps_per_epoch: int):
    """LR or optax schedule from the trainer config (the reference exposes an
    optional Hydra-partial scheduler hook; reference:
    src/models/TorsionalDiffusion.py:343-361, configs/model/TorsionalDiffusion.yaml)."""
    schedule = trainer_cfg.get("lr_schedule", "constant") or "constant"
    lr = trainer_cfg.lr
    if schedule == "constant":
        return lr
    if schedule == "cosine":
        warmup = int(trainer_cfg.get("warmup_steps", 0))
        # optax.MultiSteps advances the inner schedule once per ACCUMULATED
        # update, so the horizon counts optimizer steps, not micro-batches
        accum = max(1, int(trainer_cfg.get("grad_accum_steps", 1)))
        total = max(trainer_cfg.max_epochs * max(steps_per_epoch // accum, 1),
                    warmup + 1)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup,
            decay_steps=total, end_value=lr * 0.1)
    raise ValueError(f"unknown lr_schedule {schedule!r} (constant | cosine)")


class EarlyStopper:
    """val/loss early stopping with patience — reference-parity capability
    (reference: configs/callbacks/early_stopping.yaml: monitor val/loss,
    patience counted in validation checks, mode min, min_delta 0; the
    reference's own diffusion run neutralizes it via min_epochs ==
    max_epochs, configs/trainer/default.yaml:5-6). Disabled when
    ``trainer.early_stopping_patience`` <= 0 (the default here)."""

    def __init__(self, trainer_cfg):
        self.patience = int(trainer_cfg.get("early_stopping_patience", 0) or 0)
        self.min_delta = float(trainer_cfg.get("early_stopping_min_delta", 0.0) or 0.0)
        self.min_epochs = int(trainer_cfg.get("min_epochs", 0) or 0)
        self.best = float("inf")
        self.stale = 0

    def should_stop(self, epoch: int, val_loss: float) -> bool:
        """Feed one validation result; True once ``patience`` consecutive
        checks brought no improvement and ``min_epochs`` have completed.
        Non-finite losses (no-val epochs) neither improve nor count."""
        if self.patience <= 0 or not np.isfinite(val_loss):
            return False
        if val_loss < self.best - self.min_delta:
            self.best, self.stale = val_loss, 0
        else:
            self.stale += 1
        return self.stale >= self.patience and (epoch + 1) >= self.min_epochs


def train_diffusion(cfg) -> dict:
    """PackPPI-MSC training from a composed config (see configs/train_diffusion.yaml)."""
    from packppi_tpu.data.complex import ComplexDataset, scan_complex_dir, split_entries
    from packppi_tpu.data.loader import BucketedLoader
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.utils.metrics import chi_metrics

    _setup_runtime(cfg.trainer)
    out = Path(cfg.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    metrics_log = MetricLogger(out / "logs", backends=cfg.get("logger") or ("tensorboard",),
                               run_config=cfg.to_dict())
    (out / "config.json").write_text(json.dumps(cfg.to_dict(), indent=1, default=str))

    # ---- data ---------------------------------------------------------------
    codes = scan_complex_dir(cfg.data.data_dir, cfg.data.pdb_suffix)
    if not codes:
        raise SystemExit(f"no PDBs matching *{cfg.data.pdb_suffix}.pdb in {cfg.data.data_dir}")
    splits = split_entries(codes, cfg.data.split_fractions, cfg.data.split_seed,
                           split_file=str(out / "split.json"))
    cache = Path(cfg.data.data_dir) / cfg.data.cache_dir
    ds = {k: ComplexDataset(cfg.data.data_dir, v, cache_dir=str(cache),
                            suffix=cfg.data.pdb_suffix,
                            len_region=cfg.data.len_region).filtered()
          for k, v in splits.items()}

    n_devices = cfg.trainer.n_devices or jax.device_count()
    global_batch = cfg.data.batch_size * max(1, n_devices // cfg.trainer.model_parallel)
    loaders = {
        "train": BucketedLoader(ds["train"], global_batch, shuffle=True, seed=cfg.seed, drop_last=True),
        # sharded batches must stay divisible by the data axis
        "val": BucketedLoader(ds["val"], global_batch, shuffle=False,
                              drop_last=(n_devices > 1), prefetch=0),
    }
    log.info(f"data: {len(ds['train'])} train / {len(ds['val'])} val / {len(ds['test'])} test complexes")

    # ---- model / optimizer --------------------------------------------------
    net_cfg = NetworkConfig(**{k: cfg.model[k] for k in NetworkConfig.__dataclass_fields__
                               if k in cfg.model})
    sample_cfg = SampleConfig(
        annealed_temp=cfg.sample.annealed_temp, mode=cfg.sample.mode,
        violation_tolerance_factor=cfg.sample.violation_tolerance_factor,
        clash_overlap_tolerance=cfg.sample.clash_overlap_tolerance,
        lamda=cfg.sample.lamda, num_steps=cfg.sample.num_steps)
    model = TorsionalDiffusion.create(net_cfg, sample_cfg)

    optimizer = optax.adamw(make_lr(cfg.trainer, len(loaders["train"])),
                            weight_decay=cfg.trainer.weight_decay)
    if cfg.trainer.grad_accum_steps > 1:
        optimizer = optax.MultiSteps(optimizer, cfg.trainer.grad_accum_steps)

    key = jax.random.key(cfg.seed)
    key, k_init = jax.random.split(key)
    # dedicated fixed eval streams, never advanced by training (see the
    # common-random-numbers note at the validation loop)
    val_key = jax.random.fold_in(jax.random.key(cfg.seed), 0x5EED)
    test_key = jax.random.fold_in(jax.random.key(cfg.seed), 0x7E57)
    # first_batch, not next(iter(...)): an abandoned iterator leaks its
    # prefetch worker blocked on the full queue (with stacked batches
    # pinned) for process lifetime
    init_batch = loaders["val"].first_batch()
    if init_batch is None:
        init_batch = loaders["train"].first_batch()
    if init_batch is None:
        raise SystemExit("no full batch available; lower data.batch_size")
    state = init_state(model, k_init, init_batch, optimizer)

    ckpt_mgr = CheckpointManager(out / "checkpoints", top_k=cfg.trainer.checkpoint_top_k)
    start_epoch = 0
    resume = cfg.get("ckpt_path") or ckpt_mgr.latest()
    if resume:
        log.info(f"resuming from {resume}")
        state = load_params(resume, jax.eval_shape(lambda: state))
        start_epoch = int(state.step) // max(1, len(loaders["train"]))

    ema_decay, ema, ema_step = init_ema(cfg, state.params, resume)

    if n_devices > 1:
        # SPMD: batch over 'data' (ICI all-reduce on grads), large kernels
        # FSDP-sharded over 'model'
        from packppi_tpu.parallel import batch_sharding, make_mesh, param_shardings, replicated

        mesh = make_mesh(n_devices, model_parallel=cfg.trainer.model_parallel)
        log.info(f"mesh: {dict(mesh.shape)}")
        p_shard = param_shardings(mesh, state.params)
        state_shard = type(state)(
            params=p_shard,
            opt_state=jax.tree.map(
                lambda x: param_shardings(mesh, x) if isinstance(x, dict) else replicated(mesh),
                state.opt_state, is_leaf=lambda x: isinstance(x, dict)),
            step=replicated(mesh),
            key=replicated(mesh),
        )
        b_shard = jax.tree.map(lambda _: batch_sharding(mesh), init_batch)
        state = jax.device_put(state, state_shard)
        if ema is not None:
            ema = jax.device_put(ema, p_shard)
        put_batch = lambda b: jax.device_put(b, b_shard)
        train_step = jax.jit(make_train_step(model, optimizer),
                             in_shardings=(state_shard, b_shard),
                             out_shardings=(state_shard, replicated(mesh)),
                             donate_argnums=(0,))
        # deterministic=True: validation/test run dropout-OFF (reference
        # evaluates under Lightning eval mode; with dropout on, best-ckpt
        # selection and early stopping compare dropout noise)
        eval_loss = jax.jit(
            lambda p, k, b: model.loss(p, k, b, deterministic=True),
            in_shardings=(p_shard, replicated(mesh), b_shard),
            out_shardings=replicated(mesh))
        sample_fn = jax.jit(
            lambda p, k, b: model.sample(p, k, b, n_steps=cfg.sample.n_diffusion_steps),
            in_shardings=(p_shard, replicated(mesh), b_shard),
            out_shardings=batch_sharding(mesh))
    else:
        put_batch = lambda b: b
        train_step = jax.jit(make_train_step(model, optimizer), donate_argnums=(0,))
        eval_loss = jax.jit(lambda p, k, b: model.loss(p, k, b, deterministic=True))
        sample_fn = jax.jit(lambda p, k, b: model.sample(p, k, b, n_steps=cfg.sample.n_diffusion_steps))

    # ---- epochs -------------------------------------------------------------
    best_val = float("inf")
    stopper = EarlyStopper(cfg.trainer)
    epochs_run = 0
    for epoch in range(start_epoch, cfg.trainer.max_epochs):
        epochs_run = epoch + 1
        losses = []
        for batch in loaders["train"]:
            state, loss = train_step(state, put_batch(batch))
            if ema is not None:
                ema = ema_step(ema, state.params)
            losses.append(loss)
            if len(losses) % cfg.trainer.log_every_steps == 0:
                metrics_log.log(int(state.step), {"train/loss": float(jnp.stack(losses[-cfg.trainer.log_every_steps:]).mean())})
        train_loss = float(jnp.stack(losses).mean()) if losses else float("nan")

        val_loss = float("nan")
        if (epoch + 1) % cfg.trainer.val_every_epochs == 0 and len(ds["val"]):
            # with EMA active, validation / sampling / best-ckpt selection
            # all evaluate the EMA weights (what inference will use)
            eval_params = ema if ema is not None else state.params
            vlosses = []
            # fixed per-batch eval keys (common random numbers): every
            # validation pass sees the SAME t/noise draws (the val loader is
            # unshuffled), so val/loss differences across epochs — what
            # best-ckpt selection and early stopping compare — are purely
            # parameter-driven, not sampling noise. Dropout is already off
            # (deterministic=True); this removes the remaining noise source.
            for i, batch in enumerate(loaders["val"]):
                k_v = jax.random.fold_in(val_key, i)
                vlosses.append(eval_loss(eval_params, k_v, put_batch(batch)))
            val_loss = float(jnp.stack(vlosses).mean()) if vlosses else float("nan")
            best_val = min(best_val, val_loss) if vlosses else best_val
            metrics_log.log(int(state.step), {"val/loss": val_loss, "train/loss_epoch": train_loss})

            if cfg.sample.sample_during_training and (epoch + 1) % cfg.sample.eval_epochs == 0:
                batch = next(iter(loaders["val"]), None)
                if batch is not None:
                    # same fixed key every sampling eval: chi metrics are
                    # comparable epoch-over-epoch
                    k_s = jax.random.fold_in(val_key, -1)
                    sc = sample_fn(eval_params, k_s, put_batch(batch))
                    m = chi_metrics(batch.SC_D, np.asarray(sc), batch.SC_D_mask,
                                    batch.chi_1pi_periodic_mask)
                    metrics_log.log(int(state.step), m, prefix="val/")

        log.info(f"epoch {epoch}: train {train_loss:.4f} val {val_loss:.4f}")
        # checkpoint on the validation cadence and at the end — per-epoch
        # saves on long small-corpus runs are pure host overhead. Cadence,
        # not finiteness: an empty/NaN val epoch must still save, or a run
        # whose val loader yields nothing would never checkpoint.
        if (epoch + 1) % cfg.trainer.val_every_epochs == 0 or epoch == cfg.trainer.max_epochs - 1:
            ckpt_mgr.save(int(state.step), state,
                          metric=val_loss if np.isfinite(val_loss) else None,
                          ema=ema)
        if stopper.should_stop(epoch, val_loss):
            log.info(f"early stopping at epoch {epoch}: no val/loss improvement "
                     f"in {stopper.patience} validation check(s)")
            break

    # final held-out evaluation with the best checkpoint (reference:
    # trainer.test on best ckpt, src/train_diffusion.py:74-86)
    test_loss = float("nan")
    if len(ds["test"]):
        best = ckpt_mgr.best()
        test_params = None
        if best:
            state = load_params(best, jax.eval_shape(lambda: state))
            if ema is not None and Path(f"{best}_ema").exists():
                test_params = load_params(f"{best}_ema", jax.eval_shape(lambda: ema))
        test_loader = BucketedLoader(ds["test"], global_batch, shuffle=False,
                                     drop_last=(n_devices > 1), prefetch=0)
        if test_params is None:
            test_params = ema if ema is not None else state.params
        tlosses = []
        # fixed keys here too: test/loss is reproducible run-to-run at
        # equal params (stream disjoint from the val keys via fold_in tag)
        for i, batch in enumerate(test_loader):
            k_t = jax.random.fold_in(test_key, i)
            tlosses.append(eval_loss(test_params, k_t, put_batch(batch)))
        test_loss = float(jnp.stack(tlosses).mean()) if tlosses else float("nan")
        metrics_log.log(int(state.step), {"test/loss": test_loss})
        log.info(f"test loss (best ckpt): {test_loss:.4f}")

    metrics_log.close()
    return {"best_val_loss": best_val, "test_loss": test_loss,
            "epochs_run": epochs_run,
            "best_ckpt": ckpt_mgr.best(), "last_ckpt": ckpt_mgr.latest()}


def esm_batches(entries, batch_size, shuffle, seed, load_item):
    """Padded (wt, mut, ddg) batches over SKEMPI entries for ESM mode.

    Training (shuffle=True) drops the ragged tail so every step sees a full
    batch; eval (shuffle=False) emits the final partial batch too — a val
    split smaller than batch_size must still yield (else val_loss is NaN
    every epoch and checkpoints all save with metric=None).
    """
    from packppi_tpu.data.esm import ESM_DIM

    idx = np.arange(len(entries))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
        stops = range(0, len(idx) - batch_size + 1, batch_size)
    else:
        stops = range(0, len(idx), batch_size)
    for s in stops:
        # load_item returns None for entries whose mutations fail to apply
        items = [it for it in (load_item(entries[i]) for i in idx[s:s + batch_size])
                 if it is not None]
        if not items:
            continue
        L = max(w.shape[0] for w, _, _ in items)
        # width follows the cached embeddings (1280 for real ESM-2 650M;
        # smaller stand-ins — e.g. scripts/repro_esm2_cv.py --random_esm —
        # train the same head at their own width)
        dim = items[0][0].shape[-1] if items[0][0].ndim == 2 else ESM_DIM
        wt = np.zeros((len(items), L, dim), np.float32)
        mt = np.zeros_like(wt)
        ddg = np.zeros(len(items), np.float32)
        for k, (w, m, d) in enumerate(items):
            wt[k, : len(w)], mt[k, : len(m)], ddg[k] = w, m, d
        yield jnp.asarray(wt), jnp.asarray(mt), jnp.asarray(ddg)


def _train_affinity_esm(cfg, splits, cache_dir, out, metrics_log) -> dict:
    """'esm' mode: ddG head over precomputed/extracted ESM-2 embeddings
    (reference: configs/experiment/affinity_esm.yaml; hidden dim 1280)."""
    from packppi_tpu.data.esm import get_esm_extractor
    from packppi_tpu.data.skempi import apply_mutations
    from packppi_tpu.models import NetworkConfig
    from packppi_tpu.models.affinity import AffinityModel
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize

    extractor = get_esm_extractor()

    def load_item(e):
        cache = cache_dir / f"esm_{e['pdb_id']}_{e['id']}.npz"
        if cache.exists():
            with np.load(cache) as z:
                return z["wt"], z["mut"], np.float32(e["ddG"])
        if extractor is None:
            raise SystemExit(
                "ESM mode needs either cached embeddings under "
                f"{cache_dir} (esm_<pdb>_<id>.npz with wt/mut arrays) or a "
                "local copy of facebook/esm2_t33_650M_UR50D")
        prot = from_pdb_file(e["pdb_path"], mse_to_met=True)
        feats = featurize(prot)
        try:
            # strict: a silent mutation no-match would train wt==mut
            # embeddings against a nonzero ddG (corrupted data) AND write
            # the corrupt pair to the cache where later runs never re-check
            rt_mut, _ = apply_mutations(prot, e["mutations"], strict=True)
        except ValueError as err:
            log.warning(f"skipping {e['pdb_id']}/{e['id']}: {err}")
            return None
        wt = extractor(feats["residue_type"], feats["chain_indices"])
        mut = extractor(rt_mut, feats["chain_indices"])
        wt = wt * feats["residue_mask"][:, None]
        mut = mut * feats["residue_mask"][:, None]
        np.savez_compressed(cache, wt=wt, mut=mut)
        return wt, mut, np.float32(e["ddG"])

    def make_batches(entries, batch_size, shuffle, seed):
        yield from esm_batches(entries, batch_size, shuffle, seed, load_item)

    strict_parity = bool(cfg.model.get("strict_parity", True))
    model = AffinityModel.create(NetworkConfig(), mode="esm",
                                 strict_parity=strict_parity)
    # rows of real residues: embeddings are extracted then zeroed at padding
    # (wt * residue_mask above), so a nonzero row norm marks a real residue
    _pool_mask = ((lambda wt: (jnp.abs(wt).sum(-1) > 0).astype(jnp.float32))
                  if not strict_parity else (lambda wt: None))
    key = jax.random.key(cfg.seed)
    wt0, mt0, _ = next(make_batches(splits["train"], 1, False, 0))
    params = model.net.init(key, None, None, wt0, mt0, None)
    resume = cfg.get("ckpt_path")
    if resume:
        # params-level resume (reference: ckpt_path in src/train_affinity.py)
        log.info(f"resuming params from {resume}")
        params = load_params(resume, jax.eval_shape(lambda: params))
    optimizer = optax.adamw(cfg.trainer.lr, weight_decay=cfg.trainer.weight_decay)
    opt_state = optimizer.init(params)
    ema_decay, ema, ema_step = init_ema(cfg, params, resume)

    def _train_step(params, opt_state, wt, mt, ddg):
        loss, grads = jax.value_and_grad(model.loss_esm)(
            params, wt, mt, ddg, residue_mask=_pool_mask(wt))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def _eval_loss(params, wt, mt, ddg, w):
        return model.loss_esm(params, wt, mt, ddg, weights=w,
                              residue_mask=_pool_mask(wt))

    n_devices = cfg.trainer.get("n_devices") or jax.device_count()
    mp = int(cfg.trainer.get("model_parallel", 1) or 1)
    # never scale the global batch past what the split can fill (tiny
    # datasets on many-device hosts would otherwise yield zero batches)
    dp = max(1, min(n_devices // mp,
                    len(splits["train"]) // max(1, cfg.data.batch_size)))
    n_devices = dp * mp
    global_batch = cfg.data.batch_size * dp
    if len(splits["train"]) < global_batch:
        # esm_batches' shuffle branch drops the ragged tail; without this
        # guard a split smaller than one batch trains ZERO steps per epoch
        # while validation still runs and checkpoints the random init as
        # 'best' (the structure-mode path has the same guard)
        raise SystemExit(
            f"train split ({len(splits['train'])} mutations) yields no full "
            f"batches at global batch {global_batch} — lower data.batch_size")
    if n_devices > 1:
        # DP over the mesh: embedding batches shard over 'data'; with
        # trainer.model_parallel > 1 the wide ESM projection kernels
        # FSDP-shard over 'model' (small tensors replicate); ragged eval
        # tails pad with zero-weight rows
        from packppi_tpu.parallel import (batch_sharding, make_mesh,
                                          param_shardings, replicated)

        mesh = make_mesh(n_devices, model_parallel=mp)
        log.info(f"mesh: {dict(mesh.shape)}")
        rep, rows = replicated(mesh), batch_sharding(mesh)
        p_shard = param_shardings(mesh, params)
        o_shard = jax.tree.map(
            lambda x: param_shardings(mesh, x) if isinstance(x, dict) else rep,
            opt_state, is_leaf=lambda x: isinstance(x, dict))
        params = jax.device_put(params, p_shard)
        opt_state = jax.device_put(opt_state, o_shard)
        if ema is not None:
            ema = jax.device_put(ema, p_shard)
        put = lambda *xs: tuple(jax.device_put(x, rows) for x in xs)
        train_step = jax.jit(_train_step, in_shardings=(p_shard, o_shard, rows, rows, rows),
                             out_shardings=(p_shard, o_shard, rep))
        eval_loss = jax.jit(_eval_loss, in_shardings=(p_shard, rows, rows, rows, rows),
                            out_shardings=rep)
    else:
        put = lambda *xs: xs
        train_step = jax.jit(_train_step)
        eval_loss = jax.jit(_eval_loss)

    def eval_batches(entries):
        for wt, mt, ddg in make_batches(entries, global_batch, False, 0):
            n = len(ddg)
            pad = -n % max(1, dp)
            if pad:
                wt = np.concatenate([wt, np.repeat(wt[-1:], pad, 0)], 0)
                mt = np.concatenate([mt, np.repeat(mt[-1:], pad, 0)], 0)
                ddg = np.concatenate([ddg, np.zeros(pad, ddg.dtype)], 0)
            w = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
            yield (*put(jnp.asarray(wt), jnp.asarray(mt), jnp.asarray(ddg)),
                   put(jnp.asarray(w))[0])

    ckpt_mgr = CheckpointManager(out / "checkpoints", top_k=cfg.trainer.checkpoint_top_k)
    best_val, step = float("inf"), 0
    stopper = EarlyStopper(cfg.trainer)
    for epoch in range(cfg.trainer.max_epochs):
        losses = []
        for wt, mt, ddg in make_batches(splits["train"], global_batch, True,
                                        cfg.seed + epoch):
            params, opt_state, loss = train_step(
                params, opt_state, *put(wt, mt, ddg))
            if ema is not None:
                ema = ema_step(ema, params)
            losses.append(loss)
            step += 1
        eval_params = ema if ema is not None else params
        vlosses = [eval_loss(eval_params, wt, mt, ddg, w)
                   for wt, mt, ddg, w in eval_batches(splits["valid"])]
        train_loss = float(jnp.stack(losses).mean()) if losses else float("nan")
        val_loss = float(jnp.stack(vlosses).mean()) if vlosses else float("nan")
        best_val = min(best_val, val_loss)
        metrics_log.log(step, {"train/loss": train_loss, "val/loss": val_loss})
        log.info(f"epoch {epoch}: train {train_loss:.4f} val {val_loss:.4f}")
        ckpt_mgr.save(step, params, metric=val_loss if np.isfinite(val_loss) else None,
                      ema=ema)
        if stopper.should_stop(epoch, val_loss):
            log.info(f"early stopping at epoch {epoch}")
            break
    metrics_log.close()
    return {"best_val_loss": best_val, "best_ckpt": ckpt_mgr.best()}


def train_affinity(cfg) -> dict:
    """PackPPI-AP training (frozen diffusion backbone) from a composed config."""
    from packppi_tpu.data.loader import BucketedLoader
    from packppi_tpu.data.skempi import (cv_split, load_skempi_entries, skempi_features,
                                         stack_affinity_batch)
    from packppi_tpu.models import NetworkConfig
    from packppi_tpu.models.affinity import AffinityModel
    from packppi_tpu.structure import from_pdb_file

    _setup_runtime(cfg.trainer)
    out = Path(cfg.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    metrics_log = MetricLogger(out / "logs", backends=cfg.get("logger") or ("tensorboard",),
                               run_config=cfg.to_dict())

    entries = load_skempi_entries(cfg.data.data_dir, cfg.data.pdb_dirname,
                                  cfg.data.meta_filename, list(cfg.data.block_list))
    if not entries:
        raise SystemExit(f"no usable SKEMPI entries under {cfg.data.data_dir}")
    splits = cv_split(entries, cfg.data.num_cvfolds, cfg.data.cvfold_index, cfg.data.split_seed)
    log.info(f"skempi: {len(splits['train'])} train / {len(splits['valid'])} val mutations")

    cache_dir = Path(cfg.data.data_dir) / cfg.data.cache_dir
    cache_dir.mkdir(parents=True, exist_ok=True)

    if cfg.model.mode == "esm":
        return _train_affinity_esm(cfg, splits, cache_dir, out, metrics_log)

    class SkempiDataset:
        def __init__(self, entries):
            self.entries = entries

        def __len__(self):
            return len(self.entries)

        def __getitem__(self, i):
            e = self.entries[i]
            cache = cache_dir / f"{e['pdb_id']}_{e['id']}.npz"
            if cache.exists():
                with np.load(cache) as z:
                    return dict(z)
            feats = skempi_features(from_pdb_file(e["pdb_path"], mse_to_met=True),
                                    e["mutations"], ddg=e["ddG"])
            np.savez_compressed(cache, **feats)
            return feats

    n_devices = cfg.trainer.n_devices or jax.device_count()
    mp = int(cfg.trainer.get("model_parallel", 1) or 1)
    global_batch = cfg.data.batch_size * max(1, n_devices // mp)
    loaders = {
        "train": BucketedLoader(SkempiDataset(splits["train"]), global_batch,
                                shuffle=True, seed=cfg.seed, drop_last=True,
                                stack_fn=stack_affinity_batch),
        "val": BucketedLoader(SkempiDataset(splits["valid"]), global_batch,
                              shuffle=False, drop_last=(n_devices > 1), prefetch=0,
                              stack_fn=stack_affinity_batch),
    }

    net_cfg = NetworkConfig(**{k: cfg.model[k] for k in NetworkConfig.__dataclass_fields__
                               if k in cfg.model})
    model = AffinityModel.create(net_cfg, mode=cfg.model.mode,
                                 strict_parity=cfg.model.get("strict_parity", True))

    key = jax.random.key(cfg.seed)
    key, kb, kn = jax.random.split(key, 3)
    if len(loaders["train"]) == 0:
        raise SystemExit(
            f"train split ({len(splits['train'])} mutations) yields no full "
            f"batches at global batch {global_batch} "
            f"(data.batch_size x {max(1, n_devices)} devices) — lower "
            "data.batch_size or trainer.n_devices")
    init_batch = loaders["train"].first_batch()
    if cfg.get("pre_checkpoint_path"):
        template = jax.eval_shape(lambda: model.backbone.init(jax.random.key(0), init_batch.wild()))
        backbone_params = load_model_params(cfg.pre_checkpoint_path, template)
    else:
        log.warning("no pre_checkpoint_path: affinity training on a random backbone")
        backbone_params = model.backbone.init(kb, init_batch.wild())
    # the frozen backbone is part of the model: persist it so the run's
    # affinity checkpoints are self-contained (packppi-ddg --pre_ckpt
    # <out>/backbone reproduces inference regardless of where the backbone
    # came from)
    save_params(out / "backbone", backbone_params)

    params = model.init(kn, init_batch, backbone_params)
    resume = cfg.get("ckpt_path")
    if resume:
        # params-level resume (reference: ckpt_path in src/train_affinity.py)
        log.info(f"resuming params from {resume}")
        params = load_params(resume, jax.eval_shape(lambda: params))
    optimizer = optax.adamw(make_lr(cfg.trainer, len(loaders["train"])),
                            weight_decay=cfg.trainer.weight_decay)
    opt_state = optimizer.init(params)
    step = 0
    ema_decay, ema, ema_step = init_ema(cfg, params, resume)

    def _train_step(params, opt_state, key, batch):
        loss, grads = jax.value_and_grad(
            lambda p: model.loss(p, backbone_params, key, batch))(params)
        ok = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    if n_devices > 1:
        # data-parallel: mutation batches shard over 'data'; with
        # trainer.model_parallel > 1 the larger kernels (mutation
        # encoder/MPNN and the frozen backbone) additionally FSDP-shard over
        # 'model', as in the diffusion loop — small tensors replicate
        from packppi_tpu.parallel import (batch_sharding, make_mesh,
                                          param_shardings, replicated)

        mesh = make_mesh(n_devices, model_parallel=mp)
        log.info(f"mesh: {dict(mesh.shape)}")
        rep = replicated(mesh)
        p_shard = param_shardings(mesh, params)
        o_shard = jax.tree.map(
            lambda x: param_shardings(mesh, x) if isinstance(x, dict) else rep,
            opt_state, is_leaf=lambda x: isinstance(x, dict))
        b_shard = jax.tree.map(lambda _: batch_sharding(mesh), init_batch)
        params = jax.device_put(params, p_shard)
        opt_state = jax.device_put(opt_state, o_shard)
        # the frozen backbone is a trace-time closure constant; committing it
        # sharded here makes the jitted steps consume it in that layout
        backbone_params = jax.device_put(
            backbone_params, param_shardings(mesh, backbone_params))
        if ema is not None:
            ema = jax.device_put(ema, p_shard)
        put_batch = lambda b: jax.device_put(b, b_shard)
        train_step = jax.jit(_train_step,
                             in_shardings=(p_shard, o_shard, rep, b_shard),
                             out_shardings=(p_shard, o_shard, rep))
        eval_step = jax.jit(
            lambda p, k, b: model.loss(p, backbone_params, k, b,
                                       deterministic=True),
            in_shardings=(p_shard, rep, b_shard), out_shardings=rep)
        predict = jax.jit(lambda p, b: model.predict(p, backbone_params, b)[0],
                          in_shardings=(p_shard, b_shard), out_shardings=batch_sharding(mesh))
    else:
        put_batch = lambda b: b
        train_step = jax.jit(_train_step)
        eval_step = jax.jit(lambda p, k, b: model.loss(
            p, backbone_params, k, b, deterministic=True))
        predict = jax.jit(lambda p, b: model.predict(p, backbone_params, b)[0])

    ckpt_mgr = CheckpointManager(out / "checkpoints", top_k=cfg.trainer.checkpoint_top_k)
    best_val = float("inf")
    stopper = EarlyStopper(cfg.trainer)
    for epoch in range(cfg.trainer.max_epochs):
        losses = []
        for batch in loaders["train"]:
            key, k = jax.random.split(key)
            params, opt_state, loss = train_step(params, opt_state, k, put_batch(batch))
            if ema is not None:
                ema = ema_step(ema, params)
            losses.append(loss)
            step += 1
        train_loss = float(jnp.stack(losses).mean()) if losses else float("nan")

        # with EMA active, validation/metrics/checkpoint selection evaluate
        # the EMA weights (what inference will use)
        eval_params = ema if ema is not None else params
        vlosses, preds, labels = [], [], []
        for batch in loaders["val"]:
            key, k = jax.random.split(key)
            sb = put_batch(batch)
            vlosses.append(eval_step(eval_params, k, sb))
            preds.append(np.asarray(predict(eval_params, sb)))
            labels.append(np.asarray(batch.ddg))
        val_loss = float(jnp.stack(vlosses).mean()) if vlosses else float("nan")
        best_val = min(best_val, val_loss)

        extras = {}
        if preds:
            p, y = np.concatenate(preds), np.concatenate(labels)
            if len(p) > 2 and p.std() > 0 and y.std() > 0:
                from packppi_tpu.utils.metrics import spearman

                extras["val/pearson"] = float(np.corrcoef(p, y)[0, 1])
                extras["val/spearman"] = spearman(p, y)
            extras["val/rmse"] = float(np.sqrt(np.mean((p - y) ** 2)))
        metrics_log.log(step, {"train/loss": train_loss, "val/loss": val_loss, **extras})
        log.info(f"epoch {epoch}: train {train_loss:.4f} val {val_loss:.4f} {extras}")
        ckpt_mgr.save(step, params, metric=val_loss if np.isfinite(val_loss) else None,
                      ema=ema)
        if stopper.should_stop(epoch, val_loss):
            log.info(f"early stopping at epoch {epoch}")
            break

    metrics_log.close()
    return {"best_val_loss": best_val, "best_ckpt": ckpt_mgr.best()}
