"""Unified experiment runner for the whole train_diffusion_* family.

One trainer + evaluation suite parameterized by :class:`ModeSpec` replaces
the reference's nine copy-per-experiment scripts (SURVEY §0) while preserving
their observable contracts: output directory naming, artifact files, log-line
formats, and CLI (SURVEY §2.7).  Mapping of the major phases to the reference:

* data prep               -> train_diffusion_paper.py:221-288
* eval-image selection    -> :293-316
* training loop           -> :339-383 (jitted step, on-device RNG)
* periodic eval           -> :386-474 (val MSE, ELBO/BPD, NLL subsets)
* checkpoints             -> :476-478 (+ full resumable state, new)
* training metrics plot   -> :495-546
* reconstruction          -> :772-858
* parameter grid          -> :913-1006
* CFG guidance sweep      -> :1008-1105
* parameter sensitivity   -> :1107-1215 (batched into ONE sampler call here)
* uncond mean correction  -> train_diffusion.py:238-295
* recon power spectra     -> train_diffusion_spectrum_indiv.py:745-769

TPU-native changes called out inline: device-resident lax.scan sampling, fused
CFG, batched sensitivity/NLL evaluation (the reference runs thousands of tiny
forward passes), data-parallel sharding when a mesh is provided.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..data import batch_iterator, load_camels_dataset, synthetic_camels
from ..data.pipeline import num_batches
from ..data.prefetch import device_prefetch
from ..diffusion import (
    calculate_elbo_and_bpd,
    calculate_likelihood,
    make_schedule,
    q_sample,
    sample_ddpm,
    sample_ddpm_from_noise,
)
from ..diffusion.likelihood import (
    elbo_bpd_batch,
    elbo_per_batch,
    elbo_timesteps,
    nll_batch,
)
from ..models import ContextUnet
from ..models.fold_bn import fold_inference
from ..ops.spectrum import compare_power_spectra_stats
from ..ops.stats import compare_pdf_stats
from ..training import (
    create_train_state,
    load_train_checkpoint,
    make_eval_step,
    make_train_step,
    parse_remat_env,
    save_model_weights,
    save_train_checkpoint,
)
from ..training.checkpoints import weights_checkpoint_plan
from ..utils import RunLogger, viz


def _load_raw_data(cfg: ExperimentConfig):
    """Load the real .npy inputs, or fall back to synthetic stand-ins."""
    if os.path.exists(cfg.maps_path) and os.path.exists(cfg.params_path):
        maps = np.load(cfg.maps_path)
        params = np.load(cfg.params_path)
        source = "real"
    elif cfg.synthetic_fallback:
        maps, params = synthetic_camels(
            n_param_sets=cfg.synthetic_param_sets,
            maps_per_set=15,
            size=cfg.data_size,
            seed=cfg.seed,
        )
        source = "synthetic"
    else:
        raise FileNotFoundError(
            f"data files not found: {cfg.maps_path} / {cfg.params_path}"
        )
    if cfg.max_maps is not None and maps.shape[0] > cfg.max_maps:
        n_sets = max(1, cfg.max_maps // 15)
        maps = maps[: n_sets * 15]
        params = params[:n_sets]
    return maps, params, source


def _subset_batches(x, c, n, batch_size, rng):
    """Random-subset loader like the reference's Subset+DataLoader
    (train_diffusion_paper.py:413-415, shuffle=False after selection)."""
    idx = rng.choice(x.shape[0], size=min(n, x.shape[0]), replace=False)
    xs, cs = x[idx], c[idx]
    return list(batch_iterator(xs, cs, batch_size, shuffle=False))


def _sample_metrics(model, variables, schedule, x, c, key, batch_size, dims):
    """ELBO/BPD/NLL of a generated sample set, batched on device
    (replaces the reference's per-batch temp-dataloader dance,
    train_diffusion_paper.py:808-858)."""
    batches = list(batch_iterator(np.asarray(x), np.asarray(c), batch_size, shuffle=False))
    k1, k2 = jax.random.split(key)
    elbo, bpd = calculate_elbo_and_bpd(
        model, variables, schedule, batches, k1, dims=dims, batch_size=batch_size
    )
    nll = calculate_likelihood(
        model, variables, schedule, batches, k2, batch_size=batch_size
    )
    return elbo, bpd, nll


import functools


@functools.partial(jax.jit, static_argnames=("compute_elbo",))
def _accumulate_metrics(
    beta, alpha_bar, loss_acc, elbo_acc, loss, per_sample_mse, t, mask=None, *,
    compute_elbo: bool
):
    """Single jitted per-step metric accumulation (device-resident).

    ``mask`` marks real rows of a padded partial batch (ELBO averages over
    real rows only; ``loss`` arrives already masked from the step)."""
    loss_acc = loss_acc + loss
    if compute_elbo:
        elbo_acc = elbo_acc + elbo_per_batch(
            beta, alpha_bar, per_sample_mse, t, mask
        )
    return loss_acc, elbo_acc


def run_experiment(cfg: ExperimentConfig) -> Dict[str, object]:
    spec = cfg.spec
    output_dir = cfg.output_dir()
    save_dir = os.path.join(output_dir, "weights")
    os.makedirs(save_dir, exist_ok=True)
    os.makedirs(output_dir, exist_ok=True)

    logger = RunLogger(output_dir)
    if spec.timing_log:
        logger.write_header(
            cfg.lrate,
            cfg.n_epoch,
            cfg.timesteps,
            None if not spec.conditional else (
                cfg.param_index if spec.param_index_mode else cfg.num_params
            ),
        )

    schedule = make_schedule(cfg.timesteps, cfg.beta1, cfg.beta2)
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    # ---- data -------------------------------------------------------------
    raw_maps, raw_params, data_source = _load_raw_data(cfg)
    test_size = min(cfg.test_size, max(raw_maps.shape[0] // 10, 1))
    ds = load_camels_dataset(
        raw_maps,
        raw_params,
        num_params=cfg.num_params,
        height=cfg.height,
        test_size=test_size,
        seed=cfg.seed,
        style=spec.data_style,
        param_index=cfg.param_index if spec.param_index_mode else None,
    )
    del raw_maps

    # Unconditional modes train with a zero context vector of the model's
    # n_cfeat width (reference: model called with c=None -> zeros,
    # train_diffusion.py:147 + :54-55); the dataset's parameter columns are
    # ignored there.
    if spec.conditional:
        train_c, test_c = ds.train_c, ds.test_c
    else:
        train_c = np.zeros((ds.n_train, cfg.n_cfeat), np.float32)
        test_c = np.zeros((ds.n_test, cfg.n_cfeat), np.float32)

    if spec.conditional:
        np.save(os.path.join(output_dir, "param_min.npy"), ds.param_min)
        np.save(os.path.join(output_dir, "param_max.npy"), ds.param_max)
        if spec.param_index_mode:
            np.save(os.path.join(output_dir, "param_index.npy"), cfg.param_index)
        logger.dataset_info(ds.info)

    # ---- model + optimizer ------------------------------------------------
    factory = {
        "canonical": ContextUnet.canonical,
        "deep": ContextUnet.deep,
        "big": ContextUnet.big,
    }[spec.model_variant]
    model = factory(
        n_cfeat=cfg.n_cfeat, n_feat=cfg.n_feat, height=cfg.height, dtype=dtype,
        shortcut=cfg.shortcut,
    )
    root_key = jax.random.PRNGKey(cfg.seed)
    init_key, train_key, eval_key, sample_key = jax.random.split(root_key, 4)
    init_rngs = {"params": init_key}
    if cfg.shortcut == "stochastic":
        init_rngs["shortcut"] = jax.random.fold_in(init_key, 1)
    variables = model.init(
        init_rngs,
        np.zeros((1, cfg.height, cfg.height, 1), np.float32),
        np.array([0.5], np.float32),
    )
    steps_per_epoch = num_batches(ds.n_train, cfg.batch_size)
    state = create_train_state(
        model, variables, cfg.lrate, cfg.n_epoch, steps_per_epoch
    )
    # Every phase (training, eval, sampling, likelihood) shares ONE diffusion
    # process: the configured schedule endpoints go to the train/eval steps
    # too, not just the runner's schedule object.
    # CAMELS_TRAIN_REMAT=convs|full: rematerialization mode for the train
    # step (trainer.py docstring; identical math, different memory/recompute
    # schedule — A/B'd in ARCHITECTURE.md).  Default: XLA's residual saving.
    try:
        remat = parse_remat_env(os.environ.get("CAMELS_TRAIN_REMAT", ""))
    except ValueError as e:
        raise SystemExit(f"CAMELS_TRAIN_REMAT: {e}")
    train_step = make_train_step(
        model, cfg.timesteps, scaling=spec.q_scaling,
        beta1=cfg.beta1, beta2=cfg.beta2,
        # In-place state update on device (params + Adam moments + BN stats);
        # the init-time `variables` alias is never used after state creation.
        donate=True,
        remat=remat,
    )
    eval_step = make_eval_step(
        model, cfg.timesteps, scaling=spec.q_scaling,
        beta1=cfg.beta1, beta2=cfg.beta2,
    )

    # ---- data-parallel mesh (multi-chip) -----------------------------------
    # Params/opt state replicated; batches sharded over the "data" axis; XLA
    # inserts psum grad reductions + global BatchNorm stats over ICI.
    mesh = None
    n_dev = len(jax.devices())
    if cfg.mesh_devices or n_dev > 1:
        from ..parallel import make_mesh, replicate, shard_batch

        mesh = make_mesh(cfg.mesh_devices)
        state = replicate(mesh, state)
        n_dev = mesh.devices.size
        print(f"Data-parallel over {n_dev} devices")

    # Every train/eval batch is padded to ONE static shape (batch_size,
    # rounded up to an even per-chip shard) so a single compiled program —
    # with the same sharded layout and BatchNorm semantics — runs every step
    # of every epoch; the non-divisible FINAL batch used to compile a second
    # shape and, under a mesh, run replicated.  Pad rows wrap around real
    # rows (sane BN batch statistics) and are masked out of loss/metrics by
    # the train/eval steps.
    pad_to = cfg.batch_size
    if mesh is not None and pad_to % n_dev:
        pad_to += (-pad_to) % n_dev

    def pad_and_shard(bx, bc):
        n = bx.shape[0]
        if n < pad_to:
            idx = np.arange(pad_to) % n
            bx, bc = bx[idx], bc[idx]
        # Full batches get an all-ones mask rather than None: mask=None and
        # mask=array are different pytree structures, so alternating them
        # would retrace the step and compile a SECOND program for the final
        # partial batch — exactly what this padding exists to avoid.
        mask = (np.arange(pad_to) < n).astype(np.float32)
        if mesh is not None:
            from ..parallel import shard_batch

            bx, bc, mask = shard_batch(mesh, bx, bc, mask)
        else:
            # Commit host arrays here so the prefetch worker thread overlaps
            # the host->device copy with the previous step's compute (the
            # copy is 24% of the batch-32 step over a tunneled runtime,
            # ARCHITECTURE.md "Training-step speed-of-light audit").
            bx, bc, mask = (
                jax.device_put(bx), jax.device_put(bc), jax.device_put(mask)
            )
        return bx, bc, mask

    start_epoch = 0
    ckpt_path = os.path.join(save_dir, "train_state.msgpack")
    if cfg.resume and os.path.exists(ckpt_path):
        state, start_epoch, train_key = load_train_checkpoint(state, ckpt_path)
        print(f"Resumed from epoch {start_epoch}")

    # ---- eval image selection (train_diffusion_paper.py:293-316) ----------
    sel_rng = np.random.default_rng(cfg.seed + 1)
    if spec.conditional:
        sel_idx = sel_rng.choice(ds.n_test, size=min(cfg.n_eval_images, ds.n_test), replace=False)
        selected_images = ds.test_x[sel_idx]
        selected_params = ds.test_c[sel_idx]
        viz.save_image_grid(selected_images, os.path.join(output_dir, "test_images.png"))
        logger.selected_params(selected_params)
    else:
        all_x = np.concatenate([ds.train_x, ds.test_x])
        sel_idx = sel_rng.choice(all_x.shape[0], size=cfg.n_eval_images, replace=False)
        selected_images = all_x[sel_idx]
        selected_params = np.zeros((cfg.n_eval_images, cfg.n_cfeat), np.float32)
        viz.save_image_grid(
            selected_images, os.path.join(output_dir, "processed_images.png")
        )
    processed_images_mean = float(selected_images.mean())

    # ---- training loop ----------------------------------------------------
    loss_log: List[float] = []
    val_loss_log: List[float] = []
    likelihood_log: List[float] = []
    val_likelihood_log: List[float] = []
    elbo_log: List[float] = []
    bpd_log: List[float] = []
    val_elbo_log: List[float] = []
    val_bpd_log: List[float] = []
    epoch_times: List[float] = []
    epoch_rng = np.random.default_rng(cfg.seed + 2)
    eval_np_rng = np.random.default_rng(cfg.seed + 3)
    dims = cfg.height * cfg.height

    from ..utils.profiling import maybe_trace

    training_start = time.time()
    for ep in range(start_epoch, cfg.n_epoch):
        # CAMELS_PROFILE=<dir> captures a device trace of the second epoch
        # (first is compile-dominated).
        profile_cm = maybe_trace() if ep == start_epoch + 1 else None
        if profile_cm is not None:
            profile_cm.__enter__()
        ep_start = time.time()
        logger.device_line()  # per-epoch device log (paper.py:341 / :72-75)
        epoch_loss = 0.0
        epoch_elbo = 0.0
        epoch_bpd = 0.0
        n_b = 0
        # Batches are padded/sharded/device-committed on a background thread,
        # two ahead of the consuming step (data/prefetch.py).
        staged = device_prefetch(
            batch_iterator(ds.train_x, train_c, cfg.batch_size, rng=epoch_rng),
            transform=lambda item: pad_and_shard(*item),
        )
        try:
            from tqdm import tqdm

            pbar = tqdm(staged, total=steps_per_epoch, mininterval=2)
        except ImportError:
            pbar = staged
        # Loss (and per-batch ELBO) accumulate ON DEVICE via one jitted call
        # per step; one host sync per epoch.  The reference syncs every step
        # (`loss.item()`, paper.py:366) which serializes host and device, and
        # per-step EAGER ops are similarly expensive over remote TPU runtimes.
        loss_acc = jnp.zeros((), jnp.float32)
        elbo_acc = jnp.zeros((), jnp.float32)
        last_desc = 0.0
        for bx, bc, bmask in pbar:
            train_key, step_key = jax.random.split(train_key)
            state, metrics = train_step(state, bx, bc, step_key, bmask)
            loss_acc, elbo_acc = _accumulate_metrics(
                schedule.beta, schedule.alpha_bar, loss_acc, elbo_acc,
                metrics["loss"], metrics["per_sample_mse"], metrics["t"],
                bmask, compute_elbo=spec.per_batch_elbo,
            )
            n_b += 1
            now = time.time()
            if hasattr(pbar, "set_description") and now - last_desc > 2.0:
                pbar.set_description(
                    f"Epoch {ep + 1}, Loss: {float(metrics['loss']):.4f}"
                )
                last_desc = now
        epoch_loss = float(loss_acc) / n_b
        if spec.per_batch_elbo:
            epoch_elbo = float(elbo_acc)
            epoch_bpd = epoch_elbo / (dims * np.log(2.0))
        loss_log.append(epoch_loss)
        epoch_times.append(time.time() - ep_start)
        if profile_cm is not None:
            profile_cm.__exit__(None, None, None)

        if spec.timing_log:
            if spec.per_batch_elbo:
                logger.append(
                    f"Epoch {ep + 1}/{cfg.n_epoch} completed in "
                    f"{epoch_times[-1]:.2f} seconds\n"
                    f"  Training Loss: {epoch_loss:.6f}, "
                    f"ELBO: {epoch_elbo / n_b:.6f}, "
                    f"BPD: {epoch_bpd / n_b:.6f}\n"
                )
            else:
                logger.epoch(ep, cfg.n_epoch, epoch_times[-1], epoch_loss)
        if spec.per_batch_elbo:
            elbo_log.append(epoch_elbo / n_b)
            bpd_log.append(epoch_bpd / n_b)

        # ---- periodic eval (train_diffusion_paper.py:386-474) ------------
        is_eval = (ep % cfg.eval_every == 0) or (ep == cfg.n_epoch - 1)
        if is_eval and spec.track_val_mse:
            inference_vars = {
                "params": state.params,
                "batch_stats": state.batch_stats,
            }
            # Likelihood-style eval passes (T-step sweeps) run on the
            # BN-folded inference model — identical math, no BatchNorm work.
            inf_model, inf_vars = fold_inference(model, inference_vars)
            # Val MSE (and per-batch val ELBO for the elbo/spectrum_indiv
            # modes, train_diffusion_elbo.py:374-383) accumulate ON DEVICE;
            # one host sync per eval pass (the per-batch float() the reference
            # does would serialize host and device over the TPU tunnel).
            vloss_acc = jnp.zeros((), jnp.float32)
            velbo_acc = jnp.zeros((), jnp.float32)
            v_b = 0
            for bx, bc in batch_iterator(
                ds.test_x, test_c, cfg.batch_size, shuffle=False
            ):
                eval_key, k = jax.random.split(eval_key)
                bx, bc, bmask = pad_and_shard(bx, bc)
                em = eval_step(state.params, state.batch_stats, bx, bc, k, bmask)
                vloss_acc, velbo_acc = _accumulate_metrics(
                    schedule.beta, schedule.alpha_bar, vloss_acc, velbo_acc,
                    em["loss"], em["per_sample_mse"], em["t"], bmask,
                    compute_elbo=spec.per_batch_elbo,
                )
                v_b += 1
            val_loss = float(vloss_acc) / max(v_b, 1)
            val_loss_log.append(val_loss)

            train_elbo = train_bpd = val_elbo = val_bpd = None
            train_nll = val_nll = None
            nll_seconds = 0.0
            if spec.per_batch_elbo:
                # Reference elbo/spectrum_indiv eval: val ELBO/BPD via the
                # per-batch form + NLL on a test subset with timing
                # (train_diffusion_elbo.py:358-415).
                val_elbo = float(velbo_acc) / max(v_b, 1)
                val_bpd = val_elbo / (dims * np.log(2.0))
                val_elbo_log.append(val_elbo)
                val_bpd_log.append(val_bpd)
                nll_start = time.time()
                eval_key, k = jax.random.split(eval_key)
                val_nll = calculate_likelihood(
                    inf_model, inf_vars, schedule,
                    _subset_batches(
                        ds.test_x, test_c, cfg.nll_subset,
                        cfg.eval_batch_size, eval_np_rng,
                    ),
                    k, batch_size=cfg.eval_batch_size,
                )
                val_likelihood_log.append(val_nll)
                nll_seconds = time.time() - nll_start
            if spec.eval_elbo and not spec.per_batch_elbo:
                eval_key, k1, k2 = jax.random.split(eval_key, 3)
                eb = cfg.eval_batch_size
                train_batches = _subset_batches(
                    ds.train_x, train_c, cfg.elbo_subset, eb, eval_np_rng
                )
                train_elbo, train_bpd = calculate_elbo_and_bpd(
                    inf_model, inf_vars, schedule, train_batches, k1,
                    dims=dims, batch_size=eb,
                )
                val_batches = list(
                    batch_iterator(ds.test_x, test_c, eb, shuffle=False)
                )
                val_elbo, val_bpd = calculate_elbo_and_bpd(
                    inf_model, inf_vars, schedule, val_batches, k2,
                    dims=dims, batch_size=eb,
                )
                elbo_log.append(train_elbo)
                bpd_log.append(train_bpd)
                val_elbo_log.append(val_elbo)
                val_bpd_log.append(val_bpd)
            if spec.eval_nll:
                nll_start = time.time()
                eval_key, k1, k2 = jax.random.split(eval_key, 3)
                if not spec.val_nll_only:
                    train_nll = calculate_likelihood(
                        inf_model, inf_vars, schedule,
                        _subset_batches(
                            ds.train_x, train_c, cfg.nll_subset,
                            cfg.eval_batch_size, eval_np_rng,
                        ),
                        k1, batch_size=cfg.eval_batch_size,
                    )
                    likelihood_log.append(train_nll)
                val_nll = calculate_likelihood(
                    inf_model, inf_vars, schedule,
                    _subset_batches(
                        ds.test_x, test_c, cfg.nll_subset,
                        cfg.eval_batch_size, eval_np_rng,
                    ),
                    k2, batch_size=cfg.eval_batch_size,
                )
                val_likelihood_log.append(val_nll)
                nll_seconds = time.time() - nll_start

            if spec.timing_log:
                if spec.per_batch_elbo:
                    # Exact reference line formats (train_diffusion_elbo.py:407-410)
                    logger.append(
                        f"  Validation Loss: {val_loss:.6f}, "
                        f"Val ELBO: {val_elbo:.6f}, Val BPD: {val_bpd:.6f}\n"
                        f"  Negative Log Likelihood: {val_nll:.6f}\n"
                        f"  Likelihood calculation took {nll_seconds:.2f} seconds\n"
                    )
                elif spec.eval_elbo and spec.eval_nll:
                    logger.eval_metrics(
                        val_loss,
                        train_elbo or 0.0, train_bpd or 0.0,
                        val_elbo or 0.0, val_bpd or 0.0,
                        train_nll if train_nll is not None else 0.0,
                        val_nll if val_nll is not None else 0.0,
                        nll_seconds,
                    )
                elif spec.eval_nll:
                    logger.append(
                        f"  Validation Loss: {val_loss:.6f}\n"
                        + (
                            f"  Train Negative Log Likelihood: {train_nll:.6f}\n"
                            if train_nll is not None else ""
                        )
                        + f"  Val Negative Log Likelihood: {val_nll:.6f}\n"
                        f"  Likelihood calculation took {nll_seconds:.2f} seconds\n"
                    )
                else:
                    logger.append(f"  Validation Loss: {val_loss:.6f}\n")
            print(
                f"Epoch {ep + 1}/{cfg.n_epoch}, Train Loss: {epoch_loss:.6f}, "
                f"Val Loss: {val_loss:.6f}"
            )

        # ---- checkpoints: mode-specific cadence/naming (paper.py:476-478,
        # train_diffusion.py:154-155, initial.py:175-176) + resumable state --
        save_weights, ckpt_name = weights_checkpoint_plan(
            spec.ckpt_style, ep, cfg.n_epoch, cfg.ckpt_every
        )
        if save_weights:
            save_model_weights(
                {"params": state.params, "batch_stats": state.batch_stats},
                os.path.join(save_dir, ckpt_name),
            )
        # The resumable train state (a capability beyond the reference) saves
        # on its own cadence regardless of the weights-file contract.
        if (ep + 1) % cfg.ckpt_every == 0 or ep == cfg.n_epoch - 1:
            save_train_checkpoint(state, ep + 1, train_key, ckpt_path)

    total_training_time = time.time() - training_start
    inference_vars = {"params": state.params, "batch_stats": state.batch_stats}
    # All post-training sampling/metrics run on the BN-folded inference model
    # (models/fold_bn.py): bit-identical fp32 math, no BatchNorm work in the
    # ~1500-step reverse scans.
    model, inference_vars = fold_inference(model, inference_vars)

    if spec.timing_log:
        logger.training_complete(
            total_training_time,
            epoch_times or [0.0],
            loss_log[-1] if loss_log else 0.0,
            val_loss_log[-1] if val_loss_log else None,
            bpd_log[-1] if bpd_log else None,
            val_bpd_log[-1] if val_bpd_log else None,
            likelihood_log[-1] if likelihood_log else None,
            val_likelihood_log[-1] if val_likelihood_log else None,
        )

    # ---- loss figures ------------------------------------------------------
    if spec.training_metrics_figure:
        viz.plot_training_metrics(
            output_dir, cfg.n_epoch, loss_log, val_loss_log,
            likelihood_log, val_likelihood_log,
            elbo_log, val_elbo_log, bpd_log, val_bpd_log,
            eval_every=cfg.eval_every,
            # per-batch modes log ELBO/BPD every epoch (continuous curves,
            # train_diffusion_elbo.py:466-483), paper modes at eval points
            elbo_per_epoch=spec.per_batch_elbo,
            style=spec.plot_style,
        )
    elif loss_log:
        title = (
            f"Loss Evolution with {cfg.num_params} conditioning parameters"
            if spec.conditional and spec.track_val_mse
            else ""
        )
        viz.plot_loss_curve(
            output_dir, loss_log, val_loss_log,
            eval_every=cfg.eval_every, title=title,
        )

    results: Dict[str, object] = {
        "output_dir": output_dir,
        "data_source": data_source,
        "loss_log": loss_log,
        "val_loss_log": val_loss_log,
        "total_training_time": total_training_time,
        "epoch_times": epoch_times,
        "n_train": ds.n_train,
    }

    # ---- reconstruction (train_diffusion_paper.py:772-806) ----------------
    # (main.py instead samples fresh maps from pure noise, :197-205)
    if spec.timing_log:
        logger.sampling_header()
    sample_key, nkey, rkey = jax.random.split(sample_key, 3)
    if spec.pure_noise_sampling:
        recon = sample_ddpm(
            model, inference_vars, schedule, rkey,
            n_sample=cfg.n_eval_images, size=cfg.height,
            params=jnp.zeros((cfg.n_eval_images, cfg.n_cfeat), jnp.float32),
            mesh=mesh,
        )
    else:
        from ..diffusion.schedule import NoiseScaling

        scaling = (
            NoiseScaling.REFERENCE
            if spec.q_scaling == "reference"
            else NoiseScaling.STANDARD
        )
        noise = jax.random.normal(nkey, selected_images.shape, jnp.float32)
        x_fwd = q_sample(
            schedule, jnp.asarray(selected_images), cfg.timesteps, noise,
            scaling=scaling,
        )
        recon = sample_ddpm_from_noise(
            model, inference_vars, schedule, rkey, x_fwd,
            params=jnp.asarray(selected_params) if spec.conditional else None,
            mesh=mesh,
        )
    recon_x = np.asarray(recon.x)
    if spec.model_variant in ("deep", "big"):
        # tanh-output variants display in [0,1] via (x+1)/2 (main.py:254)
        recon_x_display = (recon_x + 1.0) / 2.0
    else:
        recon_x_display = recon_x
    if spec.timing_log:
        logger.reconstruction_perf(
            len(selected_images), recon.sampling_time,
            float(np.mean(recon.timestep_times)), cfg.timesteps,
        )
    for idx in range(0, recon.intermediate.shape[0], 5 if spec.conditional else 1):
        viz.save_image_grid(
            np.asarray(recon.intermediate[idx]),
            os.path.join(output_dir, f"intermediate_step_{idx}.png"),
        )
    viz.save_image_grid(
        recon_x_display, os.path.join(output_dir, "reconstructed_images.png")
    )
    if spec.viridis:
        viz.visualize_viridis_style(
            recon_x, os.path.join(output_dir, "reconstructed_images_viridis.png")
        )
        viz.visualize_reconstruction_comparison(
            selected_images, recon_x,
            os.path.join(output_dir, "reconstruction_comparison_viridis.png"),
        )

    if spec.post_metrics:
        sample_key, mkey = jax.random.split(sample_key)
        r_elbo, r_bpd, r_nll = _sample_metrics(
            model, inference_vars, schedule, recon_x, selected_params,
            mkey, cfg.batch_size, dims,
        )
        logger.sample_metrics("reconstructed images", r_elbo, r_bpd, r_nll)
        results["recon_metrics"] = {"elbo": r_elbo, "bpd": r_bpd, "nll": r_nll}

    # ---- pixel-PDF comparison (:861-908) ----------------------------------
    pdf_stats = compare_pdf_stats(selected_images[..., 0], recon_x[..., 0])
    viz.plot_distribution_comparison(
        *pdf_stats, output_dir=output_dir, styled=spec.styled_plots,
        style=spec.plot_style,
    )
    reconstructed_mean = float(recon_x.mean())
    results["means"] = {
        "processed": processed_images_mean,
        "reconstructed": reconstructed_mean,
    }

    # ---- recon power spectra (spectrum_indiv:745-769) ----------------------
    if spec.recon_power_spectra:
        k, om, os_, gm, gs = compare_power_spectra_stats(
            selected_images[..., 0], recon_x[..., 0]
        )
        viz.plot_power_spectrum_comparison(
            k, om, os_, gm, gs, output_dir,
            title=f"Power Spectrum conditioning on Parameter {cfg.param_index}",
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            pk_ratio = gm / om
        # The reference's mean includes 0/0 bins and logs nan (SURVEY §6
        # quirk) — keep that line for contract parity and add a nan-safe one.
        ratio_mean = float(np.mean(pk_ratio[1:]))
        ratio_std = float(np.std(pk_ratio[1:]))
        finite = np.isfinite(pk_ratio[1:])
        safe_mean = float(np.mean(pk_ratio[1:][finite])) if finite.any() else float("nan")
        safe_std = float(np.std(pk_ratio[1:][finite])) if finite.any() else float("nan")
        logger.append(
            "\nPower Spectrum Analysis:\n"
            f"  Mean P(k) ratio (generated/original): "
            f"{ratio_mean:.4f} ± {ratio_std:.4f}\n"
            f"  Mean P(k) ratio over populated bins: "
            f"{safe_mean:.4f} ± {safe_std:.4f}\n"
        )
        good = np.where((pk_ratio > 0.8) & (pk_ratio < 1.2) & (k > 0))[0]
        if len(good) > 0:
            logger.append(
                f"  Good P(k) match (within 20%) for k range: "
                f"[{k[good[0]]:.4f}, {k[good[-1]]:.4f}]\n"
            )
        results["pk_ratio"] = {
            "mean": ratio_mean,
            "std": ratio_std,
            "safe_mean": safe_mean,
            "safe_std": safe_std,
        }

    # ---- uncond mean-ratio correction (train_diffusion.py:254-295) ---------
    if spec.mean_correction:
        with open(os.path.join(output_dir, "means.txt"), "w") as f:
            f.write(f"Processed Images Mean: {processed_images_mean}\n")
            f.write(f"Reconstructed Images Mean: {reconstructed_mean}\n")
        mean_ratio = processed_images_mean / reconstructed_mean
        corrected = recon_x * mean_ratio
        viz.save_image_grid(
            corrected, os.path.join(output_dir, "corrected_reconstructed_images.png")
        )
        pdf_stats_c = compare_pdf_stats(selected_images[..., 0], corrected[..., 0])
        viz.plot_distribution_comparison(
            *pdf_stats_c, output_dir=output_dir, styled=False
        )
        with open(os.path.join(output_dir, "corrected_means.txt"), "w") as f:
            f.write(f"Processed Images Mean: {processed_images_mean}\n")
            f.write(
                f"Corrected Reconstructed Images Mean: {float(corrected.mean())}\n"
            )
        results["mean_ratio"] = mean_ratio

    # ---- parameter grid sweep (:913-1006) ----------------------------------
    if spec.param_grid and spec.conditional:
        grid_params = _build_grid_params(cfg, selected_params)
        sample_key, gkey, mkey = jax.random.split(sample_key, 3)
        t0 = time.time()
        grid_out = sample_ddpm(
            model, inference_vars, schedule, gkey,
            n_sample=len(grid_params), size=cfg.height,
            params=jnp.asarray(grid_params), mesh=mesh,
        )
        if spec.timing_log:
            logger.grid_perf(len(grid_params), grid_out.sampling_time)
        grid_x = np.asarray(grid_out.x)
        grid_size = int(np.sqrt(len(grid_x)))
        viz.save_image_grid(
            grid_x,
            os.path.join(
                output_dir, f"parameter_grid_samples_{cfg.num_params}params.png"
            ),
            nrow=grid_size,
        )
        if spec.post_metrics:
            g_elbo, g_bpd, g_nll = _sample_metrics(
                model, inference_vars, schedule, grid_x, grid_params,
                mkey, cfg.batch_size, dims,
            )
            logger.sample_metrics("parameter grid samples", g_elbo, g_bpd, g_nll)
            results["grid_metrics"] = {"elbo": g_elbo, "bpd": g_bpd, "nll": g_nll}

    # ---- CFG guidance sweep (:1008-1105) ------------------------------------
    # The reference runs one 5-sample sampler per strength; here all w > 0
    # strengths run as ONE batched call with per-sample guidance weights
    # (w == 0 keeps its distinct single-forward semantics and runs alone).
    if spec.guidance_sweep and spec.conditional:
        guided_by_w: Dict[float, np.ndarray] = {}
        base = np.tile(selected_params[0], (5, 1))
        zero_ws = [w for w in cfg.guidance_strengths if w <= 0]
        pos_ws = [w for w in cfg.guidance_strengths if w > 0]
        for w in zero_ws:
            sample_key, gkey = jax.random.split(sample_key)
            out = sample_ddpm(
                model, inference_vars, schedule, gkey,
                n_sample=5, size=cfg.height, params=jnp.asarray(base),
                guide_w=w, mesh=mesh,
            )
            guided_by_w[w] = np.asarray(out.x)
        if pos_ws:
            sample_key, gkey = jax.random.split(sample_key)
            big_params = np.tile(base, (len(pos_ws), 1))
            per_sample_w = np.repeat(np.asarray(pos_ws, np.float32), 5)
            out = sample_ddpm(
                model, inference_vars, schedule, gkey,
                n_sample=len(per_sample_w), size=cfg.height,
                params=jnp.asarray(big_params), guide_w=per_sample_w,
                mesh=mesh,
            )
            big_x = np.asarray(out.x)
            for i, w in enumerate(pos_ws):
                guided_by_w[w] = big_x[i * 5 : (i + 1) * 5]
        guided_samples = [guided_by_w[w] for w in cfg.guidance_strengths]
        guided_metrics = []
        if spec.post_metrics:
            for w in cfg.guidance_strengths:
                sample_key, mkey = jax.random.split(sample_key)
                e, b, nll = _sample_metrics(
                    model, inference_vars, schedule, guided_by_w[w], base,
                    mkey, 5, dims,
                )
                guided_metrics.append(
                    {"guidance": w, "elbo": e, "bpd": b, "nll": nll}
                )
                logger.guidance_metrics(w, e, b, nll)
        viz.save_image_grid(
            np.concatenate(guided_samples),
            os.path.join(output_dir, "guidance_strength_samples.png"),
            nrow=5,
        )
        if guided_metrics:
            viz.plot_guidance_metrics(guided_metrics, output_dir)
            results["guidance_metrics"] = guided_metrics

    # ---- parameter sensitivity (:1107-1215), batched -----------------------
    if spec.sensitivity and spec.conditional and cfg.num_params > 0:
        param_values = np.linspace(0.0, 1.0, 5, dtype=np.float32)
        sens_params = []
        for p_idx in range(cfg.num_params):
            for v in param_values:
                row = selected_params[0].copy()
                row[p_idx] = v
                sens_params.append(row)
        sens_params = np.stack(sens_params)  # (num_params*5, n_cfeat)
        sample_key, skey, mkey = jax.random.split(sample_key, 3)
        # ONE sampler invocation for every (parameter, value) pair — the
        # reference loops num_params*5 single-sample 1500-step samplers.
        sens_out = sample_ddpm(
            model, inference_vars, schedule, skey,
            n_sample=len(sens_params), size=cfg.height,
            params=jnp.asarray(sens_params), mesh=mesh,
        )
        sens_x = np.asarray(sens_out.x).reshape(
            cfg.num_params, 5, cfg.height, cfg.height
        )
        viz.plot_sensitivity_grid(sens_x, param_values, output_dir)
        if spec.post_metrics:
            mkey1, mkey2 = jax.random.split(mkey)
            per_elbo = np.asarray(
                elbo_bpd_batch(
                    model, inference_vars, schedule.beta, schedule.alpha_bar,
                    jnp.asarray(np.asarray(sens_out.x)), jnp.asarray(sens_params),
                    mkey1,
                    jnp.asarray(elbo_timesteps(cfg.timesteps)),
                )
            )
            per_nll = np.asarray(
                nll_batch(
                    model, inference_vars, schedule.beta, schedule.alpha_bar,
                    jnp.asarray(np.asarray(sens_out.x)), jnp.asarray(sens_params),
                    mkey2,
                )
            )
            for p_idx in range(cfg.num_params):
                logger.sensitivity_header(p_idx)
                metrics = []
                for i, v in enumerate(param_values):
                    j = p_idx * 5 + i
                    e = float(per_elbo[j])
                    b = e / (dims * np.log(2.0))
                    nll = float(per_nll[j])
                    logger.sensitivity_value(float(v), e, b, nll)
                    metrics.append(
                        {
                            "param_idx": p_idx,
                            "param_value": float(v),
                            "elbo": e,
                            "bpd": b,
                            "nll": nll,
                        }
                    )
                viz.plot_parameter_metrics(metrics, p_idx, output_dir)

    print(
        f"Training and evaluation completed"
        + (
            f" with {cfg.num_params} conditioning parameters."
            if spec.conditional
            else "."
        )
    )
    return results


def _build_grid_params(cfg: ExperimentConfig, selected_params: np.ndarray):
    """5x5 grid over the first two params, or 25 values of a single one
    (train_diffusion_paper.py:917-941)."""
    if cfg.num_params >= 2:
        p1 = np.linspace(0.0, 1.0, 5, dtype=np.float32)
        p2 = np.linspace(0.0, 1.0, 5, dtype=np.float32)
        rows = []
        for a in p1:
            for b in p2:
                row = selected_params[0].copy()
                row[0] = a
                row[1] = b
                rows.append(row)
    else:
        rows = []
        for a in np.linspace(0.0, 1.0, 25, dtype=np.float32):
            row = selected_params[0].copy()
            row[0] = a
            rows.append(row)
    return np.stack(rows)
