#!/usr/bin/env python
"""Benchmark: 6-param CFG sampling throughput of the flagship model.

Headline metric (BASELINE.md): 64x64 maps/minute/chip at 1500-step
classifier-free-guidance sampling.  The reference (PyTorch, 1 GPU) reaches
~33 maps/min WITHOUT guidance (45.77 s for 25 grid maps, committed log
graphs/.../timing_and_performance.log); guidance doubles its model evals.
``vs_baseline`` is measured against that 33 maps/min number.

TPU path under test: jitted lax.scan sampler, fused CFG (encoder once +
doubled-batch decoder), bfloat16 compute, batch-amortized across the chip.

Env overrides: BENCH_BATCH, BENCH_TIMESTEPS, BENCH_GUIDE_W, BENCH_DTYPE.
Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np


def _committed_checkpoint_md5(art_dir):
    """md5 of the committed certification checkpoint, or None if absent."""
    import hashlib

    ckpt = os.path.join(art_dir, "model", "train_state.msgpack")
    if not os.path.exists(ckpt):
        return None
    h = hashlib.md5()
    with open(ckpt, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _n16k_confirmation(art_dir, guide_w, ckpt_md5):
    """Summary of a committed N=16384 confirmation artifact
    (scripts/run_n16k_confirmation.sh four-phase protocol ->
    artifacts/certification/n16k/w*/n16k_final.json) for one guidance
    setting, or None.  At N=16384 the mean-P(k) Monte-Carlo floor drops to
    ~1% max-bin, so BASELINE.md's literal "power spectra within 1%" clause
    becomes measurable: the final scoring (scripts/score_n16k_final.py)
    compares a fresh-seed refit-calibrated validation run against the mean
    of TWO untouched independent exact-chain references with the literal 1%
    tolerance — ``within_1pct_literal`` records its resolution.
    Fingerprint-verified like every other quoted artifact."""
    path = os.path.join(
        art_dir, "n16k", f"w{int(guide_w)}", "n16k_final.json"
    )
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            d = json.load(f)
        if d.get("checkpoint_fingerprint") != ckpt_md5:
            print(
                f"bench.py: dropping n16k confirmation {path}: stamp "
                f"{d.get('checkpoint_fingerprint')!r} != committed "
                f"checkpoint ({ckpt_md5!r})",
                file=sys.stderr,
            )
            return None
        # The final scoring holds the ONE refit-calibrated validation row.
        if not d["rows"]:
            return None
        best = min(d["rows"], key=lambda r: r["max_err_vs_meanBC_pct"])
        return {
            "eval_maps_refs": d.get("n_eval_refs", 16384),
            "eval_maps_validation": d.get("n_eval_validation"),
            "config": best["config"],
            "maps_per_min": best["maps_per_min"],
            "max_err_vs_meanBC_pct": best["max_err_vs_meanBC_pct"],
            "mean_err_vs_meanBC_pct": best.get("mean_err_vs_meanBC_pct"),
            "reference_pair_distances_max_mean_pct":
                d.get("reference_pair_distances_max_mean_pct"),
            "zero_bias_p_value": best.get("zero_bias_p_value"),
            # Self-diagnosing supplement: where the max sits and what it is
            # restricted to bins with >=8 Fourier modes (a few-mode corner
            # bin driving a miss is visible from the artifact alone).
            "max_err_vs_meanBC_ge8modes_pct":
                best.get("max_err_vs_meanBC_ge8modes_pct"),
            "argmax_bin": best.get("argmax_bin"),
            "within_1pct_literal": bool(best.get("certified_literal_1pct")),
            "full_battery": bool(best.get("certified_full_battery")),
            # Pre-registered decision (score_n16k_final.py docstring):
            # literal pass OR conservative zero-bias p >= 0.05; no reruns.
            "confirmed_preregistered": bool(
                best.get("confirmed_preregistered")
            ),
        }
    except Exception as e:
        print(f"bench.py: skipping n16k confirmation {path}: {e!r}",
              file=sys.stderr)
        return None


def certified_serving_summary(art_dir=None):
    """Compact summaries of the committed certified serving rows
    (artifacts/certification/validation_w*_calibrated.indep.json) for the
    default-mode JSON line, so every BENCH_r* records the north-star serving
    numbers alongside the exact-CFG headline.  Empty list if no artifacts.

    Every quoted row is VERIFIED against the committed checkpoint: the
    artifact's ``checkpoint_fingerprint`` (stamped by certify_fast_sampler at
    sweep time) must equal the md5 of artifacts/certification/model/
    train_state.msgpack, or the artifact is dropped with a stderr warning —
    the round-3 failure mode (certified numbers quoting a lost model's
    artifacts) can no longer happen silently."""
    import glob

    out = []
    if art_dir is None:
        art_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "artifacts",
            "certification",
        )
    ckpt_md5 = _committed_checkpoint_md5(art_dir)
    pat = os.path.join(art_dir, "validation_w*_calibrated.indep.json")
    for path in sorted(glob.glob(pat)):
        try:
            with open(path) as f:
                d = json.load(f)
            fp = d.get("checkpoint_fingerprint")
            if ckpt_md5 is None or fp != ckpt_md5:
                print(
                    f"bench.py: dropping certification artifact {path}: "
                    f"checkpoint_fingerprint {fp!r} does not match the "
                    f"committed checkpoint ({ckpt_md5!r}) — the certified "
                    "rows were produced by a different model; re-run "
                    "scripts/run_w2_certification.sh",
                    file=sys.stderr,
                )
                continue
            certified = set(d.get("certified_configs_independent") or [])
            rows = [r for r in d["rows"] if r["config"] in certified]
            if not rows:
                continue
            best = max(rows, key=lambda r: r["maps_per_min"])
            summary = {
                "guide_w": d["guide_w"],
                "config": best["config"],
                "maps_per_min": best["maps_per_min"],
                "max_err_vs_indep_pct": best["max_err_vs_indep_pct"],
                "noise_floor_max_pct": d["noise_floor_max_pct_indep"],
                "checkpoint_fingerprint": fp,
            }
            full = d.get("certified_full_battery_independent")
            if full is not None:
                summary["certified_full_battery"] = best["config"] in full
            conf = _n16k_confirmation(art_dir, d["guide_w"], ckpt_md5)
            if conf is not None:
                summary["n16384_confirmation"] = conf
            out.append(summary)
        except Exception as e:
            # Never let a malformed artifact kill the bench, but don't drop
            # the north-star serving rows silently either (stdout must stay
            # one clean JSON line; warn on stderr).
            print(
                f"bench.py: skipping certification artifact {path}: {e!r}",
                file=sys.stderr,
            )
            continue
    return out


def default_calibration_path(guide_w, serving_steps):
    """Committed spectral-calibration artifact for a (guidance, steps) pair,
    or None when no matching artifact exists (SPEEDUP.md certified rows).

    Calibration fits are guidance-specific: a non-integral guide_w has no
    committed artifact, and silently truncating (e.g. w=0.5 -> calib_w0)
    would apply a filter fitted at a different guidance strength."""
    if float(guide_w) != int(guide_w):
        return None
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "artifacts", "certification",
        f"calib_w{int(guide_w)}_{serving_steps}.npz",
    )
    return path if os.path.exists(path) else None


def bench_train():
    """Secondary mode (BENCH_MODE=train): training throughput imgs/s/chip.

    Reference: ~254 imgs/s (13500 maps / 53.09 s epoch, committed logs)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from camels_diffusion_model_tpu.data.prefetch import device_prefetch
    from camels_diffusion_model_tpu.models import ContextUnet
    from camels_diffusion_model_tpu.training import (
        create_train_state,
        make_train_step,
    )

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    batch = int(os.environ.get("BENCH_BATCH", 32 if on_accel else 8))
    dtype = jnp.bfloat16 if on_accel else jnp.float32
    model = ContextUnet(
        in_channels=1, n_feat=128, n_cfeat=6, height=64, levels=2, dtype=dtype
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 64, 64, 1), np.float32),
        np.array([0.5], np.float32),
    )
    state = create_train_state(model, variables, 1e-5, 100, 422)
    # BENCH_REMAT=convs|full: rematerialization A/B (trainer.py docstring).
    from camels_diffusion_model_tpu.training import parse_remat_env

    try:
        remat = parse_remat_env(os.environ.get("BENCH_REMAT", ""))
    except ValueError as e:
        raise SystemExit(f"BENCH_REMAT: {e}")
    step = make_train_step(model, 1500, donate=True, remat=remat)
    # Epoch-like conditions: a DIFFERENT host batch each step (reusing one
    # array would hide the host->device input cost — 24% of the batch-32
    # step time, ARCHITECTURE.md audit).  BENCH_PREFETCH=0 disables the
    # background-thread device staging (data/prefetch.py) for A/B.
    use_prefetch = os.environ.get("BENCH_PREFETCH", "1") == "1"
    n_iter = 30 if on_accel else 3
    rs = np.random.RandomState(0)
    batches = [
        (
            rs.rand(batch, 64, 64, 1).astype(np.float32),
            rs.rand(batch, 6).astype(np.float32),
        )
        for _ in range(n_iter + 1)
    ]
    key = jax.random.PRNGKey(0)
    key, k = jax.random.split(key)
    state, m = step(state, *batches[0], k)
    _ = float(m["loss"])

    # Repeat/min protocol (same as the sampling bench): the tunneled-TPU
    # run-to-run variance is large (two same-flag runs measured 1501 and
    # 1954 imgs/s hours apart — round-3 verdict), so a single pass cannot be
    # a headline.  Run the epoch-like loop BENCH_REPEATS times and report
    # the min-time (max throughput) plus the spread, so a reader can see the
    # measurement noise instead of absorbing it.
    n_repeats = int(os.environ.get("BENCH_REPEATS", 3 if on_accel else 1))
    repeat_tp = []
    for _rep in range(n_repeats):
        t0 = _time.time()
        it = (device_prefetch(batches[1:]) if use_prefetch
              else iter(batches[1:]))
        for bx, bc in it:
            key, k = jax.random.split(key)
            state, m = step(state, bx, bc, k)
        _ = float(m["loss"])
        dt = _time.time() - t0
        repeat_tp.append(n_iter * batch / dt)
    imgs_per_sec = max(repeat_tp)
    print(
        json.dumps(
            {
                "metric": "train_throughput_64x64_t1500",
                "value": round(imgs_per_sec, 1),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(imgs_per_sec / 254.0, 3),
                "batch": batch,
                "platform": platform,
                "prefetch": use_prefetch,
                "remat": remat,
                "repeats": [round(v, 1) for v in repeat_tp],
                "spread_pct": round(
                    100 * (max(repeat_tp) - min(repeat_tp)) / max(repeat_tp),
                    1,
                ),
            }
        )
    )


def bench_sharded_sample():
    """BENCH_MODE=sharded_sample: mesh-sharded CFG sampling over ALL visible
    devices — maps/min/chip plus scaling efficiency vs a single-device run of
    the same per-chip batch.  The samplers' ``mesh=`` path (parallel/mesh.py,
    tested in test_parallel.py) shards the batch dimension over ICI; on a
    multi-chip host this measures real scaling with zero new code, and in CI
    it runs on the 8-device virtual CPU mesh (test_bench_contract.py).

    Prints ONE JSON line: value = maps/min/chip on the full mesh;
    ``scaling_efficiency`` = sharded whole-mesh throughput / (n_devices x
    single-device throughput at the same per-chip batch)."""
    import jax
    import jax.numpy as jnp

    from camels_diffusion_model_tpu.diffusion import make_schedule, sample_ddpm
    from camels_diffusion_model_tpu.models import ContextUnet
    from camels_diffusion_model_tpu.models.fold_bn import fold_inference
    from camels_diffusion_model_tpu.parallel import make_mesh

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    n_dev = len(jax.devices())
    per_chip = int(os.environ.get("BENCH_BATCH", 128 if on_accel else 4))
    timesteps = int(os.environ.get("BENCH_TIMESTEPS", 1500 if on_accel else 8))
    guide_w = float(os.environ.get("BENCH_GUIDE_W", 2.0))
    dtype = jnp.bfloat16 if on_accel else jnp.float32

    model = ContextUnet(
        in_channels=1, n_feat=128, n_cfeat=6, height=64, levels=2, dtype=dtype
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 64, 64, 1), np.float32),
        np.array([0.5], np.float32),
    )
    model, variables = fold_inference(model, variables)
    schedule = make_schedule(timesteps)
    mesh = make_mesh(n_dev)
    total = per_chip * n_dev
    params = jnp.asarray(
        np.random.RandomState(0).rand(total, 6).astype(np.float32)
    )

    def run(seed, n, use_mesh):
        return sample_ddpm(
            model, variables, schedule, jax.random.PRNGKey(seed),
            n_sample=n, size=64, params=params[:n], guide_w=guide_w,
            mesh=mesh if use_mesh else None, measure_timing=False,
        ).x

    def force(x):
        return float(jnp.abs(x).sum())

    def best_of(fn, repeats=3):
        fn(0)  # compile + warm
        times = []
        for seed in range(1, repeats + 1):
            t0 = time.time()
            force(fn(seed))
            times.append(time.time() - t0)
        return min(times)

    t_single = best_of(lambda s: run(s, per_chip, False))
    t_sharded = best_of(lambda s: run(s, total, True))
    single_tp = per_chip / t_single          # maps/sec, one device
    sharded_tp = total / t_sharded           # maps/sec, whole mesh
    efficiency = sharded_tp / (n_dev * single_tp)
    maps_per_min_chip = sharded_tp / n_dev * 60.0
    print(
        json.dumps(
            {
                "metric": "sharded_cfg_sampling_throughput_64x64_t%d"
                % timesteps,
                "value": round(maps_per_min_chip, 2),
                "unit": "maps/min/chip",
                "vs_baseline": round(maps_per_min_chip / 33.0, 3),
                "n_devices": n_dev,
                "batch_per_chip": per_chip,
                "total_batch": total,
                "guide_w": guide_w,
                "platform": platform,
                "scaling_efficiency": round(efficiency, 3),
                "single_device_maps_per_min": round(single_tp * 60.0, 2),
                "seconds_per_run": round(t_sharded, 3),
            }
        )
    )


def main():
    import jax

    # CAMELS_FORCE_CPU=1: host-only smoke runs (the axon TPU plugin ignores
    # the JAX_PLATFORMS env var; only the config API works — CLAUDE.md).
    # CAMELS_CPU_DEVICES=N adds N virtual CPU devices so the sharded bench
    # mode exercises a real multi-device mesh in CI.
    if os.environ.get("CAMELS_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
        n_cpu = int(os.environ.get("CAMELS_CPU_DEVICES", "0"))
        if n_cpu > 1:
            jax.config.update("jax_num_cpu_devices", n_cpu)

    # BENCH_PRNG=rbg: use the TPU-native RBG PRNG for the per-step noise
    # draws instead of threefry (JAX's default).  Threefry is bitwise
    # reproducible across backends but costs real VPU time per step at
    # production batch; RBG is the documented fast TPU generator with the
    # same N(0,1) output distribution (a different stream — the reference's
    # torch/Philox stream differs from ours either way).
    if os.environ.get("BENCH_PRNG") == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from camels_diffusion_model_tpu.diffusion import make_schedule, sample_ddpm
    from camels_diffusion_model_tpu.diffusion.ddim import sample_ddim
    from camels_diffusion_model_tpu.models import ContextUnet
    from camels_diffusion_model_tpu.models.fold_bn import fold_inference

    if os.environ.get("BENCH_MODE") == "train":
        bench_train()
        return
    if os.environ.get("BENCH_MODE") == "sharded_sample":
        bench_sharded_sample()
        return
    ddim_mode = os.environ.get("BENCH_MODE") == "ddim"
    # serving mode: the certified strided-DDPM configuration (SPEEDUP.md) —
    # the reference chain's own update strided to BENCH_SERVING_STEPS.
    serving_mode = os.environ.get("BENCH_MODE") == "serving"

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    batch = int(os.environ.get("BENCH_BATCH", 128 if on_accel else 4))
    timesteps = int(os.environ.get("BENCH_TIMESTEPS", 1500 if on_accel else 20))
    # DDIM serving config: certified in SPEEDUP.md (spectral error vs the
    # 1500-step DDPM reference documented there per step count).
    ddim_steps = int(os.environ.get("BENCH_DDIM_STEPS", 250))
    # Serving default follows the certified row's guidance setting (w=0, the
    # reference's own P(k)-validation setting — SPEEDUP.md); other modes
    # default to the w=2 throughput-headline config.
    guide_w = float(
        os.environ.get("BENCH_GUIDE_W", 0.0 if serving_mode else 2.0)
    )
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16" if on_accel else "float32")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    # A/B knobs (scripts/tpu_ab.py drives these; defaults = production path):
    #   BENCH_NO_FOLD=1     keep BatchNorms unfolded
    #   BENCH_PALLAS_GN=1   fused Pallas GroupNorm+act decoder heads
    #   CAMELS_PALLAS_STEP=1 fused Pallas ancestral update (read by sampler)
    pallas_gn = os.environ.get("BENCH_PALLAS_GN", "0") == "1"
    model = ContextUnet(
        in_channels=1, n_feat=128, n_cfeat=6, height=64, levels=2, dtype=dtype,
        pallas_gn=pallas_gn,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 64, 64, 1), np.float32),
        np.array([0.5], np.float32),
    )
    # Serving mode defaults to the CERTIFIED row for this guidance setting,
    # resolved from the committed artifact tree with hard fingerprint
    # verification (serving.py): certified step count, matching
    # calibration, and the committed checkpoint's weights — so
    # `BENCH_MODE=serving BENCH_GUIDE_W={0,2} python bench.py` reproduces
    # the certified configuration end-to-end from the repo alone.
    # BENCH_SERVING_STEPS overrides (A/B sweeps), falling back to the
    # legacy fixed defaults when the resolver can't produce a row.
    serving_cfg = None
    if serving_mode and not os.environ.get("BENCH_SERVING_STEPS"):
        try:
            from camels_diffusion_model_tpu.serving import (
                resolve_serving_config,
            )
            from camels_diffusion_model_tpu.training import (
                load_model_weights,
            )

            serving_cfg = resolve_serving_config(guide_w)
            variables = load_model_weights(variables, serving_cfg.model_path)
        except Exception as e:
            print(
                f"bench.py: certified-serving resolver unavailable "
                f"({e}); falling back to fixed defaults",
                file=sys.stderr,
            )
            serving_cfg = None
    # Inference path: BatchNorm running stats folded into the convs
    # (models/fold_bn.py) — identical math, no BN work in the scan.
    if os.environ.get("BENCH_NO_FOLD", "0") != "1":
        model, variables = fold_inference(model, variables)
    schedule = make_schedule(timesteps)
    params = jnp.asarray(
        np.random.RandomState(0).rand(batch, 6).astype(np.float32)
    )

    # Default = the CERTIFIED serving row for this guidance setting,
    # resolved from the committed artifact tree with hard fingerprint
    # verification (serving.py): certified step count, matching
    # calibration, and the committed checkpoint's weights — so
    # `BENCH_MODE=serving BENCH_GUIDE_W={0,2} python bench.py` reproduces
    # the certified configuration end-to-end from the repo alone.
    # BENCH_SERVING_STEPS overrides (A/B sweeps), falling back to the
    # legacy fixed defaults when the resolver can't produce a row.
    serving_steps = (
        serving_cfg.steps if serving_cfg is not None
        else int(os.environ.get("BENCH_SERVING_STEPS", 430))
    )
    # CAMELS_CALIBRATION=<calib.npz>: include the certified serving path's
    # spectral-calibration filter (one rfft2 pair per map, ~1e-4 of the UNet
    # FLOPs) inside the timed run — honest accounting of the full certified
    # configuration (SPEEDUP.md).  Defaults to the committed artifact for
    # the chosen step count when one exists; CAMELS_CALIBRATION=none skips.
    calib = None
    if serving_mode:
        # Empty string == unset (the same convention as cli/sample.py).
        calib_path = os.environ.get("CAMELS_CALIBRATION") or None
        if calib_path is None and serving_cfg is not None:
            calib_path = serving_cfg.calibration_path
        if calib_path is None:
            calib_path = default_calibration_path(guide_w, serving_steps) or "none"
        if calib_path.lower() != "none":
            from camels_diffusion_model_tpu.diffusion.calibration import (
                SpectralCalibration,
                apply_spectral_calibration,
            )

            calib = SpectralCalibration.load(calib_path)

    def run(seed):
        if serving_mode:
            out = sample_ddim(
                model,
                variables,
                schedule,
                jax.random.PRNGKey(seed),
                n_sample=batch,
                size=64,
                params=params,
                guide_w=guide_w,
                n_steps=serving_steps,
                sigma_mode="beta",
            )
            x = out.x
            if calib is not None:
                x = apply_spectral_calibration(x, calib)
            return x
        if ddim_mode:
            return sample_ddim(
                model,
                variables,
                schedule,
                jax.random.PRNGKey(seed),
                n_sample=batch,
                size=64,
                params=params,
                guide_w=guide_w,
                n_steps=ddim_steps,
            ).x
        return sample_ddpm(
            model,
            variables,
            schedule,
            jax.random.PRNGKey(seed),
            n_sample=batch,
            size=64,
            params=params,
            guide_w=guide_w,
            # Serving fast path: chunks dispatch back-to-back with donated
            # carries; one host sync per run instead of one per chunk.
            measure_timing=False,
        ).x

    def force(x):
        # The experimental TPU tunnel platform can return early from
        # block_until_ready; a dependent-scalar host transfer is the honest
        # completion barrier.
        return float(jnp.abs(x).sum())

    def attempt():
        t0 = time.time()
        force(run(0))
        first = time.time() - t0
        times = []
        for seed in (1, 2, 3):
            t0 = time.time()
            out = run(seed)
            force(out)
            times.append(time.time() - t0)
        return first, min(times)

    # The tunneled TPU runtime occasionally faults on long runs; retry once
    # after a cool-down rather than failing the whole bench.
    try:
        compile_and_first, best = attempt()
    except Exception as e:
        print(f"# bench attempt failed ({type(e).__name__}); retrying in 90s",
              file=sys.stderr)
        time.sleep(90)
        compile_and_first, best = attempt()
    maps_per_min = batch / best * 60.0

    baseline_maps_per_min = 33.0  # reference grid sampling, no CFG
    if serving_mode:
        metric = "serving_strided_ddpm%d_throughput_64x64_t%d" % (
            serving_steps, timesteps)
    elif ddim_mode:
        metric = "ddim%d_cfg_sampling_throughput_64x64_t%d" % (
            ddim_steps, timesteps)
    else:
        metric = "cfg_sampling_throughput_64x64_t%d" % timesteps
    result = {
        "metric": metric,
        "value": round(maps_per_min, 2),
        "unit": "maps/min/chip",
        "vs_baseline": round(maps_per_min / baseline_maps_per_min, 3),
        "batch": batch,
        "guide_w": guide_w,
        "dtype": dtype_name,
        "platform": platform,
        "seconds_per_run": round(best, 3),
        "first_call_seconds": round(compile_and_first, 1),
    }
    if ddim_mode:
        result["ddim_steps"] = ddim_steps
    if serving_mode:
        result["serving_steps"] = serving_steps
        result["sigma_mode"] = "beta"
        result["calibrated"] = calib is not None
        if serving_cfg is not None:
            # The run used the committed certified row end-to-end:
            # checkpoint weights, certified step count, matching filter.
            result["certified_config"] = serving_cfg.config
            result["certified_maps_per_min"] = (
                serving_cfg.expected_maps_per_min
            )
            result["checkpoint_fingerprint"] = (
                serving_cfg.checkpoint_fingerprint
            )
    elif not ddim_mode:
        # Default mode also records the committed certified serving rows
        # (the BASELINE.md north-star setting) so the round artifact carries
        # both numbers.
        certified = certified_serving_summary()
        if certified:
            result["certified_serving"] = certified
    print(json.dumps(result))


if __name__ == "__main__":
    main()
