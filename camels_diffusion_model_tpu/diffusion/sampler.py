"""Reverse-diffusion samplers as a single jitted ``lax.scan`` (TPU-native).

Capability parity with the reference's samplers
(``sample_ddpm`` train_diffusion_paper.py:555-623, ``sample_ddpm_from_noise``
:625-686, ancestral step ``denoise_add_noise`` :548-553), re-designed for TPU:

* The entire T-step loop is ONE compiled ``lax.scan`` resident in HBM — the
  reference runs a Python loop with a host sync every step.
* Classifier-free guidance exploits the ContextUnet structure: the encoder
  (init_conv/down path/bottleneck) does not depend on t or c, so it runs once
  per step; only the FiLM-conditioned decoder runs on a doubled batch
  [cond, uncond].  The reference runs the FULL model twice per step
  (train_diffusion_paper.py:600-606).  ~27% fewer FLOPs at identical math.
* FiLM embeddings are hoisted out of the scan entirely: the context MLPs run
  once per sampler invocation (context is step-invariant) and the time MLPs
  once for ALL T steps as a (T+1, C) table gathered per step — the scan body
  contains only the U-Net convolutions, the gather, and the ancestral update.
* The unconditional CFG branch uses a zero context vector, matching
  ``uncond_params = zeros_like(params)`` (train_diffusion_paper.py:587).
* Intermediate states are captured on-device into a preallocated buffer at the
  reference's save schedule (``i % save_rate == 0 or i == T or i < 8``,
  train_diffusion_paper.py:617) — only the ~82 saved frames ever cross to the
  host.
* Semantics note (matches the reference exactly): with ``guide_w == 0`` the
  model is called once with the conditional context (NOT the unconditional
  branch); ``z = 0`` at the final step ``t == 1``.
* Stochastic-shortcut models (``model.shortcut == "stochastic"``, the
  reference-faithful fresh-random-1x1 quirk) draw their per-forward projection
  from a dedicated key split inside the scan body — fully reproducible under a
  fixed sampler key.

For best inference throughput fold the BatchNorms first
(``models.fold_bn.fold_inference``); the samplers accept either form.

Images are NHWC: (batch, size, size, channels).
"""

from __future__ import annotations

import functools
import os as _os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.context_unet import model_rngs
from .schedule import DDPMSchedule, p_sample_step

# Opt-in fused Pallas ancestral-update kernel (ops/pallas/sampler_step.py).
# The update is a small elementwise op next to the model forward, so this is
# off by default; it exists to guarantee single-pass HBM traffic when XLA's
# fusion decisions around the scan body regress.
_USE_PALLAS_STEP = _os.environ.get("CAMELS_PALLAS_STEP", "0") == "1"

# Max reverse steps executed per device call (see _sample_scan_chunk).
DEFAULT_STEPS_PER_CALL = int(_os.environ.get("CAMELS_SAMPLER_CHUNK", "250"))


# Scan unroll factor for the sampler body (CAMELS_SCAN_UNROLL=k): XLA
# replicates the body k times per loop iteration, amortizing loop/dispatch
# overhead across steps.  1 (default) = no unrolling; the chunk length must
# stay divisible-friendly (lax.scan handles remainders itself).  A/B knob
# for scripts/sampler_residue.py-guided tuning.
_SCAN_UNROLL = int(_os.environ.get("CAMELS_SCAN_UNROLL", "1"))


def _pregen_noise_enabled() -> bool:
    """Opt-in: draw the ancestral noise for a whole device chunk as ONE
    batched normal() before the scan instead of one threefry call per step
    inside it (CAMELS_PREGEN_NOISE=1).

    The key chain is replayed exactly (a cheap keys-only scan), so the
    noise streams — and therefore the sampler output — are bit-identical
    to the default path (tested).  Costs chunk x state_size HBM (~0.5 GB
    at batch 128 / chunk 250); moves the threefry hashing out of the
    scan's serial critical path into one large fused kernel.
    """
    return _os.environ.get("CAMELS_PREGEN_NOISE", "0") == "1"


class SamplerOutput(NamedTuple):
    x: jax.Array  # final samples, (B, H, W, C)
    intermediate: jax.Array  # saved states, (n_saves, B, H, W, C)
    sampling_time: float  # wall-clock seconds (host-measured)
    # Per-step seconds, measured per device chunk (the reference reports
    # measured per-step wall times, train_diffusion_paper.py:613-621).
    # Empty (shape (0,)) when the caller opted out via measure_timing=False —
    # the serving fast path, which skips the per-chunk host barrier.
    timestep_times: np.ndarray


def _save_schedule(timesteps: int, save_rate: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Static save mask over the reversed step sequence i = T..1 and the slot
    each saved step writes to (chronological order, like the reference's
    ``intermediate.append``)."""
    steps = np.arange(timesteps, 0, -1)
    mask = (steps % save_rate == 0) | (steps == timesteps) | (steps < 8)
    slots = np.cumsum(mask) - 1
    return mask.astype(np.bool_), slots.astype(np.int32), int(mask.sum())


def _predict_eps(
    model, variables, x, t_norm, params, use_cfg: bool, guide_w,
    shortcut_key=None,
):
    """One denoiser evaluation with inline FiLM embedding, optionally with
    fused classifier-free guidance.

    ``guide_w`` may be a scalar or a per-sample (B,) array — the latter lets a
    whole guidance-strength sweep run as ONE batched sampler invocation (the
    reference loops one sampler run per strength, paper.py:1013-1019)."""
    rngs = model_rngs(model, shortcut_key)
    if not use_cfg:
        if not _supports_film(model):  # duck-typed eps-models: plain forward
            return model.apply(variables, x, t_norm, params, rngs=rngs)
        enc = model.apply(variables, x, method="encode", rngs=rngs)
        # Materialization boundary between encoder and decoder: without it,
        # XLA fuses the two conv stacks into mega-fusions whose scan-body
        # schedule runs ~3x slower at single-forward shapes (measured 45.4
        # -> 14.7 ms/step at batch 128 on v5e).  The CFG branch never hits
        # this because its concat materializes the boundary anyway.
        enc = jax.lax.optimization_barrier(enc)
        return model.apply(variables, enc, t_norm, params, method="decode")
    enc = model.apply(variables, x, method="encode", rngs=rngs)
    enc2 = jax.tree_util.tree_map(
        lambda a: jnp.concatenate([a, a], axis=0), enc
    )
    c2 = jnp.concatenate([params, jnp.zeros_like(params)], axis=0)
    eps2 = model.apply(variables, enc2, t_norm, c2, method="decode")
    eps_cond, eps_uncond = jnp.split(eps2, 2, axis=0)
    return _combine_cfg(eps_cond, eps_uncond, guide_w)


def _combine_cfg(eps_cond, eps_uncond, guide_w):
    w = jnp.asarray(guide_w, jnp.float32)
    if w.ndim > 0:
        w = w.reshape((-1,) + (1,) * (eps_cond.ndim - 1))
    return eps_uncond + w.astype(eps_cond.dtype) * (eps_cond - eps_uncond)


def _predict_eps_film(
    model, variables, x, cembs, tembs, use_cfg: bool, guide_w,
    shortcut_key=None,
):
    """Hot-path denoiser evaluation with PRECOMPUTED FiLM embeddings.

    ``cembs``: (cemb1, cemb2) — (B, C) for the plain path or (2B, C)
    [cond, uncond] for CFG.  ``tembs``: (temb1, temb2) — (1, C) rows gathered
    from the per-step tables (broadcast over the batch, the reference's
    scalar-t semantics)."""
    rngs = model_rngs(model, shortcut_key)
    enc = model.apply(variables, x, method="encode", rngs=rngs)
    film = (cembs[0], tembs[0], cembs[1], tembs[1])
    if not use_cfg:
        # See _predict_eps: block encoder/decoder mega-fusion in the
        # single-forward scan body (3x measured on v5e at batch 128).
        enc = jax.lax.optimization_barrier(enc)
        return model.apply(variables, enc, film=film, method="decode")
    enc2 = jax.tree_util.tree_map(
        lambda a: jnp.concatenate([a, a], axis=0), enc
    )
    eps2 = model.apply(variables, enc2, film=film, method="decode")
    eps_cond, eps_uncond = jnp.split(eps2, 2, axis=0)
    return _combine_cfg(eps_cond, eps_uncond, guide_w)


def _supports_film(model) -> bool:
    """Whether the model exposes the split encode/decode + embedding-table
    API (ContextUnet does).  Duck-typed eps-models with only ``apply(v, x, t,
    c)`` fall back to the inline-embedding path."""
    return all(
        hasattr(model, m)
        for m in ("encode", "decode", "time_embed", "context_embed")
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "use_cfg", "use_film", "timesteps", "pregen"),
    donate_argnums=(5, 6),  # x, buf — carried across chunk calls in-place
)
def _sample_scan_chunk(
    model,
    variables,
    schedule_beta,
    schedule_alpha,
    schedule_alpha_bar,
    x,
    buf,
    params,
    cemb1,
    cemb2,
    temb1_tab,
    temb2_tab,
    guide_w,
    rng,
    steps,
    write_slots,
    *,
    use_cfg: bool,
    use_film: bool,
    timesteps: int,
    pregen: bool = False,
):
    """Scan over one contiguous chunk of the reversed step sequence.

    The full T-step loop is split into fixed-size chunks executed by repeated
    calls of this one compiled function (host carries (x, buf, rng) between
    calls, buffers donated so nothing is copied).  Chunking bounds single-
    device-call wall time — long monolithic executions are fragile over
    tunneled/preemptible TPU runtimes — at zero per-step cost.
    """
    sched = DDPMSchedule(
        beta=schedule_beta,
        alpha=schedule_alpha,
        alpha_bar=schedule_alpha_bar,
        timesteps=timesteps,
    )

    if pregen:
        # Replay the per-step key chain OUTSIDE the scan (keys-only scan,
        # ~free), then draw every step's z in one batched normal() — the
        # same streams, hashed as one large fused kernel instead of T
        # small ones on the scan's serial path (_pregen_noise_enabled).
        def _chain(k, _):
            k, zkey, skey = jax.random.split(k, 3)
            return k, (zkey, skey)

        key_out, (zkeys, skeys) = jax.lax.scan(
            _chain, rng, None, length=steps.shape[0]
        )
        zs = jax.vmap(
            lambda k: jax.random.normal(k, x.shape, x.dtype)
        )(zkeys)
        zs = jnp.where(
            steps.reshape((-1,) + (1,) * x.ndim) > 1, zs, jnp.zeros_like(zs)
        )

    def body(carry, xs):
        x, buffer, key = carry
        if pregen:
            i, slot, z, skey = xs
        else:
            i, slot = xs
            key, zkey, skey = jax.random.split(key, 3)
            z = jax.random.normal(zkey, x.shape, x.dtype)
            z = jnp.where(i > 1, z, jnp.zeros_like(z))
        if use_film:
            eps = _predict_eps_film(
                model, variables, x,
                (cemb1, cemb2),
                (temb1_tab[i][None], temb2_tab[i][None]),
                use_cfg, guide_w, shortcut_key=skey,
            )
        else:
            t_norm = (i / timesteps).astype(jnp.float32).reshape(1)
            eps = _predict_eps(
                model, variables, x, t_norm, params, use_cfg, guide_w,
                shortcut_key=skey,
            )
        carry_dtype = x.dtype
        if _USE_PALLAS_STEP and (x.size % 128 == 0):
            from ..ops.pallas.sampler_step import fused_p_sample_step

            x = fused_p_sample_step(
                sched.beta, sched.alpha, sched.alpha_bar,
                x, i, eps.astype(x.dtype), z,
            )
        else:
            x = p_sample_step(sched, x, i, eps.astype(x.dtype), z)
        # Keep the carry dtype stable (a bf16 state requested by the caller
        # would otherwise be promoted to fp32 by the schedule coefficients).
        x = x.astype(carry_dtype)
        # Unconditional dynamic-update-slice (non-saving steps target an
        # overflow row) — XLA keeps it in-place; a where(save, ...) would copy
        # the whole intermediate buffer every step (~170 MB HBM traffic/step
        # at production batch sizes).
        buffer = jax.lax.dynamic_update_slice(
            buffer, x[None], (slot,) + (0,) * x.ndim
        )
        return (x, buffer, key), None

    if pregen:
        (x, buf, _), _ = jax.lax.scan(
            body, (x, buf, rng), (steps, write_slots, zs, skeys),
            unroll=_SCAN_UNROLL,
        )
        return x, buf, key_out
    (x, buf, key), _ = jax.lax.scan(
        body, (x, buf, rng), (steps, write_slots), unroll=_SCAN_UNROLL
    )
    return x, buf, key


def sample_ddpm(
    model,
    variables,
    schedule: DDPMSchedule,
    rng: jax.Array,
    n_sample: int = 1,
    size: int = 64,
    params: Optional[jax.Array] = None,
    guide_w: float = 0.0,
    save_rate: int = 20,
    x_init: Optional[jax.Array] = None,
    dtype=jnp.float32,
    mesh=None,
    spatial: bool = False,
    measure_timing: bool = True,
) -> SamplerOutput:
    """Generate samples by ancestral DDPM sampling from pure noise.

    Matches ``sample_ddpm`` (train_diffusion_paper.py:555-623): if ``params``
    is None a random parameter vector per sample is drawn (uniform [0,1)).

    ``mesh``: optional ``jax.sharding.Mesh`` — the batch axis is sharded
    across its data axis (embarrassingly parallel sampling sweeps over ICI).
    ``spatial=True`` (with a 2-D data x space mesh) additionally shards the
    image height axis — model parallelism for resolutions past one chip's
    HBM; XLA inserts the conv halo exchanges automatically.

    ``measure_timing=False`` (serving fast path) skips the per-chunk host
    barrier: all device chunks dispatch back-to-back (the donated carries
    chain on-device) and the host syncs once at the end.  Saves one host
    round-trip per chunk — material over tunneled/remote TPU runtimes —
    at the cost of ``timestep_times`` coming back empty.
    """
    rng, xkey, pkey = jax.random.split(rng, 3)
    if x_init is None:
        x_init = jax.random.normal(
            xkey, (n_sample, size, size, model.in_channels), dtype
        )
    if params is None:
        params = jax.random.uniform(pkey, (n_sample, model.n_cfeat), jnp.float32)
    return _run(
        model, variables, schedule, rng, x_init, params, guide_w, save_rate,
        mesh=mesh, spatial=spatial, measure_timing=measure_timing,
    )


def sample_ddpm_from_noise(
    model,
    variables,
    schedule: DDPMSchedule,
    rng: jax.Array,
    noise_images: jax.Array,
    params: Optional[jax.Array] = None,
    guide_w: float = 0.0,
    save_rate: int = 20,
    mesh=None,
    measure_timing: bool = True,
) -> SamplerOutput:
    """Reverse diffusion seeded with forward-diffused real images
    (train_diffusion_paper.py:625-686).  ``params=None`` means zero context."""
    if params is None:
        # Reference passes c=None through the model, which becomes a zero
        # context vector; guidance is disabled in that case (:663-672).
        params = jnp.zeros((noise_images.shape[0], model.n_cfeat), jnp.float32)
        guide_w = 0.0
    return _run(
        model, variables, schedule, rng, noise_images, params, guide_w,
        save_rate, mesh=mesh, measure_timing=measure_timing,
    )


def _film_tables(model, variables, params, timesteps: int, use_cfg: bool):
    """Hoist every FiLM MLP out of the scan: context embeddings once per run
    (doubled [cond, uncond] for CFG) and time embeddings for ALL timesteps as
    (T+1, C) gather tables."""
    c = params
    if use_cfg:
        c = jnp.concatenate([params, jnp.zeros_like(params)], axis=0)
    cemb1, cemb2 = model.apply(variables, c, method="context_embed")
    t_norm = (
        jnp.arange(timesteps + 1, dtype=jnp.float32) / timesteps
    ).reshape(-1, 1)
    temb1_tab, temb2_tab = model.apply(variables, t_norm, method="time_embed")
    return cemb1, cemb2, temb1_tab, temb2_tab


def _run(
    model,
    variables,
    schedule,
    rng,
    x_init,
    params,
    guide_w,
    save_rate,
    steps_per_call: Optional[int] = None,
    mesh=None,
    spatial: bool = False,
    measure_timing: bool = True,
):
    timesteps = schedule.timesteps
    mask, slots, n_saves = _save_schedule(timesteps, save_rate)
    steps = np.arange(timesteps, 0, -1, dtype=np.int32)
    write_slots = np.where(mask, slots, n_saves).astype(np.int32)
    w_arr = np.asarray(guide_w, np.float64)
    use_cfg = bool(np.any(w_arr > 0.0))
    if w_arr.ndim > 0 and use_cfg and np.any(w_arr <= 0.0):
        raise ValueError(
            "per-sample guide_w must be all-positive (w=0 uses a different "
            "single-forward semantics in the reference; run it separately)"
        )
    n_real = int(np.shape(x_init)[0])
    if w_arr.ndim > 0 and w_arr.shape[0] != n_real:
        raise ValueError(
            f"per-sample guide_w length {w_arr.shape[0]} must match the "
            f"batch size {n_real}"
        )
    chunk = min(timesteps, steps_per_call or DEFAULT_STEPS_PER_CALL)
    n_chunks = -(-timesteps // chunk)
    # First chunk takes the remainder so at most two shapes compile.
    first = timesteps - (n_chunks - 1) * chunk

    t0 = time.time()
    # Copy, don't alias: the scan chunks donate their carry buffers, and a
    # no-copy asarray of a caller-provided device x_init would silently
    # DELETE the caller's array on the first chunk call (jnp.array copies).
    x = jnp.array(x_init)
    params = jnp.asarray(params)
    if mesh is not None:
        # Shard the batch over the mesh's data axis (pad to an even shard).
        # With ``spatial=True`` on a 2-D (data x space) mesh the image
        # height axis is additionally sharded over "space" — XLA SPMD
        # derives the conv halo exchanges and norm collectives from the
        # sharding alone (parallel/mesh.py::make_mesh_2d).
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import batch_sharding, spatial_sharding

        if spatial and len(mesh.axis_names) < 2:
            raise ValueError("spatial=True requires a 2-D mesh (make_mesh_2d)")
        n_dev = mesh.devices.shape[0] if spatial else mesh.devices.size
        pad = (-n_real) % n_dev
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
            params = jnp.concatenate(
                [params, jnp.zeros((pad,) + params.shape[1:], params.dtype)]
            )
        # One layout convention, defined once in parallel/mesh.py.
        xshard = (
            spatial_sharding(mesh, x.ndim) if spatial
            else batch_sharding(mesh, x.ndim)
        )
        x = jax.device_put(x, xshard)
        params = jax.device_put(params, batch_sharding(mesh, params.ndim))
    buf = jnp.zeros((n_saves + 1,) + x.shape, x.dtype)
    if mesh is not None:
        # Same sharding as x with a replicated leading save axis.
        buf = jax.device_put(
            buf, NamedSharding(mesh, P(None, *xshard.spec))
        )
    key = rng
    w = jnp.asarray(guide_w, jnp.float32)
    if mesh is not None and w.ndim > 0:
        # per-sample weights shard with the batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        if pad:
            w = jnp.concatenate([w, jnp.ones((pad,), w.dtype)])
        w = jax.device_put(w, NamedSharding(mesh, P(mesh.axis_names[0])))

    use_film = _supports_film(model)
    if use_film:
        cemb1, cemb2, temb1_tab, temb2_tab = _film_tables(
            model, variables, params, timesteps, use_cfg
        )
    else:
        cemb1 = cemb2 = temb1_tab = temb2_tab = None

    def barrier(arr):
        # A dependent-scalar host read is the completion barrier: on the
        # experimental tunneled-TPU platform, block_until_ready can return
        # before the computation has actually finished, which would corrupt
        # the wall-clock numbers written to timing_and_performance.log.
        jax.block_until_ready(arr)
        _ = float(arr.reshape(-1)[0])

    per_step = np.zeros((timesteps,), np.float64)
    start = 0
    chunk_t0 = time.time()
    for ci in range(n_chunks):
        size = first if ci == 0 else chunk
        x, buf, key = _sample_scan_chunk(
            model,
            variables,
            schedule.beta,
            schedule.alpha,
            schedule.alpha_bar,
            x,
            buf,
            params,
            cemb1,
            cemb2,
            temb1_tab,
            temb2_tab,
            w,
            key,
            jnp.asarray(steps[start : start + size]),
            jnp.asarray(write_slots[start : start + size]),
            use_cfg=use_cfg,
            use_film=use_film,
            timesteps=timesteps,
            pregen=_pregen_noise_enabled(),
        )
        # Real per-chunk timing (the reference reports measured per-step wall
        # times, train_diffusion_paper.py:613-621; here each device chunk is
        # timed and its steps share the chunk average).  The serving fast
        # path (measure_timing=False) skips the per-chunk host round-trip:
        # chained donated carries keep the device busy back-to-back and the
        # single barrier below covers the whole run.
        if measure_timing:
            barrier(x)
            now = time.time()
            per_step[start : start + size] = (now - chunk_t0) / size
            chunk_t0 = now
        start += size
    if not measure_timing:
        barrier(x)
        per_step = per_step[:0]
    total = time.time() - t0
    x = x[:n_real]
    intermediate = buf[:n_saves, :n_real]
    return SamplerOutput(
        x=x, intermediate=intermediate, sampling_time=total,
        timestep_times=per_step,
    )
