"""Jitted training/eval steps and optimizer state (optax + flax TrainState).

Capability parity with the reference's trainer
(train_diffusion_paper.py:318-408): Adam, per-epoch linear LR decay
``lrate * (1 - ep / n_epoch)`` (:343), per-sample random timesteps
``t ~ randint(1, T+1)`` (:354), the REFERENCE q_sample scaling (:320-321),
simple epsilon-MSE objective (:361), and the validation pass's
equal-per-batch MSE averaging (:392-407).

TPU-first design: noise/timestep sampling happens on-device from a threaded
PRNG key inside the jitted step (no host RNG in the hot loop); the step is an
ordinary ``jax.jit`` function, so handing it batches sharded over a mesh's
"data" axis makes it data-parallel (psum of grads and global BatchNorm
statistics are inserted by XLA).  The per-sample MSE and timesteps are
returned so the per-batch ELBO mode (train_diffusion_elbo.py:74-105) costs no
extra forward pass.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def linear_decay_schedule(lrate: float, n_epoch: int, steps_per_epoch: int):
    """The reference's per-epoch linear decay as an optax step schedule."""

    def schedule(step):
        ep = step // steps_per_epoch
        return lrate * (1.0 - ep / n_epoch)

    return schedule


def create_train_state(
    model,
    variables,
    lrate: float,
    n_epoch: int,
    steps_per_epoch: int,
    beta1: float = 0.9,
    beta2: float = 0.999,
) -> TrainState:
    """TrainState with Adam + per-epoch linear LR decay (torch Adam defaults:
    betas=(0.9, 0.999), eps=1e-8, matching train_diffusion_paper.py:318)."""
    tx = optax.adam(
        learning_rate=linear_decay_schedule(lrate, n_epoch, steps_per_epoch),
        b1=beta1,
        b2=beta2,
        eps=1e-8,
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )


def _noise_coeff(ab, scaling: str):
    """q_sample noise coefficient: REFERENCE uses (1-ab) (paper.py:320-321),
    STANDARD uses sqrt(1-ab) (main.py:156)."""
    return (1.0 - ab) if scaling == "reference" else jnp.sqrt(1.0 - ab)


def masked_mean(per_sample, mask):
    """Mean of ``per_sample`` over the real rows of a padded partial batch.

    ``mask`` (B,) is 1.0 for real rows, 0.0 for pad rows (None = all real).
    Returns ``(per_sample_masked, mean)`` with pad rows zeroed so downstream
    per-sample consumers (the per-batch ELBO form) see no pad contribution.
    """
    if mask is None:
        return per_sample, jnp.mean(per_sample)
    m = mask.astype(per_sample.dtype)
    per_sample = per_sample * m
    return per_sample, jnp.sum(per_sample) / jnp.sum(m)


from ..models.context_unet import model_rngs  # noqa: E402  (re-export)


def parse_remat_env(value):
    """Map a user-facing remat mode string to :func:`make_train_step`'s
    ``remat`` argument: '' / None -> False, 'full' -> True, 'convs' ->
    'convs'.  The ONE shared parser for every CLI surface
    (CAMELS_TRAIN_REMAT, BENCH_REMAT, flop_audit --remat) so the accepted
    values can never drift between them."""
    value = value or ""
    modes = {"": False, "full": True, "convs": "convs"}
    if value not in modes:
        raise ValueError(
            f"remat mode {value!r} — valid values: '' (off), 'full', 'convs'"
        )
    return modes[value]


def make_train_step(
    model,
    timesteps: int,
    scaling: str = "reference",
    beta1: float = 1e-4,
    beta2: float = 0.02,
    donate: bool = False,
    remat=False,
):
    """Build the jitted train step.

    step(state, x, c, rng, mask=None) -> (state, metrics) with metrics
    {"loss", "per_sample_mse", "t"}.  ``x`` NHWC, ``c`` (B, n_cfeat).
    ``beta1``/``beta2`` are the noise-schedule endpoints — they must match the
    schedule used for sampling and ELBO/NLL evaluation so every phase sees one
    diffusion process.

    ``mask`` (B,) marks real rows (1) vs pad rows (0) of a padded partial
    batch: the loss/gradient is the mean over REAL rows only and pad rows'
    ``per_sample_mse`` comes back zeroed.  Padding keeps every step of every
    epoch on the ONE compiled program with the same sharded layout (a
    non-divisible final batch would otherwise compile a second shape and —
    under a mesh — run replicated).  Pad rows do still participate in
    BatchNorm batch statistics; the epoch loops pad by wrapping real rows, so
    those stats stay sane (documented divergence for the final partial batch).

    ``donate=True`` donates the incoming TrainState's buffers (params, Adam
    moments, batch stats — ~3x the model size) so the update happens in place
    instead of allocating a fresh copy every step.  The production epoch
    loops enable it; it is opt-in because the FIRST donated call also deletes
    any caller-held aliases of the initial variables (the arrays passed to
    ``create_train_state``) — a surprising default for library users who
    re-step from a kept state.

    ``remat`` selects rematerialization of the forward (math is identical in
    every mode; A/B via ``flop_audit --train --measure --remat[-convs]``):

    * ``False`` — XLA's default residual saving (measured fastest at
      batch >= 256, where the step is compute-bound);
    * ``True`` — full ``jax.checkpoint`` (save nothing): measured LOSS at
      every batch on v5e (ARCHITECTURE.md) — recompute traffic replaces but
      does not shrink saved-activation traffic at these shapes; kept for
      deeper variants whose activations exceed HBM;
    * ``"convs"`` — selective: save ONLY conv/matmul outputs (the tensors
      tagged ``blocks.saveable``) and recompute BatchNorm/activation
      epilogues in the backward pass.  Predicted to cut the HBM-bound
      batch-32 step's saved-tensor traffic ~3 -> ~1 per conv; MEASURED
      (v5e, scripts/remat_diagnosis.py + BENCH_REMAT, 2026-08-19,
      artifacts/diagnostics_r4/): it does NOT — bytes moved go UP 10%
      (11.74 -> 12.91 GB/step) because the recompute segments re-read the
      saved conv outputs and parameters, and throughput drops 4.8%
      (device-resident) to 25% (host-input bench path).  Kept as a policy
      template for deeper variants; the measured default is ``False``.
    """

    from ..diffusion.schedule import make_schedule

    alpha_bar = make_schedule(timesteps, beta1, beta2).alpha_bar

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, x, c, rng, mask=None):
        tkey, nkey, skey = jax.random.split(rng, 3)
        b = x.shape[0]
        t = jax.random.randint(tkey, (b,), 1, timesteps + 1)
        noise = jax.random.normal(nkey, x.shape, x.dtype)

        def forward(params, x_pert, t_norm, c, skey):
            variables = {"params": params, "batch_stats": state.batch_stats}
            return model.apply(
                variables,
                x_pert,
                t_norm,
                c,
                train=True,
                mutable=["batch_stats"],
                rngs=model_rngs(model, skey),
            )

        if remat == "convs":
            forward = jax.checkpoint(
                forward,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out"
                ),
            )
        elif remat:
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            ab = alpha_bar[t][:, None, None, None]
            x_pert = jnp.sqrt(ab) * x + _noise_coeff(ab, scaling) * noise
            out, mutated = forward(
                params, x_pert, (t / timesteps).astype(jnp.float32), c, skey
            )
            per_sample = jnp.mean(
                jnp.square(out - noise), axis=tuple(range(1, out.ndim))
            )
            per_sample, loss = masked_mean(per_sample, mask)
            return loss, (per_sample, mutated["batch_stats"])

        (loss, (per_sample, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        return state, {"loss": loss, "per_sample_mse": per_sample, "t": t}

    return train_step


def make_eval_step(
    model,
    timesteps: int,
    scaling: str = "reference",
    beta1: float = 1e-4,
    beta2: float = 0.02,
):
    """Validation MSE step (train_diffusion_paper.py:392-404): random
    timesteps, reference q_sample.  Returns device-resident metrics
    {"loss" scalar, "per_sample_mse" (B,), "t" (B,)} — accumulate on device
    and sync once per eval pass; the per-sample values feed the per-batch
    val-ELBO form used by the elbo/spectrum_indiv modes
    (train_diffusion_elbo.py:374-383) at no extra forward."""
    from ..diffusion.schedule import make_schedule

    alpha_bar = make_schedule(timesteps, beta1, beta2).alpha_bar

    @jax.jit
    def eval_step(params, batch_stats, x, c, rng, mask=None):
        tkey, nkey, skey = jax.random.split(rng, 3)
        b = x.shape[0]
        t = jax.random.randint(tkey, (b,), 1, timesteps + 1)
        noise = jax.random.normal(nkey, x.shape, x.dtype)
        ab = alpha_bar[t][:, None, None, None]
        x_pert = jnp.sqrt(ab) * x + _noise_coeff(ab, scaling) * noise
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x_pert,
            (t / timesteps).astype(jnp.float32),
            c,
            rngs=model_rngs(model, skey),
        )
        per_sample = jnp.mean(
            jnp.square(out - noise), axis=tuple(range(1, out.ndim))
        )
        per_sample, loss = masked_mean(per_sample, mask)
        return {"loss": loss, "per_sample_mse": per_sample, "t": t}

    return eval_step
