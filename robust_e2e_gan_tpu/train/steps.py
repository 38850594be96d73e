"""Jitted training steps: ASR pretrain, GAN pretrain, joint adversarial.

Reference parity: SURVEY.md section 2a "Train scripts" and call stack 3.1 —
the three training regimes (clean-ASR pretrain, enhancement-GAN pretrain,
joint adversarial fine-tune with alternating D/G updates and total G loss
L_ASR + lambda*L_adv + mu*L_enh), with Adadelta/Adam, grad clip, and
eps-decay on dev plateau.

TPU-first re-design: each alternating update is a *single compiled XLA
program* (D-step and G-step fused into one jitted function with two
grad computations and two optimizer applications) instead of the reference's
per-batch Python orchestration of loss.backward()/opt.step() pairs. Donated
argnums let XLA update parameters and optimizer state in place in HBM. Under
a data mesh the same functions run unchanged: batch inputs are sharded on the
'data' axis and jit inserts the gradient all-reduces (scaling-book recipe —
annotate shardings, let XLA place collectives on ICI).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from robust_e2e_gan_tpu.config import JointConfig, TrainConfig
from robust_e2e_gan_tpu.models.enhancement import (
    Discriminator,
    adversarial_losses,
    enhancement_loss,
)
from robust_e2e_gan_tpu.pipeline import RobustE2E


def create_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """Grad-clip + Adadelta (reference default) or Adam.

    Adadelta is wrapped in ``inject_hyperparams`` so its eps is state, not a
    constant baked into the compiled update — the reference's eps-decay-on-
    dev-plateau schedule (SURVEY.md section 2a "Train scripts") mutates it
    between epochs via ``decay_adadelta_eps`` without rebuilding the
    optimizer or losing accumulator state.
    """
    if tcfg.optimizer == "adadelta":
        opt = optax.inject_hyperparams(optax.adadelta)(
            learning_rate=tcfg.learning_rate,
            rho=tcfg.adadelta_rho,
            eps=tcfg.adadelta_eps,
        )
    elif tcfg.optimizer == "adam":
        if tcfg.warmup_steps > 0:
            sched = optax.linear_schedule(
                init_value=tcfg.learning_rate / max(tcfg.warmup_steps, 1),
                end_value=tcfg.learning_rate,
                transition_steps=tcfg.warmup_steps,
            )
            opt = optax.adam(sched)
        else:
            opt = optax.adam(tcfg.learning_rate)
    else:
        raise ValueError(f"unknown optimizer {tcfg.optimizer!r}")
    return optax.chain(optax.clip_by_global_norm(tcfg.grad_clip), opt)


def decay_adadelta_eps(opt_state, factor: float):
    """Multiply the injected Adadelta eps by ``factor`` (reference eps-decay).

    No-op (returns the state unchanged) for optimizers without injected
    hyperparameters, e.g. Adam.
    """
    clip_state, inner = opt_state
    if hasattr(inner, "hyperparams") and "eps" in inner.hyperparams:
        hp = dict(inner.hyperparams)
        hp["eps"] = hp["eps"] * factor
        inner = inner._replace(hyperparams=hp)
    return (clip_state, inner)


class TrainState(struct.PyTreeNode):
    """Joint G/D training state. G params include the whole RobustE2E tree
    (enhancer + ASR), matching the reference's joint fine-tuning where the
    generator update also moves ASR weights (SURVEY.md call stack 3.1)."""

    step: jnp.ndarray
    params_g: Any
    opt_state_g: Any
    params_d: Any
    opt_state_d: Any
    rng: jax.Array


def init_train_state(
    model: RobustE2E,
    discriminator: Discriminator,
    tcfg: TrainConfig,
    sample_batch: Dict[str, jnp.ndarray],
    seed: int = 0,
    input_kind: str = None,
    log_domain: bool = False,
) -> Tuple[TrainState, optax.GradientTransformation, optax.GradientTransformation]:
    """``input_kind``: "wav" (waveforms, on-device frontend), "feats"
    (precomputed log-mel, ASR-only), or "spec" (precomputed linear/log
    power spectra routed through the enhancer — the joint objective on
    precomputed inputs). None infers wav/feats from the batch keys."""
    if input_kind is None:
        input_kind = "feats" if "feats" in sample_batch else "wav"
    rng = jax.random.PRNGKey(seed)
    rng, kg, kd = jax.random.split(rng, 3)
    if input_kind == "spec":
        vars_g = model.init(
            kg,
            sample_batch["feats"],
            sample_batch.get("clean_feats", sample_batch["feats"]),
            sample_batch["feat_lengths"],
            sample_batch["labels"],
            cmvn_batch=_cmvn_batch(sample_batch),
            log_domain=log_domain,
            method=RobustE2E.joint_forward_spec,
        )
        params_g = vars_g["params"]
        out = model.apply(
            {"params": params_g},
            sample_batch["feats"],
            sample_batch.get("clean_feats", sample_batch["feats"]),
            sample_batch["feat_lengths"],
            sample_batch["labels"],
            cmvn_batch=_cmvn_batch(sample_batch),
            log_domain=log_domain,
            method=RobustE2E.joint_forward_spec,
        )
        vars_d = discriminator.init(
            kd, out["clean_logmel"], out["frame_mask"]
        )
        params_d = vars_d["params"]
    elif input_kind == "feats":
        # precomputed-features source (feats.scp): ASR params only — the
        # enhancer/GAN path needs waveforms and is unavailable by design
        vars_g = model.init(
            kg,
            sample_batch["feats"],
            sample_batch["feat_lengths"],
            sample_batch["labels"],
            cmvn_batch=_cmvn_batch(sample_batch),
            method=RobustE2E.asr_forward_feats,
        )
        params_g = vars_g["params"]
        t = sample_batch["feats"].shape[1]
        fmask = (
            jnp.arange(t, dtype=jnp.int32)[None, :]
            < sample_batch["feat_lengths"][:, None]
        ).astype(jnp.float32)
        vars_d = discriminator.init(kd, sample_batch["feats"], fmask)
        params_d = vars_d["params"]
    else:
        vars_g = model.init(
            kg,
            sample_batch["noisy_wav"],
            sample_batch["clean_wav"],
            sample_batch["wav_lengths"],
            sample_batch["labels"],
            cmvn_batch=_cmvn_batch(sample_batch),
            method=RobustE2E.joint_forward,
        )
        params_g = vars_g["params"]
        # D input: log-mel features of (B, T, n_mels)
        out = model.apply(
            {"params": params_g},
            sample_batch["noisy_wav"],
            sample_batch["clean_wav"],
            sample_batch["wav_lengths"],
            sample_batch["labels"],
            cmvn_batch=_cmvn_batch(sample_batch),
            method=RobustE2E.joint_forward,
        )
        vars_d = discriminator.init(
            kd, out["clean_logmel"], out["frame_mask"]
        )
        params_d = vars_d["params"]
    opt_g = create_optimizer(tcfg)
    opt_d = create_optimizer(tcfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        opt_state_g=opt_g.init(params_g),
        params_d=params_d,
        opt_state_d=opt_d.init(params_d),
        rng=rng,
    )
    return state, opt_g, opt_d


def _cmvn_batch(batch):
    """Per-batch speaker-CMVN stats when the loader attached them
    (FrontendConfig.cmvn="speaker"; data/cmvn.py::SpeakerCmvn)."""
    if "cmvn_mean" in batch:
        return (batch["cmvn_mean"], batch["cmvn_inv_std"])
    return None


def make_asr_pretrain_step(
    model: RobustE2E,
    opt_g: optax.GradientTransformation,
    use_enhancer: bool = False,
    input_kind: str = "wav",
    log_domain: bool = False,
) -> Callable:
    """Clean-ASR pretraining step (SURVEY.md train script (a))."""

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng_next, k_drop, k_samp = jax.random.split(state.rng, 3)
        rngs = {"dropout": k_drop, "sampling": k_samp}

        def loss_fn(params):
            if input_kind == "spec":  # precomputed spectrogram feats
                out = model.apply(
                    {"params": params},
                    batch["feats"],
                    batch["feat_lengths"],
                    batch["labels"],
                    use_enhancer=use_enhancer,
                    deterministic=False,
                    cmvn_batch=_cmvn_batch(batch),
                    log_domain=log_domain,
                    method=RobustE2E.asr_forward_spec,
                    rngs=rngs,
                )
            elif "feats" in batch:  # precomputed-features source (feats.scp)
                out = model.apply(
                    {"params": params},
                    batch["feats"],
                    batch["feat_lengths"],
                    batch["labels"],
                    deterministic=False,
                    cmvn_batch=_cmvn_batch(batch),
                    method=RobustE2E.asr_forward_feats,
                    rngs=rngs,
                )
            else:
                out = model.apply(
                    {"params": params},
                    batch["clean_wav"],
                    batch["wav_lengths"],
                    batch["labels"],
                    use_enhancer=use_enhancer,
                    deterministic=False,
                    cmvn_batch=_cmvn_batch(batch),
                    method=RobustE2E.asr_forward,
                    rngs=rngs,
                )
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params_g
        )
        updates, new_opt = opt_g.update(grads, state.opt_state_g, state.params_g)
        new_params = optax.apply_updates(state.params_g, updates)
        new_state = state.replace(
            step=state.step + 1, params_g=new_params, opt_state_g=new_opt,
            rng=rng_next,
        )
        metrics = {
            "loss": loss,
            "loss_ctc": out["loss_ctc"],
            "loss_att": out["loss_att"],
            "acc": out["acc"],
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model: RobustE2E, use_enhancer: bool = True,
                   input_kind: str = "wav", log_domain: bool = False) -> Callable:
    """Jitted dev-eval forward: ASR losses/accuracy, no parameter update.

    In joint mode the dev signal is the enhanced-noisy path (the quantity
    the reference tracked for eps-decay/best-checkpoint, SURVEY.md call
    stack 3.1 'periodic dev eval')."""

    def eval_fn(params_g, batch: Dict[str, jnp.ndarray]):
        if input_kind == "spec":
            out = model.apply(
                {"params": params_g}, batch["feats"],
                batch["feat_lengths"], batch["labels"],
                use_enhancer=use_enhancer,
                cmvn_batch=_cmvn_batch(batch),
                log_domain=log_domain,
                method=RobustE2E.asr_forward_spec,
            )
            return {
                "loss": out["loss"],
                "loss_ctc": out["loss_ctc"],
                "loss_att": out["loss_att"],
                "acc": out["acc"],
            }
        if "feats" in batch:  # precomputed-features source (feats.scp)
            out = model.apply(
                {"params": params_g}, batch["feats"],
                batch["feat_lengths"], batch["labels"],
                cmvn_batch=_cmvn_batch(batch),
                method=RobustE2E.asr_forward_feats,
            )
            return {
                "loss": out["loss"],
                "loss_ctc": out["loss_ctc"],
                "loss_att": out["loss_att"],
                "acc": out["acc"],
            }
        wav = batch["noisy_wav"] if use_enhancer else batch["clean_wav"]
        out = model.apply(
            {"params": params_g}, wav, batch["wav_lengths"],
            batch["labels"], use_enhancer=use_enhancer,
            cmvn_batch=_cmvn_batch(batch),
            method=RobustE2E.asr_forward,
        )
        return {
            "loss": out["loss"],
            "loss_ctc": out["loss_ctc"],
            "loss_att": out["loss_att"],
            "acc": out["acc"],
        }

    return jax.jit(eval_fn)


def _gan_terms(
    model: RobustE2E,
    discriminator: Discriminator,
    jcfg: JointConfig,
    params_g,
    params_d,
    batch,
    with_asr: bool,
    deterministic: bool = True,
    rngs=None,
    input_kind: str = "wav",
    log_domain: bool = False,
):
    if input_kind == "spec":
        # precomputed spectrogram feats through the enhancer (the joint
        # objective on the reference's primary input kind; pipeline
        # joint_forward_spec)
        out = model.apply(
            {"params": params_g},
            batch["feats"],
            batch["clean_feats"],
            batch["feat_lengths"],
            batch["labels"],
            deterministic=deterministic,
            cmvn_batch=_cmvn_batch(batch),
            log_domain=log_domain,
            method=RobustE2E.joint_forward_spec,
            rngs=rngs,
        )
    else:
        out = model.apply(
            {"params": params_g},
            batch["noisy_wav"],
            batch["clean_wav"],
            batch["wav_lengths"],
            batch["labels"],
            deterministic=deterministic,
            cmvn_batch=_cmvn_batch(batch),
            method=RobustE2E.joint_forward,
            rngs=rngs,
        )
    d_fake = discriminator.apply(
        {"params": params_d}, out["enhanced_logmel"], out["frame_mask"]
    )
    d_real = discriminator.apply(
        {"params": params_d}, out["clean_logmel"], out["frame_mask"]
    )
    loss_d, loss_g_adv = adversarial_losses(
        d_real, d_fake, jcfg.discriminator.loss_type
    )
    loss_enh = enhancement_loss(
        out["enhanced_power"],
        out["clean_power"],
        out["frame_mask"],
        kind=jcfg.enh_loss,
    )
    loss_asr = out["loss"] if with_asr else 0.0
    loss_g = loss_asr + jcfg.lambda_adv * loss_g_adv + jcfg.mu_enh * loss_enh
    return loss_g, loss_d, out, loss_g_adv, loss_enh


def make_joint_train_step(
    model: RobustE2E,
    discriminator: Discriminator,
    jcfg: JointConfig,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    with_asr: bool = True,
    input_kind: str = "wav",
    log_domain: bool = False,
) -> Callable:
    """One alternating adversarial update: D-step then G-step, one XLA
    program (SURVEY.md call stack 3.1). with_asr=False gives the
    enhancement-GAN pretraining regime (train script (b)).
    input_kind="spec" runs the same objective on precomputed spectrogram
    feats (batch keys feats/clean_feats/feat_lengths)."""

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng_next, k_drop, k_samp = jax.random.split(state.rng, 3)
        rngs = {"dropout": k_drop, "sampling": k_samp}

        # ---- D step: grads wrt D params only; G is implicitly detached
        # because we differentiate wrt params_d (reference used .detach()).
        def d_loss_fn(params_d):
            _, loss_d, _, _, _ = _gan_terms(
                model, discriminator, jcfg, state.params_g, params_d,
                batch, with_asr=False, input_kind=input_kind,
                log_domain=log_domain,
            )
            return loss_d

        loss_d, grads_d = jax.value_and_grad(d_loss_fn)(state.params_d)
        upd_d, new_opt_d = opt_d.update(grads_d, state.opt_state_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, upd_d)

        # ---- G step against the *updated* discriminator.
        def g_loss_fn(params_g):
            loss_g, _, out, loss_g_adv, loss_enh = _gan_terms(
                model, discriminator, jcfg, params_g, new_params_d,
                batch, with_asr=with_asr, deterministic=False, rngs=rngs,
                input_kind=input_kind, log_domain=log_domain,
            )
            return loss_g, (out, loss_g_adv, loss_enh)

        (loss_g, (out, loss_g_adv, loss_enh)), grads_g = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.params_g)
        upd_g, new_opt_g = opt_g.update(grads_g, state.opt_state_g, state.params_g)
        new_params_g = optax.apply_updates(state.params_g, upd_g)

        new_state = state.replace(
            step=state.step + 1,
            params_g=new_params_g,
            opt_state_g=new_opt_g,
            params_d=new_params_d,
            opt_state_d=new_opt_d,
            rng=rng_next,
        )
        metrics = {
            "loss_g": loss_g,
            "loss_d": loss_d,
            "loss_adv": loss_g_adv,
            "loss_enh": loss_enh,
            "grad_norm_g": optax.global_norm(grads_g),
            "grad_norm_d": optax.global_norm(grads_d),
        }
        if with_asr:
            metrics.update(
                loss_asr=out["loss"],
                loss_ctc=out["loss_ctc"],
                loss_att=out["loss_att"],
                acc=out["acc"],
            )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))
