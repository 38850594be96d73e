"""RNNLM training: next-token objective over transcript token streams.

Reference parity: the reference's ESPnet lineage trains a char RNNLM
(lm_train.py era) whose scores fuse into recognize_beam (SURVEY.md call
stack 3.2); this is the TPU-native equivalent driven by
``train/cli.py --mode lm``. One jitted step (donated state), the same
checkpoint/metrics machinery as the acoustic regimes.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from robust_e2e_gan_tpu.config import TrainConfig
from robust_e2e_gan_tpu.models.e2e import add_sos_eos
from robust_e2e_gan_tpu.models.lm import LMConfig, RNNLM, lm_loss
from robust_e2e_gan_tpu.train.steps import create_optimizer
from robust_e2e_gan_tpu.utils import checkpoint as ckpt_lib
from robust_e2e_gan_tpu.utils.logging import MetricLogger


class LMState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState


def init_lm_state(
    lm: RNNLM, tcfg: TrainConfig, seed: int = 0
) -> Tuple[LMState, optax.GradientTransformation]:
    sample = jnp.zeros((2, 4), jnp.int32)
    params = lm.init(jax.random.PRNGKey(seed), sample)["params"]
    opt = create_optimizer(tcfg)
    return LMState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=opt.init(params),
    ), opt


def make_lm_train_step(
    lm: RNNLM, opt: optax.GradientTransformation
) -> Callable:
    cfg = lm.cfg

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: LMState, labels: jnp.ndarray):
        ys_in, ys_out, _ = add_sos_eos(
            labels, cfg.sos_id, cfg.eos_id, cfg.ignore_id
        )

        def loss_fn(params):
            logits = lm.apply({"params": params}, ys_in)
            return lm_loss(logits, ys_out, cfg.ignore_id)

        (loss, ppl), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "ppl": ppl,
                   "grad_norm": optax.global_norm(grads)}
        return state.replace(
            step=state.step + 1, params=params, opt_state=new_opt
        ), metrics

    return step


def train_lm(
    lmcfg: LMConfig,
    tcfg: TrainConfig,
    label_batches: Callable[[], Iterator[np.ndarray]],
    log_dir: Optional[str] = None,
    resume: bool = True,
) -> Tuple[LMState, RNNLM]:
    """Epoch loop over (B, L) int label batches (ignore_id padded)."""
    lm = RNNLM(lmcfg)
    state, opt = init_lm_state(lm, tcfg, seed=tcfg.seed)
    start_epoch = 0
    if resume and ckpt_lib.has_checkpoint(tcfg.checkpoint_dir):
        state, _ = ckpt_lib.restore_checkpoint(tcfg.checkpoint_dir, state)
        extra = ckpt_lib.read_extra(tcfg.checkpoint_dir)
        start_epoch = int(extra.get("epoch", -1)) + 1

    step_fn = make_lm_train_step(lm, opt)
    logger = MetricLogger(log_dir, name="lm")
    metrics: Dict[str, jnp.ndarray] = {}
    for epoch in range(start_epoch, tcfg.num_epochs):
        for labels in label_batches():
            state, metrics = step_fn(state, jnp.asarray(labels))
            step = int(state.step)
            if step % tcfg.log_every == 0:
                logger.log(step, metrics, prefix=f"epoch {epoch} ")
        ckpt_lib.save_checkpoint(
            tcfg.checkpoint_dir, state, int(state.step),
            metric=-float(metrics["loss"]) if metrics else None, keep=3,
            extra={"epoch": epoch, "epoch_complete": True},
        )
    logger.close()
    return state, lm


def load_lm(lm_dir: str, which: str = "best"):
    """Rebuild (RNNLM, params) from a --mode lm training run's directory."""
    import json
    import os

    from robust_e2e_gan_tpu import config as cfg_lib

    with open(os.path.join(lm_dir, "config.json")) as f:
        saved = json.load(f)
    lmcfg = cfg_lib.from_dict(LMConfig, saved["lm"])
    lm = RNNLM(lmcfg)
    state, _ = init_lm_state(lm, TrainConfig(optimizer="adam"), seed=0)
    if which == "best" and not ckpt_lib.has_checkpoint(lm_dir, "best"):
        which = "latest"
    state, _ = ckpt_lib.restore_checkpoint(lm_dir, state, which)
    return lm, state.params
