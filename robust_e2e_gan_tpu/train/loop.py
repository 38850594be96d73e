"""Training driver: epoch loop, dev eval, eps-decay, checkpoints, resume.

Reference parity: SURVEY.md section 2a "Train scripts" and call stack 3.1 —
the three regimes (clean-ASR pretrain / enhancement-GAN pretrain / joint
adversarial fine-tune) share one epoch loop with per-iter logging, periodic
dev evaluation, best-on-dev + latest checkpointing, and Adadelta eps-decay
on dev-accuracy plateau.

TPU-native additions over the reference (SURVEY.md section 5): resumable
loop keyed on the step counter with atomic checkpoints (survives
preemption), background-prefetched host batching overlapping device steps,
structured CSV metrics, optional jax.profiler tracing, and optional
data-parallel sharding over a device mesh (batches sharded on the 'data'
axis; XLA inserts the gradient all-reduces).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from robust_e2e_gan_tpu.config import JointConfig, TrainConfig
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.pipeline import build_model
from robust_e2e_gan_tpu.train import steps as steps_lib
from robust_e2e_gan_tpu.utils import checkpoint as ckpt_lib
from robust_e2e_gan_tpu.utils.logging import MetricLogger, StepTimer

MODES = ("asr", "gan", "joint")


def _device_batch(batch: Dict[str, np.ndarray], mesh) -> Dict[str, jnp.ndarray]:
    arrays = {
        k: v for k, v in batch.items()
        if isinstance(v, np.ndarray) or hasattr(v, "shape")
    }
    if mesh is not None:
        from robust_e2e_gan_tpu.parallel import shard_batch

        return shard_batch(arrays, mesh)
    return {k: jnp.asarray(v) for k, v in arrays.items()}


def train(
    jcfg: JointConfig,
    tcfg: TrainConfig,
    train_batches: Callable[[], Iterator[Dict[str, np.ndarray]]],
    dev_batches: Optional[Callable[[], Iterator[Dict[str, np.ndarray]]]] = None,
    mode: str = "joint",
    mesh=None,
    log_dir: Optional[str] = None,
    resume: bool = True,
    init_from: Optional[str] = None,
    prefetch_depth: int = 2,
    cmvn_stats=None,
    save_every_steps: int = 0,
    input_kind: str = None,
    log_domain: bool = False,
):
    """Run ``tcfg.num_epochs`` of the selected regime; returns final state.

    Args:
      train_batches/dev_batches: zero-arg factories returning a fresh epoch
        iterator of host batches (noisy_wav, clean_wav, wav_lengths, labels).
      mode: "asr" = clean-ASR pretrain, "gan" = enhancement-GAN pretrain,
        "joint" = joint adversarial fine-tune (SURVEY.md train scripts a-c).
      init_from: checkpoint dir to warm-start params from (e.g. joint
        fine-tune starting at ASR-pretrained weights) without resuming its
        step counter.
    """
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}")
    from robust_e2e_gan_tpu.data.dataset import Prefetcher

    model = build_model(jcfg, cmvn_stats=cmvn_stats)
    disc = Discriminator(jcfg.discriminator)

    first = next(iter(train_batches()))
    sample = _device_batch(first, None)
    if input_kind is None:
        input_kind = "feats" if "feats" in sample else "wav"
    state, opt_g, opt_d = steps_lib.init_train_state(
        model, disc, tcfg, sample, seed=tcfg.seed,
        input_kind=input_kind, log_domain=log_domain,
    )

    start_epoch = 0
    best_acc = -float("inf")
    if init_from and ckpt_lib.has_checkpoint(init_from, "best"):
        warm, _ = ckpt_lib.restore_checkpoint(init_from, state, "best")
        state = state.replace(params_g=warm.params_g, params_d=warm.params_d)
    if resume and ckpt_lib.has_checkpoint(tcfg.checkpoint_dir):
        state, step0 = ckpt_lib.restore_checkpoint(tcfg.checkpoint_dir, state)
        extra = ckpt_lib.read_extra(tcfg.checkpoint_dir)
        if "epoch" in extra:
            # schedule state travels in the checkpoint sidecar: no corpus
            # re-scan to count steps, and the eps-decay plateau comparison
            # (best_acc) survives preemption.
            start_epoch = int(extra["epoch"]) + int(
                bool(extra.get("epoch_complete", True))
            )
            best_acc = float(extra.get("best_acc", best_acc))
        else:  # legacy checkpoint without sidecar extra: count one epoch
            steps_per_epoch = max(sum(1 for _ in train_batches()), 1)
            start_epoch = step0 // steps_per_epoch

    if mesh is not None:
        from robust_e2e_gan_tpu.parallel import shard_train_state

        state = shard_train_state(state, mesh)

    if mode == "asr":
        step_fn = steps_lib.make_asr_pretrain_step(
            model, opt_g, use_enhancer=False,
            input_kind=input_kind, log_domain=log_domain,
        )
    else:
        step_fn = steps_lib.make_joint_train_step(
            model, disc, jcfg, opt_g, opt_d, with_asr=(mode == "joint"),
            input_kind=input_kind, log_domain=log_domain,
        )
    eval_fn = steps_lib.make_eval_step(
        model, use_enhancer=(mode != "asr"),
        input_kind=input_kind, log_domain=log_domain,
    )

    logger = MetricLogger(log_dir, name=mode)
    timer = StepTimer()
    # serialize+write run off-thread so checkpoints don't stall training
    # (the device->host pull stays synchronous; see AsyncCheckpointer)
    saver = ckpt_lib.AsyncCheckpointer()

    # context manager drains the in-flight checkpoint write (and
    # surfaces worker errors) even if a step raises; the final
    # checkpoint must be durable before returning
    try:
        with saver:
            for epoch in range(start_epoch, tcfg.num_epochs):
                # context manager releases the prefetch thread if a step raises
                with Prefetcher(train_batches(), depth=prefetch_depth) as it:
                    for batch in it:
                        timer.tic()
                        state, metrics = step_fn(state, _device_batch(batch, mesh))
                        step = int(state.step)
                        if step % tcfg.log_every == 0:
                            jax.block_until_ready(metrics)
                            logger.log(step, metrics, prefix=f"epoch {epoch} ")
                        if save_every_steps and step % save_every_steps == 0:
                            # preemption safety net between per-epoch checkpoints
                            saver.save(
                                tcfg.checkpoint_dir, state, step, metric=None,
                                keep=3,
                                extra={"epoch": epoch, "epoch_complete": False,
                                       "best_acc": best_acc},
                            )
                        timer.toc()

                # ---- dev evaluation (mean over dev batches)
                dev_acc = None
                if dev_batches is not None:
                    sums: Dict[str, float] = {}
                    n = 0
                    for batch in dev_batches():
                        m = eval_fn(state.params_g, _device_batch(batch, mesh))
                        for k, v in m.items():
                            sums[k] = sums.get(k, 0.0) + float(v)
                        n += 1
                    if n:
                        dev = {k: v / n for k, v in sums.items()}
                        dev_acc = dev["acc"]
                        logger.log(int(state.step), dev, prefix=f"DEV epoch {epoch} ")

                # ---- eps-decay on plateau (reference Adadelta schedule)
                if dev_acc is not None:
                    if dev_acc > best_acc:
                        best_acc = dev_acc
                    elif tcfg.optimizer == "adadelta":
                        state = state.replace(
                            opt_state_g=steps_lib.decay_adadelta_eps(
                                state.opt_state_g, tcfg.eps_decay
                            ),
                            opt_state_d=steps_lib.decay_adadelta_eps(
                                state.opt_state_d, tcfg.eps_decay
                            ),
                        )
                        print(f"[{mode}] dev plateau at epoch {epoch}: "
                              f"eps *= {tcfg.eps_decay}", flush=True)

                saver.save(
                    tcfg.checkpoint_dir, state, int(state.step),
                    metric=dev_acc, keep=3,
                    extra={"epoch": epoch, "epoch_complete": True,
                           "best_acc": best_acc},
                )

    finally:
        logger.close()
    return state, model, disc
