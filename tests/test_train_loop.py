"""Training-driver tests: checkpoint atomicity/retention/resume, eps-decay,
and a smoke run of the full epoch loop in each regime (SURVEY.md section 5
"Checkpoint/resume": resumable loop, best+latest retention)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from robust_e2e_gan_tpu.config import (
    AttentionConfig,
    DecoderConfig,
    DiscriminatorConfig,
    E2EConfig,
    EncoderConfig,
    EnhancerConfig,
    FrontendConfig,
    JointConfig,
    TrainConfig,
)
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.pipeline import RobustE2E
from robust_e2e_gan_tpu.train import steps as steps_lib
from robust_e2e_gan_tpu.train.loop import train
from robust_e2e_gan_tpu.utils import checkpoint as ckpt

VOCAB = 12
JCFG = JointConfig(
    e2e=E2EConfig(
        frontend=FrontendConfig(n_mels=24),
        encoder=EncoderConfig(input_dim=24, vgg_channels=(4, 8), num_layers=1,
                              hidden_dim=32, proj_dim=32),
        attention=AttentionConfig(dim=24, conv_channels=4, conv_kernel=11),
        decoder=DecoderConfig(vocab_size=VOCAB, embed_dim=16, hidden_dim=32),
    ),
    enhancer=EnhancerConfig(input_dim=257, num_layers=1, hidden_dim=32),
    discriminator=DiscriminatorConfig(input_dim=24, channels=(4, 8)),
)
SCFG = SyntheticConfig(vocab_size=VOCAB, max_tokens=3, min_tokens=2)


def _batches(n, batch_size=2, seed=0):
    def factory():
        rng = np.random.default_rng(seed)
        for _ in range(n):
            yield make_batch(batch_size, SCFG, rng, ignore_id=-1)

    return factory


def test_checkpoint_roundtrip_and_retention(tmp_path):
    d = str(tmp_path / "ck")
    state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
             "step": np.int32(0)}
    for s, metric in [(1, 0.1), (2, 0.5), (3, 0.3), (4, 0.2)]:
        st = {"w": state["w"] + s, "step": np.int32(s)}
        ckpt.save_checkpoint(d, st, s, metric=metric, keep=2)

    latest, step = ckpt.restore_checkpoint(d, state, "latest")
    assert step == 4 and latest["step"] == 4
    best, bstep = ckpt.restore_checkpoint(d, state, "best")
    assert bstep == 2  # metric 0.5 was the best
    np.testing.assert_array_equal(best["w"], state["w"] + 2)
    # retention: best + latest survive pruning
    files = [f for f in os.listdir(d) if f.endswith(".msgpack")]
    assert "ckpt_2.msgpack" in files and "ckpt_4.msgpack" in files
    assert len(files) <= 3


def test_eps_decay():
    tcfg = TrainConfig(optimizer="adadelta", adadelta_eps=1e-8)
    opt = steps_lib.create_optimizer(tcfg)
    params = {"w": jnp.ones((3,))}
    st = opt.init(params)
    st2 = steps_lib.decay_adadelta_eps(st, 0.5)
    assert float(st2[1].hyperparams["eps"]) == pytest.approx(5e-9)
    # update still works after decay
    g = {"w": jnp.ones((3,))}
    upd, _ = opt.update(g, st2, params)
    assert np.isfinite(np.asarray(upd["w"])).all()
    # adam path: no-op
    tcfg_a = TrainConfig(optimizer="adam", learning_rate=1e-3)
    opt_a = steps_lib.create_optimizer(tcfg_a)
    st_a = opt_a.init(params)
    assert steps_lib.decay_adadelta_eps(st_a, 0.5) == st_a


def test_adam_warmup_schedule():
    """warmup_steps>0 linearly ramps the adam LR: the first update is
    ~1/warmup the size of the post-warmup update for identical grads."""
    params = {"w": jnp.zeros((4,))}
    g = {"w": jnp.ones((4,))}

    def nth_update_norm(tcfg, n):
        opt = steps_lib.create_optimizer(tcfg)
        st = opt.init(params)
        for _ in range(n):
            upd, st = opt.update(g, st, params)
        return float(jnp.linalg.norm(upd["w"]))

    warm = TrainConfig(optimizer="adam", learning_rate=1e-3, warmup_steps=10)
    flat = TrainConfig(optimizer="adam", learning_rate=1e-3)
    # step 1 under warmup is ~10x smaller than without
    assert nth_update_norm(warm, 1) < 0.2 * nth_update_norm(flat, 1)
    # by the end of warmup the step size matches the flat schedule
    assert nth_update_norm(warm, 12) == pytest.approx(
        nth_update_norm(flat, 12), rel=0.05)


@pytest.mark.parametrize("mode", ["asr", "gan", "joint"])
def test_train_loop_smoke(tmp_path, mode):
    tcfg = TrainConfig(
        optimizer="adam", learning_rate=1e-3, num_epochs=1,
        checkpoint_dir=str(tmp_path / f"ck_{mode}"), log_every=1,
    )
    state, model, disc = train(
        JCFG, tcfg, _batches(2), dev_batches=_batches(1),
        mode=mode, log_dir=str(tmp_path / "logs"),
    )
    assert int(state.step) == 2
    assert ckpt.has_checkpoint(tcfg.checkpoint_dir)
    assert ckpt.has_checkpoint(tcfg.checkpoint_dir, "best")


def test_resume_reads_sidecar_not_corpus(tmp_path):
    """Resume must not exhaust an epoch iterator to count steps (round-1
    VERDICT weak #2): the epoch counter travels in the checkpoint sidecar."""
    tcfg = TrainConfig(
        optimizer="adam", learning_rate=1e-3, num_epochs=1,
        checkpoint_dir=str(tmp_path / "ck"), log_every=10,
    )
    train(JCFG, tcfg, _batches(2), dev_batches=_batches(1), mode="asr")
    extra = ckpt.read_extra(tcfg.checkpoint_dir)
    assert extra["epoch"] == 0 and extra["epoch_complete"] is True
    assert np.isfinite(extra["best_acc"])

    yielded = {"n": 0}
    inner = _batches(2)

    def counting_factory():
        for b in inner():
            yielded["n"] += 1
            yield b

    tcfg2 = TrainConfig(
        optimizer="adam", learning_rate=1e-3, num_epochs=2,
        checkpoint_dir=str(tmp_path / "ck"), log_every=10,
    )
    state2, _, _ = train(JCFG, tcfg2, counting_factory, mode="asr")
    assert int(state2.step) == 4
    # 1 sample batch (init shapes) + 2 batches of the single resumed epoch;
    # a counting pass would add 2 more
    assert yielded["n"] == 3


def test_best_acc_survives_preemption(tmp_path):
    """eps-decay plateau state resumes: best_acc is restored from the
    sidecar, so the first post-resume epoch compares against the true best
    (round-1 VERDICT weak #3)."""
    d = str(tmp_path / "ck")
    tcfg = TrainConfig(
        optimizer="adam", learning_rate=1e-3, num_epochs=1,
        checkpoint_dir=d, log_every=10,
    )
    train(JCFG, tcfg, _batches(2), dev_batches=_batches(1), mode="asr")
    best0 = ckpt.read_extra(d)["best_acc"]
    tcfg2 = TrainConfig(
        optimizer="adam", learning_rate=1e-3, num_epochs=2,
        checkpoint_dir=d, log_every=10,
    )
    train(JCFG, tcfg2, _batches(2), dev_batches=_batches(1), mode="asr")
    # monotone: the resumed epoch can only raise the recorded best
    assert ckpt.read_extra(d)["best_acc"] >= best0


def test_train_loop_resume(tmp_path):
    tcfg = TrainConfig(
        optimizer="adam", learning_rate=1e-3, num_epochs=1,
        checkpoint_dir=str(tmp_path / "ck"), log_every=10,
    )
    state1, _, _ = train(JCFG, tcfg, _batches(2), mode="asr")
    # second call with num_epochs=2 resumes from epoch 1, runs 1 more epoch
    tcfg2 = TrainConfig(
        optimizer="adam", learning_rate=1e-3, num_epochs=2,
        checkpoint_dir=str(tmp_path / "ck"), log_every=10,
    )
    state2, _, _ = train(JCFG, tcfg2, _batches(2), mode="asr")
    assert int(state2.step) == 4


def test_metric_logger_header_tracks_fields(tmp_path):
    """Mid-run metric key changes rewrite the CSV header so rows never
    misalign (round-1 ADVICE low)."""
    import csv

    from robust_e2e_gan_tpu.utils.logging import MetricLogger

    d = str(tmp_path)
    lg = MetricLogger(d, name="t")
    lg.log(1, {"loss": 1.0})
    lg.log(2, {"loss": 0.5, "acc": 0.9})  # key set grows mid-run
    lg.close()
    # a fresh process appending with the same fields must NOT duplicate
    lg2 = MetricLogger(d, name="t")
    lg2.log(3, {"loss": 0.4, "acc": 0.95})
    lg2.close()

    with open(os.path.join(d, "t_metrics.csv"), newline="") as f:
        rows = list(csv.reader(f))
    headers = [r for r in rows if r and r[0] == "acc"]
    assert len(headers) == 1  # one header for the grown field set, no dupes
    # every data row aligns with the header that precedes it
    current = None
    for r in rows:
        try:
            float(r[0])
        except ValueError:
            current = r
            continue
        assert len(r) == len(current)


def test_checkpoint_atomic_under_sigkill(tmp_path):
    """Preemption safety (SURVEY section 5): SIGKILL during a checkpoint
    write must never corrupt the restorable 'latest' state."""
    import signal
    import subprocess
    import sys
    import time

    d = str(tmp_path / "ck")
    child_src = f"""
import numpy as np, sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax
jax.config.update("jax_platforms", "cpu")
from robust_e2e_gan_tpu.utils import checkpoint as ckpt
i = 0
while True:
    i += 1
    # ~8 MB payload widens the write window the kill can land in
    st = {{"w": np.full((1024, 1024), float(i), np.float32),
          "step": np.int64(i)}}
    ckpt.save_checkpoint({d!r}, st, i, metric=float(i), keep=2)
"""
    for trial in range(3):
        p = subprocess.Popen([sys.executable, "-c", child_src])
        # wait for the first completed save (imports take seconds), then
        # let a few more saves race the kill
        deadline = time.time() + 60
        while time.time() < deadline and not ckpt.has_checkpoint(d):
            time.sleep(0.1)
        assert ckpt.has_checkpoint(d), "child never wrote a checkpoint"
        time.sleep(0.3 + 0.35 * trial)
        p.send_signal(signal.SIGKILL)
        p.wait()

        assert ckpt.has_checkpoint(d), "no restorable checkpoint after kill"
        template = {"w": np.zeros((1024, 1024), np.float32),
                    "step": np.int64(0)}
        st, step = ckpt.restore_checkpoint(d, template)
        assert step >= 1
        # payload must be internally consistent with its step
        assert float(st["step"]) == float(step)
        np.testing.assert_array_equal(
            st["w"], np.full((1024, 1024), float(step), np.float32)
        )


def test_async_checkpointer(tmp_path):
    """AsyncCheckpointer: identical artifacts to the sync save, strict
    ordering across rapid saves, worker errors re-raised on wait()."""
    import json

    state = {"w": jnp.arange(12.0).reshape(3, 4), "step": jnp.asarray(7)}
    sync_dir = str(tmp_path / "sync")
    async_dir = str(tmp_path / "async")
    ckpt.save_checkpoint(sync_dir, state, 7, metric=0.5,
                         extra={"epoch": 1})

    with ckpt.AsyncCheckpointer() as saver:
        saver.save(async_dir, state, 7, metric=0.5, extra={"epoch": 1})
        # rapid second save: must land after the first (latest == step 9)
        state2 = {"w": state["w"] * 2, "step": jnp.asarray(9)}
        saver.save(async_dir, state2, 9, metric=0.7, extra={"epoch": 2})
    # after the context exits, both writes are durable
    with open(os.path.join(sync_dir, "ckpt_7.msgpack"), "rb") as f:
        want = f.read()
    with open(os.path.join(async_dir, "ckpt_7.msgpack"), "rb") as f:
        got = f.read()
    assert want == got
    meta = json.load(open(os.path.join(async_dir, "checkpoints.json")))
    assert meta["latest"]["step"] == 9
    assert meta["best"]["step"] == 9  # 0.7 beat 0.5
    restored, step = ckpt.restore_checkpoint(async_dir, state, "latest")
    assert step == 9
    np.testing.assert_array_equal(
        np.asarray(restored["w"]), np.asarray(state2["w"])
    )

    # donation-safety: mutating/rebinding the device state after save()
    # returns must not affect the in-flight write (host pull is eager)
    saver2 = ckpt.AsyncCheckpointer()
    s3 = {"w": jnp.ones((2, 2)), "step": jnp.asarray(11)}
    saver2.save(async_dir, s3, 11)
    del s3
    saver2.wait()
    r3, _ = ckpt.restore_checkpoint(async_dir, state, "latest")
    np.testing.assert_array_equal(np.asarray(r3["w"]), np.ones((2, 2)))

    # error propagation: unwritable target raises on wait()
    bad = ckpt.AsyncCheckpointer()
    blocked = tmp_path / "blocked"
    blocked.write_text("a file, not a directory")
    bad.save(str(blocked), state, 1)
    with pytest.raises(Exception):
        bad.wait()


def test_async_save_drains_when_body_raises(tmp_path):
    """An exception inside `with saver:` (how train() runs it) must still
    drain the in-flight write — the preemption-net checkpoint survives a
    crashed step instead of dying with the daemon thread."""
    state = {"w": jnp.full((2, 2), 3.0), "step": jnp.asarray(5)}
    d = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="step blew up"):
        with ckpt.AsyncCheckpointer() as saver:
            saver.save(d, state, 5, extra={"epoch": 0})
            raise RuntimeError("step blew up")
    restored, step = ckpt.restore_checkpoint(d, state, "latest")
    assert step == 5
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.full((2, 2), 3.0))
