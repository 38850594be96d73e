"""End-to-end drive on real hardware (the /verify recipe).

Trains the joint adversarial pipeline on the synthetic learnable task,
then decodes NOISY audio through the enhancer with greedy CTC and with the
batched beam search, checks WER -> 0, and runs the edge-case probes.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from robust_e2e_gan_tpu.config import (
    AttentionConfig, BeamSearchConfig, DecoderConfig, DiscriminatorConfig,
    E2EConfig, EncoderConfig, EnhancerConfig, FrontendConfig, JointConfig,
    TrainConfig,
)
from robust_e2e_gan_tpu.data.synthetic import (
    SyntheticConfig, labels_to_list, make_batch,
)
from robust_e2e_gan_tpu.decode.beam import make_beam_searcher
from robust_e2e_gan_tpu.models.enhancement import Discriminator
from robust_e2e_gan_tpu.ops.ctc import ctc_greedy_decode
from robust_e2e_gan_tpu.ops.editdistance import wer_details
from robust_e2e_gan_tpu.pipeline import RobustE2E
from robust_e2e_gan_tpu.train.steps import init_train_state, make_joint_train_step

VOCAB = 12
JCFG = JointConfig(
    e2e=E2EConfig(
        frontend=FrontendConfig(n_mels=40),
        encoder=EncoderConfig(input_dim=40, vgg_channels=(8, 16), num_layers=1,
                              hidden_dim=64, proj_dim=64),
        attention=AttentionConfig(dim=48, conv_channels=8, conv_kernel=31),
        decoder=DecoderConfig(vocab_size=VOCAB, embed_dim=32, hidden_dim=64),
    ),
    enhancer=EnhancerConfig(input_dim=257, num_layers=1, hidden_dim=64),
    discriminator=DiscriminatorConfig(input_dim=40, channels=(8, 16)),
)
SCFG = SyntheticConfig(vocab_size=VOCAB, min_tokens=2, max_tokens=6,
                       noise_snr_db=5.0)
TCFG = TrainConfig(optimizer="adam", learning_rate=1e-3)


def main(steps=500):
    print("backend:", jax.default_backend(), jax.devices())
    model = RobustE2E(JCFG)
    disc = Discriminator(JCFG.discriminator)
    rng = np.random.default_rng(0)
    seg = int(SCFG.tone_ms * SCFG.sample_rate / 1000.0)
    pad_to = SCFG.max_tokens * seg

    batch0 = {k: jnp.asarray(v) for k, v in
              make_batch(16, SCFG, rng, pad_to_samples=pad_to,
                         ignore_id=-1).items()}
    state, opt_g, opt_d = init_train_state(model, disc, TCFG, batch0, seed=0)
    step = make_joint_train_step(model, disc, JCFG, opt_g, opt_d, with_asr=True)

    t0 = time.time()
    for i in range(steps):
        b = make_batch(16, SCFG, rng, pad_to_samples=pad_to, ignore_id=-1)
        state, metrics = step(state, {k: jnp.asarray(v) for k, v in b.items()})
        if i % 100 == 0 or i == steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {i}: acc={m['acc']:.3f} ctc={m['loss_ctc']:.3f} "
                  f"att={m['loss_att']:.3f} d={m['loss_d']:.3f} "
                  f"({(time.time()-t0)/(i+1)*1000:.0f} ms/step)")
    assert m["acc"] > 0.9, f"training did not converge: acc={m['acc']}"

    # ---- decode NOISY eval batch through the enhancer
    eval_b = make_batch(16, SCFG, rng, pad_to_samples=pad_to, ignore_id=-1)
    wav = jnp.asarray(eval_b["noisy_wav"])
    lens = jnp.asarray(eval_b["wav_lengths"])
    refs = labels_to_list(eval_b["labels"])

    params = state.params_g
    hs, hmask, hlens, ctc_logits, _ = model.apply(
        {"params": params}, wav, lens, True,
        method=RobustE2E.encode_for_decode,
    )
    greedy = np.asarray(ctc_greedy_decode(ctc_logits, hlens, blank_id=0))
    hyps_g = [[int(x) for x in row if x != -1] for row in greedy]
    wer_g = wer_details(refs, hyps_g)
    print("greedy WER:", wer_g)

    bcfg = BeamSearchConfig(beam_size=4, ctc_weight=0.3, max_steps=10)
    searcher = make_beam_searcher(model, JCFG.e2e, bcfg, use_enhancer=True)
    res = searcher(params, wav, lens)
    hyps_b = [[int(x) for x in row if x != -1] for row in np.asarray(res.tokens)]
    wer_b = wer_details(refs, hyps_b)
    print("beam   WER:", wer_b)
    assert wer_g["error_rate"] <= 0.05, wer_g
    assert wer_b["error_rate"] <= wer_g["error_rate"] + 1e-9, (wer_b, wer_g)

    # ---- bf16 serving parity: same f32 params, bf16 compute (bench path)
    import dataclasses

    from robust_e2e_gan_tpu.pipeline import build_model

    model_bf16 = build_model(
        dataclasses.replace(JCFG, compute_dtype="bfloat16")
    )
    searcher_bf = make_beam_searcher(
        model_bf16, JCFG.e2e, bcfg, use_enhancer=True
    )
    res_bf = searcher_bf(params, wav, lens)
    hyps_bf = [
        [int(x) for x in row if x != -1] for row in np.asarray(res_bf.tokens)
    ]
    wer_bf = wer_details(refs, hyps_bf)
    print("beam   WER (bf16 compute):", wer_bf)
    assert wer_bf["error_rate"] <= wer_b["error_rate"] + 0.02, (wer_bf, wer_b)

    # ---- probes
    e1, m1, f1 = model.apply({"params": params}, wav[:1], lens[:1],
                             method=RobustE2E.enhance)
    assert np.isfinite(np.asarray(e1)).all()
    ys_ign = jnp.full_like(jnp.asarray(eval_b["labels"][:2]), -1)
    out = model.apply({"params": params}, wav[:2], lens[:2], ys_ign,
                      method=RobustE2E.asr_forward)
    assert np.isfinite(float(out["loss"])), out
    short = jnp.zeros((1, wav.shape[1]), jnp.float32)
    short_len = jnp.asarray([300], jnp.int32)  # < one frame
    e2, _, _ = model.apply({"params": params}, short, short_len,
                           method=RobustE2E.enhance)
    assert np.isfinite(np.asarray(e2)).all()
    print("probes OK")
    drive_loop_and_data()
    print("VERIFY PASS")


def drive_loop_and_data():
    """Drive the dataset layer + training driver + checkpoint resume
    through the public API (train/loop.py, data/dataset.py)."""
    import json
    import tempfile

    from robust_e2e_gan_tpu.data.dataset import AudioTextDataset, BucketBatcher
    from robust_e2e_gan_tpu.data.synthetic import synth_utterance
    from robust_e2e_gan_tpu.train.loop import train
    from robust_e2e_gan_tpu.utils import checkpoint as ckpt

    tmp = tempfile.mkdtemp(prefix="rg_verify_")
    rng = np.random.default_rng(0)
    alphabet = "abcdefghij"  # 10 chars -> ids 3..12 after specials
    entries = []
    for i in range(8):
        n_tok = int(rng.integers(2, 5))
        toks = rng.integers(2, VOCAB, size=(n_tok,)).astype(np.int32)
        clean, noisy = synth_utterance(toks, SCFG, rng)
        np.save(f"{tmp}/n{i}.npy", noisy)
        np.save(f"{tmp}/c{i}.npy", clean)
        text = "".join(alphabet[t - 2] for t in toks)
        entries.append({"utt_id": f"u{i}", "noisy": f"n{i}.npy",
                        "clean": f"c{i}.npy", "text": text,
                        "n_samples": len(clean)})
    with open(f"{tmp}/manifest.jsonl", "w") as f:
        f.write("\n".join(json.dumps(e) for e in entries))

    ds = AudioTextDataset.from_jsonl(f"{tmp}/manifest.jsonl")
    assert 3 < ds.tokenizer.vocab_size <= VOCAB + 1  # specials + seen chars

    def batches():
        b = BucketBatcher(ds, batch_size=4,
                          length_buckets=(SCFG.max_tokens * 1920,),
                          max_label_len=8)
        return b.epoch(shuffle=False)

    jcfg2 = JCFG  # vocab 13 needed (tokenizer adds <unk>): widen decoder
    from dataclasses import replace
    jcfg2 = replace(JCFG, e2e=replace(
        JCFG.e2e, decoder=replace(JCFG.e2e.decoder,
                                  vocab_size=ds.tokenizer.vocab_size)))
    tcfg = TrainConfig(optimizer="adadelta", learning_rate=1.0,
                       num_epochs=1, checkpoint_dir=f"{tmp}/ck", log_every=2)
    state1, _, _ = train(jcfg2, tcfg, batches, dev_batches=batches,
                         mode="joint", log_dir=f"{tmp}/logs")
    assert ckpt.has_checkpoint(tcfg.checkpoint_dir, "best")
    tcfg2 = TrainConfig(optimizer="adadelta", learning_rate=1.0,
                        num_epochs=2, checkpoint_dir=f"{tmp}/ck", log_every=2)
    state2, _, _ = train(jcfg2, tcfg2, batches, dev_batches=batches,
                         mode="joint", log_dir=f"{tmp}/logs")
    assert int(state2.step) == 2 * int(state1.step), (
        int(state1.step), int(state2.step))
    print("loop+data+checkpoint drive OK")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    if n == 0:  # drive only the data/loop/checkpoint section
        drive_loop_and_data()
        print("VERIFY PASS (loop/data only)")
    else:
        main(n)
