"""End-to-end CLI tests: train via train/cli.py on a jsonl manifest, decode
and score via decode/cli.py (reference L4/L5 entry-point parity)."""

import json
import os

import numpy as np
import pytest

from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, synth_utterance
from robust_e2e_gan_tpu.decode import cli as decode_cli
from robust_e2e_gan_tpu.train import cli as train_cli

ALPHABET = "abcdefghij"
SCFG = SyntheticConfig(vocab_size=12, min_tokens=2, max_tokens=4)


@pytest.fixture(scope="module")
def manifest(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    entries = []
    for i in range(8):
        n_tok = int(rng.integers(2, 5))
        toks = rng.integers(2, 12, size=(n_tok,)).astype(np.int32)
        clean, noisy = synth_utterance(toks, SCFG, rng)
        np.save(tmp / f"n{i}.npy", noisy)
        np.save(tmp / f"c{i}.npy", clean)
        entries.append({
            "utt_id": f"u{i}", "noisy": f"n{i}.npy", "clean": f"c{i}.npy",
            "text": "".join(ALPHABET[t - 2] for t in toks),
            "n_samples": len(clean),
        })
    mf = tmp / "manifest.jsonl"
    mf.write_text("\n".join(json.dumps(e) for e in entries))
    return str(mf)


def test_train_and_decode_cli(manifest, tmp_path):
    ckpt = str(tmp_path / "exp")
    train_cli.main([
        "--mode", "joint",
        "--train-manifest", manifest, "--dev-manifest", manifest,
        "--ckpt-dir", ckpt, "--epochs", "1", "--batch-size", "4",
        "--optimizer", "adam", "--lr", "1e-3", "--warmup-steps", "2",
        "--n-mels", "24", "--enc-layers", "1", "--enc-hidden", "32",
        "--enc-proj", "32", "--att-dim", "24", "--dec-hidden", "32",
        "--dec-embed", "16", "--enh-layers", "1", "--enh-hidden", "32",
        "--length-buckets", "16000",
        "--max-label-len", "8", "--log-every", "1",
    ])
    assert os.path.exists(os.path.join(ckpt, "config.json"))
    with open(os.path.join(ckpt, "config.json")) as f:
        saved = json.load(f)
    assert saved["train"]["warmup_steps"] == 2  # CLI flag lands in config
    assert os.path.exists(os.path.join(ckpt, "tokenizer.json"))
    assert os.path.exists(os.path.join(ckpt, "joint_metrics.csv"))

    # batch 3 over 8 utts: the ragged final batch (2 utts) exercises
    # pad_final — it must decode at the static batch shape yet report
    # exactly the 8 real utterances once each
    out = str(tmp_path / "dec")
    decode_cli.main([
        "--manifest", manifest, "--ckpt-dir", ckpt, "--out", out,
        "--batch-size", "3", "--beam-size", "3", "--max-steps", "6",
        "--length-buckets", "16000",
    ])
    with open(os.path.join(out, "wer.json")) as f:
        report = json.load(f)
    assert report["n_utts"] == 8
    assert report["decoder"] == "beam3"
    hyp = open(os.path.join(out, "hyp.txt")).read().strip().splitlines()
    assert len(hyp) == 8 and all(line.split()[0].startswith("u") for line in hyp)
    assert len({line.split()[0] for line in hyp}) == 8  # no pad duplicates

    # --pipelined on: cross-batch staged schedule, identical transcripts
    outp = str(tmp_path / "dec_pipe")
    decode_cli.main([
        "--manifest", manifest, "--ckpt-dir", ckpt, "--out", outp,
        "--batch-size", "3", "--beam-size", "3", "--max-steps", "6",
        "--length-buckets", "16000", "--pipelined", "on",
    ])
    hyp_pipe = open(os.path.join(outp, "hyp.txt")).read()
    assert hyp_pipe == open(os.path.join(out, "hyp.txt")).read()

    # --pipelined chunked: next batch's encode inside the beam scan;
    # transcripts must still be identical (early-exit is disabled under
    # this schedule but is itself token-exact)
    outc = str(tmp_path / "dec_chunked")
    decode_cli.main([
        "--manifest", manifest, "--ckpt-dir", ckpt, "--out", outc,
        "--batch-size", "3", "--beam-size", "3", "--max-steps", "6",
        "--length-buckets", "16000", "--pipelined", "chunked",
    ])
    hyp_chunked = open(os.path.join(outc, "hyp.txt")).read()
    assert hyp_chunked == open(os.path.join(out, "hyp.txt")).read()

    # greedy path too
    out2 = str(tmp_path / "dec_greedy")
    decode_cli.main([
        "--manifest", manifest, "--ckpt-dir", ckpt, "--out", out2,
        "--batch-size", "4", "--greedy", "--length-buckets", "16000",
    ])
    assert os.path.exists(os.path.join(out2, "wer.json"))

    # enhancement-only inference -> Kaldi ark/scp (SURVEY.md call stack 3.3)
    from robust_e2e_gan_tpu.data import kaldi_io
    from robust_e2e_gan_tpu.decode import enhance_cli

    enh_out = str(tmp_path / "enh" / "feats")
    enhance_cli.main([
        "--manifest", manifest, "--ckpt-dir", ckpt, "--out", enh_out,
        "--batch-size", "4", "--length-buckets", "16000",
        "--domain", "logmel",
    ])
    got = dict(kaldi_io.read_mat_scp(enh_out + ".scp"))
    assert len(got) == 8
    for k, m in got.items():
        assert m.ndim == 2 and m.shape[1] == 24  # n_mels
        assert np.isfinite(m).all()


def test_global_cmvn_cli(manifest, tmp_path):
    """--cmvn global end-to-end: stats ark -> train -> decode reloads it."""
    from robust_e2e_gan_tpu.data.cmvn import CmvnAccumulator, save_cmvn_ark

    acc = CmvnAccumulator(24)
    acc.add(np.random.default_rng(0).standard_normal((50, 24)) * 2 + 1)
    ark = str(tmp_path / "cmvn.ark")
    save_cmvn_ark(acc.stats(), ark)

    ckpt = str(tmp_path / "exp_cmvn")
    train_cli.main([
        "--mode", "asr",
        "--train-manifest", manifest,
        "--ckpt-dir", ckpt, "--epochs", "1", "--batch-size", "4",
        "--optimizer", "adam", "--lr", "1e-3",
        "--n-mels", "24", "--enc-layers", "1", "--enc-hidden", "32",
        "--enc-proj", "32", "--att-dim", "24", "--dec-hidden", "32",
        "--dec-embed", "16", "--enh-layers", "1", "--enh-hidden", "32",
        "--length-buckets", "16000", "--max-label-len", "8",
        "--cmvn", "global", "--cmvn-ark", ark,
    ])
    assert os.path.exists(os.path.join(ckpt, "cmvn.ark"))

    out = str(tmp_path / "dec_cmvn")
    decode_cli.main([
        "--manifest", manifest, "--ckpt-dir", ckpt, "--out", out,
        "--batch-size", "4", "--greedy", "--length-buckets", "16000",
    ])
    with open(os.path.join(out, "wer.json")) as f:
        assert json.load(f)["n_utts"] == 8


def test_nbest_and_attention_dump(manifest, tmp_path):
    """--nbest writes ranked beam hypotheses; --dump-attention writes
    per-utterance teacher-forced alignment maps."""
    ckpt = str(tmp_path / "exp_nb")
    train_cli.main([
        "--mode", "asr",
        "--train-manifest", manifest, "--dev-manifest", manifest,
        "--ckpt-dir", ckpt, "--epochs", "1", "--batch-size", "4",
        "--optimizer", "adam", "--lr", "1e-3",
        "--n-mels", "24", "--enc-layers", "1", "--enc-hidden", "32",
        "--enc-proj", "32", "--att-dim", "24", "--dec-hidden", "32",
        "--dec-embed", "16", "--enh-layers", "1", "--enh-hidden", "32",
        "--length-buckets", "16000", "--max-label-len", "8",
    ])
    out = str(tmp_path / "dec_nb")
    decode_cli.main([
        "--manifest", manifest, "--ckpt-dir", ckpt, "--out", out,
        "--batch-size", "4", "--beam-size", "3", "--max-steps", "6",
        "--length-buckets", "16000", "--nbest", "2", "--dump-attention",
    ])
    rows = [json.loads(l) for l in
            open(os.path.join(out, "nbest.jsonl")) if l.strip()]
    assert len(rows) == 8
    for r in rows:
        assert len(r["nbest"]) == 2
        scores = [e["score"] for e in r["nbest"]]
        assert scores == sorted(scores, reverse=True)
    att_files = os.listdir(os.path.join(out, "att"))
    assert len(att_files) == 8
    a = np.load(os.path.join(out, "att", att_files[0]))
    assert a.ndim == 2 and np.all(a >= 0)
    np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-4)

    # the .npy dumps render to PNG heatmaps (reference's attention plots)
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.plot_attention import plot_dir

    png_dir = str(tmp_path / "att_png")
    n = plot_dir(os.path.join(out, "att"), png_dir, limit=2)
    assert n == 2
    pngs = [f for f in os.listdir(png_dir) if f.endswith(".png")]
    assert len(pngs) == 2 and all(
        os.path.getsize(os.path.join(png_dir, f)) > 1000 for f in pngs
    )


def test_lm_train_and_fusion_cli(tmp_path):
    """--mode lm trains an RNNLM on synthetic transcripts; load_lm restores
    it; perplexity drops below the uniform baseline."""
    import numpy as np
    import jax.numpy as jnp

    from robust_e2e_gan_tpu.data.synthetic import (
        SyntheticConfig, sample_transcript,
    )
    from robust_e2e_gan_tpu.models.e2e import add_sos_eos
    from robust_e2e_gan_tpu.models.lm import lm_loss
    from robust_e2e_gan_tpu.train.lm import load_lm

    lm_dir = str(tmp_path / "lm")
    train_cli.main([
        "--mode", "lm", "--synthetic", "--synthetic-utts", "256",
        "--ckpt-dir", lm_dir, "--epochs", "3", "--batch-size", "16",
        "--optimizer", "adam", "--lr", "1e-2",
        "--dec-embed", "16", "--dec-hidden", "32", "--log-every", "5",
    ])
    assert os.path.exists(os.path.join(lm_dir, "config.json"))
    lm, params = load_lm(lm_dir)

    scfg = SyntheticConfig(seed=99)
    rng = np.random.default_rng(99)
    ys = np.full((16, scfg.max_label_len), -1, np.int32)
    for i in range(16):
        t = sample_transcript(scfg, rng)
        ys[i, : len(t)] = t
    ys_in, ys_out, _ = add_sos_eos(jnp.asarray(ys), 1, 1, -1)
    logits = lm.apply({"params": params}, ys_in)
    loss, ppl = lm_loss(logits, ys_out, -1)
    # trained LM must beat the uniform distribution over the vocab
    assert float(ppl) < scfg.vocab_size, float(ppl)


def test_speaker_cmvn_cli(manifest, tmp_path):
    """--cmvn speaker end-to-end: speaker-keyed stats ark + utt2spk ->
    train -> decode reloads both (Kaldi apply-cmvn --utt2spk parity)."""
    from robust_e2e_gan_tpu.data.cmvn import CmvnAccumulator, SpeakerCmvn
    from robust_e2e_gan_tpu.data import kaldi_io

    rng = np.random.default_rng(3)
    ark = str(tmp_path / "spk_cmvn.ark")
    with open(ark, "wb") as f:
        for spk in ("s0", "s1"):
            acc = CmvnAccumulator(24)
            acc.add(rng.standard_normal((60, 24)) * 2.0 + 0.5)
            kaldi_io.write_mat(f, spk, acc.stats())
    u2s = str(tmp_path / "utt2spk")
    with open(u2s, "w") as f:
        for i in range(8):
            f.write(f"u{i} s{i % 2}\n")

    # unit: lookup stacks the right speaker stats per utterance
    sc = SpeakerCmvn.load(ark, u2s)
    mean, inv_std = sc.lookup(["u0", "u1", "u2"])
    assert mean.shape == (3, 24) and inv_std.shape == (3, 24)
    np.testing.assert_array_equal(mean[0], mean[2])  # both s0
    assert not np.array_equal(mean[0], mean[1])

    ckpt = str(tmp_path / "exp_spk")
    train_cli.main([
        "--mode", "asr",
        "--train-manifest", manifest,
        "--ckpt-dir", ckpt, "--epochs", "1", "--batch-size", "4",
        "--optimizer", "adam", "--lr", "1e-3",
        "--n-mels", "24", "--enc-layers", "1", "--enc-hidden", "32",
        "--enc-proj", "32", "--att-dim", "24", "--dec-hidden", "32",
        "--dec-embed", "16", "--enh-layers", "1", "--enh-hidden", "32",
        "--length-buckets", "16000", "--max-label-len", "8",
        "--cmvn", "speaker", "--cmvn-ark", ark, "--utt2spk", u2s,
    ])
    assert os.path.exists(os.path.join(ckpt, "cmvn.ark"))

    out = str(tmp_path / "dec_spk")
    decode_cli.main([
        "--manifest", manifest, "--ckpt-dir", ckpt, "--out", out,
        "--batch-size", "4", "--greedy", "--length-buckets", "16000",
        "--utt2spk", u2s,
    ])
    with open(os.path.join(out, "wer.json")) as f:
        rep = json.load(f)
    assert rep["n_utts"] == 8 and "wer" in rep and "cer" in rep


def test_feats_scp_train_and_decode(tmp_path):
    """Precomputed-features path (the reference's actual input, SURVEY L1):
    Kaldi feats.scp (one entry compressed) -> --mode asr train -> decode."""
    from robust_e2e_gan_tpu.data import kaldi_io

    rng = np.random.default_rng(5)
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    texts = []
    with open(ark, "wb") as f, open(scp, "w") as s:
        for i in range(8):
            t = int(rng.integers(40, 80))
            mat = rng.standard_normal((t, 24)).astype(np.float32)
            if i % 2:  # mix compressed and raw entries
                off = kaldi_io.write_compressed_mat(f, f"u{i}", mat, fmt=1)
            else:
                off = kaldi_io.write_mat(f, f"u{i}", mat)
            s.write(f"u{i} {ark}:{off}\n")
            texts.append(f"u{i} " + "ab"[i % 2] * 3)
    (tmp_path / "text").write_text("\n".join(texts))

    ckpt = str(tmp_path / "exp_feats")
    train_cli.main([
        "--mode", "asr",
        "--train-feats-scp", scp, "--train-text", str(tmp_path / "text"),
        "--ckpt-dir", ckpt, "--epochs", "1", "--batch-size", "4",
        "--optimizer", "adam", "--lr", "1e-3",
        "--n-mels", "24", "--enc-layers", "1", "--enc-hidden", "32",
        "--enc-proj", "32", "--att-dim", "24", "--dec-hidden", "32",
        "--dec-embed", "16", "--enh-layers", "1", "--enh-hidden", "32",
        "--length-buckets", "96", "--max-label-len", "8",
    ])
    with open(os.path.join(ckpt, "config.json")) as f:
        assert json.load(f)["input_kind"] == "feats"

    out = str(tmp_path / "dec_feats")
    decode_cli.main([
        "--feats-scp", scp, "--text", str(tmp_path / "text"),
        "--ckpt-dir", ckpt, "--out", out,
        "--batch-size", "4", "--beam-size", "3", "--max-steps", "6",
        "--length-buckets", "96",
    ])
    with open(os.path.join(out, "wer.json")) as f:
        rep = json.load(f)
    assert rep["n_utts"] == 8 and "wer" in rep

    # greedy path too
    out2 = str(tmp_path / "dec_feats_g")
    decode_cli.main([
        "--feats-scp", scp, "--text", str(tmp_path / "text"),
        "--ckpt-dir", ckpt, "--out", out2,
        "--batch-size", "4", "--greedy", "--length-buckets", "96",
    ])
    assert os.path.exists(os.path.join(out2, "wer.json"))


def test_decode_cli_mesh_and_beam_flags(manifest, tmp_path):
    """--mesh-data DP serving + --end-detect/--no-early-exit flags through
    the CLI produce the same hypotheses as the plain single-device decode."""
    ckpt = str(tmp_path / "exp_mesh")
    train_cli.main([
        "--mode", "asr",
        "--train-manifest", manifest,
        "--ckpt-dir", ckpt, "--epochs", "1", "--batch-size", "4",
        "--optimizer", "adam", "--lr", "1e-3",
        "--n-mels", "24", "--enc-layers", "1", "--enc-hidden", "32",
        "--enc-proj", "32", "--att-dim", "24", "--dec-hidden", "32",
        "--dec-embed", "16", "--enh-layers", "1", "--enh-hidden", "32",
        "--length-buckets", "16000", "--max-label-len", "8",
    ])
    def decode(out, extra):
        decode_cli.main([
            "--manifest", manifest, "--ckpt-dir", ckpt, "--out", out,
            "--batch-size", "4", "--beam-size", "3", "--max-steps", "6",
            "--length-buckets", "16000", "--no-enhancer", *extra,
        ])
        return open(os.path.join(out, "hyp.txt")).read()

    plain = decode(str(tmp_path / "d0"), [])
    mesh = decode(str(tmp_path / "d1"), ["--mesh-data", "4"])
    assert mesh == plain  # DP sharding is numerically transparent here
    flags = decode(str(tmp_path / "d2"),
                   ["--end-detect", "--no-early-exit"])
    assert flags.count("\n") == plain.count("\n")


def test_spectrogram_feats_joint_train_and_decode(tmp_path):
    """Spectrogram-features enhancement variant (round-2 VERDICT missing
    #3): precomputed linear power spectra at n_fft//2+1 dims train --mode
    joint (enhancer in the loop) and decode through the same path."""
    from robust_e2e_gan_tpu.data import kaldi_io

    rng = np.random.default_rng(9)
    n_freqs = 257  # FrontendConfig default n_fft=512
    noisy_ark = str(tmp_path / "noisy.ark")
    noisy_scp = str(tmp_path / "noisy.scp")
    clean_ark = str(tmp_path / "clean.ark")
    clean_scp = str(tmp_path / "clean.scp")
    texts = []
    with open(noisy_ark, "wb") as nf, open(noisy_scp, "w") as ns, \
            open(clean_ark, "wb") as cf, open(clean_scp, "w") as cs:
        for i in range(8):
            t = int(rng.integers(30, 60))
            clean = (rng.standard_normal((t, n_freqs)) ** 2).astype(
                np.float32
            )
            noisy = clean + 0.5 * (
                rng.standard_normal((t, n_freqs)) ** 2
            ).astype(np.float32)
            ns.write(f"u{i} {noisy_ark}:"
                     f"{kaldi_io.write_mat(nf, f'u{i}', noisy)}\n")
            cs.write(f"u{i} {clean_ark}:"
                     f"{kaldi_io.write_mat(cf, f'u{i}', clean)}\n")
            texts.append(f"u{i} " + "ab"[i % 2] * 3)
    (tmp_path / "text").write_text("\n".join(texts))

    ckpt = str(tmp_path / "exp_spec")
    train_cli.main([
        "--mode", "joint",
        "--train-feats-scp", noisy_scp,
        "--train-clean-feats-scp", clean_scp,
        "--feats-kind", "spectrogram",
        "--train-text", str(tmp_path / "text"),
        "--ckpt-dir", ckpt, "--epochs", "1", "--batch-size", "4",
        "--optimizer", "adam", "--lr", "1e-3",
        "--n-mels", "24", "--enc-layers", "1", "--enc-hidden", "32",
        "--enc-proj", "32", "--att-dim", "24", "--dec-hidden", "32",
        "--dec-embed", "16", "--enh-layers", "1", "--enh-hidden", "32",
        "--length-buckets", "64", "--max-label-len", "8",
    ])
    with open(os.path.join(ckpt, "config.json")) as f:
        saved = json.load(f)
    assert saved["input_kind"] == "spec"
    assert saved["spec_log_domain"] is False

    out = str(tmp_path / "dec_spec")
    decode_cli.main([
        "--feats-scp", noisy_scp, "--text", str(tmp_path / "text"),
        "--ckpt-dir", ckpt, "--out", out,
        "--batch-size", "4", "--beam-size", "3", "--max-steps", "6",
        "--length-buckets", "64",
    ])
    with open(os.path.join(out, "wer.json")) as f:
        rep = json.load(f)
    assert rep["n_utts"] == 8 and "wer" in rep

    # greedy + cascade-off baseline through the same spec path
    out2 = str(tmp_path / "dec_spec_g")
    decode_cli.main([
        "--feats-scp", noisy_scp, "--text", str(tmp_path / "text"),
        "--ckpt-dir", ckpt, "--out", out2,
        "--batch-size", "4", "--greedy", "--no-enhancer",
        "--length-buckets", "64",
    ])
    assert os.path.exists(os.path.join(out2, "wer.json"))


def test_compute_cmvn_cli(manifest, tmp_path):
    """cmvn_cli (compute-cmvn-stats parity): feats.scp, wav manifest, and
    per-speaker modes all produce stats the consumers reload correctly."""
    from robust_e2e_gan_tpu.data import cmvn_cli, kaldi_io
    from robust_e2e_gan_tpu.data.cmvn import (
        SpeakerCmvn, load_cmvn_ark, stats_to_mean_inv_std,
    )

    # --feats-scp: stats must equal direct numpy moments over all frames
    rng = np.random.default_rng(7)
    mats = {f"u{i}": rng.standard_normal((20 + i, 24)).astype(np.float32) * 2
            for i in range(4)}
    feats_pfx = str(tmp_path / "feats")
    kaldi_io.write_ark_scp(mats.items(), feats_pfx + ".ark", feats_pfx + ".scp")
    out = str(tmp_path / "cmvn.ark")
    cmvn_cli.main(["--feats-scp", feats_pfx + ".scp", "--out", out])
    mean, inv_std = stats_to_mean_inv_std(load_cmvn_ark(out))
    allf = np.concatenate(list(mats.values()), axis=0).astype(np.float64)
    np.testing.assert_allclose(mean, allf.mean(0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        inv_std, 1.0 / np.sqrt(allf.var(0) + 0), rtol=1e-3)

    # --utt2spk: one stats key per speaker, loadable by SpeakerCmvn
    u2s = str(tmp_path / "utt2spk")
    with open(u2s, "w") as f:
        for i in range(4):
            f.write(f"u{i} s{i % 2}\n")
    out_spk = str(tmp_path / "cmvn_spk.ark")
    cmvn_cli.main(["--feats-scp", feats_pfx + ".scp", "--out", out_spk,
                   "--utt2spk", u2s])
    keys = [k for k, _ in kaldi_io.read_mat_ark(out_spk)]
    assert keys == ["s0", "s1"]
    sc = SpeakerCmvn.load(out_spk, u2s)
    m0, _ = sc.lookup(["u0"])
    s0f = np.concatenate([mats["u0"], mats["u2"]], 0).astype(np.float64)
    np.testing.assert_allclose(m0[0], s0f.mean(0), rtol=1e-4, atol=1e-5)

    # --manifest (waveform source): stats match running the pipeline's own
    # frontend directly on the same wavs
    out_wav = str(tmp_path / "cmvn_wav.ark")
    cmvn_cli.main(["--manifest", manifest, "--out", out_wav,
                   "--n-mels", "24"])
    import jax.numpy as jnp

    from robust_e2e_gan_tpu.config import FrontendConfig
    from robust_e2e_gan_tpu.ops.fbank import fbank

    cfg = FrontendConfig(n_mels=24)
    frames = []
    with open(manifest) as f:
        for line in f:
            d = json.loads(line)
            wav = np.load(os.path.join(os.path.dirname(manifest), d["noisy"]))
            feats, _ = fbank(jnp.asarray(wav, jnp.float32)[None], cfg,
                             cmvn="none")
            frames.append(np.asarray(feats[0], np.float64))
    allw = np.concatenate(frames, 0)
    wmean, _ = stats_to_mean_inv_std(load_cmvn_ark(out_wav))
    np.testing.assert_allclose(wmean, allw.mean(0), rtol=1e-3, atol=1e-4)

    # the produced ark drives training end to end (--cmvn global)
    ckpt = str(tmp_path / "exp_cc")
    train_cli.main([
        "--mode", "asr",
        "--train-manifest", manifest,
        "--ckpt-dir", ckpt, "--epochs", "1", "--batch-size", "4",
        "--optimizer", "adam", "--lr", "1e-3",
        "--n-mels", "24", "--enc-layers", "1", "--enc-hidden", "32",
        "--enc-proj", "32", "--att-dim", "24", "--dec-hidden", "32",
        "--dec-embed", "16", "--enh-layers", "1", "--enh-hidden", "32",
        "--length-buckets", "16000", "--max-label-len", "8",
        "--cmvn", "global", "--cmvn-ark", out_wav,
    ])
    assert os.path.exists(os.path.join(ckpt, "cmvn.ark"))


def test_score_cli_and_unified_entry(tmp_path, capsys):
    """score_cli (Kaldi compute-wer parity): known error counts from
    handcrafted ref/hyp; intersection semantics; the unified
    `python -m robust_e2e_gan_tpu` entry dispatches to it."""
    from robust_e2e_gan_tpu.decode import score_cli

    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    # u1: 1 sub of 3 words; u2: 1 del; u3: 1 ins; u4 missing from hyp
    ref.write_text(
        "u1 the cat sat\nu2 a b c\nu3 x y\nu4 only ref\n"
    )
    hyp.write_text(
        "u1 the dog sat\nu2 a c\nu3 x z y\nu5 only hyp\n"
    )
    out = tmp_path / "report.json"
    score_cli.main(["--ref", str(ref), "--hyp", str(hyp),
                    "--out", str(out), "--per-utt"])
    rep = json.loads(out.read_text())
    assert rep["n_utts"] == 3
    assert rep["n_missing_hyp"] == 1 and rep["n_extra_hyp"] == 1
    w = rep["wer"]
    assert w["errors"] == 3 and w["ref_tokens"] == 8
    assert w["sub"] == 1 and w["del"] == 1 and w["ins"] == 1
    assert len(rep["per_utt"]) == 3
    text = capsys.readouterr().out
    assert "%WER 37.50" in text

    with pytest.raises(SystemExit):
        score_cli.main(["--ref", str(ref), "--hyp", str(hyp), "--strict"])

    # --bootstrap N: CI fields appear and bracket the point estimate
    score_cli.main(["--ref", str(ref), "--hyp", str(hyp),
                    "--out", str(out), "--bootstrap", "200"])
    rep = json.loads(out.read_text())
    w = rep["wer"]
    assert w["ci_low"] <= w["error_rate"] <= w["ci_high"]
    assert w["confidence"] == 0.95 and w["n_resamples"] == 200
    assert "ci_low" in rep["cer"]
    assert "95% CI [" in capsys.readouterr().out

    # unified entry dispatch
    from robust_e2e_gan_tpu.__main__ import main as pkg_main

    pkg_main(["score", "--ref", str(ref), "--hyp", str(hyp)])
    assert "%WER" in capsys.readouterr().out
    with pytest.raises(SystemExit):
        pkg_main(["nonsense"])


def test_enhance_cli_mesh_data(manifest, tmp_path):
    """enhance_cli --mesh-data: sharded batches produce the same features
    as the single-device run."""
    ckpt = str(tmp_path / "exp_em")
    train_cli.main([
        "--mode", "gan",
        "--train-manifest", manifest,
        "--ckpt-dir", ckpt, "--epochs", "1", "--batch-size", "4",
        "--optimizer", "adam", "--lr", "1e-3",
        "--n-mels", "24", "--enc-layers", "1", "--enc-hidden", "32",
        "--enc-proj", "32", "--att-dim", "24", "--dec-hidden", "32",
        "--dec-embed", "16", "--enh-layers", "1", "--enh-hidden", "32",
        "--length-buckets", "16000", "--max-label-len", "8",
    ])
    from robust_e2e_gan_tpu.data import kaldi_io
    from robust_e2e_gan_tpu.decode import enhance_cli

    out1 = str(tmp_path / "enh1" / "feats")
    enhance_cli.main([
        "--manifest", manifest, "--ckpt-dir", ckpt, "--out", out1,
        "--batch-size", "8", "--length-buckets", "16000",
    ])
    out8 = str(tmp_path / "enh8" / "feats")
    enhance_cli.main([
        "--manifest", manifest, "--ckpt-dir", ckpt, "--out", out8,
        "--batch-size", "8", "--length-buckets", "16000",
        "--mesh-data", "8",
    ])
    # main() must clear the process-global mesh registration itself
    from robust_e2e_gan_tpu.parallel import sharding as _sh
    assert _sh._KERNEL_MESH is None
    a = dict(kaldi_io.read_mat_scp(out1 + ".scp"))
    b = dict(kaldi_io.read_mat_scp(out8 + ".scp"))
    assert a.keys() == b.keys() and len(a) == 8
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-5)


def test_decode_cli_serving_impls(manifest, tmp_path):
    """--serving-impls: the forced-fused decode (every Pallas serving
    kernel, interpret mode on CPU) produces the same hypotheses and
    scores as the pure-XLA decode through the REAL CLI."""
    ckpt = str(tmp_path / "exp_si")
    train_cli.main([
        "--mode", "joint",
        "--train-manifest", manifest,
        "--ckpt-dir", ckpt, "--epochs", "1", "--batch-size", "4",
        "--optimizer", "adam", "--lr", "1e-3",
        "--n-mels", "24", "--enc-layers", "1", "--enc-hidden", "32",
        "--enc-proj", "32", "--att-dim", "24", "--dec-hidden", "32",
        "--dec-embed", "16", "--enh-layers", "1", "--enh-hidden", "32",
        "--length-buckets", "16000", "--max-label-len", "8",
    ])
    outs = {}
    for impls in ("xla", "fused"):
        out = str(tmp_path / f"dec_{impls}")
        decode_cli.main([
            "--manifest", manifest, "--ckpt-dir", ckpt, "--out", out,
            "--batch-size", "4", "--beam-size", "3", "--max-steps", "6",
            "--length-buckets", "16000", "--serving-impls", impls,
        ])
        with open(os.path.join(out, "hyp.txt")) as f:
            outs[impls] = f.read()
    assert outs["xla"] == outs["fused"]
