"""featbin_cli: offline feature extraction (compute-fbank-feats /
compute-spectrogram-feats parity) and copy-feats re-encoding."""

import numpy as np
import pytest

from robust_e2e_gan_tpu.config import FrontendConfig
from robust_e2e_gan_tpu.data import featbin_cli, kaldi_io


@pytest.fixture
def wav_scp(tmp_path, rng):
    wavs = {
        f"utt{i}": rng.standard_normal(3200 + 480 * i).astype(np.float32)
        for i in range(3)
    }
    ark, scp = str(tmp_path / "wav.ark"), str(tmp_path / "wav.scp")
    kaldi_io.write_ark_scp(iter(wavs.items()), ark, scp)
    return scp, wavs


def test_fbank_cli_matches_frontend(tmp_path, wav_scp):
    """CLI output == ops.fbank (cmvn none) with pad frames trimmed."""
    import jax.numpy as jnp

    from robust_e2e_gan_tpu.ops import fbank as fbank_ops

    scp, wavs = wav_scp
    out_ark = str(tmp_path / "feats.ark")
    out_scp = str(tmp_path / "feats.scp")
    featbin_cli.main_fbank(
        ["--wav-scp", scp, "--out-ark", out_ark, "--out-scp", out_scp,
         "--n-mels", "23"]
    )
    got = dict(kaldi_io.read_mat_scp(out_scp))
    assert set(got) == set(wavs)
    cfg = FrontendConfig(n_mels=23)
    for key, wav in wavs.items():
        ref, _ = fbank_ops.fbank(jnp.asarray(wav)[None], cfg, cmvn="none")
        ref = np.asarray(ref[0])
        assert got[key].shape == ref.shape
        np.testing.assert_allclose(got[key], ref, rtol=0, atol=2e-5)


def test_fbank_cli_spectrogram_kind(tmp_path, wav_scp):
    """--feats-kind spectrogram writes log power at n_fft//2+1 dims that
    round-trips through the spec consumers' exp() back to stft_power."""
    import jax.numpy as jnp

    from robust_e2e_gan_tpu.ops import fbank as fbank_ops

    scp, wavs = wav_scp
    out_ark = str(tmp_path / "spec.ark")
    out_scp = str(tmp_path / "spec.scp")
    featbin_cli.main_fbank(
        ["--wav-scp", scp, "--out-ark", out_ark, "--out-scp", out_scp,
         "--feats-kind", "spectrogram"]
    )
    cfg = FrontendConfig()
    got = dict(kaldi_io.read_mat_scp(out_scp))
    for key, wav in wavs.items():
        assert got[key].shape[1] == cfg.n_freqs
        power = np.asarray(fbank_ops.stft_power(jnp.asarray(wav)[None], cfg))
        power = np.maximum(power[0, : got[key].shape[0]], cfg.log_floor)
        np.testing.assert_allclose(
            np.exp(got[key]), power, rtol=2e-4, atol=1e-6
        )


def test_fbank_cli_compressed_output(tmp_path, wav_scp):
    """--compress 1 writes readable CM entries close to the float feats."""
    scp, _ = wav_scp
    f_ark = str(tmp_path / "f.ark")
    f_scp = str(tmp_path / "f.scp")
    c_ark = str(tmp_path / "c.ark")
    c_scp = str(tmp_path / "c.scp")
    featbin_cli.main_fbank(["--wav-scp", scp, "--out-ark", f_ark,
                            "--out-scp", f_scp])
    featbin_cli.main_fbank(["--wav-scp", scp, "--out-ark", c_ark,
                            "--out-scp", c_scp, "--compress", "1"])
    ref = dict(kaldi_io.read_mat_scp(f_scp))
    got = dict(kaldi_io.read_mat_scp(c_scp))
    assert set(got) == set(ref)
    for key in ref:
        span = ref[key].max() - ref[key].min()
        assert np.max(np.abs(got[key] - ref[key])) < 0.02 * span + 1e-4


def test_copy_feats_roundtrip_and_compress(tmp_path, rng):
    feats = {
        f"m{i}": rng.standard_normal((10 + i, 7)).astype(np.float32)
        for i in range(4)
    }
    in_ark, in_scp = str(tmp_path / "in.ark"), str(tmp_path / "in.scp")
    kaldi_io.write_ark_scp(iter(feats.items()), in_ark, in_scp)

    # float -> float via scp: bit-exact, key order preserved
    out_ark, out_scp = str(tmp_path / "o.ark"), str(tmp_path / "o.scp")
    featbin_cli.main_copy(["--feats-scp", in_scp, "--out-ark", out_ark,
                           "--out-scp", out_scp])
    got = list(kaldi_io.read_mat_scp(out_scp))
    assert [k for k, _ in got] == list(feats)
    for k, m in got:
        np.testing.assert_array_equal(m, feats[k])

    # ark source -> CM2 (u16) re-encode: near-lossless
    cm_ark = str(tmp_path / "cm.ark")
    featbin_cli.main_copy(["--feats-ark", in_ark, "--out-ark", cm_ark,
                           "--compress", "2"])
    got2 = dict(kaldi_io.read_mat_ark(cm_ark))
    for k, m in feats.items():
        span = m.max() - m.min()
        assert np.max(np.abs(got2[k] - m)) < span / 65535.0 * 2 + 1e-6


def test_unified_entry_lists_featbin(capsys):
    from robust_e2e_gan_tpu.__main__ import main

    with pytest.raises(SystemExit):
        main(["--help"])
    out = capsys.readouterr().out
    assert "fbank" in out and "copy-feats" in out
