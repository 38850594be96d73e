"""Unified command-line entry: ``python -m robust_e2e_gan_tpu <cmd> ...``.

Reference parity: the reference shipped a set of top-level scripts (train_*,
test/recog, enhance — SURVEY.md L4); here they are subcommands of one
package entry point, each delegating to its module CLI (which also remains
directly invocable, e.g. ``python -m robust_e2e_gan_tpu.train.cli``).

  train      clean-ASR / GAN / joint-adversarial / LM training (train/cli.py)
  decode     batched beam or greedy decoding + WER/CER scoring (decode/cli.py)
  enhance    enhancement-only inference to Kaldi ark/scp (decode/enhance_cli.py)
  score      WER/CER scoring of ref/hyp text files (decode/score_cli.py)
  cmvn       compute CMVN stats ark, global or per-speaker (data/cmvn_cli.py)
  fbank      offline fbank/spectrogram feature extraction (data/featbin_cli.py)
  copy-feats copy/re-compress feature ark/scp (data/featbin_cli.py)
"""

from __future__ import annotations

import sys


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    cmds = {}

    def _train(a):
        from robust_e2e_gan_tpu.train.cli import main as m
        m(a)

    def _decode(a):
        from robust_e2e_gan_tpu.decode.cli import main as m
        m(a)

    def _enhance(a):
        from robust_e2e_gan_tpu.decode.enhance_cli import main as m
        m(a)

    def _score(a):
        from robust_e2e_gan_tpu.decode.score_cli import main as m
        m(a)

    def _cmvn(a):
        from robust_e2e_gan_tpu.data.cmvn_cli import main as m
        m(a)

    def _fbank(a):
        from robust_e2e_gan_tpu.data.featbin_cli import main_fbank as m
        m(a)

    def _copy_feats(a):
        from robust_e2e_gan_tpu.data.featbin_cli import main_copy as m
        m(a)

    cmds = {
        "train": _train,
        "decode": _decode,
        "enhance": _enhance,
        "score": _score,
        "cmvn": _cmvn,
        "fbank": _fbank,
        "copy-feats": _copy_feats,
    }
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in cmds:
        known = " | ".join(cmds)
        print(f"usage: python -m robust_e2e_gan_tpu {{{known}}} ...")
        print((__doc__ or "").strip().split("\n\n", 1)[-1])
        raise SystemExit(0 if argv and argv[0] in ("-h", "--help") else 2)
    cmds[argv[0]](argv[1:])


if __name__ == "__main__":
    main()
