"""Enhancement-only inference: denoise a dataset, write features to ark/scp.

Reference parity: SURVEY.md call stack 3.3 — "enhance/test script ->
G(noisy) -> mask * noisy -> write enhanced feats to ark". Whole batches run
through the jitted enhancer in one program; outputs are enhanced log-mel
features (default, what downstream ASR consumes) or enhanced linear power
spectra, written as Kaldi ark/scp via data/kaldi_io.py so Kaldi tooling can
consume them directly.

  python -m robust_e2e_gan_tpu.decode.enhance_cli \
      --manifest data/eval.jsonl --ckpt-dir exp/joint \
      --out exp/joint/enhanced --domain logmel
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from robust_e2e_gan_tpu.data import kaldi_io
from robust_e2e_gan_tpu.data.dataset import AudioTextDataset, BucketBatcher
from robust_e2e_gan_tpu.decode.cli import load_experiment
from robust_e2e_gan_tpu.pipeline import RobustE2E


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", help="jsonl manifest")
    p.add_argument("--noisy-scp", help="Kaldi scp of waveforms (with --text)")
    p.add_argument("--text", help="Kaldi text file (with --noisy-scp)")
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--which", choices=("best", "latest"), default="best")
    p.add_argument("--out", required=True, help="output prefix (.ark/.scp)")
    p.add_argument("--domain", choices=("logmel", "power"), default="logmel")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--length-buckets", default="32000,64000,112000,160000")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="data-parallel enhancement: shard each batch over "
                        "this many devices (like decode --mesh-data)")
    return p


def main(argv: Optional[list] = None) -> None:
    # the ambient kernel-mesh registration is process-global; clear it on
    # every exit path so in-process callers (tests, libraries) that invoke
    # main() don't inherit a stale mesh in later traces
    try:
        _main(argv)
    finally:
        from robust_e2e_gan_tpu.parallel.sharding import set_kernel_mesh

        set_kernel_mesh(None)


def _main(argv: Optional[list] = None) -> None:
    args = build_parser().parse_args(argv)
    from robust_e2e_gan_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    model, disc, state, jcfg, tok, step, _, _ = load_experiment(
        args.ckpt_dir, args.which
    )

    mesh = None
    if args.mesh_data > 1:
        from robust_e2e_gan_tpu.parallel import make_mesh
        from robust_e2e_gan_tpu.parallel.sharding import set_kernel_mesh

        mesh = make_mesh(args.mesh_data, 1)
        set_kernel_mesh(mesh)  # Pallas kernels shard_map over this mesh
        print(f"data-parallel enhancement over {args.mesh_data} devices")

    @jax.jit
    def enhance_fn(params, wav, lens):
        enhanced, tf_mask, fmask = model.apply(
            {"params": params}, wav, lens, method=RobustE2E.enhance
        )
        if args.domain == "logmel":
            out = model.apply(
                {"params": params}, enhanced, method=RobustE2E.logmel_no_cmvn
            )
        else:
            out = enhanced
        return out, fmask

    if args.manifest:
        ds = AudioTextDataset.from_jsonl(args.manifest, tokenizer=tok)
    elif args.noisy_scp and args.text:
        ds = AudioTextDataset.from_kaldi(args.noisy_scp, args.text,
                                         tokenizer=tok)
    else:
        raise SystemExit("need --manifest or --noisy-scp/--text")
    buckets = tuple(int(x) for x in args.length_buckets.split(",") if x)
    batcher = BucketBatcher(ds, args.batch_size, buckets, pad_final=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    ark, scp = args.out + ".ark", args.out + ".scp"

    def to_device(arrs):
        # ragged final batches fall back to single-device placement
        if mesh is not None and arrs[0].shape[0] % args.mesh_data == 0:
            from robust_e2e_gan_tpu.parallel import shard_batch

            return list(shard_batch(dict(enumerate(arrs)), mesh).values())
        return [jnp.asarray(a) for a in arrs]

    def entries():
        for batch in batcher.epoch(shuffle=False):
            wav, lens = to_device(
                [batch["noisy_wav"], batch["wav_lengths"]]
            )
            feats, fmask = enhance_fn(state.params_g, wav, lens)
            feats = np.asarray(feats)
            nf = np.asarray(jnp.sum(fmask, axis=-1)).astype(int)
            for j, uid in enumerate(batch["utt_ids"]):
                yield uid, feats[j, : nf[j]]

    kaldi_io.write_ark_scp(entries(), ark, scp)
    print(f"wrote {ark} / {scp} (step {step}, domain {args.domain})")


if __name__ == "__main__":
    main()
