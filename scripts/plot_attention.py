"""Render decode-time attention maps (.npy dumps) as PNG heatmaps.

Reference parity: the reference's pix2pix-lineage visualizer / ESPnet
attention plots (SURVEY.md section 2a "Logging/visualization" row). The
decode CLI's ``--dump-attention`` writes per-utterance (S, T) alignment
matrices under ``<out>/att``; this script turns them into PNGs.

  PYTHONPATH=/root/repo python scripts/plot_attention.py <decode_out>/att \
      [--out <dir>] [--limit N]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def plot_dir(att_dir: str, out_dir: str = None, limit: int = 0) -> int:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_dir = out_dir or att_dir
    os.makedirs(out_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(att_dir, "*.npy")))
    if limit:
        paths = paths[:limit]
    for p in paths:
        att = np.load(p)  # (S out steps, T encoder frames)
        uid = os.path.splitext(os.path.basename(p))[0]
        fig, ax = plt.subplots(
            figsize=(max(4, att.shape[1] / 12), max(2.5, att.shape[0] / 4))
        )
        im = ax.imshow(att, aspect="auto", origin="lower",
                       interpolation="nearest", cmap="viridis")
        ax.set_xlabel("encoder frame")
        ax.set_ylabel("output step")
        ax.set_title(uid)
        fig.colorbar(im, ax=ax, fraction=0.03)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, uid + ".png"), dpi=110)
        plt.close(fig)
    return len(paths)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("att_dir", help="directory of <utt_id>.npy attention maps")
    p.add_argument("--out", help="output dir (default: alongside the .npy)")
    p.add_argument("--limit", type=int, default=0, help="plot at most N")
    args = p.parse_args(argv)
    n = plot_dir(args.att_dir, args.out, args.limit)
    print(f"wrote {n} attention PNGs")


if __name__ == "__main__":
    main()
