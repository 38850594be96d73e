#!/usr/bin/env bash
# End-to-end demo recipe: the reference's 3-stage training pipeline
# (SURVEY.md L4: clean-ASR pretrain -> GAN pretrain -> joint adversarial
# fine-tune -> decode/score) on generated synthetic manifests, driven purely
# through the public CLIs. Runs on whatever JAX backend is available.
#
#   bash scripts/run_demo.sh [EXP_DIR]
#
# Every stage resumes from its checkpoints, so the script is safe to re-run
# until complete — on the remote-compile TPU platform the first pass through
# each stage pays a multi-minute XLA compile (cached afterwards in
# .jax_cache), which can exceed a single command window.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
EXP="${1:-/tmp/rg_demo}"
mkdir -p "$EXP"

echo "== generate synthetic corpus manifests (train/dev/eval) =="
python - "$EXP" <<'PY'
import json, sys, numpy as np
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, synth_utterance

exp = sys.argv[1]
scfg = SyntheticConfig(seed=7, noise_snr_db=3.0)
alphabet = "abcdefghij"
for split, n, seed in (("train", 256, 7), ("dev", 32, 8), ("eval", 32, 9)):
    rng = np.random.default_rng(seed)
    entries = []
    for i in range(n):
        n_tok = int(rng.integers(scfg.min_tokens, scfg.max_tokens + 1))
        toks = rng.integers(2, scfg.vocab_size, size=(n_tok,)).astype(np.int32)
        clean, noisy = synth_utterance(toks, scfg, rng)
        np.save(f"{exp}/{split}_n{i}.npy", noisy)
        np.save(f"{exp}/{split}_c{i}.npy", clean)
        entries.append({"utt_id": f"{split}{i}", "noisy": f"{split}_n{i}.npy",
                        "clean": f"{split}_c{i}.npy",
                        "text": "".join(alphabet[t - 2] for t in toks),
                        "n_samples": len(clean)})
    open(f"{exp}/{split}.jsonl", "w").write(
        "\n".join(json.dumps(e) for e in entries))
print("manifests written under", exp)
PY

COMMON=(--n-mels 40 --enc-layers 1 --enc-hidden 64 --enc-proj 64
        --att-dim 48 --dec-hidden 64 --dec-embed 32
        --enh-layers 1 --enh-hidden 64
        --optimizer adam --lr 1e-3 --batch-size 16 --log-every 10
        --length-buckets 23040 --max-label-len 12
        --train-manifest "$EXP/train.jsonl" --dev-manifest "$EXP/dev.jsonl")

echo "== stage a: clean-ASR pretrain =="
python -m robust_e2e_gan_tpu.train.cli --mode asr \
    --ckpt-dir "$EXP/asr" --epochs 6 "${COMMON[@]}"

echo "== stage b: enhancement-GAN pretrain =="
python -m robust_e2e_gan_tpu.train.cli --mode gan \
    --ckpt-dir "$EXP/gan" --epochs 2 "${COMMON[@]}"

echo "== stage c: joint adversarial fine-tune (warm-started from a) =="
python -m robust_e2e_gan_tpu.train.cli --mode joint \
    --ckpt-dir "$EXP/joint" --init-from "$EXP/asr" --epochs 8 "${COMMON[@]}"

echo "== stage d: char RNNLM on the training transcripts =="
python -m robust_e2e_gan_tpu.train.cli --mode lm \
    --train-manifest "$EXP/train.jsonl" --ckpt-dir "$EXP/lm" --epochs 10 \
    --dec-embed 32 --dec-hidden 64 --optimizer adam --lr 1e-2 \
    --batch-size 16 --max-label-len 12 --log-every 20

echo "== decode + score the held-out eval manifest =="
python -m robust_e2e_gan_tpu.decode.cli \
    --manifest "$EXP/eval.jsonl" --ckpt-dir "$EXP/joint" \
    --out "$EXP/joint/decode" --batch-size 16 --beam-size 4 --max-steps 16 \
    --length-buckets 23040 --nbest 3
cat "$EXP/joint/decode/wer.json"
echo

echo "== decode again with RNNLM shallow fusion =="
python -m robust_e2e_gan_tpu.decode.cli \
    --manifest "$EXP/eval.jsonl" --ckpt-dir "$EXP/joint" \
    --out "$EXP/joint/decode_lm" --batch-size 16 --beam-size 4 \
    --max-steps 16 --length-buckets 23040 \
    --lm-dir "$EXP/lm" --lm-weight 0.3
cat "$EXP/joint/decode_lm/wer.json"
echo
echo "demo complete: $EXP"
