"""PyTorch reference-checkpoint importer (round-3 VERDICT missing #5/#8).

Maps a reference-layout (ESPnet-era, SURVEY.md section 2a naming:
Encoder/VGG2L/BLSTMP/AttLoc/Decoder/CTC) PyTorch ``state_dict`` onto this
framework's parameter tree, so the day a reference checkpoint or corpus
materializes, WER-parity decode is one command instead of a project:

    python tools/import_reference_ckpt.py ref.pth out_dir \
        --config exp/config.json

Layout knowledge encoded here (and oracle-tested in
tests/test_import_ckpt.py against real torch modules):

  * torch ``Linear.weight`` is (out, in); flax Dense kernels are (in, out).
  * torch LSTM gate packing is (i, f, g, o) along the first axis of the
    (4H, D) weights — the same order this framework's ``jnp.split`` uses —
    and carries two bias vectors (``bias_ih + bias_hh`` -> our single bias).
  * Bidirectional layers: ``..._reverse`` keys -> index 1 of our stacked
    (2, D, 4H) weights.
  * torch ``Conv2d.weight`` is (out_ch, in_ch, kh, kw); flax NHWC conv
    kernels are (kh, kw, in_ch, out_ch).
  * VGG2L flatten order: the reference reshapes (B, C, T', F') ->
    (B, T', C*F') (channel-major); this framework's NHWC VGG flattens
    (B, T', F', C) -> (B, T', F'*C) (freq-major). The first encoder BLSTM's
    input weights are row-permuted accordingly.
  * AttLoc: ``mlp_att`` -> our ``mlp_loc``; ``loc_conv`` (C, 1, 1, K) ->
    our 1-D (K, 1, C); ``gvec.bias`` is dropped — a constant shift on every
    pre-softmax score is softmax-invariant (including under the sharpening
    scale and additive masking). ``mlp_enc.bias`` is kept; set
    ``AttentionConfig.enc_proj_bias=True`` (the CLI patches the saved
    config) so the module declares it.
  * Decoder readout: the reference-era ``output`` Linear reads the LSTM
    state only (dunits -> odim); this framework's readout reads
    concat(z, context). A (V, dunits) reference weight lands in the z rows
    with exact zeros on the context rows — functionally identical.
  * Enhancer (optional keys): a multi-layer bidirectional ``nn.LSTM``
    (``weight_ih_l{k}`` / ``..._reverse``) + a (F, 2H) mask Linear map to
    ``enhancer/blstm{k}`` + ``mask_out``.

``export_state_dict`` is the exact inverse (reference-layout names), used
by the round-trip test.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# state_dict access helpers
# ---------------------------------------------------------------------------


def _np(x) -> np.ndarray:
    """torch tensor / array-like -> float32-preserving numpy array."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _find(sd: Dict[str, np.ndarray], suffix: str,
          optional: bool = False) -> Optional[str]:
    """The unique key ending with ``suffix`` (prefix-agnostic lookup:
    reference wrappers nest the E2E model under arbitrary prefixes)."""
    hits = [k for k in sd
            if k == suffix or k.endswith("." + suffix) or k.endswith(suffix)]
    # prefer exact-boundary matches ('.suffix' or ==) over accidental ones
    exact = [k for k in hits if k == suffix or k.endswith("." + suffix)]
    if exact:
        hits = exact
    if len(hits) == 1:
        return hits[0]
    if not hits:
        if optional:
            return None
        raise KeyError(f"no state_dict key matching *{suffix}")
    raise KeyError(f"ambiguous state_dict suffix *{suffix}: {sorted(hits)}")


def _get(sd, suffix, optional=False):
    k = _find(sd, suffix, optional=optional)
    return None if k is None else _np(sd[k])


def _linear(sd, name, bias=True, optional=False):
    w = _get(sd, f"{name}.weight", optional=optional)
    if w is None:
        return None, None
    b = _get(sd, f"{name}.bias", optional=not bias)
    return w.T.astype(np.float32), (
        None if b is None else b.astype(np.float32)
    )


def _lstm_dir(sd, base, layer=0, reverse=False):
    """One direction of a torch nn.LSTM layer -> (wx (D,4H), wh (H,4H),
    bias (4H,))."""
    sfx = f"l{layer}" + ("_reverse" if reverse else "")
    w_ih = _get(sd, f"{base}.weight_ih_{sfx}")
    w_hh = _get(sd, f"{base}.weight_hh_{sfx}")
    b_ih = _get(sd, f"{base}.bias_ih_{sfx}", optional=True)
    b_hh = _get(sd, f"{base}.bias_hh_{sfx}", optional=True)
    bias = np.zeros(w_ih.shape[0], np.float32)
    if b_ih is not None:
        bias = bias + b_ih
    if b_hh is not None:
        bias = bias + b_hh
    return (w_ih.T.astype(np.float32), w_hh.T.astype(np.float32),
            bias.astype(np.float32))


def _bilstm(sd, base, layer=0):
    """Both directions -> this framework's stacked (2, D, 4H)/(2, H, 4H)/
    (2, 4H) BLSTM parameters."""
    fx, fh, fb = _lstm_dir(sd, base, layer, reverse=False)
    rx, rh, rb = _lstm_dir(sd, base, layer, reverse=True)
    return {
        "wx": np.stack([fx, rx]),
        "wh": np.stack([fh, rh]),
        "bias": np.stack([fb, rb]),
    }


def _ceil2(n: int) -> int:
    return (n + 1) // 2


def vgg_flatten_permutation(input_dim: int, channels: int) -> np.ndarray:
    """perm[j] = reference column feeding this framework's input column j.

    Framework column j (freq-major) = d * C + c; reference column
    (channel-major) = c * F' + d, with F' the twice-ceil-pooled freq dim.
    """
    fp = _ceil2(_ceil2(input_dim))
    j = np.arange(fp * channels)
    d, c = j // channels, j % channels
    return c * fp + d


# ---------------------------------------------------------------------------
# import
# ---------------------------------------------------------------------------


def import_state_dict(sd: Dict[str, np.ndarray], jcfg,
                      with_enhancer: str = "auto") -> Dict:
    """Reference state_dict -> this framework's ``params`` tree (the
    ``params_g`` side: enhancer + ASR). ``with_enhancer``: "auto" imports
    the enhancer iff its keys are present; True/False force/skip."""
    sd = {k: v for k, v in sd.items()}
    ecfg = jcfg.e2e.encoder
    dcfg = jcfg.e2e.decoder

    # ---- encoder: VGG2L ----
    vgg = {}
    for i in range(len(ecfg.vgg_channels)):
        for j in (1, 2):
            w = _get(sd, f"conv{i + 1}_{j}.weight")
            b = _get(sd, f"conv{i + 1}_{j}.bias")
            vgg[f"conv{i}_{j}"] = {
                "kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
                "bias": b.astype(np.float32),
            }

    # ---- encoder: BLSTMP stack ----
    blstmp = {}
    perm = vgg_flatten_permutation(ecfg.input_dim, ecfg.vgg_channels[-1])
    for layer in range(ecfg.num_layers):
        p = _bilstm(sd, f"bilstm{layer}")
        if layer == 0:
            p["wx"] = p["wx"][:, perm, :]
        blstmp[f"blstm{layer}"] = p
        pw, pb = _linear(sd, f"bt{layer}")
        blstmp[f"proj{layer}"] = {"kernel": pw, "bias": pb}

    # ---- attention (AttLoc) ----
    enc_w, enc_b = _linear(sd, "mlp_enc", bias=False)
    mlp_enc = {"kernel": enc_w}
    if enc_b is not None:
        if not getattr(jcfg.e2e.attention, "enc_proj_bias", False):
            raise ValueError(
                "reference mlp_enc has a bias; set "
                "AttentionConfig.enc_proj_bias=True in the target config "
                "(the CLI does this automatically)"
            )
        mlp_enc["bias"] = enc_b
    dec_w, _ = _linear(sd, "mlp_dec", bias=False)
    loc_w, _ = _linear(sd, "mlp_att", bias=False)
    gvec_w, _ = _linear(sd, "gvec", bias=False)  # bias softmax-invariant
    conv_w = _get(sd, "loc_conv.weight")  # (C, 1, 1, K)
    att = {
        "mlp_dec": {"kernel": dec_w},
        "mlp_loc": {"kernel": loc_w},
        "gvec": {"kernel": gvec_w},
        "loc_conv": {
            # (C, 1, 1, K) -> (K, 1, C)
            "kernel": np.transpose(conv_w, (3, 2, 1, 0))[:, 0, :, :]
            .astype(np.float32)
        },
    }

    # ---- decoder ----
    emb = _get(sd, "embed.weight").astype(np.float32)
    step = {"embed": {"embedding": emb}, "att": att}
    for layer in range(dcfg.num_layers):
        w_ih = _get(sd, f"decoder.{layer}.weight_ih")
        w_hh = _get(sd, f"decoder.{layer}.weight_hh")
        b_ih = _get(sd, f"decoder.{layer}.bias_ih", optional=True)
        b_hh = _get(sd, f"decoder.{layer}.bias_hh", optional=True)
        bias = np.zeros(w_ih.shape[0], np.float32)
        if b_ih is not None:
            bias = bias + b_ih
        if b_hh is not None:
            bias = bias + b_hh
        step[f"lstm{layer}"] = {
            "wx": w_ih.T.astype(np.float32),
            "wh": w_hh.T.astype(np.float32),
            "bias": bias.astype(np.float32),
        }
    out_w, out_b = _linear(sd, "output")
    hdim = dcfg.hidden_dim
    e_dim = jcfg.e2e.encoder.proj_dim
    if out_w.shape[0] == hdim:  # reference z-only readout: zero ctx rows
        full = np.zeros((hdim + e_dim, out_w.shape[1]), np.float32)
        full[:hdim] = out_w
        out_w = full
    elif out_w.shape[0] != hdim + e_dim:
        raise ValueError(
            f"decoder output weight in-dim {out_w.shape[0]} matches "
            f"neither dunits={hdim} nor dunits+eprojs={hdim + e_dim}"
        )
    step["output"] = {"kernel": out_w, "bias": out_b}

    # ---- CTC ----
    ctc_w, ctc_b = _linear(sd, "ctc_lo")

    asr = {
        "encoder": {"vgg": vgg, "blstmp": blstmp},
        "ctc": {"ctc_lo": {"kernel": ctc_w, "bias": ctc_b}},
        "decoder": {
            "enc_projection": {"mlp_enc": mlp_enc},
            "step_mod": step,
        },
    }

    params = {"asr": asr}

    # ---- enhancer (optional) ----
    has_enh = any(re.search(r"(^|\.)lstm\.weight_ih_l0$", k) for k in sd)
    want_enh = has_enh if with_enhancer == "auto" else bool(with_enhancer)
    if want_enh:
        enh = {}
        for layer in range(jcfg.enhancer.num_layers):
            enh[f"blstm{layer}"] = _bilstm(sd, "lstm", layer=layer)
        mw = mb = None
        for cand in ("mask_out", "affine", "linear", "fc", "mask"):
            mw, mb = _linear(sd, cand, optional=True)
            if mw is not None:
                break
        if mw is None:
            # shape-directed fallback: the unique (F, 2H) Linear
            f, h2 = jcfg.enhancer.input_dim, 2 * jcfg.enhancer.hidden_dim
            cands = [k for k, v in sd.items()
                     if k.endswith(".weight") and _np(v).shape == (f, h2)]
            if len(cands) != 1:
                raise KeyError(
                    f"cannot locate the enhancer mask Linear (F={f}, "
                    f"2H={h2}); candidates: {cands}"
                )
            mw = _np(sd[cands[0]]).T.astype(np.float32)
            bk = cands[0][: -len(".weight")] + ".bias"
            mb = _np(sd[bk]).astype(np.float32) if bk in sd else np.zeros(
                f, np.float32)
        enh["mask_out"] = {"kernel": mw, "bias": mb}
        params["enhancer"] = enh

    return params


# ---------------------------------------------------------------------------
# export (exact inverse — reference-layout names; used by the round-trip
# test and to hand framework-trained models back to reference tooling)
# ---------------------------------------------------------------------------


def export_state_dict(params: Dict, jcfg) -> Dict[str, np.ndarray]:
    ecfg = jcfg.e2e.encoder
    dcfg = jcfg.e2e.decoder
    sd: Dict[str, np.ndarray] = {}

    asr = params["asr"]
    for i in range(len(ecfg.vgg_channels)):
        for j in (1, 2):
            p = asr["encoder"]["vgg"][f"conv{i}_{j}"]
            sd[f"enc.enc1.conv{i + 1}_{j}.weight"] = np.transpose(
                _np(p["kernel"]), (3, 2, 0, 1)
            )
            sd[f"enc.enc1.conv{i + 1}_{j}.bias"] = _np(p["bias"])

    perm = vgg_flatten_permutation(ecfg.input_dim, ecfg.vgg_channels[-1])
    inv = np.argsort(perm)
    for layer in range(ecfg.num_layers):
        p = asr["encoder"]["blstmp"][f"blstm{layer}"]
        wx, wh, bias = _np(p["wx"]), _np(p["wh"]), _np(p["bias"])
        if layer == 0:
            wx = wx[:, inv, :]
        for z, sfx in ((0, "l0"), (1, "l0_reverse")):
            sd[f"enc.enc2.bilstm{layer}.weight_ih_{sfx}"] = wx[z].T
            sd[f"enc.enc2.bilstm{layer}.weight_hh_{sfx}"] = wh[z].T
            sd[f"enc.enc2.bilstm{layer}.bias_ih_{sfx}"] = bias[z]
            sd[f"enc.enc2.bilstm{layer}.bias_hh_{sfx}"] = np.zeros_like(
                bias[z]
            )
        pr = asr["encoder"]["blstmp"][f"proj{layer}"]
        sd[f"enc.enc2.bt{layer}.weight"] = _np(pr["kernel"]).T
        sd[f"enc.enc2.bt{layer}.bias"] = _np(pr["bias"])

    mlp_enc = asr["decoder"]["enc_projection"]["mlp_enc"]
    sd["att.mlp_enc.weight"] = _np(mlp_enc["kernel"]).T
    if "bias" in mlp_enc:
        sd["att.mlp_enc.bias"] = _np(mlp_enc["bias"])
    step = asr["decoder"]["step_mod"]
    att = step["att"]
    sd["att.mlp_dec.weight"] = _np(att["mlp_dec"]["kernel"]).T
    sd["att.mlp_att.weight"] = _np(att["mlp_loc"]["kernel"]).T
    sd["att.gvec.weight"] = _np(att["gvec"]["kernel"]).T
    sd["att.loc_conv.weight"] = np.transpose(
        _np(att["loc_conv"]["kernel"])[:, None, :, :], (3, 2, 1, 0)
    )

    sd["dec.embed.weight"] = _np(step["embed"]["embedding"])
    for layer in range(dcfg.num_layers):
        p = step[f"lstm{layer}"]
        sd[f"dec.decoder.{layer}.weight_ih"] = _np(p["wx"]).T
        sd[f"dec.decoder.{layer}.weight_hh"] = _np(p["wh"]).T
        sd[f"dec.decoder.{layer}.bias_ih"] = _np(p["bias"])
        sd[f"dec.decoder.{layer}.bias_hh"] = np.zeros_like(_np(p["bias"]))
    sd["dec.output.weight"] = _np(step["output"]["kernel"]).T
    sd["dec.output.bias"] = _np(step["output"]["bias"])

    sd["ctc.ctc_lo.weight"] = _np(asr["ctc"]["ctc_lo"]["kernel"]).T
    sd["ctc.ctc_lo.bias"] = _np(asr["ctc"]["ctc_lo"]["bias"])

    if "enhancer" in params:
        enh = params["enhancer"]
        for layer in range(jcfg.enhancer.num_layers):
            p = enh[f"blstm{layer}"]
            wx, wh, bias = _np(p["wx"]), _np(p["wh"]), _np(p["bias"])
            for z, sfx in ((0, f"l{layer}"), (1, f"l{layer}_reverse")):
                sd[f"enh.lstm.weight_ih_{sfx}"] = wx[z].T
                sd[f"enh.lstm.weight_hh_{sfx}"] = wh[z].T
                sd[f"enh.lstm.bias_ih_{sfx}"] = bias[z]
                sd[f"enh.lstm.bias_hh_{sfx}"] = np.zeros_like(bias[z])
        sd["enh.mask_out.weight"] = _np(enh["mask_out"]["kernel"]).T
        sd["enh.mask_out.bias"] = _np(enh["mask_out"]["bias"])

    return sd


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def _tree_paths(t, prefix=""):
    if isinstance(t, dict):
        for k, v in t.items():
            yield from _tree_paths(v, f"{prefix}{k}/")
    else:
        yield prefix.rstrip("/"), np.shape(t)


def validate_against_template(imported: Dict, template: Dict) -> None:
    """Every imported leaf must exist in the template with the same shape
    (catches a config that does not match the reference architecture)."""
    tpl = dict(_tree_paths(template))
    errs = []
    for path, shape in _tree_paths(imported):
        if path not in tpl:
            errs.append(f"{path}: not in the model's parameter tree")
        elif tuple(tpl[path]) != tuple(shape):
            errs.append(f"{path}: imported {shape} != model {tpl[path]}")
    if errs:
        raise ValueError(
            "imported checkpoint does not fit the config:\n  "
            + "\n  ".join(errs)
        )


def main(argv=None):
    import argparse
    import dataclasses
    import json
    import os
    import shutil
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # host-side tool: numpy weights in, msgpack out — no TPU needed
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    ap = argparse.ArgumentParser(
        description="Import a reference-layout PyTorch checkpoint into a "
        "framework experiment dir (decodable with `decode --ckpt-dir`)."
    )
    ap.add_argument("state_dict", help=".pth/.pt torch state_dict (or a "
                    "dict with a 'model'/'state_dict' entry)")
    ap.add_argument("out_dir", help="experiment dir to create")
    ap.add_argument("--config", required=True,
                    help="framework JointConfig JSON matching the "
                    "reference architecture (a config.json saved by the "
                    "train CLI also works)")
    ap.add_argument("--tokenizer", default=None,
                    help="optional tokenizer.json to copy alongside")
    ap.add_argument("--units", default=None,
                    help="reference Kaldi/ESPnet units.txt ('token id' "
                    "lines); emits a table tokenizer in the reference's "
                    "own id layout and patches vocab/sos/eos ids")
    args = ap.parse_args(argv)

    import torch

    raw = torch.load(args.state_dict, map_location="cpu",
                     weights_only=False)
    for k in ("model", "state_dict", "model_state_dict"):
        if isinstance(raw, dict) and k in raw and isinstance(raw[k], dict):
            raw = raw[k]
            break
    sd = {k: _np(v) for k, v in raw.items()}

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from robust_e2e_gan_tpu import config as cfg_lib
    from robust_e2e_gan_tpu.config import JointConfig, TrainConfig
    from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
    from robust_e2e_gan_tpu.models.enhancement import Discriminator
    from robust_e2e_gan_tpu.pipeline import build_model
    from robust_e2e_gan_tpu.train.steps import init_train_state
    from robust_e2e_gan_tpu.utils import checkpoint as ckpt

    with open(args.config) as f:
        saved = json.load(f)
    if "joint" in saved:  # a train-CLI config.json
        jcfg = cfg_lib.from_dict(JointConfig, saved["joint"])
        tcfg = cfg_lib.from_dict(TrainConfig, saved["train"])
    else:
        jcfg = cfg_lib.from_dict(JointConfig, saved)
        tcfg = TrainConfig()

    tok = None
    if args.units:
        from robust_e2e_gan_tpu.data.dataset import TableTokenizer

        tok = TableTokenizer.from_units(args.units)
        v = tok.vocab_size
        emb_v = _get(sd, "embed.weight").shape[0]
        if v != emb_v:
            raise ValueError(
                f"units.txt implies vocab {v} (blank 0 + units + sos/eos "
                f"{tok.sos_eos_id}) but the embedding has {emb_v} rows"
            )
        # reference id layout: blank=0, shared <sos>/<eos> at vocab-1
        jcfg = dataclasses.replace(
            jcfg,
            e2e=dataclasses.replace(
                jcfg.e2e,
                blank_id=tok.blank_id,
                sos_id=tok.sos_eos_id, eos_id=tok.sos_eos_id,
                decoder=dataclasses.replace(
                    jcfg.e2e.decoder, vocab_size=v
                ),
            ),
        )
        print(f"units.txt: vocab {v}, blank {tok.blank_id}, "
              f"sos/eos {tok.sos_eos_id}")

    if _find(sd, "mlp_enc.bias", optional=True) is not None and not getattr(
        jcfg.e2e.attention, "enc_proj_bias", False
    ):
        jcfg = dataclasses.replace(
            jcfg,
            e2e=dataclasses.replace(
                jcfg.e2e,
                attention=dataclasses.replace(
                    jcfg.e2e.attention, enc_proj_bias=True
                ),
            ),
        )
        print("note: reference mlp_enc has a bias -> enc_proj_bias=True")

    params = import_state_dict(sd, jcfg)

    # template TrainState from the config (CPU init), imported weights
    # grafted over params_g; optimizer slots stay at their fresh init —
    # the import is for decode/fine-tune, not for resuming the reference's
    # optimizer trajectory (Adadelta accumulators are not in scope).
    model = build_model(jcfg)
    disc = Discriminator(jcfg.discriminator)
    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=jcfg.e2e.decoder.vocab_size)
    sample = {k: jnp.asarray(v)
              for k, v in make_batch(2, scfg, rng, ignore_id=-1).items()}
    state, _, _ = init_train_state(model, disc, tcfg, sample, seed=0)
    validate_against_template(params, state.params_g)
    merged = dict(state.params_g)
    merged["asr"] = jax.tree_util.tree_map(jnp.asarray, params["asr"])
    if "enhancer" in params:
        merged["enhancer"] = jax.tree_util.tree_map(
            jnp.asarray, params["enhancer"]
        )
    else:
        print("note: no enhancer keys in the state_dict; enhancer keeps "
              "fresh init (ASR-only import)")
    state = state.replace(params_g=merged)

    os.makedirs(args.out_dir, exist_ok=True)
    cfg_lib.save_config(
        {"joint": cfg_lib.to_dict(jcfg), "train": cfg_lib.to_dict(tcfg),
         "mode": "joint", "input_kind": "wav", "spec_log_domain": False,
         "imported_from": os.path.abspath(args.state_dict)},
        os.path.join(args.out_dir, "config.json"),
    )
    if args.tokenizer:
        shutil.copy(args.tokenizer,
                    os.path.join(args.out_dir, "tokenizer.json"))
    elif tok is not None:
        tok.save(os.path.join(args.out_dir, "tokenizer.json"))
    ckpt.save_checkpoint(args.out_dir, state, step=0)
    n = sum(int(np.prod(s)) for _, s in _tree_paths(params))
    print(f"imported {n / 1e6:.1f}M reference params -> {args.out_dir} "
          "(decode with: python -m robust_e2e_gan_tpu decode "
          f"--ckpt-dir {args.out_dir} ...)")


if __name__ == "__main__":
    main()
