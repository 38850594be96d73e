"""Chunked-encode equivalence: the per-decode-step staged encode of
decode/chunked_encode.py must reproduce the monolithic
RobustE2E.encode_for_decode exactly (same op sequences on the same
values), and the chunked pipelined searcher must yield the sequential
searcher's results token-exactly."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robust_e2e_gan_tpu.config import (
    AttentionConfig,
    BeamSearchConfig,
    DecoderConfig,
    DiscriminatorConfig,
    E2EConfig,
    EncoderConfig,
    EnhancerConfig,
    FrontendConfig,
    JointConfig,
)
from robust_e2e_gan_tpu.data.synthetic import SyntheticConfig, make_batch
from robust_e2e_gan_tpu.decode.beam import (
    make_beam_searcher,
    make_chunked_pipelined_beam_searcher,
)
from robust_e2e_gan_tpu.decode.chunked_encode import (
    build_chunked_encode,
    make_chunk_plan,
)
from robust_e2e_gan_tpu.pipeline import RobustE2E

VOCAB = 12
JCFG1 = JointConfig(
    e2e=E2EConfig(
        frontend=FrontendConfig(n_mels=24),
        encoder=EncoderConfig(input_dim=24, vgg_channels=(4, 8),
                              num_layers=1, hidden_dim=32, proj_dim=32),
        attention=AttentionConfig(dim=24, conv_channels=4, conv_kernel=11),
        decoder=DecoderConfig(vocab_size=VOCAB, embed_dim=16, hidden_dim=32),
    ),
    enhancer=EnhancerConfig(input_dim=257, num_layers=1, hidden_dim=32),
    discriminator=DiscriminatorConfig(input_dim=24, channels=(4, 8)),
)
# 2 layers on both sides exercises the layer>0 lane plumbing + the
# inter-layer projection stage
JCFG2 = dataclasses.replace(
    JCFG1,
    e2e=dataclasses.replace(
        JCFG1.e2e,
        encoder=dataclasses.replace(JCFG1.e2e.encoder, num_layers=2),
    ),
    enhancer=dataclasses.replace(JCFG1.enhancer, num_layers=2),
)


def _setup(jcfg, n_batch=2, seed=3):
    model = RobustE2E(jcfg)
    rng = np.random.default_rng(seed)
    scfg = SyntheticConfig(vocab_size=VOCAB, min_tokens=2, max_tokens=4)
    batch = make_batch(n_batch, scfg, rng, ignore_id=-1)
    wav = jnp.asarray(batch["noisy_wav"])
    lens = jnp.asarray(batch["wav_lengths"])
    params = model.init(
        jax.random.PRNGKey(7), wav, lens, jnp.asarray(batch["labels"]),
        use_enhancer=True, method=RobustE2E.asr_forward,
    )["params"]
    return model, params, wav, lens


def _run_chunked(model, jcfg, params, wav, lens, n_steps, use_enhancer):
    plan = make_chunk_plan(jcfg, wav.shape[1], n_steps, use_enhancer)
    init_fn, step_fn, finalize_fn = build_chunked_encode(
        model, jcfg, plan, use_enhancer
    )

    @jax.jit
    def run(params, wav, lens):
        carry = init_fn(params, wav, lens)
        carry = jax.lax.fori_loop(
            0, n_steps, lambda i, c: step_fn(params, c, i), carry
        )
        return finalize_fn(params, carry, n_steps)

    return plan, run(params, wav, lens)


@pytest.mark.parametrize("jcfg", [JCFG1, JCFG2], ids=["1layer", "2layer"])
@pytest.mark.parametrize("use_enhancer", [True, False])
def test_chunked_encode_matches_monolithic(jcfg, use_enhancer):
    model, params, wav, lens = _setup(jcfg)
    ref = model.apply(
        {"params": params}, wav, lens, use_enhancer,
        method=RobustE2E.encode_for_decode,
    )
    plan, got = _run_chunked(
        model, jcfg, params, wav, lens, 24, use_enhancer
    )
    names = ("hs", "hmask", "hlens", "ctc_logits", "enc_proj")
    for name, r, g in zip(names, ref, got):
        assert r.shape == g.shape, (name, r.shape, g.shape)
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(g, np.float32),
            rtol=1e-5, atol=1e-5, err_msg=name,
        )


def test_chunked_encode_finalize_covers_leftover():
    """A step budget smaller than the schedule: the un-run stages must
    complete in finalize and still match the monolithic encode."""
    model, params, wav, lens = _setup(JCFG2)
    ref = model.apply(
        {"params": params}, wav, lens, True,
        method=RobustE2E.encode_for_decode,
    )
    # budget of 0 beam steps -> the ENTIRE schedule runs in finalize
    plan = make_chunk_plan(JCFG2, wav.shape[1], 16, True)
    init_fn, step_fn, finalize_fn = build_chunked_encode(
        model, JCFG2, plan, True
    )
    got = jax.jit(
        lambda p, w, l: finalize_fn(p, init_fn(p, w, l), 0)
    )(params, wav, lens)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(g, np.float32),
            rtol=1e-5, atol=1e-5,
        )


def test_chunk_plan_budget():
    plan = make_chunk_plan(JCFG2, 16000, 48, True)
    assert plan.total_steps <= 48
    kinds = [s.kind for s in plan.stages]
    assert kinds[0] == "stft" and kinds[-1] == "noop"
    assert kinds[-2] == "heads"
    assert kinds.count("lstm") == 4  # 2 enhancer + 2 encoder sweeps
    assert kinds.count("proj") == 1  # between the two encoder layers
    assert kinds.count("vgg_tail") == 1  # exact-boundary final chunk


def test_chunked_pipelined_searcher_matches_sequential():
    """Same contract as make_pipelined_beam_searcher: identical results
    in order, including the mixed-shape flush/re-prime path."""
    model, params, _, _ = _setup(JCFG2)
    rng = np.random.default_rng(11)
    scfg = SyntheticConfig(vocab_size=VOCAB, min_tokens=2, max_tokens=4)
    batches = []
    for _ in range(3):
        b = make_batch(2, scfg, rng, ignore_id=-1)
        batches.append((jnp.asarray(b["noisy_wav"]),
                        jnp.asarray(b["wav_lengths"])))

    bcfg = BeamSearchConfig(beam_size=3, ctc_weight=0.3, max_steps=8,
                            early_exit=False)
    seq = make_beam_searcher(model, JCFG2.e2e, bcfg, use_enhancer=True)
    pipe = make_chunked_pipelined_beam_searcher(
        model, JCFG2.e2e, bcfg, use_enhancer=True
    )

    for stream in (batches[:1], batches):
        ref = [seq(params, w, l) for w, l in stream]
        got = list(pipe(params, stream))
        assert len(got) == len(ref)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r.tokens),
                                          np.asarray(g.tokens))
            np.testing.assert_allclose(np.asarray(r.scores),
                                       np.asarray(g.scores),
                                       rtol=1e-4, atol=1e-4)

    # mixed shapes: flush + re-prime at the boundary
    b_long = make_batch(2, scfg, rng, ignore_id=-1,
                        pad_to_samples=int(batches[0][0].shape[1] * 2))
    mixed = batches[:2] + [(jnp.asarray(b_long["noisy_wav"]),
                            jnp.asarray(b_long["wav_lengths"]))]
    ref = [seq(params, w, l) for w, l in mixed]
    got = list(pipe(params, mixed))
    assert len(got) == 3
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r.tokens),
                                      np.asarray(g.tokens))

    with pytest.raises(ValueError):
        make_chunked_pipelined_beam_searcher(
            model, JCFG2.e2e,
            dataclasses.replace(bcfg, early_exit=True),
        )


def test_chunked_encode_aligned_frame_count():
    """t % 4 == 0 exercises the non-ragged VGG boundary (the head/tail
    exact-geometry slices must also be right when pooling is even)."""
    model, params, wav, lens = _setup(JCFG2)
    # pad so num_frames = 1 + (N-400)//160 is a multiple of 4
    n = 400 + 160 * 47  # t = 48
    wav = jnp.pad(wav, ((0, 0), (0, n - wav.shape[1])))
    ref = model.apply(
        {"params": params}, wav, lens, True,
        method=RobustE2E.encode_for_decode,
    )
    _, got = _run_chunked(model, JCFG2, params, wav, lens, 24, True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(g, np.float32),
            rtol=1e-5, atol=1e-5,
        )


def test_chunked_encode_global_cmvn():
    """Global-CMVN frontends chunk too (constant stats applied in the
    fbank stage; the sequential path bakes the same constants)."""
    jcfg = dataclasses.replace(
        JCFG1,
        e2e=dataclasses.replace(
            JCFG1.e2e,
            frontend=dataclasses.replace(JCFG1.e2e.frontend,
                                         cmvn="global"),
        ),
    )
    rng = np.random.default_rng(5)
    mean = rng.normal(size=(jcfg.e2e.frontend.n_mels,)).astype(np.float32)
    inv_std = (0.5 + rng.random(jcfg.e2e.frontend.n_mels)).astype(
        np.float32
    )
    model = RobustE2E(jcfg, cmvn_stats=(mean, inv_std))
    scfg = SyntheticConfig(vocab_size=VOCAB, min_tokens=2, max_tokens=4)
    batch = make_batch(2, scfg, rng, ignore_id=-1)
    wav = jnp.asarray(batch["noisy_wav"])
    lens = jnp.asarray(batch["wav_lengths"])
    params = model.init(
        jax.random.PRNGKey(7), wav, lens, jnp.asarray(batch["labels"]),
        use_enhancer=True, method=RobustE2E.asr_forward,
    )["params"]
    ref = model.apply(
        {"params": params}, wav, lens, True,
        method=RobustE2E.encode_for_decode,
    )
    _, got = _run_chunked(model, jcfg, params, wav, lens, 24, True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(g, np.float32),
            rtol=1e-5, atol=1e-5,
        )


def test_chunked_encode_flagship_geometry_exact():
    """Exactness at the REAL bench geometry (t=694, 58-frame chunks,
    c4=16 VGG chunks with head/regular/tail boundaries) in f32 — the
    on-chip bf16 divergence is untrained-weight chaos amplifying MXU
    rounding, not indexing (this test pins the indexing)."""
    import __graft_entry__ as g

    jcfg = g._flagship_config(52)
    model = RobustE2E(jcfg)
    rng = np.random.default_rng(0)
    scfg = SyntheticConfig(vocab_size=52, min_tokens=48, max_tokens=58)
    batch = make_batch(1, scfg, rng, ignore_id=-1)
    wav = jnp.asarray(batch["noisy_wav"])
    lens = jnp.asarray(batch["wav_lengths"])
    params = model.init(
        jax.random.PRNGKey(0), wav, lens, jnp.asarray(batch["labels"]),
        use_enhancer=True, method=RobustE2E.asr_forward,
    )["params"]
    ref = jax.jit(lambda p, w, l: model.apply(
        {"params": p}, w, l, True,
        method=RobustE2E.encode_for_decode))(params, wav, lens)
    _, got = _run_chunked(model, jcfg, params, wav, lens, 48, True)
    for r, g_ in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(g_, np.float32),
            rtol=2e-5, atol=2e-5,
        )
