"""Full-pipeline golden decode parity (VERDICT r1 item 6).

The torch reference model (tests/torch_reference.py) + an independent
dynamic-Python beam oracle (tests/beam_oracle.py) define the expected
hypotheses on fixed synthetic audio. The jitted generator and the full
generate CLI (loading a fairseq-style .pt of the same weights) must reproduce
them token-for-token (reference: fairseq/sequence_generator.py:179-769,
fairseq_cli/generate.py:34-398)."""

import re
from argparse import Namespace
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from chimera_st_tpu.checkpoint.torch_import import import_interlingua_state_dict
from chimera_st_tpu.generation.generator import GeneratorSettings, SequenceGenerator
from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
from tests.beam_oracle import oracle_beam
from tests.test_interlingua_model import TINY
from tests.torch_reference import TorchChimera

BEAM = 3
MAX_LEN = 8
LENPEN = 1.5
N_UTT = 6


@pytest.fixture(scope="module")
def golden():
    torch.manual_seed(7)
    tref = TorchChimera(TINY).eval()
    # sharpen the output distribution: default-init logits on a 16-d model are
    # near-uniform, so beam hypotheses tie within float round-off and the
    # token-for-token comparison would test tie-breaking noise, not decoding
    with torch.no_grad():
        tref.decoder.embed_tokens.weight.mul_(4.0)
    rng = np.random.default_rng(11)
    wavs = [
        (rng.normal(size=int(n)) * 0.1).astype(np.float32)
        for n in rng.integers(350, 700, size=N_UTT)
    ]
    expected = []
    with torch.no_grad():
        for wav in wavs:
            mem = tref.encode_audio(
                torch.tensor(wav[None, :]), torch.zeros(1, len(wav), dtype=torch.bool)
            )

            def lp(prefixes):
                n = prefixes.shape[0]
                logits = tref.decode(
                    torch.tensor(prefixes), mem.repeat(n, 1, 1)
                )[:, -1, :]
                return torch.log_softmax(logits.double(), -1).numpy()

            expected.append(
                oracle_beam(lp, BEAM, MAX_LEN, min_len=1, len_penalty=LENPEN)
            )
    return tref, wavs, expected


def test_generator_matches_oracle(golden):
    tref, wavs, expected = golden
    params = {"params": import_interlingua_state_dict(tref.state_dict())}
    model = ChimeraInterlinguaModel(TINY)
    gen = SequenceGenerator(
        model,
        GeneratorSettings(beam_size=BEAM, max_decode_len=MAX_LEN,
                          len_penalty=LENPEN, min_len=1),
    )
    # batched, mixed lengths: pad to a common bucket like the CLI does
    T = max(len(w) for w in wavs)
    audio = np.zeros((len(wavs), T), np.float32)
    mask = np.ones((len(wavs), T), bool)
    for i, w in enumerate(wavs):
        audio[i, : len(w)] = w
        mask[i, : len(w)] = False
    tokens, scores, lens = map(
        np.asarray, gen.generate_audio(params, jnp.asarray(audio), jnp.asarray(mask))
    )
    for b in range(len(wavs)):
        for k in range(BEAM):
            exp_toks, exp_score = expected[b][k]
            L = int(lens[b, k])
            got = tokens[b, k, :L]
            np.testing.assert_array_equal(
                got, exp_toks, err_msg=f"utt {b} hypo {k}: {got} != {exp_toks}"
            )
            # fp32 vs float64-oracle drift accumulates over 8 steps; tokens
            # above are compared exactly, scores within 1e-2
            np.testing.assert_allclose(scores[b, k], exp_score, atol=1e-2)


def test_generate_cli_matches_oracle(golden, tmp_path):
    from chimera_st_tpu.cli import generate
    from chimera_st_tpu.data.audio import write_wav

    tref, wavs, expected = golden

    # data dir: one test split over the fixed wavs; dict covers the vocab ids
    root = tmp_path
    (root / "wavs").mkdir()
    with open(root / "test.tsv", "w") as f:
        f.write("id\taudio\tn_frames\tsrc_text\ttgt_text\n")
        for i, w in enumerate(wavs):
            write_wav(str(root / "wavs" / f"u{i}.wav"), w)
            f.write(f"u{i}\twavs/u{i}.wav:0:{len(w)}\t{len(w)}\tsrc\ttgt\n")
    # dictionary: ids 4..V-1 map to tokens w4..w{V-1} (nspecial = 4)
    with open(root / "dict.txt", "w") as f:
        for i in range(4, TINY.tgt_vocab_size):
            f.write(f"w{i} 1\n")
    (root / "config_wave.yaml").write_text(
        f"audio_root: {root}\nuse_audio_input: true\n"
        "vocab_filename: dict.txt\nsrc_vocab_filename: dict.txt\n"
    )

    # fairseq-style torch checkpoint of the reference weights
    ns = Namespace(
        encoder_embed_dim=TINY.encoder_embed_dim,
        encoder_ffn_embed_dim=TINY.encoder_ffn_dim,
        encoder_layers=TINY.encoder_layers,
        encoder_attention_heads=TINY.encoder_heads,
        decoder_embed_dim=TINY.decoder_embed_dim,
        decoder_ffn_embed_dim=TINY.decoder_ffn_dim,
        decoder_layers=TINY.decoder_layers,
        decoder_attention_heads=TINY.decoder_heads,
        interlingua_length=TINY.interlingua_length,
        interlingua_layers=TINY.interlingua_layers,
        conv_kernel_sizes=",".join(map(str, TINY.conv_kernel_sizes)),
        conv_channels=TINY.conv_channels,
        activation_fn="relu",
        w2v2_embed_dim=TINY.w2v2_embed_dim,
        w2v2_ffn_dim=TINY.w2v2_ffn_dim,
        w2v2_layers=TINY.w2v2_layers,
        w2v2_heads=TINY.w2v2_heads,
        w2v2_conv_spec=TINY.w2v2_conv_spec,
        w2v2_conv_pos=TINY.w2v2_conv_pos,
        w2v2_conv_pos_groups=TINY.w2v2_conv_pos_groups,
        max_target_positions=TINY.max_target_positions,
    )
    ckpt = root / "ref.pt"
    torch.save({"model": tref.state_dict(), "args": ns}, str(ckpt))

    out_dir = root / "gen"
    out_dir.mkdir()
    generate.main([
        str(root), "--task", "triplet", "--path", str(ckpt),
        "--gen-subset", "test", "--beam", str(BEAM),
        "--max-decode-len", str(MAX_LEN), "--lenpen", str(LENPEN),
        "--min-len", "1", "--nbest", str(BEAM),
        "--batch-size", "8", "--dtype", "float32",
        "--results-path", str(out_dir), "--num-length-buckets", "1",
    ])
    text = (out_dir / "generate-test.txt").read_text()

    # H-{sid} lines carry (score, detokenized hypo); sid = row index
    hyps = {}
    for m in re.finditer(r"^H-(\d+)\t(\S+)\t(.*)$", text, re.M):
        hyps.setdefault(int(m.group(1)), []).append(
            (float(m.group(2)), m.group(3).strip())
        )
    assert set(hyps) == set(range(N_UTT))
    from chimera_st_tpu.data.dictionary import Dictionary

    d = Dictionary.load(str(root / "dict.txt"))
    for b in range(N_UTT):
        for k in range(BEAM):
            exp_toks, exp_score = expected[b][k]
            exp_str = d.string(exp_toks)
            got_score, got_str = hyps[b][k]
            assert got_str == exp_str, (b, k, got_str, exp_str)
            assert abs(got_score - exp_score) < 1e-2


def test_text_generator_matches_oracle(golden):
    """Same oracle protocol over the TEXT branch (MT path)."""
    tref, _, _ = golden
    rng = np.random.default_rng(21)
    srcs = [
        np.concatenate([rng.integers(4, TINY.src_vocab_size, size=int(n)), [2]])
        for n in rng.integers(3, 7, size=4)
    ]
    expected = []
    with torch.no_grad():
        for s in srcs:
            mem = tref.encode_text(torch.tensor(s[None, :]))

            def lp(prefixes):
                n = prefixes.shape[0]
                logits = tref.decode(
                    torch.tensor(prefixes), mem.repeat(n, 1, 1)
                )[:, -1, :]
                return torch.log_softmax(logits.double(), -1).numpy()

            expected.append(
                oracle_beam(lp, BEAM, MAX_LEN, min_len=1, len_penalty=LENPEN)
            )

    params = {"params": import_interlingua_state_dict(tref.state_dict())}
    model = ChimeraInterlinguaModel(TINY)
    gen = SequenceGenerator(
        model,
        GeneratorSettings(beam_size=BEAM, max_decode_len=MAX_LEN,
                          len_penalty=LENPEN, min_len=1),
    )
    T = max(len(s) for s in srcs)
    src = np.full((len(srcs), T), 1, np.int32)
    for i, s in enumerate(srcs):
        src[i, : len(s)] = s
    tokens, scores, lens = map(
        np.asarray, gen.generate_text(params, jnp.asarray(src))
    )
    for b in range(len(srcs)):
        for k in range(BEAM):
            exp_toks, exp_score = expected[b][k]
            L = int(lens[b, k])
            np.testing.assert_array_equal(tokens[b, k, :L], exp_toks,
                                          err_msg=f"utt {b} hypo {k}")
            np.testing.assert_allclose(scores[b, k], exp_score, atol=2e-2)


def test_lazy_select_modes_identical(golden, monkeypatch):
    """The ancestry-gather and cross-column formulations of lazy beam
    reorder are the same math — tokens, scores and lengths must match
    bit-for-bit (layers.py _lazy_select_mode)."""
    tref, wavs, _ = golden
    params = {"params": import_interlingua_state_dict(tref.state_dict())}
    model = ChimeraInterlinguaModel(TINY)
    T = max(len(w) for w in wavs)
    audio = np.zeros((len(wavs), T), np.float32)
    mask = np.ones((len(wavs), T), bool)
    for i, w in enumerate(wavs):
        audio[i, : len(w)] = w
        mask[i, : len(w)] = False

    outs = {}
    for mode in ("gather", "crosscol"):
        monkeypatch.setenv("CHIMERA_LAZY_SELECT", mode)
        gen = SequenceGenerator(
            model,
            GeneratorSettings(beam_size=BEAM, max_decode_len=MAX_LEN,
                              len_penalty=LENPEN, min_len=1),
        )
        outs[mode] = tuple(
            np.asarray(x)
            for x in gen.generate_audio(
                params, jnp.asarray(audio), jnp.asarray(mask)
            )
        )
    np.testing.assert_array_equal(outs["gather"][0], outs["crosscol"][0])
    np.testing.assert_array_equal(outs["gather"][2], outs["crosscol"][2])
    np.testing.assert_allclose(
        outs["gather"][1], outs["crosscol"][1], rtol=2e-3, atol=2e-3
    )


def test_pallas_decode_matches_default(golden, monkeypatch):
    """CHIMERA_PALLAS_DECODE=1 (fused decode-step attention over the 5D
    column-major cache, interpret mode on CPU) produces the same hypotheses
    as the XLA crosscol path."""
    tref, wavs, _ = golden
    params = {"params": import_interlingua_state_dict(tref.state_dict())}
    model = ChimeraInterlinguaModel(TINY)
    T = max(len(w) for w in wavs)
    audio = np.zeros((len(wavs), T), np.float32)
    mask = np.ones((len(wavs), T), bool)
    for i, w in enumerate(wavs):
        audio[i, : len(w)] = w
        mask[i, : len(w)] = False

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("CHIMERA_PALLAS_DECODE", flag)
        gen = SequenceGenerator(
            model,
            GeneratorSettings(beam_size=BEAM, max_decode_len=MAX_LEN,
                              len_penalty=LENPEN, min_len=1),
        )
        outs[flag] = tuple(
            np.asarray(x)
            for x in gen.generate_audio(
                params, jnp.asarray(audio), jnp.asarray(mask)
            )
        )
    np.testing.assert_array_equal(outs["0"][0], outs["1"][0])
    np.testing.assert_array_equal(outs["0"][2], outs["1"][2])
    np.testing.assert_allclose(outs["0"][1], outs["1"][1], rtol=2e-3, atol=2e-3)


def test_pallas_decode_segmented(golden, monkeypatch):
    """Pallas decode with cache segmentation: 5D caches grow on the time
    axis between segment while_loops (beam_search.py _grow_time)."""
    tref, wavs, _ = golden
    params = {"params": import_interlingua_state_dict(tref.state_dict())}
    model = ChimeraInterlinguaModel(TINY)
    T = max(len(w) for w in wavs)
    audio = np.zeros((len(wavs), T), np.float32)
    mask = np.ones((len(wavs), T), bool)
    for i, w in enumerate(wavs):
        audio[i, : len(w)] = w
        mask[i, : len(w)] = False

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("CHIMERA_PALLAS_DECODE", flag)
        gen = SequenceGenerator(
            model,
            GeneratorSettings(beam_size=BEAM, max_decode_len=MAX_LEN,
                              len_penalty=LENPEN, min_len=1,
                              cache_segment=4),
        )
        outs[flag] = tuple(
            np.asarray(x)
            for x in gen.generate_audio(
                params, jnp.asarray(audio), jnp.asarray(mask)
            )
        )
    np.testing.assert_array_equal(outs["0"][0], outs["1"][0])
