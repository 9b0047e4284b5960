"""chimera-generate: batched beam-search evaluation
(reference: fairseq_cli/generate.py:34-398 — same output protocol:
S-/T-/H-/D-/P- lines + final corpus score line)."""

from __future__ import annotations

import logging
import sys
import time
from pathlib import Path

logger = logging.getLogger("chimera_st_tpu.generate")


def load_model_and_params(path: str, task, dtype, gen_model_overrides=None):
    """Load either a native .ckpt or a fairseq torch .pt checkpoint."""
    import jax
    import jax.numpy as jnp

    from ..models.interlingua import ChimeraInterlinguaModel

    if path.endswith(".pt"):
        from ..checkpoint.torch_import import (
            import_interlingua_state_dict,
            infer_interlingua_config,
            load_torch_checkpoint,
        )

        ckpt = load_torch_checkpoint(path)
        cfg = infer_interlingua_config(
            ckpt["args"],
            tgt_vocab=len(task.target_dictionary),
            src_vocab=len(task.source_dictionary)
            if task.source_dictionary is not None
            else None,
        )
        model = ChimeraInterlinguaModel(cfg, dtype=dtype)
        params = {"params": import_interlingua_state_dict(ckpt["model"])}
        return model, params
    # native checkpoint: the train CLI stores model_cfg in extra, so the
    # exact model rebuilds without repeating arch flags
    import pickle

    with open(path, "rb") as f:
        payload = pickle.load(f)
    model_cfg = dict(payload.get("extra", {}).get("model_cfg") or {})
    model_cfg.update(gen_model_overrides or {})
    model_cfg.setdefault("arch", "s2t_transformer_w2v2_interlingua_base")
    model = task.build_model(model_cfg, dtype=dtype)

    from flax import serialization

    from .train import init_params_for_task

    class _A:
        seed = 0
        w2v2_model_path = None

    template = init_params_for_task(model, task, _A())
    params = serialization.from_state_dict(template, payload["params"])
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model, params


def run_ctc_generate(args, task, model, params, dataset, tgt_dict) -> None:
    """CTC recognition loop for decoder-less models (wav2vec_ctc): per-frame
    log-probs -> greedy collapse (beam=1) or prefix beam search with optional
    ARPA LM fusion (generation/ctc_decoder.py). Emits fairseq-style T-/H-
    lines and a final WER (letter labels: ``|`` = word boundary)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..criterions.ctc import ctc_greedy_decode
    from ..generation.ctc_decoder import ArpaLM, ctc_beam_search
    from ..scoring.wer import levenshtein

    @jax.jit
    def logits_fn(p, audio, mask):
        return model.apply(p, audio, mask, method=type(model).ctc_logits)

    lm = None
    if getattr(args, "ctc_lm_path", None):
        lm = ArpaLM(args.ctc_lm_path)
    token_strings = [tgt_dict[i] for i in range(len(tgt_dict))]
    special = {tgt_dict.pad(), tgt_dict.eos(), tgt_dict.bos()}

    def words(token_ids):
        syms = [tgt_dict[int(t)] for t in token_ids if int(t) not in special]
        return "".join(syms).replace("|", " ").split()

    itr = task.make_batch_iterator(
        dataset,
        max_tokens=int(args.max_tokens) if args.max_tokens else None,
        max_sentences=args.batch_size,
        seed=args.seed,
        num_length_buckets=args.num_length_buckets,
    ).next_epoch_itr(shuffle=False)
    out = open(Path(args.results_path) / f"generate-{args.gen_subset}.txt", "w") \
        if args.results_path else sys.stdout
    errs = total = n_sent = 0
    t0 = time.time()
    for batch in itr:
        logits, frame_pad = logits_fn(
            params, jnp.asarray(batch["audio"]),
            jnp.asarray(batch["audio_padding_mask"]),
        )
        lprobs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        frame_pad = None if frame_pad is None else np.asarray(frame_pad)
        for b in range(lprobs.shape[0]):
            sid = int(batch["id"][b]) if "id" in batch else n_sent
            lp = lprobs[b] if frame_pad is None else lprobs[b][~frame_pad[b]]
            if args.beam > 1:
                hyps = ctc_beam_search(
                    lp, beam_size=args.beam, blank=0, lm=lm,
                    lm_weight=getattr(args, "ctc_lm_weight", 1.0),
                    token_strings=token_strings,
                )
                hyp_ids, score = hyps[0]
            else:
                hyp_ids = ctc_greedy_decode(lp, blank_idx=0)
                score = float(lp.max(-1).sum())
            hyp = words(hyp_ids)
            if not args.quiet:
                print(f"H-{sid}\t{score:.4f}\t{' '.join(hyp)}", file=out)
            if batch.get("target") is not None:
                ref = words(np.asarray(batch["target"][b]))
                if not args.quiet:
                    print(f"T-{sid}\t{' '.join(ref)}", file=out)
                errs += levenshtein(hyp, ref)
                total += max(len(ref), 1)
            n_sent += 1
    dt = time.time() - t0
    logger.info(
        f"Recognized {n_sent} utterances in {dt:.1f}s "
        f"({n_sent / max(dt, 1e-9):.2f} utt/s)"
    )
    if total:
        print(
            f"Generate {args.gen_subset} with beam={args.beam}: "
            f"WER {100.0 * errs / total:.2f}",
            file=out,
        )
    if out is not sys.stdout:
        out.close()


def run_score_reference(args, task, model, params, dataset, tgt_dict) -> None:
    """--score-reference: teacher-force the gold target through the model and
    emit H-/P- lines carrying its mean/positional log-probs (reference:
    fairseq_cli/generate.py:135-141 building SequenceScorer instead of the
    beam generator)."""
    import jax.numpy as jnp
    import numpy as np

    from ..generation.scorer import SequenceScorer

    scorer = SequenceScorer(
        model, pad=tgt_dict.pad(), eos=tgt_dict.eos(),
        retain_dropout=getattr(args, "retain_dropout", False), seed=args.seed,
    )
    itr = task.make_batch_iterator(
        dataset,
        max_tokens=int(args.max_tokens) if args.max_tokens else None,
        max_sentences=args.batch_size,
        seed=args.seed,
        num_length_buckets=args.num_length_buckets,
    ).next_epoch_itr(shuffle=False)
    out = open(Path(args.results_path) / f"generate-{args.gen_subset}.txt", "w") \
        if args.results_path else sys.stdout
    strip = task.lang_tag_indices() if hasattr(task, "lang_tag_indices") else set()
    n_sent = 0
    for batch in itr:
        target = jnp.asarray(batch["target"])
        if "audio" in batch:
            res = scorer.score_audio(
                params, jnp.asarray(batch["audio"]),
                jnp.asarray(batch["audio_padding_mask"]), target,
            )
        else:
            res = scorer.score_text(
                params, jnp.asarray(batch["src_tokens"]), target
            )
        score = np.asarray(res["score"])
        pos = np.asarray(res["positional_scores"])
        length = np.asarray(res["length"])
        for b in range(target.shape[0]):
            sid = int(batch["id"][b]) if "id" in batch else n_sent
            ref_str = tgt_dict.string(
                batch["target"][b], bpe_symbol=args.remove_bpe,
                extra_symbols_to_ignore=strip,
            )
            if not args.quiet:
                print(f"T-{sid}\t{ref_str}", file=out)
                print(f"H-{sid}\t{score[b]:.4f}\t{ref_str}", file=out)
                print(
                    f"P-{sid}\t"
                    + " ".join(f"{p:.4f}" for p in pos[b][: int(length[b])]),
                    file=out,
                )
            n_sent += 1
    logger.info(f"Scored {n_sent} reference sentences")
    if out is not sys.stdout:
        out.close()


def main(argv=None) -> None:
    from . import options

    p = options.base_parser("chimera-generate")
    options.add_generation_args(p)
    args, model_overrides = options.parse_with_model_overrides(p, argv)
    options.require_single_host("chimera-generate")
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(asctime)s | %(message)s")

    import jax.numpy as jnp
    import numpy as np

    import chimera_st_tpu.models  # noqa: F401
    import chimera_st_tpu.scoring  # noqa: F401
    from ..scoring import build_scorer
    from ..tasks import setup_task

    task_cfg = {"_name": args.task, "data": args.data, "config_yaml": args.config_yaml,
                "source_lang": args.source_lang, "target_lang": args.target_lang,
                **model_overrides}  # unknown flags reach the task (e.g. --labels)
    task = setup_task(task_cfg)
    task.load_dataset(args.gen_subset)
    dataset = task.dataset(args.gen_subset)
    tgt_dict = task.target_dictionary

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, params = load_model_and_params(args.path.split(":")[0], task, dtype, model_overrides)

    if hasattr(type(model), "ctc_logits") and not hasattr(model, "decoder"):
        # speech recognition over a CTC head (wav2vec_ctc): greedy collapse
        # or prefix beam search, optional ARPA LM fusion (reference analogue:
        # examples/speech_recognition W2l decoders driving Wav2VecCtc)
        run_ctc_generate(args, task, model, params, dataset, tgt_dict)
        return

    # data-parallel decode over the device mesh: batch dims shard on `data`
    # and XLA propagates (verified output-identical to single-device decode,
    # tests/test_multichip_decode.py); replaces the reference's multi-GPU
    # --distributed-world-size generate sharding (fairseq_cli/generate.py)
    import jax

    devices = jax.devices()
    if getattr(args, "distributed_world_size", -1) > 0:
        devices = devices[: args.distributed_world_size]
    mesh = None
    if len(devices) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import make_mesh

        mesh = make_mesh(devices=devices)
        n_data = mesh.shape["data"]
        params = jax.device_put(params, NamedSharding(mesh, P()))
        logger.info(f"decode mesh: {dict(mesh.shape)}")

    def maybe_shard(x):
        x = jnp.asarray(x)
        if mesh is not None and x.ndim >= 1 and x.shape[0] % n_data == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(x, NamedSharding(mesh, P("data")))
        return x

    if args.score_reference:
        # score gold targets instead of searching (reference:
        # fairseq_cli/generate.py:135-141 + sequence_scorer.py)
        run_score_reference(args, task, model, params, dataset, tgt_dict)
        return

    class GenCfg:
        diversity_rate = args.diversity_rate
        beam = args.beam
        if args.iter_decode_max_iter is not None:  # NAT refinement loops
            iter_decode_max_iter = args.iter_decode_max_iter
        iter_decode_force_max_iter = args.iter_decode_force_max_iter
        iter_decode_eos_penalty = args.iter_decode_eos_penalty
        iter_decode_with_beam = args.iter_decode_with_beam
        iter_decode_with_external_reranker = getattr(
            args, "iter_decode_with_external_reranker", False)
        retain_iter_history = getattr(args, "retain_iter_history", False)
        print_step = getattr(args, "print_step", False)
        max_len_a = args.max_len_a
        max_len_b = args.max_len_b
        min_len = args.min_len
        # fix: --min-len-a/b were parsed but never forwarded, so the CLI
        # LengthConstrained path silently no-oped (search.py:526 parity)
        min_len_a = getattr(args, "min_len_a", 0.0)
        min_len_b = getattr(args, "min_len_b", 0)
        if getattr(args, "match_source_len", False):
            # pin hypothesis length to source length (reference
            # sequence_generator.py match_source_len). max_lens now budget
            # REAL tokens (reference `step >= max_len` convention), so the
            # source's eos is excluded via b=-1 on both bounds
            max_len_a, max_len_b = 1.0, -1
            min_len_a, min_len_b = 1.0, -1
        lenpen = args.lenpen
        if getattr(args, "unnormalized", False):
            # raw log-prob ranking == length divisor len^0 (reference:
            # normalize_scores=False)
            lenpen = 0.0
        unkpen = args.unkpen
        temperature = args.temperature
        max_decode_len = args.max_decode_len
        no_repeat_ngram_size = getattr(args, "no_repeat_ngram_size", 0)
        diverse_beam_groups = max(args.diverse_beam_groups, 0)
        diverse_beam_strength = args.diverse_beam_strength
        sampling = args.sampling
        sampling_topk = args.sampling_topk
        sampling_topp = args.sampling_topp
        seed = args.seed
        kv_cache_int8 = getattr(args, "kv_cache_int8", False)
        retain_dropout = getattr(args, "retain_dropout", False)

    paths = args.path.split(":")
    reranker = None
    if getattr(args, "iter_decode_with_external_reranker", False):
        # reference convention (iterative_refinement_generator.py:113-120):
        # the LAST --path checkpoint is the autoregressive reranker, the
        # rest decode
        if len(paths) < 2:
            raise ValueError(
                "--iter-decode-with-external-reranker: give at least two "
                "--path checkpoints; the last one is the AR reranker")
        rr_model, rr_params = load_model_and_params(
            paths[-1], task, dtype, model_overrides)
        reranker = (rr_model, rr_params)
        paths = paths[:-1]
        if len(paths) > 1:
            raise NotImplementedError(
                "external reranking over a NAT *ensemble* is not supported; "
                "use one decoding checkpoint + one reranker")
    if len(paths) > 1 or args.lm_path:
        # ensemble / LM-fusion decode (reference: generate.py:103-128)
        from ..generation.ensemble import EnsembleSequenceGenerator
        from ..generation.generator import GeneratorSettings

        models, params_list = [model], [params]
        for extra_path in paths[1:]:
            m2, p2 = load_model_and_params(extra_path, task, dtype, model_overrides)
            models.append(m2)
            params_list.append(p2)
        from ..generation.nat_ensemble import build_nat_ensemble_generator

        nat_ens = build_nat_ensemble_generator(models, params_list, GenCfg, tgt_dict)
        if nat_ens is not None:
            # Levenshtein ensemble refinement (reference:
            # models/nat/nonautoregressive_ensembles.py EnsembleLevT)
            if args.lm_path:
                raise NotImplementedError("--lm-path is not supported for NAT decoding")
            generator = nat_ens
        else:
            lm = None
            if args.lm_path:
                lm_model, lm_params = load_model_and_params(
                    args.lm_path, task, dtype, {"arch": "transformer_lm"}
                )
                lm = (lm_model, lm_params, args.lm_weight)
            if args.sampling or args.diverse_beam_groups > 0 or \
                    args.diversity_rate >= 0:
                raise NotImplementedError(
                    "ensemble decoding supports plain beam search only here; "
                    "--sampling/--diverse-beam-groups/--diversity-rate are "
                    "single-model features (review fix: these used to be "
                    "silently ignored)")
            if getattr(args, "retain_dropout", False):
                raise NotImplementedError(
                    "--retain-dropout is a single-model decode feature "
                    "(loud rejection over a silently-deterministic ensemble)")
            settings = GeneratorSettings(
                beam_size=args.beam,
                max_len_a=GenCfg.max_len_a, max_len_b=GenCfg.max_len_b,
                min_len=args.min_len,
                min_len_a=GenCfg.min_len_a, min_len_b=GenCfg.min_len_b,
                len_penalty=GenCfg.lenpen, unk_penalty=args.unkpen,
                max_decode_len=args.max_decode_len, temperature=args.temperature,
                no_repeat_ngram_size=args.no_repeat_ngram_size,
                kv_cache_int8=GenCfg.kv_cache_int8,
            )
            d = tgt_dict
            ens = EnsembleSequenceGenerator(
                models, params_list, settings, pad=d.pad(), eos=d.eos(), unk=d.unk(),
                lm=lm,
            )

            class _EnsembleAdapter:
                s = settings

                def generate_audio(self, _params, audio, mask, src_lengths=None):
                    return ens.generate_audio(audio, mask, src_lengths)

                def generate_text(self, _params, tokens, src_lengths=None):
                    return ens.generate_text(tokens, src_lengths)

            generator = _EnsembleAdapter()
    else:
        generator = task.build_generator(model, GenCfg, reranker=reranker)
    scorer = build_scorer({"_name": args.scoring}, tgt_dict)

    itr = task.make_batch_iterator(
        dataset,
        max_tokens=int(args.max_tokens) if args.max_tokens else None,
        max_sentences=args.batch_size,
        seed=args.seed,
        num_length_buckets=args.num_length_buckets,
    ).next_epoch_itr(shuffle=False)

    out = open(Path(args.results_path) / f"generate-{args.gen_subset}.txt", "w") \
        if args.results_path else sys.stdout
    strip = task.lang_tag_indices() if hasattr(task, "lang_tag_indices") else set()

    prefix_size = int(getattr(args, "prefix_size", 0) or 0)
    if prefix_size > 0 and not getattr(generator, "supports_prefix", False):
        raise NotImplementedError(
            "--prefix-size is only supported for the single-model beam "
            "decode (NAT refinement and ensemble decoding have no prefix "
            "forcing here)")

    n_sent = 0
    n_tokens = 0
    t0 = time.time()
    for batch in itr:
        ids = batch["id"]
        prefix = None
        if prefix_size > 0 and batch.get("target") is not None:
            # force each hypothesis to start with the reference's first
            # prefix_size tokens (reference generate.py:181-186
            # prefix_tokens = target[:, :prefix_size]); pad rows force
            # nothing
            prefix = maybe_shard(
                np.asarray(batch["target"])[:, :prefix_size].astype(np.int32)
            )
        if "audio" in batch:
            tokens, scores, lens = generator.generate_audio(
                params,
                maybe_shard(batch["audio"]),
                maybe_shard(batch["audio_padding_mask"]),
                src_lengths=maybe_shard(batch["audio_lengths"]),
                **({"prefix_tokens": prefix} if prefix is not None else {}),
            )
        else:
            tokens, scores, lens = generator.generate_text(
                params,
                maybe_shard(batch["src_tokens"]),
                src_lengths=maybe_shard(batch["src_lengths"]),
                **({"prefix_tokens": prefix} if prefix is not None else {}),
            )
        tokens, scores, lens = map(np.asarray, (tokens, scores, lens))
        alignments = None
        if getattr(args, "print_alignment", False) or (
            args.replace_unk and "src_tokens" in batch
        ):
            # teacher-force the best hypothesis and argmax the last layer's
            # head-averaged cross-attention per target position (reference:
            # SequenceGeneratorWithAlignment, sequence_generator.py:906)
            if "audio" in batch:
                enc, enc_mask = model.apply(
                    params, jnp.asarray(batch["audio"]),
                    jnp.asarray(batch["audio_padding_mask"]),
                    method=type(model).encode_audio,
                )
            else:
                enc, enc_mask = model.apply(
                    params, jnp.asarray(batch["src_tokens"]),
                    method=type(model).encode_text,
                )
            eos_tok = tgt_dict.eos()
            prev_tokens = np.concatenate(
                [np.full((tokens.shape[0], 1), eos_tok, np.int32),
                 tokens[:, 0, :-1]], axis=1,
            )
            try:
                attn = model.apply(
                    params, jnp.asarray(prev_tokens), enc, enc_mask,
                    method=lambda m, t, e, em: m.decoder.cross_attention_weights(
                        t, e, em
                    ),
                )
                alignments = np.argmax(np.asarray(attn), axis=-1)  # [B, L]
            except Exception as e:  # models without a standard decoder
                logger.warning(f"--print-alignment unsupported here: {e}")
                alignments = None
        for b in range(tokens.shape[0]):
            sid = int(ids[b])
            target = batch.get("target")
            ref_str = None
            if target is not None:
                ref_str = tgt_dict.string(
                    target[b], bpe_symbol=args.remove_bpe,
                    extra_symbols_to_ignore=strip,
                )
            if not args.quiet:
                # S- carries the detokenized source when a text source
                # exists (reference generate.py:243-253; audio inputs print
                # an empty source like the reference's has_target-only path)
                src_str = ""
                src_dict = getattr(task, "source_dictionary", None)
                if "src_tokens" in batch and src_dict is not None:
                    src_str = src_dict.string(
                        batch["src_tokens"][b], bpe_symbol=args.remove_bpe,
                        extra_symbols_to_ignore=strip,
                    )
                print(f"S-{sid}\t{src_str}", file=out)
                if ref_str is not None:
                    print(f"T-{sid}\t{ref_str}", file=out)
            for k in range(min(args.nbest, tokens.shape[1])):
                L = int(lens[b, k])
                hyp_ids = tokens[b, k, :L]
                if (
                    args.replace_unk
                    and alignments is not None
                    and "src_tokens" in batch
                    and k == 0
                ):
                    # cross-attention-aligned unk replacement (reference:
                    # utils.post_process_prediction -> replace_unk; alignment
                    # indices are raw source-token positions, so the copy
                    # happens pre-BPE-stripping)
                    from ..data.dictionary import post_process
                    from ..generation.unk_replace import (
                        load_align_dict,
                        replace_unk_tokens,
                    )

                    src_dict = getattr(task, "source_dictionary", tgt_dict)
                    src_words = [
                        src_dict[int(t)]
                        for t in np.asarray(batch["src_tokens"][b])
                        if int(t) not in (src_dict.pad(), src_dict.eos())
                    ]
                    syms = replace_unk_tokens(
                        [tgt_dict[int(t)] for t in hyp_ids],
                        src_words,
                        alignments[b][:L],
                        load_align_dict(args.replace_unk),
                        tgt_dict[tgt_dict.unk()],
                    )
                    keep_ids_syms = [
                        s
                        for t, s in zip(hyp_ids, syms)
                        if int(t) not in strip
                        and int(t) not in (tgt_dict.pad(), tgt_dict.eos())
                    ]
                    hyp_str = post_process(
                        " ".join(keep_ids_syms), args.remove_bpe
                    )
                else:
                    hyp_str = tgt_dict.string(
                        hyp_ids, bpe_symbol=args.remove_bpe,
                        extra_symbols_to_ignore=strip,
                    )
                if not args.quiet:
                    print(f"H-{sid}\t{scores[b, k]:.4f}\t{hyp_str}", file=out)
                    print(f"D-{sid}\t{scores[b, k]:.4f}\t{hyp_str}", file=out)
                    print(f"P-{sid}\t{scores[b, k]:.4f}", file=out)
                    # NAT refinement introspection (reference
                    # generate.py:325-344: I- finalization step under
                    # --print-step, E-<id>_<round> canvases under
                    # --retain-iter-history)
                    last_steps = getattr(generator, "last_steps", None)
                    if k == 0 and getattr(args, "print_step", False) \
                            and last_steps is not None:
                        print(f"I-{sid}\t{int(last_steps[b])}", file=out)
                    hist = getattr(generator, "last_history", None)
                    if (
                        k == 0
                        and getattr(args, "retain_iter_history", False)
                        and hist is not None
                    ):
                        rounds = hist.shape[0]
                        upto = rounds if last_steps is None else min(
                            int(last_steps[b]) + 1, rounds)
                        for j in range(upto):
                            h_ids = [int(t) for t in hist[j, b]
                                     if int(t) != tgt_dict.pad()]
                            h_str = tgt_dict.string(
                                h_ids, bpe_symbol=args.remove_bpe,
                                extra_symbols_to_ignore=strip,
                            )
                            print(f"E-{sid}_{j}\t{h_str}", file=out)
                    if (
                        alignments is not None
                        and k == 0
                        and getattr(args, "print_alignment", False)
                    ):
                        pairs = " ".join(
                            f"{int(alignments[b, t])}-{t}" for t in range(L)
                        )
                        print(f"A-{sid}\t{pairs}", file=out)
                if k == 0 and ref_str is not None:
                    if hasattr(scorer, "add_string"):
                        scorer.add_string(ref_str, hyp_str)
                    else:
                        scorer.add(
                            [int(t) for t in target[b]], [int(t) for t in hyp_ids]
                        )
                    n_tokens += L
            n_sent += 1
    dt = time.time() - t0
    logger.info(
        f"Translated {n_sent} sentences ({n_tokens} tokens) in {dt:.1f}s "
        f"({n_sent / max(dt, 1e-9):.2f} sentences/s, {n_tokens / max(dt, 1e-9):.2f} tokens/s)"
    )
    if n_sent and hasattr(scorer, "result_string"):
        print(
            f"Generate {args.gen_subset} with beam={args.beam}: {scorer.result_string()}",
            file=out,
        )
    if out is not sys.stdout:
        out.close()


def cli_main():
    main()


if __name__ == "__main__":
    cli_main()
