"""chimera-interactive: stdin-driven inference
(reference: fairseq_cli/interactive.py:42-317 — for the triplet task, input
lines are .wav file paths; output is S-/W-/H-/D-/P- lines)."""

from __future__ import annotations

import logging
import sys
import time

logger = logging.getLogger("chimera_st_tpu.interactive")


def buffered_read(input_fh, buffer_size: int):
    buf = []
    for line in input_fh:
        line = line.strip()
        if not line:
            continue
        buf.append(line)
        if len(buf) >= buffer_size:
            yield buf
            buf = []
    if buf:
        yield buf


_constraint_gen_cache = {}  # (shape, bytes) -> SequenceGenerator


def main(argv=None) -> None:
    from . import options

    p = options.base_parser("chimera-interactive")
    options.add_generation_args(p)
    p.add_argument("--buffer-size", type=int, default=1)
    p.add_argument("--input", default="-")
    p.add_argument("--constraints", nargs="?", const="ordered", default=None,
                   choices=["ordered", "unordered"],
                   help="lexically constrained decoding (text tasks): input "
                        "lines are 'source\\tphrase1\\tphrase2...'; 'ordered' "
                        "requires phrases in the given order, 'unordered' "
                        "accepts any order (reference: fairseq-interactive "
                        "--constraints {ordered,unordered}, "
                        "token_generation_constraints.py:202)")
    args, model_overrides = options.parse_with_model_overrides(p, argv)
    options.require_single_host("chimera-interactive")
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(asctime)s | %(message)s")

    import jax.numpy as jnp
    import numpy as np

    import chimera_st_tpu.models  # noqa: F401
    from ..tasks import setup_task
    from .generate import load_model_and_params

    task_cfg = {"_name": args.task, "data": args.data,
                "config_yaml": args.config_yaml}
    task = setup_task(task_cfg)
    tgt_dict = task.target_dictionary

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, params = load_model_and_params(args.path, task, dtype, model_overrides)

    class GenCfg:
        beam = args.beam
        max_len_a = args.max_len_a
        max_len_b = args.max_len_b
        min_len = args.min_len
        lenpen = args.lenpen
        unkpen = args.unkpen
        temperature = args.temperature
        max_decode_len = args.max_decode_len
        kv_cache_int8 = getattr(args, "kv_cache_int8", False)

    generator = task.build_generator(model, GenCfg)
    logger.info("Type a .wav file path per line and press Enter:")

    input_fh = sys.stdin if args.input == "-" else open(args.input)
    is_audio_task = hasattr(task, "get_interactive_examples")
    start_id = 0
    for lines in buffered_read(input_fh, args.buffer_size):
        t0 = time.time()
        if is_audio_task:
            wavs = task.get_interactive_examples(lines)
            batch = task.batch_interactive(wavs)
            tokens, scores, lens = generator.generate_audio(
                params,
                jnp.asarray(batch["audio"]),
                jnp.asarray(batch["audio_padding_mask"]),
                src_lengths=jnp.asarray(batch["audio_lengths"]),
            )
        else:
            # text task: lines are source sentences (reference:
            # interactive.py for --task translation); with --constraints,
            # tab-separated constraint phrases follow the source
            from ..data.batching import collate_tokens

            src_dict = task.source_dictionary
            constraints = None
            if args.constraints:
                split = [l.split("\t") for l in lines]
                lines = [s[0] for s in split]
                constraints = [
                    [
                        [int(t) for t in tgt_dict.encode_line(p, append_eos=False)]
                        for p in s[1:]
                    ]
                    for s in split
                ]
            encoded = [src_dict.encode_line(l) for l in lines]
            T = ((max(len(e) for e in encoded) + 15) // 16) * 16
            src = collate_tokens(encoded, src_dict.pad(), target_len=T)
            lengths = np.asarray([len(e) for e in encoded], np.int32)
            gen = generator
            if constraints is not None and any(any(c) for c in constraints):
                from ..generation.generator import SequenceGenerator
                from ..generation.search_strategies import (
                    LexicallyConstrainedSearch,
                    UnorderedLexicallyConstrainedSearch,
                    pack_constraint_phrases,
                    pack_constraints,
                )

                if args.constraints == "unordered":
                    packed = pack_constraint_phrases(
                        constraints, pad=tgt_dict.pad()
                    )
                    make_strategy = UnorderedLexicallyConstrainedSearch
                else:
                    packed = pack_constraints(constraints, pad=tgt_dict.pad())
                    make_strategy = LexicallyConstrainedSearch
                # the packed constraints are baked into the jitted beam
                # program as constants, so each DISTINCT constraint set
                # compiles once; identical sets (repeated lines, re-runs)
                # reuse the cached generator instead of rebuilding + paying
                # a fresh trace per batch (review fix). Bounded cache.
                key = (args.constraints, packed.shape, packed.tobytes())
                gen = _constraint_gen_cache.get(key)
                if gen is None:
                    gen = SequenceGenerator(
                        model, generator.s,
                        pad=tgt_dict.pad(), eos=tgt_dict.eos(),
                        unk=tgt_dict.unk(),
                        strategy=make_strategy(
                            packed, pad=tgt_dict.pad(), eos=tgt_dict.eos()
                        ),
                    )
                    if len(_constraint_gen_cache) >= 16:
                        _constraint_gen_cache.pop(
                            next(iter(_constraint_gen_cache))
                        )
                    _constraint_gen_cache[key] = gen
            tokens, scores, lens = gen.generate_text(
                params, jnp.asarray(src), src_lengths=jnp.asarray(lengths)
            )
        tokens, scores, lens = map(np.asarray, (tokens, scores, lens))
        for b, line in enumerate(lines):
            sid = start_id + b
            print(f"S-{sid}\t{line}")
            print(f"W-{sid}\t{time.time() - t0:.3f}\tseconds")
            for k in range(min(args.nbest, tokens.shape[1])):
                L = int(lens[b, k])
                hyp = tgt_dict.string(
                    tokens[b, k, :L], bpe_symbol=args.remove_bpe
                )
                print(f"H-{sid}\t{scores[b, k]:.4f}\t{hyp}")
                print(f"D-{sid}\t{scores[b, k]:.4f}\t{hyp}")
                print(f"P-{sid}\t{scores[b, k]:.4f}")
        start_id += len(lines)
        sys.stdout.flush()


def cli_main():
    main()


if __name__ == "__main__":
    cli_main()
