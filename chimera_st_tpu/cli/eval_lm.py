"""chimera-eval-lm: language-model perplexity evaluation
(reference: fairseq_cli/eval_lm.py)."""

from __future__ import annotations

import logging
import math
import sys

logger = logging.getLogger("chimera_st_tpu.eval_lm")


def main(argv=None) -> None:
    from . import options

    p = options.base_parser("chimera-eval-lm")
    p.add_argument("--path", required=True)
    p.add_argument("--gen-subset", default="test")
    p.add_argument("--tokens-per-sample", type=int, default=512)
    p.add_argument("--sample-break-mode", default="none")
    p.add_argument("--context-window", type=int, default=0,
                   help="sliding-window eval: each block sees this many "
                        "tokens of preceding context whose loss is not "
                        "counted (reference: fairseq_cli/eval_lm.py "
                        "--context-window + LMContextWindowDataset)")
    args, model_overrides = options.parse_with_model_overrides(p, argv)
    options.require_single_host("chimera-eval-lm")
    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(asctime)s | %(message)s")

    import jax
    import jax.numpy as jnp
    import numpy as np

    import chimera_st_tpu.models  # noqa: F401
    from ..criterions.label_smoothed_ce import ce_loss_from_logits
    from ..tasks import setup_task

    ctx = max(args.context_window, 0)
    if ctx:
        # blocks shrink so that block + context fits tokens_per_sample
        # (reference eval_lm.py:...: tokens_per_sample -= context_window;
        # requires the contiguous stream of break-mode none)
        assert args.sample_break_mode in ("none", None), (
            "--context-window needs --sample-break-mode none"
        )
    task_cfg = {"_name": "language_modeling", "data": args.data,
                "tokens_per_sample": args.tokens_per_sample - ctx,
                "sample_break_mode": args.sample_break_mode}
    task = setup_task(task_cfg)
    task.load_dataset(args.gen_subset)

    from .generate import load_model_and_params

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model_overrides.setdefault("arch", "transformer_lm")
    model, params = load_model_and_params(args.path, task, dtype, model_overrides)

    pad = task.target_dictionary.pad()

    @jax.jit
    def nll_fn(params, net_tokens, target):
        logits = model.apply(params, net_tokens, deterministic=True)
        loss, nll = ce_loss_from_logits(logits, target, 0.0, pad)
        return nll

    itr = task.make_batch_iterator(
        task.dataset(args.gen_subset),
        max_tokens=int(args.max_tokens) if args.max_tokens else None,
        max_sentences=args.batch_size or 8,
        num_length_buckets=args.num_length_buckets,
    ).next_epoch_itr(shuffle=False)

    total_nll, total_tokens = 0.0, 0
    # rolling context tail across ordered blocks (LMContextWindowDataset
    # semantics: context positions get pad targets, so their loss is skipped)
    carry = np.full((ctx,), pad, np.int64) if ctx else None
    for batch in itr:
        nt = np.asarray(batch["net_tokens"])
        tg = np.asarray(batch["target"])
        if ctx:
            B = nt.shape[0]
            ctxs = np.empty((B, ctx), tg.dtype)
            for j in range(B):
                prev = carry if j == 0 else tg[j - 1, -ctx:]
                ctxs[j] = prev
            carry = tg[-1, -ctx:]
            nt = np.concatenate([ctxs, nt], axis=1)
            tg = np.concatenate(
                [np.full((nt.shape[0], ctx), pad, tg.dtype), tg], axis=1
            )
        nll = nll_fn(params, jnp.asarray(nt), jnp.asarray(tg))
        total_nll += float(np.asarray(nll))
        total_tokens += int(batch["ntokens"])
    nll_per_tok = total_nll / max(total_tokens, 1) / math.log(2)
    print(
        f"Evaluated {total_tokens} tokens: loss {nll_per_tok:.4f} bits/token, "
        f"perplexity {2 ** nll_per_tok:.2f}"
    )


def cli_main():
    main()


if __name__ == "__main__":
    cli_main()
