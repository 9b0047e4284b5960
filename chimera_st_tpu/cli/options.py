"""CLI argument parsing (reference: fairseq/options.py:29-120).

Core flags are declared explicitly; any unrecognized ``--some-flag value``
pairs are folded into the model config dict (the reference achieves the same
surface with a two-pass parse where ``--arch`` registers model args,
options.py:77 parse_args_and_arch)."""

from __future__ import annotations

import argparse
import ast
from typing import Any, Dict, List, Tuple


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("data", nargs="?", help="data directory")
    p.add_argument("--task", default="triplet")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--log-format", default=None)
    p.add_argument("--tensorboard-logdir", default=None)
    p.add_argument("--config-yaml", default="config_wave.yaml")
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--fp16", action="store_true",
                   help="accepted for recipe compat; maps to bf16 on TPU")
    p.add_argument("--max-tokens", type=float, default=None)
    p.add_argument("--batch-size", "--max-sentences", type=int, default=None)
    p.add_argument("--required-batch-size-multiple", type=int, default=1)
    p.add_argument("--num-length-buckets", type=int, default=10)
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--shard-id", type=int, default=0)
    p.add_argument("--model-parallel-size", type=int, default=1)
    p.add_argument("--distributed-world-size", type=int, default=-1,
                   help="number of devices to use (-1: all visible devices); "
                        "under SPMD this bounds the mesh size rather than "
                        "spawning processes")
    p.add_argument("--distributed-init-method", default=None,
                   help="multi-host coordinator, reference-style "
                        "'tcp://HOST:PORT' (or bare HOST:PORT); passed to "
                        "jax.distributed.initialize on every participating "
                        "process (reference: distributed_utils.py:91-151)")
    p.add_argument("--distributed-rank", type=int, default=None,
                   help="this process's id in the multi-host job (auto-"
                        "detected on TPU pods when omitted)")
    p.add_argument("--distributed-num-procs", type=int, default=None,
                   help="total number of processes in the multi-host job "
                        "(auto-detected on TPU pods when omitted)")
    p.add_argument("--zero-sharding", default="none", choices=["none", "os"],
                   help="'os': shard optimizer state over the data axis "
                        "(ZeRO-1; reference: fairseq/optim/shard.py)")
    p.add_argument("--pipeline-stages", type=int, default=0,
                   help="pipeline-parallel stages over a `pipe` mesh axis "
                        "(GPipe schedule, parallel/pipeline.py; reference: "
                        "--pipeline-balance/--pipeline-devices via fairscale "
                        "Pipe). Supported archs: transformer, transformer_lm "
                        "(throughput; params replicated), transformer_lm_pipe "
                        "(capacity; stacked params sharded over pipe). "
                        "Uniform layer balance; requires --dropout 0.")
    p.add_argument("--pipeline-chunks", type=int, default=0,
                   help="microbatches through the pipeline (reference: "
                        "--pipeline-chunks); default = stages")
    p.add_argument("--pipeline-checkpoint", action="store_true",
                   help="rematerialize each stage in backward (reference: "
                        "--pipeline-checkpoint)")
    p.add_argument("--source-lang", "-s", default=None)
    p.add_argument("--target-lang", "-t", default=None)
    p.add_argument("--max-source-positions", type=int, default=6000000)
    p.add_argument("--max-target-positions", type=int, default=1024)
    p.add_argument("--skip-invalid-size-inputs-valid-test", action="store_true")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace into DIR "
                        "(replaces the reference's nvtx/cuda profiler hooks)")
    p.add_argument("--cpu", action="store_true",
                   help="run on CPU even when an accelerator is visible "
                        "(reference --cpu; forces jax_platforms=cpu before "
                        "any computation)")
    p.add_argument("--user-dir", default=None, metavar="DIR",
                   help="path to a python module/package whose import "
                        "registers custom tasks/models/criterions "
                        "(reference: fairseq/utils.py import_user_module)")
    return p


def add_train_args(p: argparse.ArgumentParser):
    p.add_argument("--arch", "-a", default="s2t_transformer_w2v2_interlingua_base")
    p.add_argument("--criterion", default="label_smoothed_cross_entropy")
    p.add_argument("--label-smoothing", type=float, default=0.0)
    p.add_argument("--loss-ratio", type=float, nargs="+", default=[1.0, 1.0, 1.0])
    p.add_argument("--contrastive-temp", type=float, default=0.1)
    p.add_argument("--contrastive-increase-until", type=int, default=None)
    p.add_argument("--sentence-avg", action="store_true")
    p.add_argument("--optimizer", default="adam")
    p.add_argument("--adam-betas", default="(0.9, 0.999)")
    p.add_argument("--adam-eps", type=float, default=1e-8)
    # per-optimizer knobs (previously only the adam ones were forwarded —
    # --momentum etc. were silently swallowed into model overrides)
    p.add_argument("--momentum", type=float, default=0.0,
                   help="sgd momentum / nag default 0.99 when unset")
    p.add_argument("--adagrad-eps", type=float, default=1e-10)
    p.add_argument("--adadelta-rho", type=float, default=0.9)
    p.add_argument("--adadelta-eps", type=float, default=1e-6)
    p.add_argument("--adamax-betas", default=None)
    p.add_argument("--adamax-eps", type=float, default=1e-8)
    p.add_argument("--lamb-betas", default=None)
    p.add_argument("--lamb-eps", type=float, default=1e-8)
    p.add_argument("--weight-decay", "--wd", type=float, default=0.0)
    p.add_argument("--clip-norm", type=float, default=0.0)
    p.add_argument("--lr", type=str, default="0.25")
    p.add_argument("--lr-scheduler", default="fixed")
    p.add_argument("--warmup-updates", type=int, default=0)
    p.add_argument("--warmup-init-lr", type=float, default=-1)
    # scheduler-family hyperparams (previously unreachable from the CLI —
    # polynomial/cosine/triangular/tri_stage ran on silent defaults)
    p.add_argument("--total-num-update", type=int, default=0,
                   help="polynomial_decay horizon (falls back to --max-update)")
    p.add_argument("--end-learning-rate", type=float, default=0.0)
    p.add_argument("--power", type=float, default=1.0)
    p.add_argument("--min-lr", type=float, default=None,
                   help="cosine floor (reference --min-lr)")
    p.add_argument("--max-lr", type=float, default=None,
                   help="cosine/triangular ceiling (reference --max-lr)")
    p.add_argument("--lr-period-updates", type=float, default=None)
    p.add_argument("--t-mult", type=float, default=1.0,
                   help="cosine restarts: factor to grow each period "
                        "(reference cosine_lr_scheduler --t-mult)")
    p.add_argument("--lr-shrink", type=float, default=0.1)
    p.add_argument("--init-lr-scale", type=float, default=0.01)
    p.add_argument("--final-lr-scale", type=float, default=0.01)
    p.add_argument("--phase-ratio", type=str, default=None,
                   help="tri_stage warmup,hold,decay fractions, e.g. "
                        "'(0.1,0.4,0.5)'")
    p.add_argument("--stop-min-lr", type=float, default=-1.0)
    p.add_argument("--update-freq", type=str, default="1")
    p.add_argument("--async-dispatch", type=int, default=3,
                   help="max updates kept in flight before the host blocks; "
                        "metrics materialize in batches at log/save/stop "
                        "boundaries instead of per update (overlaps batch "
                        "prep with device compute). 0 = synchronous per-"
                        "update reads (the reference trainer's behavior)")
    p.add_argument("--max-update", type=int, default=0)
    p.add_argument("--max-epoch", type=int, default=0)
    p.add_argument("--stop-time-hours", type=float, default=0)
    p.add_argument("--train-subset", default="train")
    p.add_argument("--valid-subset", default="valid")
    p.add_argument("--validate-interval", type=int, default=1)
    p.add_argument("--validate-interval-updates", type=int, default=0)
    p.add_argument("--disable-validation", action="store_true")
    p.add_argument("--save-dir", default="checkpoints")
    p.add_argument("--restore-file", default="checkpoint_last.ckpt")
    p.add_argument("--reset-optimizer", action="store_true")
    p.add_argument("--reset-dataloader", action="store_true")
    p.add_argument("--reset-lr-scheduler", action="store_true")
    p.add_argument("--reset-meters", action="store_true")
    p.add_argument("--save-interval", type=int, default=1)
    p.add_argument("--save-interval-updates", type=int, default=0)
    p.add_argument("--keep-last-epochs", type=int, default=-1)
    p.add_argument("--keep-interval-updates", type=int, default=-1)
    p.add_argument("--no-save", action="store_true")
    p.add_argument("--no-epoch-checkpoints", action="store_true")
    p.add_argument("--best-checkpoint-metric", default="loss")
    p.add_argument("--maximize-best-checkpoint-metric", action="store_true")
    p.add_argument("--patience", type=int, default=-1)
    p.add_argument("--num-workers", type=int, default=2)
    p.add_argument("--max-tokens-valid", type=float, default=None,
                   help="validation token budget (default: --max-tokens)")
    p.add_argument("--batch-size-valid", type=int, default=None,
                   help="validation batch size (default: --batch-size)")
    p.add_argument("--validate-after-updates", type=int, default=0,
                   help="skip validation until N updates (reference "
                        "dataset_cfg.validate_after_updates)")
    p.add_argument("--fixed-validation-seed", type=int, default=None,
                   help="seed for any stochastic validation component "
                        "(BLEU/WER decode batching; reference flag)")
    p.add_argument("--curriculum", type=int, default=0,
                   help="serve batches length-ordered (no shuffle) for the "
                        "first N epochs (reference dataset_cfg.curriculum)")
    p.add_argument("--keep-best-checkpoints", type=int, default=-1,
                   help="keep only the N best checkpoint.best_* files "
                        "(reference checkpoint_utils pruning)")
    p.add_argument("--no-last-checkpoints", action="store_true")
    p.add_argument("--no-save-optimizer-state", action="store_true",
                   help="exclude optimizer moments from checkpoints "
                        "(restore falls back to fresh optimizer state)")
    p.add_argument("--finetune-from-model", default=None, metavar="CKPT",
                   help="warm-start params from CKPT with optimizer/"
                        "lr-scheduler/meters/dataloader reset (reference "
                        "checkpoint_cfg.finetune_from_model; mutually "
                        "exclusive with --restore-file/--reset-* flags)")
    p.add_argument("--optimizer-overrides", default="{}",
                   help="accepted for recipe compat: optimizer hyperparams "
                        "always come from the current args here (the "
                        "reference patches the pickled optimizer config "
                        "on load; moments restore unchanged either way)")
    p.add_argument("--data-buffer-size", type=int, default=4)
    p.add_argument("--no-host-wire", action="store_true",
                   help="disable the train-split host-wire economy mode "
                        "(int16 PCM over the wire + device-side padding-mask "
                        "rebuild; see data/manifests.py set_wire_format)")
    p.add_argument("--ddp-backend", default=None,
                   help="accepted for recipe compat; SPMD mesh is always used")
    # fine-tune freeze controls (reference: chimera
    # w2v2_transformer_interlingua.py:106-124; implemented as optimizer
    # subtree masking, optim/freeze.py)
    p.add_argument("--task-configs", nargs="+", default=None,
                   help="joint training: per-sub-task YAML/JSON config files "
                        "(reference tasks/joint_task.py --task-configs)")
    p.add_argument("--main-task", default=None,
                   help="joint training: sub-task owning the shared "
                        "model/dictionaries")
    p.add_argument("--fix-wav2vec", action="store_true",
                   help="freeze the wav2vec2 trunk")
    p.add_argument("--fix-interlingua", action="store_true",
                   help="freeze interlingua layers + memory embedding")
    p.add_argument("--fix-decoder", action="store_true",
                   help="freeze the whole decoder")
    p.add_argument("--fix-decoder-transformers", action="store_true",
                   help="freeze the decoder transformer layers only")
    p.add_argument("--fix-encoder-transformers", action="store_true",
                   help="freeze the shared encoder transformer layers")
    p.add_argument("--reset-encoder", action="store_true",
                   help="re-init the shared encoder transformer stack after "
                        "restoring a checkpoint (reference: "
                        "w2v2_transformer_interlingua.py:191-198)")
    p.add_argument("--feature-grad-mult", type=float, default=1.0,
                   help="gradient scale on the wav2vec2 conv extractor "
                        "(0 = frozen; reference: wav2vec2.py:337)")
    return p


def add_generation_args(p: argparse.ArgumentParser):
    p.add_argument("--path", default=None, help="checkpoint path(s), ':' separated (ensemble)")
    p.add_argument("--lm-path", default=None, help="language model checkpoint for shallow fusion")
    p.add_argument("--lm-weight", type=float, default=0.0)
    p.add_argument("--ctc-lm-path", default=None,
                   help="ARPA n-gram LM for CTC prefix-beam fusion (wav2vec_ctc decode)")
    p.add_argument("--ctc-lm-weight", type=float, default=1.0)
    p.add_argument("--gen-subset", default="test")
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--nbest", type=int, default=1)
    p.add_argument("--max-len-a", type=float, default=0)
    p.add_argument("--max-len-b", type=int, default=200)
    p.add_argument("--min-len", type=int, default=1)
    p.add_argument("--min-len-a", type=float, default=0.0,
                   help="per-sentence min length = a*src_len + b (reference: "
                        "search.py:526 LengthConstrainedBeamSearch)")
    p.add_argument("--min-len-b", type=int, default=0)
    p.add_argument("--lenpen", type=float, default=1)
    p.add_argument("--unkpen", type=float, default=0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--max-decode-len", type=int, default=256)
    p.add_argument("--prefix-size", type=int, default=0)
    p.add_argument("--no-repeat-ngram-size", type=int, default=0)
    p.add_argument("--diverse-beam-groups", type=int, default=-1)
    p.add_argument("--diverse-beam-strength", type=float, default=0.5)
    p.add_argument("--sampling", action="store_true")
    p.add_argument("--sampling-topk", type=int, default=-1)
    p.add_argument("--sampling-topp", type=float, default=-1.0)
    p.add_argument("--iter-decode-max-iter", type=int, default=None,
                   help="refinement iterations for NAT models "
                        "(reference iterative_refinement_generator max_iter)")
    p.add_argument("--iter-decode-force-max-iter", action="store_true",
                   help="disable the NAT early exit; always run max_iter "
                        "rounds (reference iterative_refinement_generator)")
    p.add_argument("--iter-decode-eos-penalty", type=float, default=0.0,
                   help="Levenshtein: penalty on predicting ZERO insertions "
                        "per slot — discourages short outputs (reference "
                        "levenshtein_transformer.py forward_decoder "
                        "mask_ins_score[...,0] -= eos_penalty)")
    p.add_argument("--iter-decode-with-beam", type=int, default=1,
                   help="NAT length-beam: decode the top-B predicted lengths "
                        "in parallel and keep the best-scoring candidate "
                        "(reference iterative_refinement_generator beam_size)")
    p.add_argument("--iter-decode-with-external-reranker", action="store_true",
                   help="NAT: teacher-force-score every length-beam candidate "
                        "with the LAST --path checkpoint (an autoregressive "
                        "seq2seq model) and keep the best mean token log-prob "
                        "(reference iterative_refinement_generator.py rerank; "
                        "requires --iter-decode-with-beam > 1)")
    p.add_argument("--retain-iter-history", action="store_true",
                   help="NAT: record the canvas after every refinement round "
                        "and print them as E-<id>_<step> lines (reference "
                        "retain_history / generate.py:331)")
    p.add_argument("--print-step", action="store_true",
                   help="print the refinement step each NAT hypothesis "
                        "finalized at as I-<id> (reference generate.py:325)")
    p.add_argument("--diversity-rate", type=float, default=-1.0,
                   help="diverse-siblings rank penalty (reference search.py:745)")
    p.add_argument("--match-source-len", action="store_true",
                   help="pin hypothesis length to the source length "
                        "(reference sequence_generator.py match_source_len; "
                        "maps to per-sentence min/max = 1*src_len)")
    p.add_argument("--unnormalized", action="store_true",
                   help="rank hypotheses by raw log-prob sum instead of "
                        "length-normalized score (reference --unnormalized; "
                        "equivalent to lenpen 0)")
    p.add_argument("--kv-cache-int8", action="store_true",
                   help="store decode self-attention K/V caches as int8 with "
                        "per-row f32 scales (halves the per-step cache HBM "
                        "read; near-lossless per-row symmetric quantization)")
    p.add_argument("--retain-dropout", action="store_true",
                   help="keep dropout active through encode + the jitted "
                        "beam decode (and --score-reference scoring): "
                        "seed-reproducible MC-sampled hypotheses (reference "
                        "sequence_generator.py retain_dropout)")
    p.add_argument("--score-reference", action="store_true",
                   help="score gold targets instead of searching "
                        "(reference fairseq_cli/generate.py --score-reference)")
    p.add_argument("--replace-unk", nargs="?", const=True, default=None,
                   metavar="ALIGN_DICT",
                   help="replace hypothesis <unk> via cross-attention argmax; "
                        "optional src->tgt lexicon file (reference utils.replace_unk)")
    p.add_argument("--print-alignment", action="store_true",
                   help="emit A- lines: per-target-token source argmax of the "
                        "last decoder layer's head-averaged cross-attention "
                        "(reference: SequenceGeneratorWithAlignment)")
    p.add_argument("--remove-bpe", "--post-process", dest="remove_bpe",
                   nargs="?", const="subword_nmt", default=None)
    p.add_argument("--scoring", default="sacrebleu")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--results-path", default=None)
    return p


def initialize_distributed_from_args(args) -> None:
    """Multi-host runtime init from the --distributed-* flags.

    Accepts the reference recipes' ``tcp://HOST:PORT`` (or bare HOST:PORT)
    and rejects every other init-method scheme up front — the reference's
    ``env://``/SLURM paths (distributed_utils.py:52-90) are deliberately
    unsupported under SPMD, where one coordinator address covers the job.
    """
    init = getattr(args, "distributed_init_method", None)
    rank = getattr(args, "distributed_rank", None)
    nprocs = getattr(args, "distributed_num_procs", None)
    if init is None:
        if rank is not None or nprocs is not None:
            raise SystemExit(
                "--distributed-rank/--distributed-num-procs have no effect "
                "without --distributed-init-method tcp://HOST:PORT"
            )
        return
    coord = init[len("tcp://"):] if init.startswith("tcp://") else init
    host, sep, port = coord.rpartition(":")
    if "://" in coord or not sep or not host or not port.isdigit():
        raise SystemExit(
            "--distributed-init-method must be tcp://HOST:PORT or bare "
            "HOST:PORT (the reference's env://- and file://-style init "
            f"methods are deliberately unsupported under SPMD); got {init!r}"
        )
    from .. import parallel as _parallel

    _parallel.initialize_distributed(
        coordinator_address=coord, num_processes=nprocs, process_id=rank
    )


def require_single_host(entry_point: str) -> None:
    """Fail fast when a decode-side CLI runs inside a multi-host job.

    These entry points gather mesh-sharded device arrays to host with
    ``np.asarray`` (not fully-addressable under multi-host) and write one
    results file — neither is defined for >1 process. Multi-host decode =
    shard the INPUT instead: run one single-process job per host on a slice
    of the data (the reference's sharded-generate pattern,
    fairseq_cli/generate.py --shard-id/--num-shards).
    """
    import jax

    if jax.process_count() > 1:
        raise SystemExit(
            f"{entry_point} does not support multi-host execution: it "
            "gathers decode outputs to one host and writes a single results "
            "file. Run one single-host job per data shard instead "
            "(multi-host --distributed-init-method is for chimera-train)."
        )


def parse_with_model_overrides(
    p: argparse.ArgumentParser, argv=None
) -> Tuple[argparse.Namespace, Dict[str, Any]]:
    """Parse known args; fold leftover --flag[=]value pairs into a dict."""
    args, leftover = p.parse_known_args(argv)
    if getattr(args, "cpu", False):
        import jax

        # must precede any computation (the axon plugin ignores the plain
        # JAX_PLATFORMS env var)
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "user_dir", None):
        import_user_module(args.user_dir)
    # multi-host init is shared by EVERY entry point (the reference's
    # distributed init also covers validation/generation); doing it here —
    # before any jax device use in the mains — means no CLI silently ignores
    # the flags
    initialize_distributed_from_args(args)
    extra: Dict[str, Any] = {}
    i = 0
    while i < len(leftover):
        tok = leftover[i]
        if not tok.startswith("--"):
            raise SystemExit(f"unrecognized argument: {tok}")
        key = tok[2:]
        val: Any = True
        if "=" in key:
            key, val = key.split("=", 1)
        elif i + 1 < len(leftover) and not leftover[i + 1].startswith("--"):
            val = leftover[i + 1]
            i += 1
        if isinstance(val, str):
            try:
                val = ast.literal_eval(val)
            except (ValueError, SyntaxError):
                pass
        extra[key.replace("-", "_")] = val
        i += 1
    return args, extra


def import_user_module(path: str) -> None:
    """Import a user plugin module/package so its @register_* decorators run
    (reference: fairseq/utils.py import_user_module — sys.path injection +
    importlib by directory name)."""
    import importlib
    import os
    import sys

    # user modules extend the registries, so the core plugin packages must
    # be populated first (the reference's user modules likewise import a
    # fully-initialized fairseq package)
    import chimera_st_tpu.criterions  # noqa: F401
    import chimera_st_tpu.models  # noqa: F401
    import chimera_st_tpu.tasks  # noqa: F401

    path = os.path.abspath(path)
    if not os.path.exists(path):
        raise FileNotFoundError(f"--user-dir {path} does not exist")
    parent, name = os.path.split(path.rstrip(os.sep))
    if name.endswith(".py"):
        name = name[:-3]
    if name in sys.modules:
        existing = getattr(sys.modules[name], "__file__", "") or ""
        if os.path.dirname(os.path.abspath(existing)) != path and \
                os.path.abspath(existing) != path + ".py" and \
                not os.path.abspath(existing).startswith(path + os.sep):
            # a DIFFERENT module already owns this name — importing would
            # silently no-op and the user's registrations would be missing
            # (the reference raises ImportError for ambiguous user dirs)
            raise ImportError(
                f"--user-dir module name {name!r} collides with an already-"
                f"imported module at {existing!r}; rename the plugin directory"
            )
        return  # already imported from this very path
    sys.path.insert(0, parent)
    try:
        importlib.import_module(name)
    finally:
        sys.path.remove(parent)


def parse_lr(lr_str: str) -> float:
    """'--lr 5e-4' or '--lr 0.25,0.1' -> first value (reference takes a list)."""
    return float(str(lr_str).split(",")[0])


def parse_update_freq(s: str) -> int:
    return int(str(s).split(",")[0])
