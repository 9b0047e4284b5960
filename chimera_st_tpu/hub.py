"""Hub-style convenience API (reference: fairseq/hub_utils.py
``from_pretrained`` + ``GeneratorHubInterface.translate/sample/encode/
decode``, the surface behind fairseq's torch.hub models).

    import chimera_st_tpu.hub as hub
    m = hub.from_pretrained("ckpt/checkpoint_best.ckpt", data_dir="bin",
                            source_lang="de", target_lang="en")
    m.translate(["Hallo Welt"])                  # -> ["hello world"]
    m.sample(["Hallo Welt"], sampling_topk=10)   # ancestral sampling

The roberta-specific hub lives in models/roberta_hub.py; this is the
sequence-to-sequence counterpart over any registered task/model."""

from __future__ import annotations

from typing import Any, Dict, List, Optional


def from_pretrained(
    checkpoint_path: str,
    data_dir: Optional[str] = None,
    task: str = "translation",
    bpe: Optional[str] = None,
    bpe_cfg: Optional[Dict] = None,
    tokenizer: Optional[str] = None,
    dtype: str = "float32",
    **overrides: Any,
) -> "GeneratorHubInterface":
    """Load a checkpoint + its task assets into a callable interface
    (reference hub_utils.py:28-77 from_pretrained)."""
    import jax.numpy as jnp

    import chimera_st_tpu.models  # noqa: F401 — registration
    from .cli.generate import load_model_and_params
    from .tasks import setup_task

    task_cfg = {"_name": task, "data": data_dir, **overrides}
    t = setup_task(task_cfg)
    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model, params = load_model_and_params(
        checkpoint_path, t, jdtype, dict(overrides)
    )
    return GeneratorHubInterface(
        t, model, params, bpe=bpe, bpe_cfg=bpe_cfg, tokenizer=tokenizer
    )


class GeneratorHubInterface:
    """tokenize -> bpe -> dictionary -> beam decode -> detok pipeline
    (reference hub_utils.py:80-309)."""

    def __init__(self, task, model, params, bpe=None, bpe_cfg=None,
                 tokenizer=None):
        from .data.encoders import build_bpe, build_tokenizer

        self.task = task
        self.model = model
        self.params = params
        self.src_dict = task.source_dictionary or task.target_dictionary
        self.tgt_dict = task.target_dictionary
        self.bpe = build_bpe(
            bpe_cfg if bpe_cfg else ({"_name": bpe} if bpe else None)
        )
        self.tokenizer = build_tokenizer(
            {"_name": tokenizer} if tokenizer else None
        )
        self._generators: Dict[tuple, Any] = {}

    # ------------------------------------------------------------- text I/O

    def encode(self, sentence: str):
        """str -> int32 token ids (+eos), through tokenizer + bpe."""
        import numpy as np

        if self.tokenizer is not None:
            sentence = self.tokenizer.encode(sentence)
        if self.bpe is not None:
            sentence = self.bpe.encode(sentence)
        return np.asarray(
            self.src_dict.encode_line(sentence, append_eos=True), np.int32
        )

    def decode(self, token_ids) -> str:
        s = self.tgt_dict.string(
            token_ids,
            bpe_symbol=None if self.bpe is None else "@@ ",
        )
        if self.bpe is not None and hasattr(self.bpe, "decode"):
            s = self.bpe.decode(s)
        if self.tokenizer is not None:
            s = self.tokenizer.decode(s)
        return s

    # ------------------------------------------------------------ translate

    def translate(self, sentences: List[str], beam: int = 5,
                  **gen_kwargs) -> List[str]:
        return [h[0]["text"] for h in
                self.generate(sentences, beam=beam, **gen_kwargs)]

    def sample(self, sentences: List[str], sampling_topk: int = -1,
               sampling_topp: float = -1.0, **kw) -> List[str]:
        return [h[0]["text"] for h in self.generate(
            sentences, sampling=True, sampling_topk=sampling_topk,
            sampling_topp=sampling_topp, **kw)]

    def fill_mask(self, masked_input: str, topk: int = 5,
                  mask_token: str = "<mask>", match_source_len: bool = True,
                  **gen_kwargs):
        """Denoising-infill a ``<mask>`` span (reference:
        models/bart/hub_interface.py:166-201 BARTHubInterface.fill_mask):
        bpe-encode the spans around the mask, beam-decode with beam >= topk,
        return [(text, score)] best-first. ``match_source_len`` pins the
        hypothesis length to the source length (the reference default)."""
        assert mask_token in masked_input, f"input needs one {mask_token}"
        if match_source_len:
            gen_kwargs.setdefault("max_len_a", 1.0)
            gen_kwargs.setdefault("max_len_b", 0)
            gen_kwargs.setdefault("min_len_a", 1.0)
            gen_kwargs.setdefault("min_len_b", -1)
        import numpy as np

        spans = masked_input.split(mask_token)
        if self.bpe is not None:
            spans = [self.bpe.encode(s.strip()) for s in spans]
        else:
            spans = [s.strip() for s in spans]
        joined = f" {mask_token} ".join(spans).strip()
        ids = np.asarray(
            self.src_dict.encode_line(joined, append_eos=True), np.int32
        )
        gen_kwargs["beam"] = max(topk, gen_kwargs.get("beam", 1))
        hyps = self.generate_tokens([ids], nbest=topk, **gen_kwargs)[0]
        return [(h["text"], h["score"]) for h in hyps]

    def generate(self, sentences: List[str], **gen_kwargs) -> List[List[Dict]]:
        """-> per-sentence n-best [{'text', 'tokens', 'score'}] lists."""
        return self.generate_tokens(
            [self.encode(s) for s in sentences], **gen_kwargs
        )

    def generate_tokens(self, encoded, beam: int = 5, nbest: int = 1,
                        **gen_kwargs) -> List[List[Dict]]:
        import jax.numpy as jnp
        import numpy as np

        from .data.batching import collate_tokens

        key = (beam, tuple(sorted(gen_kwargs.items())))
        if key not in self._generators:
            cfg = type("GenCfg", (), {"beam": beam, **gen_kwargs})
            self._generators[key] = self.task.build_generator(self.model, cfg)
        gen = self._generators[key]

        src = collate_tokens(
            encoded, self.src_dict.pad(), dtype=np.int32
        )
        lengths = jnp.asarray([len(e) for e in encoded], jnp.int32)
        tokens, scores, lens = (
            np.asarray(x)
            for x in gen.generate_text(
                self.params, jnp.asarray(src), src_lengths=lengths
            )
        )
        # reuse the generator's hypothesis unpacking; layer the decoded text
        # on top (review cleanup: this loop duplicated to_hypotheses)
        from .generation.generator import SequenceGenerator

        batches = SequenceGenerator.to_hypotheses(
            tokens, scores, lens, nbest=nbest
        )
        for hyps in batches:
            for h in hyps:
                h["text"] = self.decode(h["tokens"])
        return batches
