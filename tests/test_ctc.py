import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import chimera_st_tpu.criterions  # noqa: F401
from chimera_st_tpu.config.registry import CRITERIONS
from chimera_st_tpu.criterions.ctc import ctc_greedy_decode
from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
from tests.test_interlingua_model import TINY


def test_ctc_criterion_loss_and_grads():
    cfg = dataclasses.replace(TINY, no_interlingua=True)
    model = ChimeraInterlinguaModel(cfg)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(2, 800)), jnp.float32)
    mask = jnp.zeros((2, 800), bool).at[1, 500:].set(True)
    params = model.init(
        jax.random.PRNGKey(0), wav, mask, jnp.zeros((2, 4), jnp.int32),
        jnp.zeros((2, 4), jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    tgt = jnp.asarray([[4, 5, 6, 2], [7, 8, 2, 1]], jnp.int32)
    crit = CRITERIONS.get("ctc_chi")({"padding_idx": 1})
    batch = {"audio": wav, "audio_padding_mask": mask, "target": tgt, "ntokens": 7.0}
    loss, ss, logging = crit(model, params, batch, train=False)
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = jax.grad(lambda p: crit(model, p, batch, train=False)[0])(params)
    assert all(
        np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
    )


def test_ctc_greedy_decode_collapse():
    # blank=0; repeated tokens collapse, blanks removed
    logits = np.zeros((6, 3))
    for t, v in enumerate([1, 1, 0, 2, 2, 1]):
        logits[t, v] = 1.0
    assert ctc_greedy_decode(logits) == [1, 2, 1]
