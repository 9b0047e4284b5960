import jax
import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.models.chi_utils import length_dropout
from chimera_st_tpu.utils.hdfs import hopen, is_hdfs_path, load_pickle, save_pickle


def test_length_dropout_masks_frames():
    x = jnp.ones((2, 10, 4))
    mask = jnp.zeros((2, 10), bool)
    x2, m2 = length_dropout(x, mask, 0.5, jax.random.PRNGKey(0), deterministic=False)
    assert np.asarray(m2).sum() > 0
    # dropped frames zeroed
    dropped = np.asarray(m2) & ~np.asarray(mask)
    assert (np.asarray(x2)[dropped] == 0).all()
    # frame 0 always kept
    assert not np.asarray(m2)[:, 0].any()
    # deterministic mode: identity
    x3, m3 = length_dropout(x, mask, 0.5, None, deterministic=True)
    assert (np.asarray(x3) == 1).all() and not np.asarray(m3).any()


def test_hdfs_local_passthrough(tmp_path):
    assert is_hdfs_path("hdfs://nn/a/b") and not is_hdfs_path("/tmp/x")
    p = str(tmp_path / "o.pkl")
    save_pickle({"a": 1}, p)
    assert load_pickle(p) == {"a": 1}
    with hopen(p, "rb") as f:
        assert len(f.read()) > 0
