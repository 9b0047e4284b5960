from chimera_st_tpu.config import ChimeraConfig
from chimera_st_tpu.config.registry import Registry, get_registry


def test_config_roundtrip():
    cfg = ChimeraConfig()
    cfg.task = {"_name": "triplet", "data": "/tmp/data"}
    cfg2 = ChimeraConfig.from_yaml(cfg.to_yaml())
    assert cfg2.task["_name"] == "triplet"
    assert cfg2.common.seed == 1
    assert cfg2.generation.beam == 5


def test_config_replace():
    cfg = ChimeraConfig()
    c2 = cfg.common.replace(seed=42)
    assert c2.seed == 42 and cfg.common.seed == 1


def test_registry():
    r = Registry("widget")

    @r.register("a")
    class A:
        pass

    assert r.get("a") is A
    assert "a" in r
    try:
        r.register("a", object())
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_get_registry_singleton():
    assert get_registry("model") is get_registry("model")
