from chimera_st_tpu.logging import metrics
from chimera_st_tpu.logging.meters import AverageMeter, MetersDict


def setup_function(fn):
    metrics.reset()


def test_nested_aggregate():
    with metrics.aggregate("outer"):
        metrics.log_scalar("loss", 1.0)
        with metrics.aggregate("inner"):
            metrics.log_scalar("loss", 3.0)
    assert metrics.get_smoothed_value("outer", "loss") == 2.0
    assert metrics.get_smoothed_value("inner", "loss") == 3.0


def test_weighted_average():
    with metrics.aggregate("a"):
        metrics.log_scalar("x", 1.0, weight=1)
        metrics.log_scalar("x", 3.0, weight=3)
    assert metrics.get_smoothed_value("a", "x") == 2.5


def test_derived():
    with metrics.aggregate("d"):
        metrics.log_scalar("nll_loss", 1.0)
        metrics.log_derived("ppl", lambda m: metrics.get_perplexity(m["nll_loss"].avg))
    assert metrics.get_smoothed_value("d", "ppl") == 2.0


def test_state_dict_roundtrip():
    with metrics.aggregate("t"):
        metrics.log_scalar("loss", 5.0)
    state = metrics.state_dict()
    metrics.reset()
    metrics.load_state_dict(state)
    assert metrics.get_smoothed_value("t", "loss") == 5.0


def test_meters_dict_priority():
    md = MetersDict()
    md.add_meter("low", AverageMeter(), 10)
    md.add_meter("high", AverageMeter(), 1)
    assert list(md.keys()) == ["high", "low"]
