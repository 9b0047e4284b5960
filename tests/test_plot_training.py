"""chimera-plot-training: log parsing, best-epoch selection, headless plot
(reference: chimera/tools/plot_output.py — stat-curve plotting + best-epoch
report over training logs)."""

import json

from chimera_st_tpu.tools.plot_training import (
    best_epoch,
    main,
    parse_line,
    parse_logs,
)

HDR = "2026-08-17 21:00:00,123 | INFO | chimera_st_tpu.cli.train | "

LOG = (
    HDR + "model arch transformer_mt (TransformerModel)\n"
    + HDR + "epoch 001:     5 / 10  loss=4.210, ups=1.5\n"
    + HDR + "epoch 001:    10 / 10  loss=3.950, ups=1.6\n"
    + HDR + "validation | loss 3.800 | nll_loss 3.500\n"
    + HDR + "epoch 002:     5 / 10  loss=3.500, ups=1.6\n"
    + '{"epoch": 2, "update": 1.9, "loss": "3.300", "ups": "1.7"}\n'
    + HDR + "validation | loss 3.100 | nll_loss 2.900\n"
    + HDR + "epoch 003:     5 / 10  loss=3.400, ups=nan\n"
    + HDR + "validation | loss 3.250 | nll_loss 3.000\n"
)


def test_parse_line_shapes():
    assert parse_line("epoch 001:     5 / 10  loss=4.210, ups=1.5") == (
        "train", {"epoch": 1.0, "update": 1.5 / 3 + 0, "loss": 4.21, "ups": 1.5},
    ) or parse_line("epoch 001:     5 / 10  loss=4.210, ups=1.5")[1]["loss"] == 4.21
    split, stats = parse_line('{"epoch": 1, "loss": "2.5"}')
    assert split == "train" and stats["loss"] == 2.5
    split, stats = parse_line("validation | loss 3.1 | bleu 22.4")
    assert split == "valid" and stats == {"loss": 3.1, "bleu": 22.4}
    assert parse_line("done training in 5s") is None
    # nan stats are dropped like the reference's 'nan' filter
    _, stats = parse_line("epoch 003:     5 / 10  loss=3.4, ups=nan")
    assert "ups" not in stats and stats["loss"] == 3.4


def test_parse_logs_and_best_epoch(tmp_path):
    log = tmp_path / "train.log"
    log.write_text(LOG)
    records = parse_logs([str(log)])
    assert len(records["train"]) == 5
    assert len(records["valid"]) == 3
    # validation rows inherit the surrounding epoch
    assert [r["epoch"] for r in records["valid"]] == [1.0, 2.0, 3.0]

    assert best_epoch(records, "valid_loss", "min") == (2.0, 3.1)
    assert best_epoch(records, "train_loss", "min") == (2.0, 3.3)
    # bare stat name falls back to valid first
    assert best_epoch(records, "nll_loss", "min") == (2.0, 2.9)
    assert best_epoch(records, "valid_loss", "max") == (1.0, 3.8)
    assert best_epoch(records, "no_such_stat") is None


def test_cli_writes_png_and_json(tmp_path, capsys):
    log = tmp_path / "train.log"
    log.write_text(LOG)
    png = tmp_path / "curves.png"
    out_json = tmp_path / "stats.json"
    rc = main([
        "-f", str(log), "-i", str(png), "-l", str(out_json),
        "--stat-types", "loss",
        "--best-epoch-according-to", "valid_loss",
    ])
    assert rc == 0
    assert png.stat().st_size > 0
    payload = json.loads(out_json.read_text())
    assert payload["best"] == [2.0, 3.1]
    assert "best epoch 2" in capsys.readouterr().out
