"""Tests for log parsing and the metrics logger."""

import json
import os

from graphcast_lite_tpu.utils.logs import (
    MetricsLogger,
    compare_experiments,
    parse_training_log,
)


def test_parse_training_log(tmp_path):
    log = tmp_path / "training_log.txt"
    log.write_text(
        "=== Training started ===\n"
        "epoch  ar  train_loss  val_loss  val_ACC  best_vl  patience  time\n"
        " init  --  --  0.98988  0.6672  --  --  10:00:00\n"
        "    1   1     0.85914     0.82262    0.6985     0.82262         0  10:00:06\n"
        "    2   2     0.63981     0.72262    0.7155     0.72262         0  10:00:07\n"
    )
    rows = parse_training_log(str(log))
    assert len(rows) == 2
    assert rows[0]["epoch"] == 1 and rows[0]["ar"] == 1
    assert rows[1]["val_loss"] == 0.72262

    table = compare_experiments({"demo": str(log)})
    assert "0.72262" in table and "demo" in table


def test_metrics_logger(tmp_path):
    ml = MetricsLogger(str(tmp_path), mirror_wandb=False)
    ml.log({"epoch": 1, "val_loss": 0.5})
    ml.log({"epoch": 2, "val_loss": 0.4})
    lines = open(os.path.join(tmp_path, "metrics.jsonl")).read().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["epoch"] == 2 and "ts" in rec
