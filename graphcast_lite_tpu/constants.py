"""Canonical artifact filenames (~ reference ``src/constants.py``)."""

from __future__ import annotations


class FileNames:
    CONFIG = "config.json"
    BEST_MODEL = "best_model.msgpack"
    CHECKPOINT_DIR = "checkpoint"
    RESULTS = "results.json"
    TRAINING_LOG = "training_log.txt"
    METRICS = "metrics.jsonl"
    PREDICTIONS = "predictions.npz"
    EVAL_REPORT = "eval_report.json"
    GRAPH_SUMMARY = "graph_summary.json"
    REGIONAL_HEAD = "regional_head.msgpack"
    # dataset files
    DATA = "data.npy"
    DATASET_INFO = "dataset_info.json"
    SCALERS = "scalers.npz"
    COORDS = "coords.npz"
    VARIABLES = "variables.json"
    PROGRESS = "progress.json"
