"""Observability adapters (utils/observability.py)."""

import json

from thermal_semantic_segmentation_tpu.utils.observability import (
    MetricsLogger, VisdomPlotter)


def test_metrics_logger_jsonl_roundtrip(tmp_path):
    path = tmp_path / "m" / "metrics.jsonl"
    log = MetricsLogger(str(path))
    log.log(1, {"loss": 2.5}, phase="train")
    log.log(2, {"loss": 1.25})
    recs = [json.loads(line) for line in path.read_text().splitlines()]
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[0]["loss"] == 2.5 and recs[0]["phase"] == "train"


def test_visdom_plotter_inert_without_server():
    plotter = VisdomPlotter()
    assert plotter.vis is None  # no server in CI
    plotter.plot_loss([0.1], {"g": [1.0]})   # no-ops, no raise
    plotter.images(None, win="x")


def test_visdom_plotter_goes_inert_on_midrun_failure():
    """A visdom server dropping mid-run (restart, network blip) must not
    kill hours of training: the first failed post disables live panels for
    the rest of the run instead of raising into the train loop."""

    class _DeadVis:
        def line(self, *a, **k):
            raise ConnectionError("server went away")

        def images(self, *a, **k):
            raise ConnectionError("server went away")

    plotter = VisdomPlotter.__new__(VisdomPlotter)
    plotter.vis = _DeadVis()
    plotter.plot_loss([0.1], {"g": [1.0]})   # must swallow, not raise
    assert plotter.vis is None               # inert from now on
    plotter.images(object(), win="x")        # no-op

    plotter.vis = _DeadVis()
    plotter.images(object(), win="x")
    assert plotter.vis is None
