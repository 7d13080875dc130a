"""Smoke-drive the model benchmark CLI (tools/benchmark.py) — the
reference's test_models_performance.ipynb equivalent (FLOPs/params/latency,
SURVEY.md §6): one tiny forward measurement must report params/GFLOPs, and
an unknown model must be reported, not crash the sweep."""

import pytest


@pytest.mark.slow
def test_benchmark_model_reports_stats(capsys):
    from litehandnet_tpu.tools.benchmark import main

    results = main(["--models", "litehandnet", "nosuchmodel",
                    "--size", "64", "--batch", "2", "--reps", "2"])
    assert "litehandnet" in results
    modes = results["litehandnet"]  # e.g. train-mode + deploy-fused graphs
    assert modes
    for stats in modes.values():
        assert stats["params_M"] > 0
        assert stats["gflops"] is None or stats["gflops"] > 0
        assert stats["latency_ms"] > 0 and stats["fps"] > 0
    # the unknown model is skipped with a FAILED line, not a crash
    assert "nosuchmodel" not in results
    assert "nosuchmodel: FAILED" in capsys.readouterr().out
