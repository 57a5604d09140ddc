"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.WARNING)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    """FIXTURES.md §1 `tiny`: 20 convs × ~12 turns (~240 turns)."""
    from raysearch.gen import write_corpus

    out = str(tmp_path_factory.mktemp("corpus") / "tiny")
    write_corpus(out, n_convs=20, avg_turns=12, avg_tokens=30, seed=42, n_files=4)
    return out


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """FIXTURES.md §1 `small` (scaled down a bit for test wall-time)."""
    from raysearch.gen import write_corpus

    out = str(tmp_path_factory.mktemp("corpus") / "small")
    write_corpus(out, n_convs=200, avg_turns=16, avg_tokens=40, seed=42, n_files=8)
    return out
