"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyreshaper_ray.fixtures import generate_transcripts, write_fixture  # noqa: E402


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
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_transcripts() -> pa.Table:
    """120-conversation fixture table (fast; includes every edge case class)."""
    return generate_transcripts(n_conv=120, skew_turns=600)


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("fixture"))
    write_fixture(d, n_conv=120, n_files=4, skew_turns=600)
    return d
