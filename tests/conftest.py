import logging

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_corpus(tmp_path_factory):
    """Small synthetic pages corpus + truth, generated once per session."""
    from kgx.synth import write_pages
    root = str(tmp_path_factory.mktemp("corpus"))
    pages_dir = write_pages(root, 120, seed=7)
    return {"root": root, "pages": pages_dir,
            "truth": f"{root}/truth_triples.parquet"}
