import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_fixture_path() -> str:
    from diive_ray.fixtures import ensure_fixture

    return ensure_fixture("tiny")


@pytest.fixture(scope="session")
def tiny_raw_df(tiny_fixture_path):
    """The tiny corpus as one pandas frame (no tokens), file order preserved
    per source chunk — the oracle input."""
    import glob
    import pandas as pd
    import pyarrow.parquet as pq

    frames = []
    for f in sorted(glob.glob(tiny_fixture_path + "/src-*/*.parquet")):
        frames.append(pq.read_table(f, columns=["doc_id", "source", "ts", "n_tok"]).to_pandas())
    return pd.concat(frames, ignore_index=True)
