import numpy as np
import pytest


@pytest.fixture(scope="session")
def spark():
    from cesium_spark.session import get_spark

    s = get_spark(app_name="cesium-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def golden():
    """Vendored reference golden vectors: 3 ASAS series + expected feature
    values (tests/data/, copied from the reference's test data)."""
    import os

    d = os.path.join(os.path.dirname(__file__), "data")
    series = []
    for name in ("257141.dat", "245486.dat", "247327.dat"):
        arr = np.loadtxt(os.path.join(d, name), delimiter=",")
        order = np.argsort(arr[:, 0])  # reference sorts by time on load
        series.append((name, arr[order, 0], arr[order, 1], arr[order, 2]))
    with open(os.path.join(d, "expected_features.csv")) as f:
        names = f.readline().strip().split(",")
        expected = np.loadtxt(f, delimiter=",")
    return series, names, expected


def irregular_random(seed=0, size=50):
    """The reference's seeded fixture (features/tests/util.py:14-20)."""
    state = np.random.RandomState(seed)
    times = np.sort(state.uniform(0, 10, size))
    values = state.normal(1, 1, size)
    errors = state.exponential(0.1, size)
    return times, values, errors
