import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from compss_python_spark.session import get_spark

    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def retry_under_load(attempts: int = 3, wait_sec: float = 20.0):
    """Bounded retry for RESOURCE-contention failures only.

    The two heaviest tests (the every-oracled-query construction smoke and
    the roc_auc property sweep) flake when the box concurrently runs gen-SF
    sweep JVMs (25–40 GB each): executor/broadcast timeouts and JVM memory
    pressure surface as Py4J errors that are load symptoms, not product
    defects (r11 VERDICT: both pass standalone).  A genuine assertion
    failure — or ANY error whose text doesn't match a resource signature —
    re-raises immediately; only load signatures get the bounded retry.
    """
    import functools
    import re
    import time

    load_sig = re.compile(
        r"Connection refused|SparkContext was shut down|Java heap space|"
        r"Py4JNetworkError|Answer from Java side is empty|"
        r"broadcast.*timeout|TimeoutException|GC overhead limit|"
        r"Unable to acquire .* bytes of memory|No space left on device",
        re.IGNORECASE,
    )

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            for attempt in range(attempts):
                try:
                    return fn(*args, **kwargs)
                except AssertionError:
                    raise
                except Exception as e:  # noqa: BLE001 — filtered by signature
                    if attempt + 1 >= attempts or not load_sig.search(str(e)):
                        raise
                    time.sleep(wait_sec)
            return None

        return wrapper

    return deco
