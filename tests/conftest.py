from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_MEDIUM = os.environ.get("SPARK_GRAFT_SF_MEDIUM", "/root/testdata/sf0.01")
SIG_DIR = str(REPO_ROOT / "signatures")


@pytest.fixture(scope="session")
def spark():
    from loki_rs_spark.session import get_spark

    spark = get_spark(app_name="loki-rs-spark-tests", master="local[4]",
                      shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sigs():
    from loki_rs_spark.signatures import load_signature_set

    return load_signature_set(SIG_DIR)
