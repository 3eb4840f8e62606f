from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from hubspot_neo4j_pipeline_spark.session import get_spark

    return get_spark(app_name="tests", cpus=8, shuffle_partitions=4)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
