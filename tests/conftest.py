import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdf_dtdl_fabric_ontology_converter_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(app="engine-tests", master="local[4]",
                      shuffle_partitions=4,
                      extra={"spark.ui.enabled": "false",
                             "spark.driver.memory": "4g"})
    yield s
    s.stop()
