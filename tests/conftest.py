import pytest

from coap_rfc_knowledge_graph_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="kg-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
