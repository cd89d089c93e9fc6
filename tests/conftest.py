import pytest

from geotreehealth_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="geotreehealth-tests", cores=8)
    yield s
    s.stop()
