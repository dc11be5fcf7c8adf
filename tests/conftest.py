import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from copy_sharepoint_to_onelake_lakehousefiles_spark import get_spark

    s = get_spark("tests", cpus="4")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
