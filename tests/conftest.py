import shutil
import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dataingestionframework_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="dif_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def catalog(spark, tmp_root):
    from dataingestionframework_spark.catalog.table import TableCatalog

    return TableCatalog(spark, tmp_root)
