from __future__ import annotations

import os
import shutil

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from excelastic_spark.session import get_spark

    s = get_spark(app_name="excelastic-tests", master="local[4]")
    yield s
    s.stop()


@pytest.fixture()
def warehouse(tmp_path):
    w = str(tmp_path / "warehouse")
    yield w
    shutil.rmtree(w, ignore_errors=True)
