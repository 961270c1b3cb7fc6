import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visiblev8_crawler_spark.sources import synth  # noqa: E402

N_IMAGES, N_URLS, N_HOSTS = 300, 1200, 40


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("vv8-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def world(tmp_path_factory):
    """Small deterministic crawl world: parquet paths + python-side mirrors."""
    d = tmp_path_factory.mktemp("world")
    paths = synth.write_world(str(d), N_IMAGES, N_URLS, N_HOSTS)
    images_pdf = synth.generate_images_pdf(N_IMAGES, with_expected=True)
    return {
        "paths": paths,
        "images_by_id": {r["image_id"]: r for r in images_pdf.to_dict("records")},
        "frontier_rows": synth.generate_frontier_pdf(N_URLS, N_IMAGES, N_HOSTS).to_dict("records"),
        "robots_by_host": {r["host"]: r for r in synth.generate_robots_pdf(N_HOSTS).to_dict("records")},
    }
