import shutil

import pytest

from lmss_entity_extractor_spark.datagen import write_fixture_owl
from lmss_entity_extractor_spark.ontology import build_artifacts, parse_owl_classes


@pytest.fixture(scope="session")
def spark():
    from lmss_entity_extractor_spark.session import get_spark

    spark = get_spark(app_name="lmss-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def owl_path(tmp_path_factory):
    return write_fixture_owl(tmp_path_factory.mktemp("owl") / "fixture.owl")


@pytest.fixture(scope="session")
def index_rows(owl_path):
    return parse_owl_classes(owl_path)


@pytest.fixture(scope="session")
def artifacts(index_rows):
    return build_artifacts(index_rows)


@pytest.fixture(scope="session")
def tiny_transcripts():
    """The 'tiny' corpus (FIXTURES.md §1): 8 convs, seed 42."""
    from lmss_entity_extractor_spark.datagen import gen_transcript_rows

    return gen_transcript_rows(n_convs=8, seed=42, hot_frac=0.125, hot_multiplier=10)


@pytest.fixture()
def warehouse(tmp_path):
    wh = tmp_path / "wh"
    yield wh
    shutil.rmtree(wh, ignore_errors=True)
