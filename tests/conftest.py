import shutil
import tempfile

import pytest

from aisafetyintervention_literatureextraction_spark.catalog import Catalog
from aisafetyintervention_literatureextraction_spark.datagen import corpus_df
from aisafetyintervention_literatureextraction_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    """(transcripts_df, expected) — small deterministic corpus."""
    df, expected = corpus_df(spark, n_convs=20, hot_conv_turns=300)
    df = df.persist()
    df.count()
    return df, expected


@pytest.fixture()
def warehouse():
    d = tempfile.mkdtemp(prefix="kgwh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def catalog(spark, warehouse):
    return Catalog(spark, warehouse)
