"""Backend-dispatch suite (VERDICT r2 next-step #3): the same catalog
contract runs against every available backend — the manifest catalog
always, the native Iceberg catalog when a runtime jar is configured
(skipped cleanly otherwise; this sandbox ships none)."""

import shutil
import tempfile

import pytest

from aisafetyintervention_literatureextraction_spark.catalog import Catalog
from aisafetyintervention_literatureextraction_spark.iceberg_backend import (
    IcebergCatalog,
    iceberg_available,
    make_catalog,
)

BACKENDS = ["manifest", "iceberg"]


@pytest.fixture(params=BACKENDS)
def any_catalog(request, spark):
    if request.param == "iceberg" and not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar configured in this session")
    wh = tempfile.mkdtemp(prefix=f"kgwh_{request.param}_")
    cat = make_catalog(spark, wh, backend=request.param)
    yield cat
    if request.param == "iceberg":
        for t in ("t",):
            cat.drop(t)
    shutil.rmtree(wh, ignore_errors=True)


def test_auto_backend_selection(spark):
    """auto → manifest here (no jar); explicit iceberg raises loudly
    instead of silently degrading."""
    wh = tempfile.mkdtemp(prefix="kgwh_auto_")
    try:
        cat = make_catalog(spark, wh, backend="auto")
        if iceberg_available(spark):
            assert isinstance(cat, IcebergCatalog)
        else:
            assert isinstance(cat, Catalog)
            with pytest.raises(RuntimeError):
                make_catalog(spark, wh, backend="iceberg")
        with pytest.raises(ValueError):
            make_catalog(spark, wh, backend="nope")
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def _rows(cat):
    return sorted((r["k"], r["v"]) for r in cat.read("t").collect())


def test_backend_contract_append_merge_timetravel(spark, any_catalog):
    """The cross-backend core contract: sequential versions, O(delta)
    append semantics, LWW merge, merge-after-append key collapse, and
    version time travel."""
    cat = any_catalog
    mk = lambda rows: spark.createDataFrame(rows, "k int, v int")

    cat.merge_upsert(mk([(0, 10), (1, 1)]), "t", keys=["k"], order_col="v")
    assert cat.current_version("t") == 0
    assert _rows(cat) == [(0, 10), (1, 1)]

    cat.append(mk([(1, 7), (2, 2)]), "t")
    v1 = cat.current_version("t")
    assert v1 == 1

    cat.merge_upsert(mk([(3, 3)]), "t", keys=["k"], order_col="v")
    # appended raw rows collapse on the next merge: 1→7 beats 1
    assert _rows(cat) == [(0, 10), (1, 7), (2, 2), (3, 3)]

    # time travel to the post-append version still shows the raw log
    old = sorted((r["k"], r["v"]) for r in cat.read("t", version=v1).collect())
    assert old == [(0, 10), (1, 1), (1, 7), (2, 2)]

    # merge_upsert of EXISTING keys (r3 advice): the update must fold
    # with the base row under LWW — update rows beat base even when the
    # base order_col is higher (__gen), and among duplicate update rows
    # the max order_col wins
    cat.merge_upsert(mk([(0, 4), (0, 6), (4, 44)]), "t", keys=["k"], order_col="v")
    assert _rows(cat) == [(0, 6), (1, 7), (2, 2), (3, 3), (4, 44)]


def test_backend_rollback_skips_unlabeled_between_orphans(spark, any_catalog):
    """A torn run's unlabeled (no-run_id) commits sandwiched between
    its labeled orphan commits roll back WITH the run; an unlabeled
    suffix over a committed tail is kept."""
    cat = any_catalog
    mk = lambda rows: spark.createDataFrame(rows, "k int, v int")
    cat.overwrite(mk([(0, 0)]), "t", run_id="good")
    cat.overwrite(mk([(1, 1)]), "t", run_id="orphan")
    cat.overwrite(mk([(2, 2)]), "t")  # same torn run, unlabeled
    cat.overwrite(mk([(3, 3)]), "t", run_id="orphan")
    rolled = cat.rollback_orphan_versions("t", committed_run_ids={"good"})
    assert rolled == 3
    assert _rows(cat) == [(0, 0)]
    # unlabeled suffix with no orphan beneath: kept
    cat.overwrite(mk([(5, 5)]), "t")
    assert cat.rollback_orphan_versions("t", committed_run_ids={"good"}) == 0
    assert _rows(cat) == [(5, 5)]


def test_backend_rollback_orphans(spark, any_catalog):
    cat = any_catalog
    mk = lambda rows: spark.createDataFrame(rows, "k int, v int")
    cat.overwrite(mk([(0, 0)]), "t", run_id="good")
    cat.overwrite(mk([(9, 9)]), "t", run_id="orphan")
    rolled = cat.rollback_orphan_versions("t", committed_run_ids={"good"})
    assert rolled == 1
    assert _rows(cat) == [(0, 0)]
