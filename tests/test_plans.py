"""Plan-shape regression tests: the scale contract of the headline
queries, pinned (see walex_spark/plans/audit.py). Data size is
irrelevant — these assert what Catalyst plans, not what it computes —
so sf0.001 keeps them fast."""

import pytest

from walex_spark.plans import audit
from walex_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reports(spark):
    cache = {}

    def get(name):
        if name not in cache:
            cache[name] = audit(Q.QUERIES[name](spark, SF_DIR))
        return cache[name]

    return get


def test_q01_scan_pruned_and_pushed(reports):
    r = reports("q01_pricing_summary")
    scan = r.scan_for("lineitem")
    # date filter reaches the parquet reader
    assert any("l_shipdate" in f for f in scan.pushed_filters)
    # column pruning: 7 of 11 lineitem columns read
    assert set(scan.read_columns) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }
    # partial agg map-side -> exactly one shuffle on the group keys
    assert r.shuffle_exchanges == 1
    assert "partial_sum" in r.text


def test_q07_all_dims_broadcast(reports):
    r = reports("q07_nation_volume")
    # customer/supplier/2x nation/orders all broadcast: zero shuffle joins
    assert r.sort_merge_joins == 0
    assert r.broadcast_hash_joins == 5
    # the only shuffle is the final aggregation exchange
    assert r.shuffle_exchanges == 1
    # nation IN-filters pushed into the dim scans
    for s in r.scans:
        if "nation" in s.location:
            assert any("n_name" in f for f in s.pushed_filters)


def test_q19_common_filters_pushed_below_join(reports):
    r = reports("q19_disjunctive_revenue")
    part = r.scan_for("part")
    # the brand disjunction collapses to an Or pushed into the part scan
    assert any("p_brand" in f for f in part.pushed_filters)
    li = r.scan_for("lineitem")
    # quantity bounds common to all branches reach the fact scan
    assert any("l_quantity" in f for f in li.pushed_filters)


def test_exact_dedup_single_shuffle(reports):
    r = reports("q_doc_exact_dedup")
    assert r.shuffle_exchanges == 1
    assert r.sort_merge_joins == 0
    scan = r.scan_for("documents")
    # only text + doc_id read, not the whole table
    assert set(scan.read_columns) == {"text", "doc_id"}


def test_cdc_latest_state_single_shuffle(reports):
    # R10 materialization: one exchange on the PK partitioning
    r = reports("q_cdc_latest_state")
    assert r.shuffle_exchanges <= 2  # pk window + final projection agg if any


def test_brute_force_topk_broadcasts_queries(reports):
    r = reports("q_emb_cosine_topk")
    # the query side broadcasts; the corpus is never shuffled pre-join
    assert r.nested_loop_joins == 1
    assert r.broadcast_exchanges >= 1
