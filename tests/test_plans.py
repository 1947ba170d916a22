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


def test_simhash_single_early_shuffle(reports):
    """partition_by_doc contract: the one exchange sits BELOW the
    tokenize/explode fan-out (raw text shuffles, exploded tokens never
    do), and the distinct + 32 bit-sums fuse shuffle-free above it."""
    r = reports("q_doc_simhash")
    assert r.shuffle_exchanges == 1
    # the exchange is the explicit doc-id repartition, not an
    # aggregation exchange: it hashes doc_id only
    assert "REPARTITION_BY_NUM" in r.text
    # explode runs above the exchange: Generate must not appear before
    # the Exchange in the tree walk (tree prints top-down, so the
    # exchange string must come AFTER Generate textually)
    tree = r.text.split("\n\n", 1)[0]
    gen_pos = tree.index("Generate")
    ex_pos = tree.index("Exchange")
    assert ex_pos > gen_pos, "explode fan-out must sit above the shuffle"


def test_minhash_shuffles_bounded(reports):
    """MinHash+LSH: doc-id repartition + band-bucket self-join
    exchanges and the final distinct — but never a shuffle of the
    exploded shingle stream (the signature agg reuses the doc-id
    partitioning)."""
    r = reports("q_doc_minhash_pairs")
    # 1 repartition + 2 join sides + distinct-ish; allow AQE variance
    assert r.shuffle_exchanges <= 4
    assert "partial_min" in r.text, "signature mins must map-side combine"


def test_ann_lsh_equi_join_on_bucket(reports):
    """The scale contract of LSH ANN: candidates meet via an equi-join
    on the bucket key — never a nested-loop cross product."""
    for name in ("q_emb_ann_lsh", "q_emb_ann_multiprobe"):
        r = reports(name)
        assert r.nested_loop_joins == 0, f"{name} fell back to cross product"


def test_ann_ivf_candidate_join_is_equi(reports):
    """IVF: the only nested-loop joins are the two cell-assignment
    broadcasts over the n_cells-row centroid table (bounded fan-out by
    construction); candidates must meet via the cell_id equi-join,
    never a corpus cross product."""
    r = reports("q_emb_ann_ivf")
    assert r.nested_loop_joins <= 2
    assert r.broadcast_exchanges >= 1


def test_pgoutput_stamp_isolates_serial_window(reports):
    """The single-partition txn-stamp window only ever sees the narrow
    metadata projection; wide record maps rejoin via an equi-join."""
    r = reports("q_cdc_pgoutput_decode")
    assert r.nested_loop_joins == 0
    tree = r.text.split("\n\n", 1)[0]
    assert "Window" in tree
