"""chunk_documents / term_scores / redact_pii semantics
(extensions/chunking.py, extensions/text.py)."""

import pytest
from pyspark.sql import functions as F

from walex_spark.extensions.chunking import chunk_documents, term_scores
from walex_spark.extensions.text import redact_pii


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),   # 10 tokens, 2 chunks
            (2, "one two three"),                          # < chunk size, 1 chunk
            (3, ""),                                       # empty: no rows
            (4, " ".join(f"w{i}" for i in range(13))),   # exactly 2 windows + tail
        ],
        "doc_id long, text string",
    )


def test_chunk_windows_and_overlap(docs):
    out = chunk_documents(docs, chunk_tokens=8, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r
    # doc 1: 10 tokens, stride 4 -> ceil((10-4)/4)=2 chunks
    assert set(by_doc[1]) == {0, 1}
    assert by_doc[1][0].chunk_text == "t0 t1 t2 t3 t4 t5 t6 t7"
    # overlap: chunk 1 starts at token 4
    assert by_doc[1][1].chunk_text == "t4 t5 t6 t7 t8 t9"
    assert by_doc[1][1].n_chunk_tokens == 6
    # short doc: single whole-doc chunk
    assert set(by_doc[2]) == {0}
    assert by_doc[2][0].chunk_text == "one two three"
    # empty doc yields nothing
    assert 3 not in by_doc
    # n_chunks column consistent with fan-out
    assert all(r.n_chunks == len(by_doc[r.doc_id]) for r in out)


def test_chunk_rejects_bad_overlap(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_term_scores_ranking(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana shared"),
            (2, "banana cherry shared"),
            (3, "cherry cherry cherry shared"),
        ],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.rnk): r for r in term_scores(docs, top_k=2).collect()}
    # doc 1: apple tf=2 df=1 -> score 6.0 beats banana (tf=1 df=2 -> 1.5)
    assert out[(1, 1)].term == "apple" and out[(1, 1)].score == 6.0
    # shared appears everywhere -> idf 1, never wins rank 1
    assert all(out[(d, 1)].term != "shared" for d in (1, 2, 3))
    # doc 3: cherry tf=3 df=2 -> 4.5
    assert out[(3, 1)].term == "cherry" and out[(3, 1)].score == 4.5


def test_redact_pii_kinds_and_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b@test.org or visit https://x.io/y?z=a.b@c.de"),
            (2, "call +1 (555) 123-4567 today"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(docs).collect()}
    # the URL-embedded email is consumed by the URL pass (order contract)
    assert out[1].n_urls == 1 and out[1].n_emails == 1
    assert "<URL>" in out[1].redacted_text and "<EMAIL>" in out[1].redacted_text
    assert "a.b@test.org" not in out[1].redacted_text
    assert out[2].n_phones == 1 and "<PHONE>" in out[2].redacted_text
    assert out[3].redacted_text == "clean text only"
    assert (out[3].n_urls, out[3].n_emails, out[3].n_phones) == (0, 0, 0)
