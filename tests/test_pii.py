"""PII detection/redaction (extensions/pii.py): per-class counts on
crafted strings, redaction completeness (re-detection finds nothing),
the URL-first ordering contract, and pattern portability (every
pattern stays inside the Java∩RE2 subset the module documents)."""

import re

from walex_spark.extensions.pii import (
    PII_PATTERNS,
    pii_signals,
    redact_pii,
)

DOC = (
    "intro text then http://ex.com/a?x=1 and mail bob.smith+x@corp.io "
    "call 555-123-4567 or 555.987.6543 ssn 123-45-6789 host 192.168.0.1 "
    "card 4111111111111111 done"
)


def _sig_row(spark, text):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return pii_signals(df).collect()[0]


def test_detection_counts(spark):
    r = _sig_row(spark, DOC)
    assert r.n_url == 1
    assert r.n_email == 1
    assert r.n_phone == 2  # both hyphen and dot separators
    assert r.n_ssn == 1
    assert r.n_ipv4 == 1
    assert r.n_cc == 1
    assert r.has_pii


def test_no_false_positives_on_plain_text(spark):
    r = _sig_row(spark, "just ordinary words and a number 42 here")
    assert not r.has_pii
    assert all(
        getattr(r, f"n_{name}") == 0 for name, _, _ in PII_PATTERNS
    )


def test_redaction_complete_and_ordered(spark):
    df = spark.createDataFrame([(1, DOC)], ["doc_id", "text"])
    red = redact_pii(df).collect()[0].redacted
    # every class sentinel placed
    for _, _, sentinel in PII_PATTERNS:
        assert sentinel in red, f"{sentinel} missing from {red!r}"
    # completeness: re-running the detectors on redacted text finds 0
    resid = pii_signals(
        redact_pii(df).select("doc_id", "redacted"), text_col="redacted"
    ).collect()[0]
    assert not resid.has_pii, red


def test_url_first_keeps_email_like_userinfo_inside_url(spark):
    # a URL carrying an email-shaped userinfo must become ONE <URL>,
    # not a torn <EMAIL> inside a half-replaced URL
    txt = "go http://alice@ex.com/path now"
    df = spark.createDataFrame([(1, txt)], ["doc_id", "text"])
    red = redact_pii(df).collect()[0].redacted
    assert red == "go <URL> now"


def test_patterns_are_re2_portable():
    # no backreferences, no look-around — the subset both engines share
    for name, pat, _ in PII_PATTERNS:
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat
        assert not re.search(r"\\[1-9]", pat), f"backreference in {name}"
        re.compile(pat)  # valid Java-style (Python re approximates)


def test_pii_queries_registered_with_oracles():
    """Registered with oracles, and either driver-witnessed green (a
    committed CORRECTNESS row — r11 witnessed both) or still heading
    the window. The original zero-history assertion (`in
    DRIVER_ORDER`) retired when the r12 rotation replaced them with
    r11's optimized-but-unwitnessed cohort, per VERDICT r11 #3."""
    import glob
    import json
    import os

    from walex_spark.queries import DRIVER_ORDER, ORACLES, QUERIES

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def witnessed(q):
        for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
            with open(path) as f:
                row = json.load(f).get(q)
            if row and row.get("rows_match") and row.get("hash_match"):
                return True
        return False

    for q in ("q_doc_pii_scan", "q_doc_pii_redact"):
        assert q in QUERIES and q in ORACLES
        assert q in DRIVER_ORDER or witnessed(q), (
            f"{q} has no driver witness and is not in the window"
        )
