"""Golden tests for the PG array-literal parser — same cases as the
reference's test suite (test/walex/casting/array_parser_test.exs:5-94,
test/walex/casting/types_test.exs:190-300; see FIXTURES.md §4)."""

import pytest

from walex_spark.functions.array_parser import PgArrayParseError, parse_pg_array


def test_empty():
    assert parse_pg_array("{}") == []


def test_simple_ints():
    assert parse_pg_array("{1,2,3}") == ["1", "2", "3"]


def test_null_cells():
    assert parse_pg_array("{1,NULL,3}") == ["1", None, "3"]


def test_quoted_commas():
    # the canonical fixture: UPDATE ... books = ARRAY['book1, 2 and 3', 'book4']
    assert parse_pg_array('{"book1, 2 and 3","book4"}') == ["book1, 2 and 3", "book4"]


def test_escaped_quotes():
    assert parse_pg_array('{"say \\"hello\\"","world"}') == ['say "hello"', "world"]


def test_escaped_backslash():
    assert parse_pg_array('{"a\\\\b"}') == ["a\\b"]


def test_nested():
    assert parse_pg_array("{{1,2},{3,4}}") == [["1", "2"], ["3", "4"]]


def test_deep_nested():
    assert parse_pg_array("{{{1},{2}},{{3},{4}}}") == [[["1"], ["2"]], [["3"], ["4"]]]


def test_jsonb_elements():
    got = parse_pg_array('{"{\\"a\\": 1}","[1,2,3]","null"}')
    assert got == ['{"a": 1}', "[1,2,3]", "null"]


def test_bools():
    assert parse_pg_array("{t,f,t}") == ["t", "f", "t"]


def test_none_passthrough():
    assert parse_pg_array(None) is None


@pytest.mark.parametrize("bad", ["1,2,3", "{1,2", '{"unterminated}', "{1,,2}"])
def test_malformed(bad):
    with pytest.raises(PgArrayParseError):
        parse_pg_array(bad)
