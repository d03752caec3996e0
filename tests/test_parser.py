"""Parser + AST optimizer unit tests (reference: QryParser.java)."""

import pytest

from searchengine_spark.plans.ast import IopNode, QuerySyntaxError, SopNode, TermNode
from searchengine_spark.plans.parser import QueryParser

P = QueryParser(analyzer="english")
PS = QueryParser(analyzer="simple")


def test_bare_terms_wrap_default_op():
    ast = P.parse("barim batok", default_op="sum")
    assert isinstance(ast, SopNode) and ast.op == "sum"
    assert [a.op for a in ast.args] == ["score", "score"]
    assert ast.args[0].args[0] == TermNode("barim", "body")


def test_near_distance_and_field_propagation():
    ast = P.parse("#near/2(barim.title batok.title)")
    assert ast == SopNode(
        "score",
        (IopNode("near", (TermNode("barim", "title"), TermNode("batok", "title")), 2, "title"),),
    )


def test_mixed_fields_in_iop_rejected():
    with pytest.raises(QuerySyntaxError):
        P.parse("#near/2(barim.title batok.body)")


def test_unknown_field_rejected():
    with pytest.raises(QuerySyntaxError):
        P.parse("barim.nosuchfield")


def test_unbalanced_parens_rejected():
    with pytest.raises(QuerySyntaxError):
        P.parse("#and(barim batok")


def test_weights_parsed_and_aligned():
    ast = P.parse("#wand(0.7 barim 0.3 #and(batok balan))")
    assert ast.op == "wand"
    assert ast.weights == (0.7, 0.3)
    assert len(ast.args) == 2


def test_numeric_token_swallowed_by_unweighted_op():
    # Qry.java:187 — appendWeight is a no-op outside #WAND/#WSUM
    ast = P.parse("#or(2024 barim batok)")
    assert len(ast.args) == 2


def test_punctuation_token_splits_into_terms():
    ast = P.parse("#wand(0.5 barim-batok 0.5 balan)")
    # near-death style split: both halves get the pending weight
    assert ast.weights == (0.5, 0.5, 0.5)
    assert [a.args[0].term for a in ast.args] == ["barim", "batok", "balan"]


def test_stopword_only_subquery_pruned_to_none():
    assert P.parse("#near/1(of the)") is None
    assert P.parse("of the", default_op="and") is None


def test_single_arg_collapse():
    # QryParser.optimizeQuery: #AND(#AND(a)) -> SCORE(a)
    ast = P.parse("#and(#and(barim))")
    assert ast == SopNode("score", (TermNode("barim", "body"),))


def test_simple_analyzer_keeps_stopwords():
    ast = PS.parse("#and(of the)")
    assert [a.args[0].term for a in ast.args] == ["of", "the"]


def test_stemming_applied_to_query_terms():
    ast = P.parse("running tables", default_op="and")
    assert {a.args[0].term for a in ast.args} == {"run", "table"}
