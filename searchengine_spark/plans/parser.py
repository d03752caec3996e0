"""Prefix query-language parser (reference: QryParser.java:295-374).

Grammar (Indri-style)::

    query   := '#' opname ['/' int] '(' arg* ')'
    arg     := [weight] (query | token)
    token   := word ['.' field]            # e.g. apple.title, near-death

Replicated reference behaviors:

- A numeric token is always consumed as a *weight* for the following
  argument (QryParser.java:345-350); non-weighted operators silently
  drop it (Qry.java:187 — ``appendWeight`` is a no-op there).
- A token may analyze into several terms (``near-death`` -> ``near``,
  ``death``); each gets the pending weight (QryParser.java:369-373).
- A token whose terms are all stopwords contributes no argument (and
  its weight is dropped with it).
- ``term.field`` must name a known field or it is a syntax error
  (QryParser.createTerms, QryParser.java:160-167).
- Parentheses must balance and terminate the string
  (QryParser.java:301-307).
"""

from __future__ import annotations

import re

from searchengine_spark.analyzer import Analyzer, get_analyzer
from searchengine_spark.plans.ast import (
    IOP_OPS,
    SOP_OPS,
    WEIGHTED_OPS,
    IopNode,
    QuerySyntaxError,
    SopNode,
    TermNode,
    normalize,
    optimize,
)

DEFAULT_FIELDS = ("url", "keywords", "title", "body", "inlink")

_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _is_numeric(tok: str) -> bool:
    return bool(_NUM_RE.match(tok))


def _find_balanced(s: str, open_idx: int) -> int:
    """Index of the ')' balancing the '(' at ``open_idx``."""
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise QuerySyntaxError("Missing, unbalanced, or misplaced parentheses")


class QueryParser:
    """Parses query strings into normalized+optimized AST nodes."""

    def __init__(
        self,
        analyzer: str | Analyzer = "simple",
        fields: tuple = DEFAULT_FIELDS,
        default_field: str = "body",
    ):
        self.analyzer = get_analyzer(analyzer) if isinstance(analyzer, str) else analyzer
        self.fields = tuple(fields)
        self.default_field = default_field

    # -- public API ---------------------------------------------------------

    def parse(self, query: str, default_op: str | None = None):
        """Parse (optionally wrapping with a model default op) -> AST or None.

        Mirrors QryEval.processQuery (QryEval.java:120-122): the raw user
        query is wrapped as ``#sum(q)`` / ``#and(q)`` before parsing, then
        optimized; a fully-degenerate query returns None.
        """
        q = query.strip()
        if default_op:
            q = f"#{default_op.lstrip('#')}({q})"
        node = self._parse_string(q)
        node = normalize(node)
        node = optimize(node)
        if node is not None and not isinstance(node, SopNode):
            node = SopNode("score", (node,))
        return node

    # -- internals ----------------------------------------------------------

    def _parse_string(self, s: str):
        s = s.strip()
        if not s.startswith("#"):
            raise QuerySyntaxError(f"query must start with an operator: {s!r}")
        open_idx = s.index("(") if "(" in s else -1
        if open_idx < 0:
            raise QuerySyntaxError("Missing, unbalanced, or misplaced parentheses")
        close_idx = _find_balanced(s, open_idx)
        if s[close_idx + 1 :].strip():
            raise QuerySyntaxError("Missing, unbalanced, or misplaced parentheses")

        opname = s[1:open_idx].strip().lower()
        dist = None
        if "/" in opname:
            opname, dist_s = opname.split("/", 1)
            try:
                dist = int(dist_s)
            except ValueError:
                raise QuerySyntaxError(f"bad operator distance: {dist_s!r}")
        if opname in IOP_OPS:
            if opname in ("near", "window") and dist is None:
                raise QuerySyntaxError(f"#{opname} requires /n distance")
            node_args, node_weights = self._parse_args(
                s[open_idx + 1 : close_idx], weighted=False
            )
            return IopNode(opname, tuple(node_args), dist=dist)
        if opname in SOP_OPS:
            weighted = opname in WEIGHTED_OPS
            node_args, node_weights = self._parse_args(
                s[open_idx + 1 : close_idx], weighted=weighted
            )
            return SopNode(
                opname,
                tuple(node_args),
                weights=tuple(node_weights) if weighted else None,
            )
        raise QuerySyntaxError(f"Unknown query operator #{opname}")

    def _parse_args(self, body: str, weighted: bool):
        args: list = []
        weights: list = []
        rest = body.strip()
        pending_weight = None
        while rest:
            if rest[0] == "#":
                open_idx = rest.index("(") if "(" in rest else -1
                if open_idx < 0:
                    raise QuerySyntaxError("Missing, unbalanced, or misplaced parentheses")
                close_idx = _find_balanced(rest, open_idx)
                sub = rest[: close_idx + 1]
                rest = rest[close_idx + 1 :].strip()
                args.append(self._parse_string(sub))
                if weighted:
                    weights.append(1.0 if pending_weight is None else pending_weight)
                pending_weight = None
                continue

            m = re.match(r"^[^\s()]+", rest)
            if not m:
                raise QuerySyntaxError(f"cannot parse near: {rest[:30]!r}")
            tok = m.group(0)
            rest = rest[m.end() :].strip()

            if _is_numeric(tok):
                # Always a weight (QryParser.java:345-350); no-op for
                # unweighted operators (Qry.java:187).
                pending_weight = float(tok)
                continue

            for t in self._create_terms(tok):
                args.append(t)
                if weighted:
                    weights.append(1.0 if pending_weight is None else pending_weight)
            pending_weight = None
        return args, weights

    def _create_terms(self, token: str) -> list[TermNode]:
        """Token -> 0..n TermNodes (QryParser.createTerms, QryParser.java:144-182)."""
        fld = self.default_field
        if "." in token:
            word, suffix = token.rsplit(".", 1)
            suffix = suffix.lower()
            if suffix not in self.fields:
                raise QuerySyntaxError(f"Unknown field {token}")
            fld, token = suffix, word
        return [TermNode(t, fld) for t in self.analyzer.terms(token)]


def parse_query(
    query: str,
    default_op: str | None = None,
    analyzer: str | Analyzer = "simple",
    fields: tuple = DEFAULT_FIELDS,
):
    return QueryParser(analyzer=analyzer, fields=fields).parse(query, default_op)
