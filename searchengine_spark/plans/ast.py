"""Query AST for the reference's structured prefix query language.

Two node families mirror the reference's type system (Qry.java:69,
QryIop.java:29, QrySop.java:17):

- *Iop* nodes produce positional inverted lists: ``TermNode`` and
  ``IopNode`` (``#SYN``, ``#NEAR/n``, ``#WINDOW/n``).
- *Sop* nodes produce (doc, score) frames: ``SopNode`` (``#SCORE``,
  ``#AND``, ``#OR``, ``#SUM``, ``#WAND``, ``#WSUM``).

``normalize()`` applies the reference's type discipline
(Qry.appendArg, Qry.java:111-182): a SCORE node is inserted between any
Sop parent and Iop child; Iop args of an Iop must share one field,
which propagates upward. ``optimize()`` is the reference's
``QryParser.optimizeQuery`` (QryParser.java:233-275): empty operators
are deleted, single-argument non-SCORE operators collapse to the
argument.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

SOP_OPS = frozenset({"score", "and", "or", "sum", "wand", "wsum"})
IOP_OPS = frozenset({"syn", "near", "window"})
WEIGHTED_OPS = frozenset({"wand", "wsum"})


@dataclass(frozen=True)
class TermNode:
    """A single analyzed term restricted to one field (QryIopTerm)."""

    term: str
    field: str = "body"


@dataclass(frozen=True)
class IopNode:
    """Positional-list operator: ``syn``, ``near`` or ``window``.

    ``dist`` is the ``/n`` parameter (None for ``syn``). All args share
    one field (enforced by ``normalize``), stored in ``field``.
    """

    op: str
    args: tuple
    dist: int | None = None
    field: str = "body"


@dataclass(frozen=True)
class SopNode:
    """Score operator. ``weights`` parallels ``args`` for #WAND/#WSUM."""

    op: str
    args: tuple
    weights: tuple | None = None


def is_iop(node) -> bool:
    return isinstance(node, (TermNode, IopNode))


class QuerySyntaxError(ValueError):
    pass


def normalize(node):
    """Apply reference type discipline (Qry.appendArg, Qry.java:111-182).

    - Sop parent + Iop child -> insert implicit ``#SCORE`` wrapper
      (Qry.java:144-150).
    - Iop args must all be Iop-typed and share one field; the common
      field propagates to the parent (Qry.java:154-167).
    """
    if isinstance(node, TermNode):
        return node
    if isinstance(node, IopNode):
        args = tuple(normalize(a) for a in node.args)
        for a in args:
            if not is_iop(a):
                raise QuerySyntaxError(
                    f"#{node.op} arguments must be term/positional operators"
                )
        fields = {a.field for a in args}
        if len(fields) > 1:
            raise QuerySyntaxError(
                f"#{node.op} arguments must share one field, got {sorted(fields)}"
            )
        fld = fields.pop() if fields else node.field
        return replace(node, args=args, field=fld)
    if isinstance(node, SopNode):
        out = []
        for a in node.args:
            a = normalize(a)
            if is_iop(a) and node.op != "score":
                a = SopNode("score", (a,))
            out.append(a)
        return replace(node, args=tuple(out))
    raise TypeError(f"not a query node: {node!r}")


def optimize(node):
    """Reference tree pruning (QryParser.optimizeQuery, QryParser.java:233-275).

    Returns the optimized node or None if the subtree is degenerate
    (e.g. every term was a stopword).
    """
    if isinstance(node, TermNode):
        return node

    kept_args = []
    kept_weights = []
    weights = node.weights if isinstance(node, SopNode) and node.weights else None
    for i, a in enumerate(node.args):
        a2 = optimize(a)
        if a2 is not None:
            kept_args.append(a2)
            if weights is not None and i < len(weights):
                kept_weights.append(weights[i])

    if not kept_args:
        return None
    # Only SCORE may keep a single argument; others collapse to the arg
    # (weights are dropped on collapse, as in the reference).
    if len(kept_args) == 1 and not (isinstance(node, SopNode) and node.op == "score"):
        return kept_args[0]

    if isinstance(node, SopNode):
        return replace(
            node,
            args=tuple(kept_args),
            weights=tuple(kept_weights) if weights is not None else None,
        )
    return replace(node, args=tuple(kept_args))
