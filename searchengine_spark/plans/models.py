"""Retrieval models (reference: RetrievalModel*.java).

Pure parameter holders; all scoring formulas live in the compiler as
column expressions. ``default_op`` mirrors ``defaultQrySopName``
(#sum for BM25 — RetrievalModelBM25.java; #and for the others).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class UnrankedBoolean:
    name: str = "unrankedboolean"
    default_op: str = "and"


@dataclass(frozen=True)
class RankedBoolean:
    name: str = "rankedboolean"
    default_op: str = "and"


@dataclass(frozen=True)
class BM25:
    """k3 is accepted but unused, as in the reference (QrySopScore.java:121)."""

    k1: float = 1.2
    b: float = 0.75
    k3: float = 0.0
    name: str = "bm25"
    default_op: str = "sum"


@dataclass(frozen=True)
class Indri:
    mu: float = 2500.0
    lam: float = 0.4
    name: str = "indri"
    default_op: str = "and"


def make_model(name: str, **kw):
    name = name.lower()
    if name == "unrankedboolean":
        return UnrankedBoolean()
    if name == "rankedboolean":
        return RankedBoolean()
    if name == "bm25":
        allowed = {k: v for k, v in kw.items() if k in ("k1", "b", "k3")}
        return BM25(**allowed)
    if name == "indri":
        allowed = {k: v for k, v in kw.items() if k in ("mu", "lam")}
        return Indri(**allowed)
    raise ValueError(f"unknown retrieval model {name!r}")
