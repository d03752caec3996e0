"""Tiny trusted in-memory oracle implementing the reference's semantics.

Used by pytest to golden-check the Spark engine: same formulas, same
match strategies, same tie-breaks (SURVEY.md §2.4, §5). Implemented
directly from the reference's scoring definitions (QrySopScore.java,
QrySopAnd/Or/Sum/WAnd/WSum.java, QryIopNear/Window/Syn.java) over
plain Python dicts — no Spark, no SQL.
"""

from __future__ import annotations

import math

import numpy as np

from searchengine_spark.operators.positional import near_merge, window_merge
from searchengine_spark.plans.ast import IopNode, SopNode, TermNode
from searchengine_spark.plans.models import BM25, Indri, RankedBoolean, UnrankedBoolean


class PyIndex:
    """doc_tokens: {doc_id: {field: [token slots, '' = stopword]}}."""

    def __init__(self, doc_tokens: dict):
        self.doc_tokens = doc_tokens
        self.postings: dict = {}
        self.doc_len: dict = {}
        self.sum_len: dict = {}
        self.doc_count: dict = {}
        self.n_docs = len(doc_tokens)
        for d, flds in doc_tokens.items():
            for f, toks in flds.items():
                self.doc_len[(d, f)] = len(toks)
                if toks:
                    self.sum_len[f] = self.sum_len.get(f, 0) + len(toks)
                    self.doc_count[f] = self.doc_count.get(f, 0) + 1
                for p, t in enumerate(toks):
                    if t:
                        self.postings.setdefault((t, f), {}).setdefault(d, []).append(p)

    def avg_len(self, f):
        return self.sum_len.get(f, 0) / max(1, self.doc_count.get(f, 0))

    def get_doc_len(self, d, f):
        return self.doc_len.get((d, f), 0)


def field_of(node):
    return node.field


def eval_iop(idx: PyIndex, node) -> dict:
    """-> {doc_id: sorted positions}."""
    if isinstance(node, TermNode):
        return {d: list(ps) for d, ps in idx.postings.get((node.term, node.field), {}).items()}
    child = [eval_iop(idx, a) for a in node.args]
    if node.op == "syn":
        out: dict = {}
        for c in child:
            for d, ps in c.items():
                out.setdefault(d, []).extend(ps)
        return {d: sorted(ps) for d, ps in out.items()}
    docs = set(child[0])
    for c in child[1:]:
        docs &= set(c)
    merge = near_merge if node.op == "near" else window_merge
    out = {}
    for d in sorted(docs):
        ps = merge([np.asarray(c[d], dtype=np.int64) for c in child], node.dist)
        if ps:
            out[d] = ps
    return out


def eval_sop(idx: PyIndex, node: SopNode, model):
    """-> (scores: {doc: score}, default_fn(doc)->float | None)."""
    if node.op == "score":
        return _leaf(idx, node, model)

    children = [eval_sop(idx, a, model) for a in node.args]
    k = len(children)
    indri = isinstance(model, Indri)
    op = node.op

    if op in ("or", "sum") or indri:
        docs = set()
        for sc, _ in children:
            docs |= set(sc)
    else:
        docs = set(children[0][0])
        for sc, _ in children[1:]:
            docs &= set(sc)

    weights = list(node.weights) if node.weights else [1.0] * k
    total = sum(weights)
    scores: dict = {}
    for d in docs:
        if isinstance(model, UnrankedBoolean):
            scores[d] = 1.0
        elif isinstance(model, RankedBoolean):
            if op in ("and", "wand", "wsum"):
                scores[d] = min(sc[d] for sc, _ in children)
            elif op == "or":
                scores[d] = max(sc[d] for sc, _ in children if d in sc)
        elif isinstance(model, BM25):
            if op in ("sum", "wsum"):
                scores[d] = sum(sc[d] for sc, _ in children if d in sc)
            else:
                raise ValueError(f"#{op} unsupported under BM25")
        else:  # Indri
            eff = [
                sc[d] if d in sc else dfn(d) for sc, dfn in children
            ]
            if op == "and":
                prod = 1.0
                for e in eff:
                    prod *= e
                scores[d] = prod ** (1.0 / k)
            elif op == "or":
                prod = 1.0
                for e in eff:
                    prod *= 1.0 - e
                scores[d] = prod
            elif op == "wand":
                prod = 1.0
                for i, e in enumerate(eff):
                    prod *= e ** (weights[i] / total)
                scores[d] = prod
            elif op == "wsum":
                scores[d] = sum(e * weights[i] / total for i, e in enumerate(eff))
            else:
                raise ValueError(f"#{op} unsupported under Indri")

    dfn_out = None
    if indri:
        if op == "and":
            def dfn_out(d):
                prod = 1.0
                for _, dfn in children:
                    prod *= dfn(d)
                return prod ** (1.0 / k)
        elif op == "or":
            def dfn_out(d):
                prod = 1.0
                for _, dfn in children:
                    prod *= 1.0 - dfn(d)
                return prod
        elif op == "wand":
            def dfn_out(d):
                prod = 1.0
                for i, (_, dfn) in enumerate(children):
                    prod *= dfn(d) ** (weights[i] / total)
                return prod
        elif op == "wsum":
            def dfn_out(d):
                return sum(dfn(d) * weights[i] / total for i, (_, dfn) in enumerate(children))
    return scores, dfn_out


def _leaf(idx: PyIndex, node: SopNode, model):
    inv = eval_iop(idx, node.args[0])
    f = field_of(node.args[0])
    if isinstance(model, UnrankedBoolean):
        return {d: 1.0 for d in inv}, None
    if isinstance(model, RankedBoolean):
        return {d: float(len(ps)) for d, ps in inv.items()}, None
    if isinstance(model, BM25):
        df = len(inv)
        n = float(idx.n_docs)
        avg = idx.avg_len(f)
        idf = max(0.0, math.log((n - df + 0.5) / (df + 0.5)))
        out = {}
        for d, ps in inv.items():
            tf = float(len(ps))
            dl = idx.get_doc_len(d, f)
            out[d] = idf * tf / (tf + model.k1 * (1 - model.b + model.b * dl / avg))
        return out, None
    # Indri
    ctf = sum(len(ps) for ps in inv.values())
    collen = float(idx.sum_len.get(f, 0))
    p = ctf / collen if collen else 0.0
    ctf_def = float(ctf) if ctf >= 1.0 else 0.5
    p_def = ctf_def / collen if collen else 0.0
    mu, lam = model.mu, model.lam
    out = {}
    for d, ps in inv.items():
        tf = float(len(ps))
        dl = idx.get_doc_len(d, f)
        out[d] = (1.0 - lam) * (tf + mu * p) / (dl + mu) + lam * p

    def dfn(d):
        dl = idx.get_doc_len(d, f)
        return (1.0 - lam) * (0.0 + mu * p_def) / (dl + mu) + lam * p_def

    return out, dfn


def expand_terms(
    idx: PyIndex,
    top_docs: list[tuple[int, float]],
    fb_terms: int,
    fb_mu: float,
    field: str = "body",
) -> list[tuple[str, float]]:
    """Direct per-doc loop mirroring QryExpand.java:100-124."""
    collen = float(idx.sum_len[field])
    cands = set()
    for d, _ in top_docs:
        for t in idx.doc_tokens[d][field]:
            if t and "." not in t and "," not in t:
                cands.add(t)
    scores = {}
    for t in cands:
        ctf = sum(len(ps) for ps in idx.postings.get((t, field), {}).values())
        idf = math.log(collen / ctf)
        s = 0.0
        for d, sd in top_docs:
            tf = len(idx.postings.get((t, field), {}).get(d, []))
            dl = idx.get_doc_len(d, field)
            ptd = (tf + fb_mu * ctf / collen) / (dl + fb_mu)
            s += ptd * sd * idf
        scores[t] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:fb_terms]


def search(idx: PyIndex, ast, model, k: int) -> list[tuple[int, float]]:
    """Evaluate an optimized AST -> top-k [(doc_id, score)], reference
    tie-break (score desc, doc_id asc — doc ids are ext-id-ordered)."""
    if ast is None:
        return []
    if isinstance(ast, (TermNode, IopNode)):
        ast = SopNode("score", (ast,))
    scores, _ = eval_sop(idx, ast, model)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
