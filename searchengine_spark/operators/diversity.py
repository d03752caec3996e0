"""Search-result diversification: xQuAD and PM2 (reference: QryDiversity.java).

Input: a rankings frame ``(qid, intent, doc_id, score)`` where
``intent = ''`` marks the main ranking and ``'<qid>.<i>'`` the intent
rankings (the reference reads the same shape from its
``diversity:initialRankingFile``, QryDiversity.java:38-77).

Per main qid (replicating getDocidToScore, QryDiversity.java:98-133):

- orthodox candidates = top ``max_input`` docs of the main ranking;
- scale base = max over (main, each intent) of the summed scores of
  its top ``max_input`` docs restricted to the candidate set, floored
  at 1.0; all scores divide by it;
- greedy re-rank with xQuAD (QryDiversity.java:159-187) or PM2
  (QryDiversity.java:189-249), emit top ``max_result``.

The greedy loops are inherently sequential *within one query* but
independent across queries — so they run as ``applyInPandas`` grouped
by qid: thousands of queries diversify in parallel, each group's
input capped at ``max_input`` rows per intent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

RESULT_SCHEMA = "qid string, doc_id long, score double, rank int"


def _normalized(group: pd.DataFrame, qid: str, max_input: int):
    main = group[group["intent"] == ""].sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).head(max_input)
    orthodox = [int(d) for d in main["doc_id"]]
    subqids = sorted(set(group.loc[group["intent"] != "", "intent"]))
    d2s: dict[int, dict[str, float]] = {d: {} for d in orthodox}

    def _fold(vals) -> float:
        # explicit left-to-right fold in (score desc, doc_id) order —
        # reproducible in SQL via list_reduce(list(… ORDER BY …));
        # pandas .sum() would use pairwise summation (order-dependent ulp)
        acc = 0.0
        for v in vals:
            acc = acc + float(v)
        return acc

    base = _fold(main["score"])
    per_intent_top = {}
    for sq in subqids:
        sub = group[group["intent"] == sq].sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(max_input)
        per_intent_top[sq] = sub
        tmp = _fold(sub[sub["doc_id"].isin(d2s)]["score"])
        base = max(base, tmp)
    base = max(base, 1.0)

    for _, row in main.iterrows():
        d2s[int(row["doc_id"])][qid] = float(row["score"]) / base
    for sq, sub in per_intent_top.items():
        for _, row in sub.iterrows():
            d = int(row["doc_id"])
            if d in d2s:
                d2s[d][sq] = float(row["score"]) / base
    return orthodox, subqids, d2s


def xquad_rerank(orthodox, subqids, d2s, qid, lam, max_result):
    """Greedy xQuAD (QryDiversity.xquad, QryDiversity.java:159-187)."""
    orthodox = list(orthodox)
    result: list[tuple[int, float]] = []
    while orthodox and len(result) < max_result:
        best_doc, best_score = -1, -float("inf")
        for d in orthodox:
            s = (1 - lam) * d2s[d].get(qid, 0.0)
            for sq in subqids:
                already = 1.0
                for chosen, _ in result:
                    already *= 1 - d2s[chosen].get(sq, 0.0)
                s += lam / len(subqids) * d2s[d].get(sq, 0.0) * already
            if s > best_score:
                best_doc, best_score = d, s
        result.append((best_doc, best_score))
        orthodox.remove(best_doc)
    result.sort(key=lambda t: (-t[1], t[0]))
    return result


def pm2_rerank(orthodox, subqids, d2s, qid, lam, max_result):
    """Greedy PM2 (QryDiversity.pm2, QryDiversity.java:189-249)."""
    orthodox = list(orthodox)
    n = len(subqids)
    v = max_result / n if n else 0.0
    s = {sq: 0.0 for sq in subqids}
    result: list[tuple[int, float]] = []
    while orthodox and len(result) < max_result:
        q = {sq: v / (2 * s[sq] + 1) for sq in subqids}
        max_q = max(subqids, key=lambda sq: q[sq]) if subqids else None
        best_doc, best_score, best_sum = -1, -float("inf"), -float("inf")
        for d in orthodox:
            sc = lam * q[max_q] * d2s[d].get(max_q, 0.0) if max_q else 0.0
            cov = d2s[d].get(max_q, 0.0) if max_q else 0.0
            for sq in subqids:
                if sq != max_q:
                    sc += (1.0 - lam) * q[sq] * d2s[d].get(sq, 0.0)
                    cov += d2s[d].get(sq, 0.0)
            if sc > best_score:
                best_doc, best_score, best_sum = d, sc, cov
        result.append((best_doc, best_score))
        if best_score != 0.0:
            for sq in subqids:
                s[sq] += d2s[best_doc].get(sq, 0.0) / best_sum
        orthodox.remove(best_doc)
    result.sort(key=lambda t: (-t[1], t[0]))
    return result


def diversify(
    rankings: DataFrame,
    algorithm: str = "xquad",
    lam: float = 0.5,
    max_input: int = 100,
    max_result: int = 100,
) -> DataFrame:
    """(qid, intent, doc_id, score) -> diversified (qid, doc_id, score, rank).

    One shuffle on qid; each query's greedy loop runs in its own
    grouped-map task.
    """
    algo = xquad_rerank if algorithm.lower() == "xquad" else pm2_rerank

    def per_query(key, pdf):
        qid = key[0]
        orthodox, subqids, d2s = _normalized(pdf, qid, max_input)
        ranked = algo(orthodox, subqids, d2s, qid, lam, max_result)
        return pd.DataFrame(
            {
                "qid": qid,
                "doc_id": [d for d, _ in ranked],
                "score": [s for _, s in ranked],
                "rank": range(1, len(ranked) + 1),
            }
        )

    return rankings.groupBy("qid").applyInPandas(per_query, RESULT_SCHEMA)


def rankings_from_engine(
    engine, qid: str, query: str, intents: dict[str, str], model, k: int = 100
) -> DataFrame:
    """Build the (qid, intent, doc_id, score) frame by running the main
    query + intent queries through the engine (intentsFile path,
    QryDiversity.java:77-89)."""
    from pyspark.sql import functions as F

    frames = []
    main = engine.scores(query, model=model).select(
        F.lit(qid).alias("qid"), F.lit("").alias("intent"), "doc_id", "score"
    )
    frames.append(main)
    for iqid, iq in intents.items():
        fr = engine.scores(iq, model=model).select(
            F.lit(qid).alias("qid"), F.lit(iqid).alias("intent"), "doc_id", "score"
        )
        frames.append(fr)
    u = frames[0]
    for fr in frames[1:]:
        u = u.unionByName(fr)
    return u
