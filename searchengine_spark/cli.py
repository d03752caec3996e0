"""QryEval-equivalent entry point: ``python -m searchengine_spark.cli
param_file`` (reference: QryEval.main, QryEval.java:31-59).

Reads a key=value param file, opens the persisted index, evaluates the
query file (with optional PRF expansion and diversification), writes
the trec_eval run file. Designed for ``spark-submit --py-files``: no
module-level Spark state.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from searchengine_spark.engine import SearchEngine
from searchengine_spark.index.build import read_index
from searchengine_spark.operators import prf
from searchengine_spark.operators.diversity import diversify, rankings_from_engine
from searchengine_spark.plans.models import make_model
from searchengine_spark.session import get_spark
from searchengine_spark.sources.params import RunConfig, read_param_file
from searchengine_spark.sources.trec import (
    read_query_file,
    read_run_file,
    write_run_file,
)


def _read_intents(path: str) -> dict[str, str]:
    out = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line and ":" in line:
                qid, _, q = line.partition(":")
                out[qid.strip()] = q.strip()
    return out


def run(param_file: str, spark=None) -> str:
    cfg = RunConfig.from_params(read_param_file(param_file))
    spark = spark or get_spark("qryeval")
    idx = read_index(spark, cfg.index_path)
    eng = SearchEngine(idx)
    model = make_model(cfg.algorithm, **cfg.model_params)
    queries = read_query_file(cfg.query_file)

    fb_initial: dict[str, list] = {}
    if cfg.fb and cfg.fb.get("initial_ranking_file"):
        # Run files carry EXTERNAL ids (urls) — resolve to internal doc
        # ids via the docs table (QryExpand.java reads the .teIn the same
        # way and calls Idx.getInternalDocid). Unresolvable numeric ids
        # fall back to an int parse (synthetic fixtures).
        run_df = read_run_file(spark, cfg.fb["initial_ranking_file"])
        # right-outer with the run file as the broadcast build side: the
        # corpus-sized docs table streams through without shuffling, and
        # run rows with unknown ext_ids survive (doc_id null). A LEFT
        # join couldn't broadcast its preserved left side.
        mapped = (
            idx.docs.select("ext_id", F.col("doc_id").alias("__did"))
            .join(F.broadcast(run_df), on="ext_id", how="right")
            .orderBy("qid", "rank")
        )
        for r in mapped.collect():
            if r["__did"] is not None:
                did = int(r["__did"])
            else:
                try:
                    did = int(r["ext_id"])
                except ValueError:
                    continue  # unknown external id: skip (reference logs+skips)
            fb_initial.setdefault(r["qid"], []).append((did, float(r["score"])))

    out_rows = []
    expansion_lines = []
    for qid, q in queries:
        if cfg.fb:
            params = prf.ExpandParams(
                fb=cfg.fb["fb"],
                fb_docs=cfg.fb["fb_docs"],
                fb_terms=cfg.fb["fb_terms"],
                fb_mu=cfg.fb["fb_mu"],
                fb_orig_weight=cfg.fb["fb_orig_weight"],
            )
            q_expanded, fb_query = prf.expand(
                eng, q, params, model=model, initial_ranking=fb_initial.get(qid)
            )
            expansion_lines.append(f"{qid}: {fb_query}")
            q = q_expanded

        if cfg.diversity:
            intents = (
                _read_intents(cfg.diversity["intents_file"])
                if cfg.diversity.get("intents_file")
                else {}
            )
            my_intents = {k: v for k, v in intents.items() if k.startswith(qid + ".")}
            rankings = rankings_from_engine(eng, qid, q, my_intents, model)
            ranked = diversify(
                rankings,
                cfg.diversity["algorithm"],
                cfg.diversity["lambda"],
                cfg.diversity["max_input"],
                cfg.diversity["max_result"],
            )
            rows = (
                ranked.join(idx.docs.select("doc_id", "ext_id"), "doc_id")
                .orderBy("rank")
                .collect()
            )
        else:
            rows = eng.search(q, model=model, k=cfg.output_length).collect()
        for r in rows:
            out_rows.append((qid, r["ext_id"], int(r["rank"]), float(r["score"])))

    write_run_file(out_rows, cfg.output_path, all_qids=[qid for qid, _ in queries])
    if cfg.fb and cfg.fb.get("expansion_file"):
        with open(cfg.fb["expansion_file"], "w") as fh:
            fh.write("\n".join(expansion_lines) + "\n")

    if cfg.eval:
        # engine-side trec_eval (extension; the reference pipes the run
        # file into external trec_eval): per-query lines then 'all'
        # summary rows, trec_eval -q style `metric<tab>qid<tab>value`
        from searchengine_spark.eval import ir_metrics, mean_metrics
        from searchengine_spark.sources.trec import read_qrels, read_run_file as _rrf

        per = ir_metrics(
            _rrf(spark, cfg.output_path),
            read_qrels(spark, cfg.eval["qrels_file"]),
            k=cfg.eval["k"],
        )
        lines = []
        metrics = ("p_at_k", "recall_at_k", "rr", "ap", "ndcg_at_k")
        for r in sorted(per.collect(), key=lambda r: r["qid"]):
            for m in metrics:
                lines.append(f"{m}\t{r['qid']}\t{r[m]:.6f}")
        mrow = mean_metrics(per).collect()[0]
        for dst, src in (
            ("num_q", "n_queries"),
            ("map", "map"),
            ("mrr", "mrr"),
            ("mean_p_at_k", "mean_p_at_k"),
            ("mean_recall_at_k", "mean_recall_at_k"),
            ("mean_ndcg_at_k", "mean_ndcg_at_k"),
        ):
            v = mrow[src]
            lines.append(
                f"{dst}\tall\t{v:.6f}" if isinstance(v, float) else f"{dst}\tall\t{v}"
            )
        with open(cfg.eval["metrics_path"], "w") as fh:
            fh.write("\n".join(lines) + "\n")
    _ = F
    return cfg.output_path


def main() -> None:
    if len(sys.argv) != 2:
        print("Usage: python -m searchengine_spark.cli <param_file>", file=sys.stderr)
        sys.exit(1)
    run(sys.argv[1])


if __name__ == "__main__":
    main()
